// Test-stub glm noise header: mesh_gen.cpp uses glm only for its
// simplex/perlin modes (mesh_gen.cpp:715-716), which the sine-table
// harness never exercises.  Returning 0 keeps those modes inert.
#pragma once
namespace glm {
struct vec2 {
    float x, y;
    vec2(float x_, float y_) : x(x_), y(y_) {}
};
inline float simplex(vec2 const &) {return 0.0f;}
inline float perlin(vec2 const &) {return 0.0f;}
}
