// Test-only golden harness: runs the REFERENCE hydraulic-erosion
// implementation (/root/reference/src/erosion.cpp, compiled verbatim from
// the reference tree — never copied into this repo) on a raw float32
// heightmap so the repo's transcribed Python oracle (ops/erosion.py
// erode_reference) can be validated against the actual C++ behavior.
//
// Usage: erosion_harness <in.f32> <xs> <ys> <min_zval> <num_iters>
//                        <erode_amount> <water_plane_z> <out.f32>
// The input file holds xs*ys little-endian float32 heights (row-major,
// y-major like the reference heightmap[y*xs+x]); the result is written in
// the same format.

#include "3DWorld.h"   // first (it remaps timer_t); via the GL stub headers
#include <cstdio>
#include <cstdlib>
#include <vector>

// engine globals referenced by erosion.cpp (defined in other TUs in the
// real build; supplied here and set from argv/env)
float erode_amount = 1.0f;
float water_plane_z = -1e9f;
float HALF_DXY = 0.0f;
void register_timing_value(const char*, int, bool) {}

// rock-vs-dirt test used by the erosion ds scaling (Textures.cpp:1284);
// parameters configurable so goldens can cover both regimes
static float g_zmin = 0.0f, g_zmax = 1.0f, g_clip_hd1 = 2.0f,
             g_relh_adj_tex = 0.0f;
int get_bare_ls_tid(float zval) {
    float const relh(g_relh_adj_tex + (zval - g_zmin) / (g_zmax - g_zmin));
    return ((relh > g_clip_hd1) ? (int)ROCK_TEX : (int)DIRT_TEX);
}

void apply_erosion(float* heightmap, int xsize, int ysize, float min_zval,
                   unsigned num_iters);

static float envf(const char* name, float dflt) {
    const char* v = std::getenv(name);
    return v ? (float)std::atof(v) : dflt;
}

int main(int argc, char** argv) {
    if (argc != 9) {
        std::fprintf(stderr, "usage: %s in.f32 xs ys min_zval iters "
                             "erode_amount water_plane_z out.f32\n", argv[0]);
        return 2;
    }
    const char* in_path = argv[1];
    int const xs = std::atoi(argv[2]), ys = std::atoi(argv[3]);
    float const min_zval = std::atof(argv[4]);
    unsigned const iters = (unsigned)std::atoi(argv[5]);
    erode_amount = std::atof(argv[6]);
    water_plane_z = std::atof(argv[7]);
    const char* out_path = argv[8];
    HALF_DXY = envf("EH_HALF_DXY", 0.0f);
    g_zmin = envf("EH_ZMIN", 0.0f);
    g_zmax = envf("EH_ZMAX", 1.0f);
    g_clip_hd1 = envf("EH_CLIP_HD1", 2.0f);
    g_relh_adj_tex = envf("EH_RELH_ADJ", 0.0f);

    std::vector<float> hm((size_t)xs * ys);
    FILE* f = std::fopen(in_path, "rb");
    if (!f || std::fread(hm.data(), sizeof(float), hm.size(), f) != hm.size()) {
        std::fprintf(stderr, "bad input %s\n", in_path);
        return 1;
    }
    std::fclose(f);

    apply_erosion(hm.data(), xs, ys, min_zval, iters);

    f = std::fopen(out_path, "wb");
    if (!f || std::fwrite(hm.data(), sizeof(float), hm.size(), f) != hm.size()) {
        std::fprintf(stderr, "bad output %s\n", out_path);
        return 1;
    }
    std::fclose(f);
    return 0;
}
