// Driver that compiles the reference's mesh_intersect.cpp (+ Math3d.cpp
// and intersect.cpp for its geometry helpers) so the repo's heightfield
// ray intersection (ops/ray.py ray_heightfield_dda) can be validated
// against the actual reference `mesh_intersector` (the hierarchical
// line-vs-mesh query used by its physics and ray tracer,
// mesh_intersect.cpp:248-256).
//
// This file is OUR OWN code: globals + the z_min_matrix fill that
// matrix_ops.cpp::update_matrix_element performs (3x3 neighborhood min
// with the (-1,-1) corner intentionally skipped, matrix_ops.cpp:374-383).
//
// Protocol:
//   mesh_intersect_harness mesh.f32 xs ys segs.f32 nsegs out.f32
// segs.f32: nsegs x 6 floats (v1, v2).  out.f32: nsegs x 4 floats
// (hit, xpos, ypos, zval).

#include "3DWorld.h"
#include "mesh.h"

#include <cstdio>
#include <cstdlib>
#include <vector>

int MESH_X_SIZE(128), MESH_Y_SIZE(128), MESH_Z_SIZE(64);
int MAX_XY_SIZE(128), XY_MULT_SIZE(16384), XY_SUM_SIZE(256), I_TIMESCALE(1);
int MESH_SIZE[3] = {128, 128, 64};
float X_SCENE_SIZE(4.0), Y_SCENE_SIZE(4.0), Z_SCENE_SIZE(4.0);
float XY_SCENE_SIZE(4.0);
float DX_VAL(0.0625), DY_VAL(0.0625), HALF_DXY(0.0625), DZ_VAL(0.0625);
float DX_VAL_INV(16.0), DY_VAL_INV(16.0), DZ_VAL_INV(16.0);
float CLOUD_CEILING(1.5);
float zmin(-4.0), zmax(4.0), ztop(0.0), zbottom(-4.0);
float base_gravity(1.0), orig_timestep(0.007);
int world_mode(WMODE_GROUND), xoff2(0), yoff2(0);
float **mesh_height = NULL, **z_min_matrix = NULL;
unsigned char **mesh_draw = NULL;
rand_gen_t global_rand_gen;
std::vector<float> sin_table;   // unused by this path; satisfies Math3d

double rgen_core_t::randd() {
    double rand_num;
    randome_int(rand_num);
    return rand_num / 2147483563.;
}
void cube_t::set_from_points(point const *const pts, unsigned npts) {
    assert(npts > 0);
    set_from_point(pts[0]);
    for (unsigned i = 1; i < npts; ++i) {union_with_pt(pts[i]);}
}

int main(int argc, char **argv) {
    if (argc != 7) {
        fprintf(stderr, "usage: %s mesh.f32 xs ys segs.f32 nsegs out.f32\n",
                argv[0]);
        return 1;
    }
    int const xs = atoi(argv[2]), ys = atoi(argv[3]);
    int const nsegs = atoi(argv[5]);
    MESH_X_SIZE = xs; MESH_Y_SIZE = ys;
    DX_VAL = 2.0f * X_SCENE_SIZE / (float)xs;
    DY_VAL = 2.0f * Y_SCENE_SIZE / (float)ys;
    DX_VAL_INV = 1.0f / DX_VAL; DY_VAL_INV = 1.0f / DY_VAL;

    std::vector<float> hm((size_t)xs * ys);
    {
        FILE *f = fopen(argv[1], "rb");
        if (!f || fread(hm.data(), 4, hm.size(), f) != hm.size()) {return 2;}
        fclose(f);
    }
    std::vector<float *> mh(ys), zm(ys);
    std::vector<float> zm_store((size_t)xs * ys);
    for (int y = 0; y < ys; ++y) {
        mh[y] = &hm[(size_t)y * xs];
        zm[y] = &zm_store[(size_t)y * xs];
    }
    mesh_height = mh.data(); z_min_matrix = zm.data();
    ztop = -1e30f; zbottom = 1e30f;
    for (float h : hm) {ztop = std::max(ztop, h); zbottom = std::min(zbottom, h);}
    zmax = ztop; zmin = zbottom;
    // update_matrix_element z_min fill (matrix_ops.cpp:374-383)
    for (int ypos = 0; ypos < ys; ++ypos) {
        for (int xpos = 0; xpos < xs; ++xpos) {
            float z_min(zmax);
            for (int y = -1; y <= 1; ++y) {
                for (int x = ((y == -1) ? 0 : -1); x <= 1; ++x) {
                    if (point_outside_mesh(xpos + x, ypos + y)) continue;
                    z_min = std::min(z_min, mesh_height[ypos + y][xpos + x]);
                }
            }
            z_min_matrix[ypos][xpos] = z_min;
        }
    }

    // build the BSP acceleration tree (the reference's production
    // path; the non-BSP fallback walker misses ~5% of grazing cells)
    void gen_mesh_bsp_tree();
    gen_mesh_bsp_tree();

    std::vector<float> segs((size_t)nsegs * 6);
    {
        FILE *f = fopen(argv[4], "rb");
        if (!f || fread(segs.data(), 4, segs.size(), f) != segs.size()) {return 2;}
        fclose(f);
    }
    std::vector<float> out((size_t)nsegs * 4, 0.0f);
    for (int i = 0; i < nsegs; ++i) {
        float const *s = &segs[(size_t)i * 6];
        point const v1(s[0], s[1], s[2]), v2(s[3], s[4], s[5]);
        int xpos(0), ypos(0);
        float zval(0.0);
        bool const hit = line_intersect_mesh(v1, v2, xpos, ypos, zval, 0, 0);
        float *o = &out[(size_t)i * 4];
        o[0] = hit ? 1.0f : 0.0f;
        o[1] = (float)xpos; o[2] = (float)ypos; o[3] = zval;
    }
    FILE *f = fopen(argv[6], "wb");
    if (!f) {return 2;}
    fwrite(out.data(), 4, out.size(), f);
    fclose(f);
    return 0;
}
