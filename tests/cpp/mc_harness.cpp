// Test-only golden harness: polygonises a raw float32 scalar field with
// the REFERENCE marching-cubes tables (/root/reference/src/
// marching_cubes.h, included verbatim at compile time — never copied
// into this repo) so the repo's DERIVED 256-case table (voxel/mc256.py)
// can be compared cell by cell against the published triangulation.
//
// Conventions match voxel_manager::add_triangles_for_voxel
// (voxels.cpp:497-546): cube-index bit ((xhi^yhi) + 2*yhi + 4*zhi) is
// set when the corner value is OUTSIDE (>= isolevel); vertices are
// linearly interpolated to the isolevel on the crossed edges.
//
// Usage: mc_harness <in.f32> <X> <Y> <Z> <isolevel> <out.bin>
//   in.f32:  X*Y*Z little-endian float32, index (x*Y + y)*Z + z
//   out.bin: per cell with triangles: int32 x,y,z,ntris then ntris*9
//            float32 vertex coords (cell-local + cell base, grid units)

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "marching_cubes.h"  // reference tables (edge_table, tri_table)

// Bourke corner layout (matches the reference's bit mapping)
static const int CORNER[8][3] = {
    {0,0,0},{1,0,0},{1,1,0},{0,1,0},{0,0,1},{1,0,1},{1,1,1},{0,1,1}};
static const int EDGE[12][2] = {
    {0,1},{1,2},{2,3},{3,0},{4,5},{5,6},{6,7},{7,4},
    {0,4},{1,5},{2,6},{3,7}};

int main(int argc, char** argv) {
    if (argc != 7) {
        std::fprintf(stderr,
                     "usage: %s in.f32 X Y Z isolevel out.bin\n", argv[0]);
        return 2;
    }
    int const X = std::atoi(argv[2]), Y = std::atoi(argv[3]),
              Z = std::atoi(argv[4]);
    float const iso = (float)std::atof(argv[5]);
    std::vector<float> f((size_t)X * Y * Z);
    {
        FILE* in = std::fopen(argv[1], "rb");
        if (!in || std::fread(f.data(), 4, f.size(), in) != f.size()) {
            std::fprintf(stderr, "bad input\n");
            return 2;
        }
        std::fclose(in);
    }
    FILE* out = std::fopen(argv[6], "wb");
    auto V = [&](int x, int y, int z) {
        return f[((size_t)x * Y + y) * Z + z];
    };
    for (int x = 0; x + 1 < X; ++x)
    for (int y = 0; y + 1 < Y; ++y)
    for (int z = 0; z + 1 < Z; ++z) {
        unsigned cix = 0;
        float vals[8];
        for (int c = 0; c < 8; ++c) {
            vals[c] = V(x + CORNER[c][0], y + CORNER[c][1],
                        z + CORNER[c][2]);
            if (vals[c] >= iso) cix |= 1u << c;  // OUTSIDE sets the bit
        }
        if (voxel_detail::edge_table[cix] == 0) continue;
        float vx[12][3];
        for (int e = 0; e < 12; ++e) {
            if (!(voxel_detail::edge_table[cix] & (1u << e))) continue;
            int const a = EDGE[e][0], b = EDGE[e][1];
            float const va = vals[a], vb = vals[b];
            float t = (vb != va) ? (iso - va) / (vb - va) : 0.5f;
            if (t < 0.0f) t = 0.0f;
            if (t > 1.0f) t = 1.0f;
            for (int d = 0; d < 3; ++d) {
                float const pa = (float)CORNER[a][d],
                            pb = (float)CORNER[b][d];
                vx[e][d] = pa + t * (pb - pa);
            }
        }
        int const* tris = voxel_detail::tri_table[cix];
        int ntris = 0;
        for (int i = 0; tris[i] >= 0; i += 3) ++ntris;
        int hdr[4] = {x, y, z, ntris};
        std::fwrite(hdr, 4, 4, out);
        float const base[3] = {(float)x, (float)y, (float)z};
        for (int i = 0; tris[i] >= 0; i += 3) {
            for (int j = 0; j < 3; ++j) {
                float p[3];
                for (int d = 0; d < 3; ++d)
                    p[d] = base[d] + vx[tris[i + j]][d];
                std::fwrite(p, 4, 3, out);
            }
        }
    }
    std::fclose(out);
    return 0;
}
