// Driver that compiles the reference's upsurface.cpp so the repo's 3D
// separable sine noise (ops/noise.py gen_sine_table_3d /
// eval_sine3d_grid — used for voxel density fields, planet surfaces,
// and voxel rocks) can be pinned against the actual reference
// implementation (noise_gen_3d::gen_sines upsurface.cpp:16-38,
// gen_xyz_vals/get_val :41-72).
//
// This file is OUR OWN code: stubs for the universe-object classes the
// rest of the TU references.
//
// Protocol:
//   upsurface_harness rs1 rs2 mag freq nx ny nz table_out.f32 vals_out.f32
// table_out: [60, 7] f32 rdata rows; vals_out: [nz, ny, nx] f32 noise.

#include "3DWorld.h"
#include "universe.h"
#include "universe_base.h"
#include "upsurface.h"
#include "sinf.h"

#include <cstdio>
#include <cstdlib>
#include <vector>

// quantized SINF table (sinf.h): created in main
std::vector<float> sin_table;

static void create_sin_table_local() {
    if (!sin_table.empty()) return;
    sin_table.resize(2 * TSIZE);
    for (unsigned i = 0; i < TSIZE; ++i) {
        sin_table[i] = sinf(i / sscale);
        sin_table[i + TSIZE] = cosf(i / sscale);
    }
}

double rgen_core_t::randd() {
    // the real out-of-line definition (gen_object.cpp:377-381)
    double rand_num;
    randome_int(rand_num);
    return rand_num / 2147483563.;
}

// universe-object stubs (upsurface.cpp's other functions reference
// these; never called by the noise path)
void uobj_rgen::set_rseeds() const {}
void uobj_solid::get_colors(unsigned char *ca, unsigned char *cb) const {(void)ca; (void)cb;}
void urev_body::get_surface_color(unsigned char *data, float val, float val2) const {(void)data; (void)val; (void)val2;}
point_d urev_body::do_update(point_d const &p0, bool update_rev, bool update_rot) {(void)update_rev; (void)update_rot; return p0;}
void urev_body::explode(float damage, float bradius, int etype, point const &edir, int exp_time, int wclass,
                        int align, unsigned eflags, free_obj const *parent) {
    (void)damage; (void)bradius; (void)etype; (void)edir; (void)exp_time;
    (void)wclass; (void)align; (void)eflags; (void)parent;
}
void urev_body::free_texture() {}
void urev_body::free_uobj() {}
std::string urev_body::get_info() const {return std::string();}
bool urev_body::use_procedural_shader() const {return false;}
cobj_vector_t const &uobject::get_cobjs() const {static cobj_vector_t v; return v;}
void uobject::explode(float damage, float bradius, int etype, vector3d const &edir, int exp_time, int wclass,
                      int align, unsigned eflags, free_obj const *parent_) {
    (void)damage; (void)bradius; (void)etype; (void)edir; (void)exp_time;
    (void)wclass; (void)align; (void)eflags; (void)parent_;
}
bool uobject::sphere_intersection(point const &c, float r) const {(void)c; (void)r; return false;}
void rotated_obj::rotate_vector(vector3d &v) const {(void)v;}
void sd_sphere_d::gen_points_norms(sphere_point_norm &cur_spn, float s_beg, float s_end, float t_beg, float t_end) {
    (void)cur_spn; (void)s_beg; (void)s_end; (void)t_beg; (void)t_end;
}
void sd_sphere_d::set_data(point const &p, float r, int n, float const *pm, float dp, upsurface const *s) {
    (void)p; (void)r; (void)n; (void)pm; (void)dp; (void)s;
}
void sd_sphere_vbo_d::clear_vbos() {}
void sphere_point_norm::free_data() {}

int main(int argc, char **argv) {
    if (argc != 10) {
        fprintf(stderr, "usage: %s rs1 rs2 mag freq nx ny nz table.f32 vals.f32\n", argv[0]);
        return 1;
    }
    int const rs1 = atoi(argv[1]), rs2 = atoi(argv[2]);
    float const mag = (float)atof(argv[3]), freq = (float)atof(argv[4]);
    unsigned const nx = atoi(argv[5]), ny = atoi(argv[6]), nz = atoi(argv[7]);
    create_sin_table_local();

    noise_gen_3d ng;
    ng.set_rand_seeds(rs1, rs2);
    ng.gen_sines(mag, freq);

    FILE *ft = fopen(argv[8], "wb");
    if (!ft) {return 2;}
    fwrite(ng.rdata, sizeof(float), 60 * 7, ft);
    fclose(ft);

    // evaluate on a small regular grid, matching eval_sine3d_grid's
    // start/step convention
    point const start(-1.0, -1.0, -1.0);
    vector3d const step(0.13, 0.17, 0.19);
    unsigned const xyz_num[3] = {nx, ny, nz};
    std::vector<float> xyz_vals[3];
    ng.gen_xyz_vals(start, step, xyz_num, xyz_vals);
    std::vector<float> out((size_t)nx * ny * nz);
    for (unsigned z = 0; z < nz; ++z)
        for (unsigned y = 0; y < ny; ++y)
            for (unsigned x = 0; x < nx; ++x)
                out[((size_t)z * ny + y) * nx + x] = ng.get_val(x, y, z, xyz_vals);

    FILE *fv = fopen(argv[9], "wb");
    if (!fv) {return 2;}
    fwrite(out.data(), sizeof(float), out.size(), fv);
    fclose(fv);
    return 0;
}
