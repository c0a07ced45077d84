// Driver that compiles the reference's mesh_gen.cpp so the repo's
// sine-table noise (ops/noise.py gen_sine_table / eval_sine_grid) can
// be pinned BITWISE against the actual reference implementation
// (gen_rand_sine_table_entries mesh_gen.cpp:219-254, sine evaluation
// via mesh_xy_grid_cache_t::build_arrays/eval_index :588+, driven
// through gen_mesh_sine_table :201-209).
//
// This file is OUR OWN code: stub definitions for the symbols
// mesh_gen.cpp imports from the rest of the app (textures, shaders,
// heightmap IO, erosion), scoped to pure sine-mode generation.
//
// Protocol:
//   noise_harness nx ny table_out.f32 height_out.f32
// table_out: [90, 5] f32 sinTable rows (mag, y_phase, x_phase, y_freq,
// x_freq); height_out: [ny, nx] f32 from gen_mesh_sine_table.
// Scene parameters come from NH_* environment variables.

#include "3DWorld.h"
#include "mesh.h"
#include "heightmap.h"
#include "shaders.h"

#include <cstdio>
#include <cstdlib>
#include <vector>

// ---------------------------------------------------------------------------
// globals mesh_gen.cpp imports
// ---------------------------------------------------------------------------

int MESH_X_SIZE(128), MESH_Y_SIZE(128), MESH_Z_SIZE(64);
int MAX_XY_SIZE(128), XY_MULT_SIZE(16384), XY_SUM_SIZE(256), I_TIMESCALE(1);
int MESH_SIZE[3] = {128, 128, 64};
float X_SCENE_SIZE(4.0), Y_SCENE_SIZE(4.0), Z_SCENE_SIZE(4.0);
float XY_SCENE_SIZE(4.0);
float DX_VAL(0.0625), DY_VAL(0.0625), HALF_DXY(0.0625), DZ_VAL(0.0625);
float DX_VAL_INV(16.0), DY_VAL_INV(16.0), DZ_VAL_INV(16.0);
float MESH_HEIGHT(0.10), LARGE_ZVAL(1.0E6);
float CLOUD_CEILING(1.5);
bool combined_gu(0);
int xoff(0), yoff(0), xoff2(0), yoff2(0), world_mode(WMODE_GROUND);
int rand_gen_index(1), mesh_rgen_index(1), mesh_scale_change(0);
int display_mode(0), read_heightmap(0), read_landscape(0), do_read_mesh(0);
int mesh_seed(0), scrolling(0), camera_mode(0), invert_mh_image(0);
unsigned erosion_iters(0);
double c_radius(1.0), c_phi(0.0), c_theta(0.0);
float water_plane_z(-10.0), temperature(20.0), mesh_file_scale(1.0);
float mesh_file_tz(0.0), custom_glaciate_exp(0.0);
float water_h_off(0.0), water_h_off_rel(0.0), disabled_mesh_z(-10.0);
float read_mesh_zmm(0.0), init_temperature(20.0), univ_temp(20.0);
// zmin/zmax/zbottom/ztop/zmax_est are defined by mesh_gen.cpp itself
point mesh_origin(all_zeros), surface_pos(all_zeros), camera_origin(all_zeros);
point camera_pos(all_zeros);
char *mh_filename(NULL), *mh_filename_tt(NULL), *mesh_file(NULL);
float **mesh_height = NULL;
unsigned char **mesh_draw = NULL;
rand_gen_t global_rand_gen;

// ---------------------------------------------------------------------------
// function stubs (render/IO paths never taken in sine mode)
// ---------------------------------------------------------------------------

void apply_erosion(float *heightmap, int xsize, int ysize, float min_zval,
                   unsigned num_iters) {
    (void)heightmap; (void)xsize; (void)ysize; (void)min_zval;
    (void)num_iters;
}
void checked_fclose(FILE *fp) {if (fp) {fclose(fp);}}
void gen_scene(int a, int b, int c, int d, int e) {(void)a; (void)b; (void)c; (void)d; (void)e;}
void gen_tex_height_tables() {}
float get_tiled_terrain_height_tex(float x, float y, bool nearest) {(void)x; (void)y; (void)nearest; return 0.0;}
void regen_lightmap() {}
void update_cpos() {}
bool using_hmap_with_detail() {return false;}
bool using_tiled_terrain_hmap_tex() {return false;}
void free_texture(unsigned &tid) {tid = 0;}
double rgen_core_t::randd() {
    // the real out-of-line definition (gen_object.cpp:377-381): the
    // combined-LCG draw the repo's utils/rng.py pins bitwise
    double rand_num;
    randome_int(rand_num);
    return rand_num / 2147483563.;
}
float heightmap_t::get_heightmap_value(unsigned x, unsigned y) const {(void)x; (void)y; return 0.0;}
void texture_t::free_client_mem() {}
void texture_t::gl_delete() {}
void texture_t::load(int a, bool b, bool c, bool d) {(void)a; (void)b; (void)c; (void)d;}
void texture_t::resize(int a, int b) {(void)a; (void)b;}
void compute_shader_t::begin() {}
void compute_shader_t::end_shader() {}
void compute_shader_t::prep_for_read_pixels(bool b) {(void)b;}
void compute_shader_t::setup_and_run(unsigned &tid, bool a, bool b, bool c) {(void)tid; (void)a; (void)b; (void)c;}
bool shader_t::add_uniform_float(char const *const name, float v) const {(void)name; (void)v; return true;}
void shader_t::disable() {}
void shader_t::enable() {}
void shader_t::set_prefix(char const *p, unsigned t) {(void)p; (void)t;}
float int_mesh_zval_pt_off(point const &pos, int a, int b, bool c) {(void)pos; (void)a; (void)b; (void)c; return 0.0;}
void compute_shader_t::read_float_vals(std::vector<float> &vals, bool is_last, bool keep) {(void)vals; (void)is_last; (void)keep;}
bool open_file(FILE *&fp, char const *fn, std::string const &file_type, char const *mode) {
    (void)file_type;
    fp = fopen(fn, mode);
    return (fp != NULL);
}

// entry points in mesh_gen.cpp
void gen_rand_sine_table_entries(float scaled_height);
void gen_mesh_sine_table(float **matrix, int x_offset, int y_offset,
                         int xsize, int ysize);
void compute_scale();
void create_sin_table();
extern float sinTable[90][5];
extern float mesh_height_scale;

static float envf(char const *name, float dflt) {
    char const *s = getenv(name);
    return (s ? (float)atof(s) : dflt);
}

int main(int argc, char **argv) {
    if (argc != 5) {
        fprintf(stderr, "usage: %s nx ny table_out.f32 height_out.f32\n",
                argv[0]);
        return 1;
    }
    int const nx = atoi(argv[1]), ny = atoi(argv[2]);
    MESH_X_SIZE = (int)envf("NH_MESH_X", 128);
    MESH_Y_SIZE = (int)envf("NH_MESH_Y", 128);
    X_SCENE_SIZE = envf("NH_XSS", 4.0);
    Y_SCENE_SIZE = envf("NH_YSS", 4.0);
    XY_SCENE_SIZE = 0.5f * (X_SCENE_SIZE + Y_SCENE_SIZE);
    DX_VAL = 2.0f * X_SCENE_SIZE / (float)MESH_X_SIZE;
    DY_VAL = 2.0f * Y_SCENE_SIZE / (float)MESH_Y_SIZE;
    DX_VAL_INV = 1.0f / DX_VAL;
    DY_VAL_INV = 1.0f / DY_VAL;
    MESH_HEIGHT = envf("NH_MESH_HEIGHT", 0.10f);
    mesh_seed = (int)envf("NH_SEED", 3);
    xoff2 = (int)envf("NH_XOFF2", 0);
    yoff2 = (int)envf("NH_YOFF2", 0);

    create_sin_table();   // SINF/COSF quantized lookup (sinf.h)
    compute_scale();
    gen_rand_sine_table_entries(MESH_HEIGHT * mesh_height_scale);

    FILE *ft = fopen(argv[3], "wb");
    if (!ft) {return 2;}
    fwrite(sinTable, sizeof(float), 90 * 5, ft);
    fclose(ft);

    std::vector<float *> rows(ny);
    std::vector<float> store((size_t)nx * ny);
    for (int y = 0; y < ny; ++y) {rows[y] = &store[(size_t)y * nx];}
    gen_mesh_sine_table(rows.data(), xoff2, yoff2, nx, ny);

    FILE *fh = fopen(argv[4], "wb");
    if (!fh) {return 2;}
    fwrite(store.data(), sizeof(float), store.size(), fh);
    fclose(fh);
    return 0;
}
