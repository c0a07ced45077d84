// Standalone driver that compiles /root/reference/src/Physics.cpp into a
// test binary so the repo's transcribed physics oracle
// (tests/oracle_physics.py) can be pinned against the ACTUAL reference
// integrator (dwobject::advance_object and the routines it calls:
// get_obj_zval, check_water_collision, object_bounce, surface_advance).
//
// This file is OUR OWN code: it provides stub definitions for the ~100
// symbols Physics.cpp imports from other translation units (rendering,
// cobj collision, grass, smoke, ...), scoped to the oracle's declared
// environment model: ground mode, flat-plane water, no cobjs, no grass,
// no flow sources, temperature above freezing.  Mesh height sampling is
// injected as the same bilinear interpolation the oracle parameterizes
// over, so the comparison isolates the INTEGRATION semantics.
//
// Protocol (mirrors erosion_harness):
//   physics_harness mesh.f32 xs ys nsteps obj_in.f32 nobj traj_out.f32
// obj_in.f32: nobj x 8 floats (pos3, vel3, status, flags).
// traj_out.f32: nsteps x nobj x 8 floats (pos3, vel3, status, flags).
// Scene/type parameters come from PH_* environment variables.

#include "3DWorld.h"
#include "mesh.h"
#include "physics_objects.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

// ---------------------------------------------------------------------------
// globals Physics.cpp imports (normally defined across the rest of the app)
// ---------------------------------------------------------------------------

int MESH_X_SIZE(128), MESH_Y_SIZE(128), MESH_Z_SIZE(64);
int MAX_XY_SIZE(128), XY_MULT_SIZE(16384), XY_SUM_SIZE(256), I_TIMESCALE(1);
int MESH_SIZE[3] = {128, 128, 64};
float X_SCENE_SIZE(4.0), Y_SCENE_SIZE(4.0), Z_SCENE_SIZE(4.0);
float XY_SCENE_SIZE(4.0);
float DX_VAL(0.0625), DY_VAL(0.0625), HALF_DXY(0.0625), DZ_VAL(0.0625);
float DX_VAL_INV(16.0), DY_VAL_INV(16.0), DZ_VAL_INV(16.0);
float TWO_XSS(8.0), TWO_YSS(8.0);
float CAMERA_RADIUS(0.06), C_STEP_HEIGHT(0.6);
int xoff(0), yoff(0), xoff2(0), yoff2(0);
int world_mode(WMODE_GROUND), frame_counter(1), display_mode(0);
int animate2(1), precip_mode(0);
int iticks(1), is_cloudy(0), auto_time_adv(0), DISABLE_WATER(0);
int enable_fsource(0), has_accumulation(0), has_snow_accum(0);
int camera_coll_id(-1), s_ball_id(-1), num_groups(0);
bool begin_motion(1), disable_fire_delay(0), has_decals(0);
float tstep(0.025), fticks(1.0), base_gravity(1.0);
float zmin(-4.0), zmax(4.0), ztop(0.0), zbottom(-4.0), czmax(0.0), czmin(0.0);
float zmax_est(4.0), water_plane_z(-10.0), max_water_height(-10.0);
float alt_temp(20.0), grass_length(0.0);
float light_factor(0.5), sun_rot(0.0), moon_rot(0.0);
float CLOUD_CEILING(1.5);
point camera_pos(all_zeros);
vector3d up_norm(plus_z), orig_cdir(plus_z);

float **mesh_height = NULL, **water_matrix = NULL, **h_collision_matrix = NULL;
float **accumulation_matrix = NULL, **surface_damage = NULL;
unsigned char **mesh_draw = NULL;
char **wminside = NULL;
short **spillway_matrix = NULL;
valley_w **watershed_matrix = NULL;
vector3d **vertex_normals = NULL, **surface_normals = NULL,
         **wat_vert_normals = NULL;
std::vector<valley> valleys;
int coll_id[NUM_TOT_OBJS] = {};
dwobject def_objects[NUM_TOT_OBJS];
obj_group obj_groups[NUM_TOT_OBJS];
obj_vector_t<bubble> bubbles(0);
obj_vector_t<particle_cloud> part_clouds(0);
obj_vector_t<fire> fires(0);
obj_vector_t<decal_obj> decals(0);
water_particle_manager water_part_man;
physics_particle_manager explosion_part_man[2];

// defined in Physics.cpp itself; set from main
extern float temperature;
extern vector3d wind, total_wind;
extern obj_type object_types[NUM_TOT_OBJS];

// ---------------------------------------------------------------------------
// scoped environment model (injected sampling)
// ---------------------------------------------------------------------------

static std::vector<float> g_mesh;  // row-major [ys][xs]
static int g_xs(0), g_ys(0);

// the oracle's bilinear height sample (float32 throughout)
static float bilinear_h(float x, float y) {
    float gx = x * DX_VAL_INV + (float)(g_xs / 2);
    float gy = y * DY_VAL_INV + (float)(g_ys / 2);
    float fx0 = floorf(gx), fy0 = floorf(gy);
    int x0 = (int)fx0, y0 = (int)fy0;
    if (x0 < 0) x0 = 0; if (x0 > g_xs - 2) x0 = g_xs - 2;
    if (y0 < 0) y0 = 0; if (y0 > g_ys - 2) y0 = g_ys - 2;
    float fx = gx - (float)x0, fy = gy - (float)y0;
    if (fx < 0.0f) fx = 0.0f; if (fx > 1.0f) fx = 1.0f;
    if (fy < 0.0f) fy = 0.0f; if (fy > 1.0f) fy = 1.0f;
    float const *m = g_mesh.data();
    float h00 = m[y0 * g_xs + x0], h01 = m[y0 * g_xs + x0 + 1];
    float h10 = m[(y0 + 1) * g_xs + x0], h11 = m[(y0 + 1) * g_xs + x0 + 1];
    return (h00 * (1.0f - fx) + h01 * fx) * (1.0f - fy)
         + (h10 * (1.0f - fx) + h11 * fx) * fy;
}

float interpolate_mesh_zval(float xval, float yval, float rad, int use_real_equation, int ignore_disabled, bool clamp_xy) {
    (void)rad; (void)use_real_equation; (void)ignore_disabled; (void)clamp_xy;
    return bilinear_h(xval, yval);
}
float int_mesh_zval_pt_off(point const &pos, int use_real_equation, int ignore_disabled, bool clamp_xy) {
    (void)use_real_equation; (void)ignore_disabled; (void)clamp_xy;
    return bilinear_h(pos.x, pos.y);
}
bool has_water(int x, int y) {(void)x; (void)y; return true;}  // flat plane: gated by wpz<mh upstream
int is_in_ice(int x, int y) {(void)x; (void)y; return 0;}
bool is_underwater(point const &pos, int check_bottom, float *depth) {
    (void)check_bottom;
    if (depth) {*depth = water_plane_z - pos.z;}
    return (pos.z < water_plane_z);
}
bool mesh_is_underwater(int x, int y) {
    return (water_matrix && mesh_height && water_matrix[y][x] > mesh_height[y][x]);
}
vector3d get_interpolated_terrain_normal(point const &pos, float *mh) {
    if (mh) {*mh = bilinear_h(pos.x, pos.y);}
    return plus_z;  // tiled-terrain only; unused in ground-mode scope
}
float get_grass_density(point const &pos) {(void)pos; return 0.0;}
void float_downstream(point &pos, float radius) {(void)pos; (void)radius;}
bool sphere_int_tiled_terrain(point &pos, float radius) {(void)pos; (void)radius; return false;}
float snow_height(point pos) {(void)pos; return 0.0;}
float get_rain_intensity() {return 0.0;}
float get_snow_intensity() {return 0.0;}
bool is_rain_enabled() {return false;}
bool is_snow_enabled() {return false;}
float get_grass_density(int x, int y) {(void)x; (void)y; return 0.0;}
float get_texture_component_grayscale_pow2(unsigned tid, float u, float v) {
    (void)tid; (void)u; (void)v; return 0.0;  // -> wind_intensity == 1
}

// no cobjs in scope: the collision query always misses
int dwobject::check_vert_collision(int obj_index, int do_coll_funcs, int iter, vector3d *cnorm,
                                   vector3d const &mdir, bool skip_dynamic, bool only_drawn, int only_cobj, bool skip_movable) {
    (void)obj_index; (void)do_coll_funcs; (void)iter; (void)mdir;
    (void)skip_dynamic; (void)only_drawn; (void)only_cobj; (void)skip_movable;
    if (cnorm) {*cnorm = plus_z;}
    return 0;
}
bool dwobject::is_flat() const {return false;}
void dwobject::print_and_terminate() const {
    fprintf(stderr, "NaN object state\n");
    exit(3);
}

// effect/rendering sinks (side-effect-only in the reference; no-ops here)
void add_color_to_landscape_texture(colorRGBA const &c, float x, float y, float rad) {(void)c; (void)x; (void)y; (void)rad;}
void add_dynamic_light(float sz, point const &p, colorRGBA const &c, point const &d, float bw, point *lpos, bool is_static_pos) {(void)sz; (void)p; (void)c; (void)d; (void)bw; (void)lpos; (void)is_static_pos;}
void add_ground_fire(point const &p, float r, float h) {(void)p; (void)r; (void)h;}
void add_smoke(point const &p, float v) {(void)p; (void)v;}
void add_snow_to_landscape_texture(point const &p, float v) {(void)p; (void)v;}
void add_splash(point const &p, int x, int y, float e, float rad, bool draw, vector3d const &vadd, bool is_upside_down) {(void)p; (void)x; (void)y; (void)e; (void)rad; (void)draw; (void)vadd; (void)is_upside_down;}
void draw_splash(float x, float y, float z, float sz, colorRGBA c) {(void)x; (void)y; (void)z; (void)sz; (void)c;}
void modify_grass_at(point const &p, float r, bool crush, int burn, bool cut, bool check_uw, bool add_color, bool remove, colorRGBA const &c) {(void)p; (void)r; (void)crush; (void)burn; (void)cut; (void)check_uw; (void)add_color; (void)remove; (void)c;}
bool crush_snow_at_pt(point const &p, float r) {(void)p; (void)r; return false;}
void destroy_coll_objs(point const &p, float dmg, int who, int dtype, float force_rad, cube_t const &bc) {(void)p; (void)dmg; (void)who; (void)dtype; (void)force_rad; (void)bc;}
void do_area_effect_damage(point const &p, float r, float dmg, int idx, int who, int type) {(void)p; (void)r; (void)dmg; (void)idx; (void)who; (void)type;}
bool gen_fire(point const &p, float sz, int who, bool allow_close, bool is_static, float lb, float inten) {(void)p; (void)sz; (void)who; (void)allow_close; (void)is_static; (void)lb; (void)inten; return false;}
colorRGBA gen_fire_color(float &cval, float &inten, float rate) {(void)cval; (void)inten; (void)rate; return WHITE;}
void gen_particles(point const &p, unsigned num, float lt, bool fade) {(void)p; (void)num; (void)lt; (void)fade;}
bool gen_smoke(point const &p, float zv, float rs, colorRGBA const &c, bool no_lighting) {(void)p; (void)zv; (void)rs; (void)c; (void)no_lighting; return false;}
void create_explosion(point const &p, int who, int chain, float dmg, float sz, int type, bool cview) {(void)p; (void)who; (void)chain; (void)dmg; (void)sz; (void)type; (void)cview;}
void update_sun_and_moon() {}
void check_update_global_lighting(unsigned l) {(void)l;}
int check_legal_move(int x, int y, float z, float r, int &cindex) {(void)x; (void)y; (void)z; (void)r; cindex = -1; return 1;}
bool check_point_contained_tree(point const &p, int &which, bool dyn) {(void)p; (void)dyn; which = -1; return false;}
float get_mat_sphere_density(dwobject const &obj) {(void)obj; return 1.0;}
float get_mat_sphere_rscale(dwobject const &obj) {(void)obj; return 1.0;}
void decal_obj::check_cobj() {}
int set_true_obj_height(point &pos, point const &lpos, float step_height, float &zvel, int type, int id,
                        bool flight, bool on_snow, bool skip_dynamic, bool only_drawn, bool skip_movable) {
    (void)pos; (void)lpos; (void)step_height; (void)zvel; (void)type; (void)id;
    (void)flight; (void)on_snow; (void)skip_dynamic; (void)only_drawn; (void)skip_movable;
    return 0;
}
float get_coll_energy(vector3d const &v1, vector3d const &v2, float mass) {
    // used by do_coll_damage paths kept out of scope; keep physical form
    vector3d const dv(v1 - v2);
    return 0.5f * mass * dv.mag_sq();
}
void calc_reflection_angle(vector3d const &v_inc, vector3d &v_ref, vector3d const &norm) {
    // exact Math3d.cpp:28 semantics (2.0*cos_t1 in double, narrowed at call)
    float const cos_t1(-dot_product(norm, v_inc));
    v_ref = v_inc + norm * (2.0 * cos_t1);
}
double rgen_core_t::randd() {
    // the real out-of-line definition (gen_object.cpp:377-381): the
    // combined-LCG draw the repo's utils/rng.py pins bitwise
    double rand_num;
    randome_int(rand_num);
    return rand_num / 2147483563.;
}
// ROCKET rapid-fire spin only (out of the oracle's scope): identity
template<typename T> void rotate_vector3d(pointT<T> vin, pointT<T> const &vrot, double angle, pointT<T> &vout) {
    (void)vrot; (void)angle; vout = vin;
}
template void rotate_vector3d<float>(pointT<float>, pointT<float> const &, double, pointT<float> &);

// ---------------------------------------------------------------------------
// main
// ---------------------------------------------------------------------------

static float envf(char const *name, float dflt) {
    char const *s = getenv(name);
    return (s ? (float)atof(s) : dflt);
}

int main(int argc, char **argv) {
    if (argc != 8) {
        fprintf(stderr, "usage: %s mesh.f32 xs ys nsteps obj_in.f32 nobj traj_out.f32\n", argv[0]);
        return 1;
    }
    char const *mesh_fn = argv[1];
    g_xs = atoi(argv[2]); g_ys = atoi(argv[3]);
    int const nsteps = atoi(argv[4]);
    char const *obj_fn = argv[5];
    int const nobj = atoi(argv[6]);
    char const *out_fn = argv[7];

    // scene geometry: framework convention DX_VAL = 2*X_SCENE_SIZE/MESH_X
    MESH_X_SIZE = g_xs; MESH_Y_SIZE = g_ys;
    X_SCENE_SIZE = envf("PH_XSS", 4.0); Y_SCENE_SIZE = envf("PH_YSS", 4.0);
    XY_SCENE_SIZE = 0.5f * (X_SCENE_SIZE + Y_SCENE_SIZE);
    DX_VAL = 2.0f * X_SCENE_SIZE / (float)MESH_X_SIZE;
    DY_VAL = 2.0f * Y_SCENE_SIZE / (float)MESH_Y_SIZE;
    DX_VAL_INV = 1.0f / DX_VAL; DY_VAL_INV = 1.0f / DY_VAL;
    HALF_DXY = 0.5f * (DX_VAL + DY_VAL);
    TWO_XSS = 2.0f * X_SCENE_SIZE; TWO_YSS = 2.0f * Y_SCENE_SIZE;
    tstep = envf("PH_TSTEP", 0.025f);
    fticks = 1.0; iticks = 1.0;
    base_gravity = envf("PH_BASE_GRAVITY", 1.0f);
    water_plane_z = envf("PH_WPZ", -10.0f);
    max_water_height = water_plane_z;
    zmin = envf("PH_ZMIN", -4.0f);
    temperature = envf("PH_TEMP", 20.0f);
    wind.assign(envf("PH_WIND_X", 0.0f), envf("PH_WIND_Y", 0.0f), envf("PH_WIND_Z", 0.0f));
    total_wind = all_zeros;

    // mesh
    g_mesh.resize((size_t)g_xs * g_ys);
    {
        FILE *f = fopen(mesh_fn, "rb");
        if (!f || fread(g_mesh.data(), 4, g_mesh.size(), f) != g_mesh.size()) {
            fprintf(stderr, "bad mesh file\n"); return 2;
        }
        fclose(f);
    }
    float mh_max = g_mesh[0];
    for (float h : g_mesh) {if (h > mh_max) mh_max = h;}
    ztop = envf("PH_ZTOP", mh_max);  // >= mesh everywhere: get_obj_zval parity
    zbottom = zmin; zmax = envf("PH_ZMAX", 4.0f); czmax = 0.0; zmax_est = zmax;

    // per-cell matrices: flat-plane water, cell-centered heights/normals
    std::vector<float *> mh_rows(g_ys), wm_rows(g_ys), hc_rows(g_ys), ac_rows(g_ys);
    std::vector<short *> sp_rows(g_ys);
    std::vector<vector3d *> vn_rows(g_ys), sn_rows(g_ys), wn_rows(g_ys);
    std::vector<float> mh_store((size_t)g_xs * g_ys), wm_store((size_t)g_xs * g_ys),
                       hc_store((size_t)g_xs * g_ys), ac_store((size_t)g_xs * g_ys, 0.0f);
    std::vector<short> sp_store((size_t)g_xs * g_ys, (short)-30000);
    std::vector<vector3d> vn_store((size_t)g_xs * g_ys), sn_store((size_t)g_xs * g_ys),
                          wn_store((size_t)g_xs * g_ys, plus_z);
    for (int y = 0; y < g_ys; ++y) {
        mh_rows[y] = &mh_store[(size_t)y * g_xs];
        wm_rows[y] = &wm_store[(size_t)y * g_xs];
        hc_rows[y] = &hc_store[(size_t)y * g_xs];
        ac_rows[y] = &ac_store[(size_t)y * g_xs];
        sp_rows[y] = &sp_store[(size_t)y * g_xs];
        vn_rows[y] = &vn_store[(size_t)y * g_xs];
        sn_rows[y] = &sn_store[(size_t)y * g_xs];
        wn_rows[y] = &wn_store[(size_t)y * g_xs];
        for (int x = 0; x < g_xs; ++x) {
            float const h = g_mesh[(size_t)y * g_xs + x];
            mh_rows[y][x] = h;
            wm_rows[y][x] = water_plane_z;
            hc_rows[y][x] = h;
            // central-difference normal (framework convention); the
            // stencil WRAPS at borders like the oracle/kernel np.roll
            int const xm = (x > 0 ? x - 1 : g_xs - 1), xp = (x < g_xs - 1 ? x + 1 : 0);
            int const ym = (y > 0 ? y - 1 : g_ys - 1), yp = (y < g_ys - 1 ? y + 1 : 0);
            float const sx = (g_mesh[(size_t)y * g_xs + xp] - g_mesh[(size_t)y * g_xs + xm]) * 0.5f * DX_VAL_INV;
            float const sy = (g_mesh[(size_t)yp * g_xs + x] - g_mesh[(size_t)ym * g_xs + x]) * 0.5f * DY_VAL_INV;
            float const inv = 1.0f / sqrtf(sx * sx + sy * sy + 1.0f);
            vector3d const n(-sx * inv, -sy * inv, inv);
            vn_rows[y][x] = n; sn_rows[y][x] = n;
        }
    }
    mesh_height = mh_rows.data(); water_matrix = wm_rows.data();
    h_collision_matrix = hc_rows.data(); accumulation_matrix = ac_rows.data();
    spillway_matrix = sp_rows.data();
    vertex_normals = vn_rows.data(); surface_normals = sn_rows.data();
    wat_vert_normals = wn_rows.data();
    mesh_draw = NULL;

    // object type (slot BALL is arbitrary; fields come from env)
    int const tslot = 1;
    obj_type &ot(object_types[tslot]);
    ot.lifetime = (int)envf("PH_LIFE", 1000000.0f);
    ot.flags = 0;
    ot.radius = envf("PH_RADIUS", 0.04f);
    ot.air_factor = envf("PH_AIR", 0.05f);
    ot.terminal_vel = envf("PH_TERMV", 10.0f);
    ot.friction_factor = envf("PH_FRICTION", 0.01f);
    ot.elasticity = envf("PH_ELAS", 0.8f);
    ot.gravity = envf("PH_GRAV", 1.0f);
    ot.density = envf("PH_DENS", 0.6f);
    ot.mass = 1.0; ot.volume = 1.0; ot.health = 10000.0; ot.damage = 0.0;

    // objects
    std::vector<dwobject> objs(nobj);
    {
        FILE *f = fopen(obj_fn, "rb");
        std::vector<float> buf((size_t)nobj * 8);
        if (!f || fread(buf.data(), 4, buf.size(), f) != buf.size()) {
            fprintf(stderr, "bad obj file\n"); return 2;
        }
        fclose(f);
        for (int i = 0; i < nobj; ++i) {
            float const *b = &buf[(size_t)i * 8];
            objs[i] = dwobject(tslot, point(b[0], b[1], b[2]),
                               vector3d(b[3], b[4], b[5]), (int)b[6], 10000.0);
            objs[i].flags = (short)b[7];
        }
    }

    FILE *out = fopen(out_fn, "wb");
    if (!out) {fprintf(stderr, "bad out file\n"); return 2;}
    std::vector<float> rec((size_t)nobj * 8);
    for (int s = 0; s < nsteps; ++s) {
        for (int i = 0; i < nobj; ++i) {
            dwobject &o(objs[i]);
            if (o.status != 0) {o.advance_object(false, 0, i);}
            float *r = &rec[(size_t)i * 8];
            r[0] = o.pos.x; r[1] = o.pos.y; r[2] = o.pos.z;
            r[3] = o.velocity.x; r[4] = o.velocity.y; r[5] = o.velocity.z;
            r[6] = (float)o.status; r[7] = (float)o.flags;
        }
        fwrite(rec.data(), 4, rec.size(), out);
    }
    fclose(out);
    return 0;
}
