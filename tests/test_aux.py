"""Aux systems tests: snow, clouds/lightning, textures, map view, events,
sphere materials, scene loader, world modes."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

import w3d
from w3d.water import snow as WSN, clouds as WC
from w3d.export import textures as TX, map_view as MV
from w3d.utils import events as EV
from w3d.utils.constants import WorldConst
from w3d.scene import cobj as SC
from w3d.scene.sphere_materials import parse_sphere_materials
from w3d.scene.loader import load_scene
from w3d.models.world import ground_frame

W = WorldConst(mesh_x=64, mesh_y=64)


@pytest.mark.slow
def test_snow_lands_on_surfaces():
    mesh = jnp.zeros((64, 64))
    sp = SC.SceneParse()
    sp.cobjs.append(SC.RawCobj(SC.COLL_CUBE, (-1, -1, 0.0), (1, 1, 0.5)))
    co = SC.pack_cobjs(sp)
    sz, cov = WSN.create_snow_map(mesh, co, 65536, world=W, wind=(0, 0, 0))
    sz = np.asarray(sz)
    assert abs(sz[32, 32] - 0.5) < 0.01       # on the cube top
    assert abs(sz[5, 5]) < 0.01               # on the ground
    assert np.asarray(cov).sum() > 60000      # most rays landed in-grid


def test_clouds_scroll_and_lightning():
    a = np.asarray(WC.cloud_layer(0.0, 0.4, 0.2, 64, 64))
    b = np.asarray(WC.cloud_layer(10.0, 0.4, 0.2, 64, 64))
    assert not np.allclose(a, b)
    assert a.min() >= 0 and a.max() <= 1
    path, forks = WC.gen_lightning_strike(7, 2.0, 0.0, 0.5, 0.5)
    assert path[0][2] == 2.0 and abs(path[-1][2]) < 0.2
    zs = [p[2] for p in path]
    assert zs == sorted(zs, reverse=True)     # descends monotonically
    p2, _ = WC.gen_lightning_strike(7, 2.0, 0.0, 0.5, 0.5)
    assert p2 == path                         # deterministic


def test_local_wind_gusts():
    px = jnp.linspace(-1, 1, 32)
    py = jnp.zeros(32)
    wx, wy, wz = WC.local_wind(px, py, jnp.zeros(32), (0.4, 0.2, 0.0), 1.0)
    assert float(jnp.std(wx)) > 0.0           # spatial variation
    assert abs(float(jnp.mean(wx)) - 0.4) < 0.15


def test_procedural_textures():
    for f in (TX.cloud_texture, TX.marble_texture, TX.noise_texture):
        t = np.asarray(f(64))
        assert t.shape == (64, 64)
        assert np.isfinite(t).all() and t.min() >= 0 and t.max() <= 1
        assert t.std() > 0.05
    p = np.asarray(TX.plasma_texture(64))
    assert p.shape == (3, 64, 64)
    assert TX.texture_to_u8(p).dtype == np.uint8


def test_map_view_and_mandelbrot():
    mesh = jnp.linspace(-1, 1, 64)[None, :].repeat(64, 0)
    img = np.asarray(MV.terrain_map(mesh, -0.5, -1.0, 1.0))
    assert img.shape == (3, 64, 64)
    # water region is blue-ish, land green-ish
    assert img[2, :, 5].mean() > img[0, :, 5].mean()
    mb = np.asarray(MV.mandelbrot(-0.5, 0.0, 3.0, 64, 48))
    assert 0.05 < (mb > 0.99).mean() < 0.5


def test_event_record_replay(tmp_path):
    j = EV.EventJournal()
    j.record(0, EV.EV_SRAND, 42)
    j.record(3, EV.EV_KEY, "w")
    j.record(3, EV.EV_MOUSE, 1, 2)
    j.record(7, EV.EV_CAMERA, 0.0, 1.0, 2.0)
    p = str(tmp_path / "events.json")
    j.save(p)
    r = EV.Replay(EV.EventJournal.load(p))
    assert len(r.events_for_frame(0)) == 1
    assert len(r.events_for_frame(3)) == 2
    assert len(r.events_for_frame(5)) == 0
    assert len(r.events_for_frame(7)) == 1
    assert r.done


def test_sphere_materials_reference_file():
    mats = parse_sphere_materials("/root/reference/sphere_materials.txt")
    assert len(mats.materials) >= 10
    names = [m.name for m in mats.materials]
    assert "Bricks" in names
    glass_like = [m for m in mats.materials if m.refract_ix > 1.0]
    assert glass_like                          # glass materials present
    assert mats.max_num_spheres == 20


def test_scene_loader_shipped_config():
    sc = load_scene("/root/reference/scene_config/config_spheres.txt",
                    num_objects=256)
    assert sc.world.mesh_x == 192
    assert int((np.asarray(sc.cobjs.shape) > 0).sum()) == 101  # floor + 100 spheres
    assert len(sc.sphere_mats.materials) >= 10
    for _ in range(5):
        sc = ground_frame(sc)
    assert (np.asarray(sc.objects.status) > 0).sum() > 200


def test_dlights():
    from w3d.lighting import dlights as DL, lmap as LM
    dl = DL.pack_dlights([[0, 0, 0, 1.0, 1, 0.5, 0.2], [1, 1, 0, 0.5, 0, 0, 1]])
    r, g, b = DL.eval_dlights_at(dl, jnp.asarray([0.0, 5.0]), jnp.zeros(2),
                                 jnp.zeros(2))
    assert float(r[0]) == 1.0 and float(r[1]) == 0.0   # full at center, 0 far
    Wc = WorldConst(mesh_x=32, mesh_y=32, mesh_z=8)
    grid = LM.make_light_grid(Wc)
    g2 = DL.dlight_volume(dl, grid, Wc)
    assert int((np.asarray(g2.lc_r) > 0).sum()) > 20
    # capacity clamp
    many = DL.pack_dlights([[0, 0, 0, 1, 1, 1, 1]] * 2000)
    assert int(many.enabled.sum()) == DL.MAX_DLIGHTS


def test_object_group_spawning():
    from w3d.physics import groups as PG, types as PT, step as PS
    table = PT.make_type_table()
    st = PS.make_state(np.zeros((64, 3)), np.zeros((64, 3)),
                       np.zeros(64, np.int32), table)
    st = st._replace(status=st.status.at[:].set(0))
    k = jax.random.key(0)
    st2 = PG.spawn_into_group(st, table, k, PT.type_id("BALL"), 16)
    assert PG.group_stats(st2, PT.type_id("BALL")) == 16
    # spawning again fills more dead slots, never touches live ones
    st3 = PG.spawn_into_group(st2, table, jax.random.fold_in(k, 1),
                              PT.type_id("RAIN"), 8)
    assert PG.group_stats(st3, PT.type_id("BALL")) == 16
    assert PG.group_stats(st3, PT.type_id("RAIN")) == 8
    # fractional app rates accumulate correctly
    spec = PG.GroupSpec(PT.type_id("RAIN"), 64, 0.3)
    total = sum(PG.frame_spawns(spec, f) for f in range(100))
    assert abs(total - 30) <= 1


def test_universe_gravity():
    from w3d.universe import gen as UG
    c = UG.gen_cell((0, 0, 0))
    ax, ay, az = UG.get_gravity(c, (0.0, 0.0, 0.0))
    assert all(np.isfinite([ax, ay, az]))
    # gravity points toward a dominant nearby mass
    s = c.galaxies[0].systems[0]
    gx, gy, gz = UG.get_gravity(c, (s.pos[0] + 0.1, s.pos[1], s.pos[2]))
    assert gx < 0  # pulled back toward the star


def test_edit_ui_menus():
    """keyboard_menu_t (edit_ui.cpp:20-344): select/adjust/wrap/clamp and
    text-slider rendering, one menu per editable subsystem."""
    from w3d.utils import edit_ui as UI

    m = UI.voxel_brush_menu()
    assert m["mode"].text == "add"
    m.increase()                          # mode wraps through choices
    assert m["mode"].text == "remove"
    m.select_next()
    m.select_next()                       # -> radius
    r0 = m["radius"].value
    m.increase()
    assert m["radius"].value == r0 + 0.5
    for _ in range(100):
        m.increase()
    assert m["radius"].value == 16.0      # clamped at hi
    rows = m.render()
    assert rows[0] == "Voxel Brush" and len(rows) == 5
    assert rows[3].startswith(">")        # selection marker on radius
    assert "+" in rows[3]
    v = m.values()
    assert v["mode"] == "remove" and v["radius"] == 16.0
    for name, mk in UI.ALL_MENUS.items():
        menu = mk()
        menu.decrease()                   # never throws, stays in range
        for c in menu.controls:
            assert 0.0 <= c.slider_pos <= 1.0


def test_trains_helis_and_prings():
    """Railroads with arc-length trains, roof-helipad helicopters,
    planet ring bands (uplanet::gen_prings)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from w3d.city import traffic as TF, buildings as CB
    from w3d.universe.gen import Planet, gen_prings

    line = TF.gen_railroad([(0, 0), (10, 0), (10, 5), (20, 5)])
    assert abs(float(line.length) - 25.0) < 1e-5
    tr = TF.make_trains(4, 1, seed=1)
    xs = []
    for _ in range(1200):
        tr = TF.step_trains(tr, line)
        x, y = TF.train_positions(tr, line)
        xs.append(float(x[0]))
    assert max(xs) > 18 and min(xs) < 2   # full out-and-back service

    bl = CB.place_buildings_in_blocks(
        [(30 * i, 30 * j, 30 * i + 30, 30 * j + 30, 0)
         for i in range(2) for j in range(2)],
        lambda x, y: 0.0, CB.BuildingParams(), seed=2)
    pads = TF.make_helipads(bl)
    h = TF.make_helis(6, pads, seed=1)
    key = jax.random.key(0)
    phases = set()
    for i in range(600):
        h = TF.step_helis(h, jnp.asarray(pads), jax.random.fold_in(key, i))
        phases |= set(np.asarray(h.phase).tolist())
    assert phases == {0, 1, 2, 3}         # full flight cycle observed

    p = Planet(orbit_r=1.0, radius=0.01, temp=100.0, has_water=False,
               has_atmos=True, is_gas_giant=True, has_rings=True, seed=42)
    ri, ro, bands = gen_prings(p)
    assert ri > 1.05 * p.radius and ro > ri and 1 <= len(bands) <= 10
    assert gen_prings(p)[:2] == (ri, ro)  # deterministic


@pytest.mark.slow
def test_app_entry_modes(capsys):
    """3DWorld.cpp main() analog: config -> mode -> frame loop with
    JSON metrics, for all three world modes."""
    import json
    from w3d import app as APP

    APP.main(["--mode", "tiled", "--frames", "2", "--seed", "3"])
    APP.main(["--mode", "universe", "--frames", "2"])
    APP.main(["--mode", "ground", "--frames", "2", "--objects", "100"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    modes = {l["mode"] for l in lines}
    assert modes == {"tiled", "universe", "ground"}
    assert all("ms" in l for l in lines)
    g = [l for l in lines if l["mode"] == "ground"]
    assert g[-1]["live"] == 100


def test_all_reference_configs_parse():
    """Every config*.txt shipped with the reference parses cleanly:
    typed keywords land on Config fields (241-keyword registry), domain
    prefixes (buildings/city/voxel/...) consume whole lines, and at
    most a handful of exotica fall through to `extra`."""
    import glob
    import os
    from w3d.utils.config import load_config

    paths = sorted(glob.glob("/root/reference/scene_config/config*.txt"))
    if not paths:        # reference tree not mounted: exercise ours only
        paths = ["scene_config/config_spheres.txt"]
    for p in paths:
        cfg = load_config(p)
        assert len(cfg.extra) <= 6, (os.path.basename(p), cfg.extra)
    # typed values from the main config land correctly
    if os.path.exists("/root/reference/scene_config/config.txt"):
        c = load_config("/root/reference/scene_config/config.txt")
        assert isinstance(c.mesh_size, tuple) and len(c.mesh_size) == 3
        assert c.gravity > 0.0


def test_city_building_param_accessors():
    """city_building_params.cpp keyword maps: the `city`/`buildings`
    sub-config lines drive typed generator parameters."""
    import os
    from w3d.utils.config import load_config, city_params, building_params

    p = "/root/reference/scene_config/config_city.txt"
    if not os.path.exists(p):
        return
    c = load_config(p)
    cp = city_params(c)
    assert cp["num_cities"] == 8 and cp["num_cars"] == 3000
    bp, ex = building_params(c)
    assert ex["num_rats_min"] == 5 and ex["ai_target_player"] == 1
    assert bp.num_materials >= 1


def test_tiered_config_load(tmp_path):
    """3DWorld.cpp:1650-1665 three-tier load: config_pre -> defaults.txt
    list -> config_post, later tiers overriding earlier ones."""
    from w3d.utils.config import load_config_tiered

    (tmp_path / "config_pre.txt").write_text("gravity 2.0\nmesh_seed 5\n")
    (tmp_path / "defaults.txt").write_text("main.txt\n")
    (tmp_path / "main.txt").write_text("gravity 1.5\nntrees 20\n")
    (tmp_path / "config_post.txt").write_text("ntrees 99\n")
    c = load_config_tiered(str(tmp_path))
    assert c.gravity == 1.5        # defaults tier overrides pre
    assert c.ntrees == 99          # post overrides defaults
    assert c.mesh_seed == 5        # pre survives where not overridden


def test_import_every_module():
    """Every module in the package imports cleanly through the w3d
    alias (guards against bitrot in rarely-touched corners)."""
    import importlib
    import os
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "3dworld_tpu"
    failed = []
    for p in root.rglob("*.py"):
        rel = p.relative_to(root)
        if rel.name == "__init__.py":
            parts = rel.parts[:-1]
        else:
            parts = rel.parts[:-1] + (rel.stem,)
        mod = "w3d" + ("." + ".".join(parts) if parts else "")
        try:
            importlib.import_module(mod)
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failed.append((mod, repr(e)))
    assert not failed, failed
