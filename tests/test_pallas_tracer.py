"""Pallas wavefront kernel vs the pure-JAX reference tracer.

On CPU the kernel runs under the TPU-semantics interpreter
(pltpu.InterpretParams), so these tests validate the exact program that
compiles on hardware. The deterministic light components (first-hit
emission, mirror tint, budgets) must match the jnp tracer bitwise-ish;
the stochastic multi-bounce mean must agree statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import MazeConfig, TracerConfig
from mirror_maze_tpu.render.pallas_tracer import (
    build_plane_table,
    trace_paths_pallas,
)
from mirror_maze_tpu.render.scenebuf import upload_scene
from mirror_maze_tpu.render.tracer import trace_paths
from mirror_maze_tpu.scene import build_scene

KEY = jax.random.PRNGKey(0)


def _rays(n, rng, extent=15.0):
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(-7, 1, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _setup():
    scene = build_scene(MazeConfig(width=4, height=4))
    dev = upload_scene(scene)
    return dev, dev.plane_table


@pytest.mark.slow
def test_deterministic_single_segment_matches_exactly(rng):
    dev, table = _setup()
    cfg = TracerConfig(bounce_limit=1, mirror_limit=1)
    o, d = _rays(257, rng)  # odd count exercises padding
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(table, o, d, jnp.int32(7), cfg,
                                       rows_per_block=4))
    np.testing.assert_allclose(lj, lp, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_mirror_chain_matches_exactly(rng):
    """Mirror reflections are deterministic: tint accumulation and budget
    kills must agree with the jnp tracer for any mirror_limit."""
    dev, table = _setup()
    o, d = _rays(128, rng)
    for limit in (2, 5):
        cfg = TracerConfig(bounce_limit=1, mirror_limit=limit)
        lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
        lp = np.asarray(trace_paths_pallas(table, o, d, jnp.int32(3), cfg,
                                           rows_per_block=1))
        np.testing.assert_allclose(lj, lp, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_random_skewed_scenes_match_exactly():
    """Fuzz: arbitrary (non-axis-aligned, partly degenerate) quad soups
    must agree with the jnp tracer on the deterministic segment — the
    generated maze is axis-aligned everywhere, so this is the only
    coverage of skewed normals/edges in the MXU W packing."""
    from mirror_maze_tpu.scene.builder import Scene

    for seed in (0, 1, 2):
        r = np.random.default_rng(seed)
        n = 37
        origin = r.uniform(-10, 10, (n, 3))
        v = r.normal(size=(n, 3)) * 3.0
        u = r.normal(size=(n, 3)) * 3.0
        v[::9] = 0.0                      # degenerate planes
        u[5] = v[5] * 2.0                 # parallel edges (zero normal)
        em = np.concatenate(
            [r.uniform(0, 1, (n, 3)),
             (r.random((n, 1)) < 0.4) * r.uniform(0, 3, (n, 1))], axis=1
        )
        scene = Scene(
            origin=origin.astype(np.float32),
            v=v.astype(np.float32),
            u=u.astype(np.float32),
            color=r.uniform(0, 1, (n, 3)).astype(np.float32),
            is_mirror=r.random(n) < 0.3,
            emission=em.astype(np.float32),
            grid=np.zeros((1, 1), np.uint8),
        )
        dev = upload_scene(scene)
        cfg = TracerConfig(bounce_limit=1, mirror_limit=2)
        rr = np.random.default_rng(100 + seed)
        o = jnp.asarray(rr.uniform(-12, 12, (130, 3)).astype(np.float32))
        d = rr.normal(size=(130, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
        lp = np.asarray(trace_paths_pallas(
            dev.plane_table, o, d, jnp.int32(5), cfg, rows_per_block=2,
            tables=dev.mxu_tables,
        ))
        np.testing.assert_allclose(lj, lp, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_random_multitile_scene_matches_exactly():
    """Skewed random quads ABOVE the 128-plane tile threshold: covers
    the multi-tile path (per-tile AABB slab skip, near-to-far order,
    cross-tile strict-< merge) on arbitrary geometry — generated mazes
    exercise it only with axis-aligned planes."""
    from mirror_maze_tpu.scene.builder import Scene

    r = np.random.default_rng(11)
    n = 150   # > PLANE_TILE -> at least two tiles in the kind-0 group
    origin = r.uniform(-20, 20, (n, 3))
    v = r.normal(size=(n, 3)) * 2.0
    u = r.normal(size=(n, 3)) * 2.0
    em = np.concatenate(
        [r.uniform(0, 1, (n, 3)),
         (r.random((n, 1)) < 0.3) * r.uniform(0, 2, (n, 1))], axis=1
    )
    scene = Scene(
        origin=origin.astype(np.float32),
        v=v.astype(np.float32),
        u=u.astype(np.float32),
        color=r.uniform(0, 1, (n, 3)).astype(np.float32),
        is_mirror=np.zeros(n, bool),
        emission=em.astype(np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    dev = upload_scene(scene)
    n_tiles = max(g[2].shape[0] for g in dev.mxu_tables if g is not None)
    assert n_tiles >= 2   # the multi-tile path is actually exercised
    cfg = TracerConfig(bounce_limit=1, mirror_limit=1)
    rr = np.random.default_rng(7)
    o = jnp.asarray(rr.uniform(-25, 25, (130, 3)).astype(np.float32))
    d = rr.normal(size=(130, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    anchor = jnp.asarray([1.0, -2.0, 3.0])
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(9), cfg, rows_per_block=2,
        tables=dev.mxu_tables, anchor=anchor,
    ))
    per_ray = np.abs(lj - lp).max(axis=1)
    agree = per_ray < 1e-4
    assert agree.mean() >= 0.99, np.where(~agree)[0]  # grazing-edge slack
    np.testing.assert_allclose(lj[agree], lp[agree], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sky_term_matches_jnp_tracer(rng):
    """sky_strength > 0 (the reference's dead sky code, exposed as
    config) must agree across backends: miss lanes gain
    sky * lighting_factor^(segment - mirror_hits) * strength, which is
    deterministic for bounce_limit=1 (all surviving segments are mirror
    chains)."""
    # An OPEN scene (a generated maze is closed-world, so no ray ever
    # misses — which is exactly why the reference's sky code is dead):
    # a couple of free-floating quads, rays scattered around them.
    from mirror_maze_tpu.scene.builder import Scene

    r = np.random.default_rng(4)
    n = 9
    scene = Scene(
        origin=r.uniform(-8, 8, (n, 3)).astype(np.float32),
        v=(r.normal(size=(n, 3)) * 4).astype(np.float32),
        u=(r.normal(size=(n, 3)) * 4).astype(np.float32),
        color=r.uniform(0, 1, (n, 3)).astype(np.float32),
        # Mirror-free: a reflected direction differs between backends by
        # float ulps (different normalize formulations), which a grazing
        # second segment amplifies into a binary hit-vs-sky divergence —
        # measure-zero, but this test needs exactness.
        is_mirror=np.zeros(n, bool),
        emission=np.zeros((n, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    dev = upload_scene(scene)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=2,
                       sky_strength=0.7, lighting_factor=0.25)
    o, d = _rays(192, rng)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(dev.plane_table, o, d, jnp.int32(2),
                                       cfg, rows_per_block=2,
                                       tables=dev.mxu_tables))
    assert lp.max() > 0.0  # the sky actually contributed
    # Rays grazing a quad edge within a float ulp can land on different
    # sides of the inclusive in-rectangle bound in the two formulations
    # (brute tests the advanced hit point; the kernel tests the
    # factored o1 + t*d1), flipping hit<->sky — measure-zero. Demand
    # agreement everywhere else.
    per_ray = np.abs(lj - lp).max(axis=1)
    agree = per_ray < 1e-5
    assert agree.mean() >= 0.99, (np.where(~agree)[0], per_ray.max())
    np.testing.assert_allclose(lj[agree], lp[agree], rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sky_zero_lighting_factor_is_finite_and_matches(rng):
    """lighting_factor == 0 with sky_strength != 0: the kernel's
    exp(expo * log(base)) form would produce 0 * -inf = NaN at expo == 0;
    it must instead match the jnp tracer's pow semantics (0**0 == 1,
    0**n == 0) — first-segment misses get the full sky term, later
    segments none."""
    from mirror_maze_tpu.scene.builder import Scene

    r = np.random.default_rng(4)
    n = 9
    scene = Scene(
        origin=r.uniform(-8, 8, (n, 3)).astype(np.float32),
        v=(r.normal(size=(n, 3)) * 4).astype(np.float32),
        u=(r.normal(size=(n, 3)) * 4).astype(np.float32),
        color=r.uniform(0, 1, (n, 3)).astype(np.float32),
        is_mirror=np.zeros(n, bool),
        emission=np.zeros((n, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    dev = upload_scene(scene)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=2,
                       sky_strength=0.7, lighting_factor=0.0)
    o, d = _rays(192, rng)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(dev.plane_table, o, d, jnp.int32(2),
                                       cfg, rows_per_block=2,
                                       tables=dev.mxu_tables))
    assert np.isfinite(lp).all()
    assert lp.max() > 0.0   # expo==0 misses DID get the sky term
    per_ray = np.abs(lj - lp).max(axis=1)
    agree = per_ray < 1e-5  # same grazing-edge slack as the test above
    assert agree.mean() >= 0.99, (np.where(~agree)[0], per_ray.max())


def test_negative_lighting_factor_rejected():
    import pytest

    with pytest.raises(ValueError):
        TracerConfig(sky_strength=0.5, lighting_factor=-0.25)
    TracerConfig(sky_strength=0.0, lighting_factor=-0.25)  # dead sky: fine


@pytest.mark.slow
def test_multibounce_statistical_agreement(rng):
    dev, table = _setup()
    cfg = TracerConfig(bounce_limit=3, mirror_limit=4)
    o, d = _rays(2048, rng)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(table, o, d, jnp.int32(7), cfg,
                                       rows_per_block=4))
    se = lj.std(axis=0) / np.sqrt(lj.shape[0])
    diff = np.abs(lj.mean(axis=0) - lp.mean(axis=0))
    assert np.all(diff < 5.0 * se * np.sqrt(2.0)), (diff, se)


def test_pallas_deterministic_given_seed(rng):
    dev, table = _setup()
    cfg = TracerConfig(bounce_limit=3, mirror_limit=4)
    o, d = _rays(300, rng)
    a = np.asarray(trace_paths_pallas(table, o, d, jnp.int32(11), cfg,
                                      rows_per_block=2))
    b = np.asarray(trace_paths_pallas(table, o, d, jnp.int32(11), cfg,
                                      rows_per_block=2))
    c = np.asarray(trace_paths_pallas(table, o, d, jnp.int32(12), cfg,
                                      rows_per_block=2))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert np.isfinite(a).all()


def test_padding_lanes_do_not_leak(rng):
    """Light for real rays must be identical whatever the pad amount."""
    dev, table = _setup()
    cfg = TracerConfig(bounce_limit=2, mirror_limit=2)
    o, d = _rays(100, rng)
    a = np.asarray(trace_paths_pallas(table, o, d, jnp.int32(5), cfg,
                                      rows_per_block=1))
    o2 = jnp.concatenate([o, o[:28]])
    d2 = jnp.concatenate([d, d[:28]])
    b = np.asarray(trace_paths_pallas(table, o2, d2, jnp.int32(5), cfg,
                                      rows_per_block=1))
    np.testing.assert_allclose(a, b[:100], rtol=1e-6, atol=0)


def test_pipeline_pallas_backend(tiny_cfg, tiny_device_scene):
    """render_pixels with intersector='pallas' produces finite colors of
    the same magnitude as the brute backend."""
    from mirror_maze_tpu.render.pipeline import render_pixels

    cfg_p = tiny_cfg.replace(intersector="pallas")
    pix = jnp.stack(
        jnp.meshgrid(jnp.arange(16), jnp.arange(16), indexing="xy"), -1
    ).reshape(-1, 2)
    cam = _camera(tiny_cfg)
    cols_b = np.asarray(render_pixels(tiny_device_scene, cam, pix, KEY, tiny_cfg))
    cols_p = np.asarray(render_pixels(tiny_device_scene, cam, pix, KEY, cfg_p))
    assert np.isfinite(cols_p).all()
    assert cols_p.shape == cols_b.shape
    # same image statistics (different RNG streams)
    assert abs(cols_p.mean() - cols_b.mean()) < 0.15


def _camera(cfg):
    from mirror_maze_tpu.render import make_camera

    return make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)


@pytest.mark.slow
def test_step_dispatches_to_pallas(tiny_cfg, tiny_device_scene):
    """Regression: make_step must NOT override the pallas backend with a
    nearest_fn (it silently fell back to brute force once)."""
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step

    cfg_b = tiny_cfg.replace(intersector="brute")
    cfg_p = tiny_cfg.replace(intersector="pallas")
    fb = fp = None
    for cfg in (cfg_b, cfg_p):
        step = make_step(tiny_device_scene, cfg)
        st = init_state(cfg, seed=5)
        for _ in range(3):
            st, f = step(st, FrameInputs.idle())
        if cfg is cfg_b:
            fb = np.asarray(st.screen)
        else:
            fp = np.asarray(st.screen)
    # Different RNG streams (threefry vs PCG) make the traced chunks differ
    # in their noise; identical screens mean pallas was silently bypassed.
    assert not np.array_equal(fb, fp)
    assert np.isfinite(fp).all()


@pytest.mark.slow
def test_large_scene_plane_tiling(rng):
    """Scenes beyond one plane tile (>128 planes) must trace identically:
    the tiled running-min merge is exercised against the jnp tracer on a
    16x16 maze (several hundred planes)."""
    scene = build_scene(MazeConfig(width=16, height=16))
    dev = upload_scene(scene)
    assert dev.plane_table.shape[0] > 128  # really multi-tile
    cfg = TracerConfig(bounce_limit=1, mirror_limit=1)
    o, d = _rays(257, rng, extent=70.0)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(dev.plane_table, o, d, jnp.int32(7),
                                       cfg, rows_per_block=4))
    np.testing.assert_allclose(lj, lp, rtol=1e-4, atol=1e-6)


def test_pack_tables_tiling_shapes():
    from mirror_maze_tpu.render.pallas_tracer import (
        MODE_QUANTITIES,
        PLANE_TILE,
        PLANE_WIDTH,
        pack_intersection_tables,
    )

    for p in (3, 81, 128, 129, 700):
        table = np.zeros((p, PLANE_WIDTH), np.float32)
        table[:, 19] = 1.0
        # no kind column -> everything lands in mode 0
        groups = pack_intersection_tables(jnp.asarray(table))
        assert groups[1] is None and groups[2] is None
        w, pt, aabbs = groups[0]
        tiles = max(1, -(-((p + 7) // 8 * 8) // PLANE_TILE))
        assert w.shape[0] == pt.shape[0] == aabbs.shape[0] == tiles
        # 32 prop rows: 16 bf16-exact hi + 16 f32 residual (the
        # split-precision select operand; one MXU M-tile either way)
        assert w.shape[2] == 8 and pt.shape[1] == 32
        assert w.shape[1] == MODE_QUANTITIES[0] * pt.shape[2]
        assert aabbs.shape[1] == 8


def test_props_split_precision_reconstructs_exactly(rng):
    """The select operand's 32 prop rows are (bf16-exact hi, f32
    residual). hi must round-trip bf16 unchanged — so the MXU's f32
    input truncation (single-pass on v5e, measured bitwise) is a no-op
    on it — and hi + residual must equal the f32 properties BITWISE, so
    the exact CPU interpreter (and every golden) is unchanged. On
    hardware the fold recovers ~2^-17 select precision; the plain f32
    operand returned bf16(property) — a measured ~1e-3..1e-2 systematic
    luminance error on scenes with non-bf16-exact materials."""
    from mirror_maze_tpu.render.pallas_tracer import (
        PLANE_WIDTH,
        pack_intersection_tables,
    )

    p = 37
    table = rng.uniform(-3, 3, (p, PLANE_WIDTH)).astype(np.float32)
    table[:, 19] = 1.0
    # kind/ior/texture columns: keep every random row an opaque,
    # untextured mode-0 quad.
    table[:, 26:] = 0.0
    w, pt, aabbs = pack_intersection_tables(jnp.asarray(table))[0]
    props_t = np.asarray(pt)                       # [T, 32, PT]
    hi, lo = props_t[:, :16], props_t[:, 16:]
    hi_rt = np.asarray(
        jnp.asarray(hi).astype(jnp.bfloat16).astype(jnp.float32)
    )
    np.testing.assert_array_equal(hi, hi_rt)       # hi is bf16-exact

    # hi + lo reconstructs the f32 properties bitwise (live rows).
    expected = np.zeros((props_t.shape[0] * props_t.shape[2], 16), np.float32)
    expected[:p, 0:3] = table[:, 0:3]              # normal
    expected[:p, 3:6] = table[:, 12:15]            # albedo
    expected[:p, 6:9] = table[:, 15:18]            # emission
    expected[:p, 9] = table[:, 18]                 # is_mirror
    got = (hi + lo).transpose(0, 2, 1).reshape(-1, 16)
    np.testing.assert_array_equal(got[:p], expected[:p])


@pytest.mark.slow
@pytest.mark.slow
def test_pack_tables_tile_by_mode_override(rng):
    """Per-mode tile-size overrides re-tile a group without changing
    traced results (the experiment knob behind PERF.md's rejected
    smaller-tile variants)."""
    from mirror_maze_tpu.render.pallas_tracer import pack_intersection_tables

    scene = build_scene(MazeConfig(width=16, height=16))
    dev = upload_scene(scene)
    default = pack_intersection_tables(dev.plane_table)
    small = pack_intersection_tables(dev.plane_table, {1: 32})
    assert small[1][1].shape[2] == 32
    assert small[1][0].shape[0] > default[1][0].shape[0]  # more tiles
    cfg = TracerConfig(bounce_limit=1, mirror_limit=1)
    o, d = _rays(128, rng, extent=70.0)
    a = np.asarray(trace_paths_pallas(dev.plane_table, o, d, jnp.int32(7),
                                      cfg, rows_per_block=1, tables=default))
    b = np.asarray(trace_paths_pallas(dev.plane_table, o, d, jnp.int32(7),
                                      cfg, rows_per_block=1, tables=small))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_pack_tables_kind_groups():
    """A real scene partitions into all three closed-world kinds with the
    right W widths (6/4/2 quantities) and plane counts."""
    from mirror_maze_tpu.render.pallas_tracer import (
        MODE_QUANTITIES,
        pack_intersection_tables,
    )

    scene = build_scene(MazeConfig(width=10, height=10))
    dev = upload_scene(scene)
    table = np.asarray(dev.plane_table)
    groups = pack_intersection_tables(dev.plane_table)
    total = 0
    for mode, group in enumerate(groups):
        n_mode = int((table[:, 26] == mode).sum())
        if group is None:
            assert n_mode == 0
            continue
        w, pt, aabbs = group
        assert w.shape[1] == MODE_QUANTITIES[mode] * pt.shape[2]
        assert w.shape[0] == pt.shape[0] == aabbs.shape[0]
        assert pt.shape[0] * pt.shape[2] >= n_mode
        total += n_mode
    assert total == table.shape[0]
    assert int((table[:, 26] == 2).sum()) == 6  # floor+ceiling+4 boundary


def test_tile_aabbs_conservative():
    """Each tile's AABB must contain every quad corner of its planes."""
    from mirror_maze_tpu.render.pallas_tracer import (
        pack_intersection_tables,
    )

    scene = build_scene(MazeConfig(width=16, height=16))
    dev = upload_scene(scene)
    table = np.asarray(dev.plane_table)
    for mode, group in enumerate(pack_intersection_tables(dev.plane_table)):
        if group is None:
            continue
        rows_all = table[table[:, 26] == mode]
        _, pt, aabbs = map(np.asarray, group)
        tiles, _, ptile = pt.shape
        for ti in range(tiles):
            rows = rows_all[ti * ptile:(ti + 1) * ptile]
            rows = rows[rows[:, 19] > 0]  # valid only
            if len(rows) == 0:
                continue
            assert (rows[:, 20:23] >= aabbs[ti, 0:3] - 1e-4).all()
            assert (rows[:, 23:26] <= aabbs[ti, 3:6] + 1e-4).all()


def test_spatial_order_is_permutation():
    from mirror_maze_tpu.render.pallas_tracer import spatial_plane_order

    scene = build_scene(MazeConfig(width=8, height=8))
    dev = upload_scene(scene)
    perm = spatial_plane_order(np.asarray(dev.plane_table))
    assert sorted(perm.tolist()) == list(range(dev.plane_table.shape[0]))


@pytest.mark.slow
@pytest.mark.slow
def test_sceneless_table_disables_skip_not_geometry(rng):
    """build_plane_table without a Scene has no quad AABBs; the default
    must be infinite boxes (skip disabled), never collapsed boxes that
    silently skip real geometry (regression: zero-filled AABB columns
    rendered multi-tile scenes black)."""
    from mirror_maze_tpu.render.pallas_tracer import build_plane_table

    scene = build_scene(MazeConfig(width=16, height=16))
    dev = upload_scene(scene)
    table = jnp.asarray(build_plane_table(scene.derived()))
    assert table.shape[0] > 128
    cfg = TracerConfig(bounce_limit=1, mirror_limit=1)
    o, d = _rays(257, rng, extent=70.0)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(table, o, d, jnp.int32(7), cfg,
                                       rows_per_block=4))
    np.testing.assert_allclose(lj, lp, rtol=1e-4, atol=1e-6)


def test_block_segments_diagnostic(rng):
    scene = build_scene(MazeConfig(width=4, height=4))
    dev = upload_scene(scene)
    cfg = TracerConfig(bounce_limit=3, mirror_limit=4)
    o, d = _rays(256, rng)
    light, diag = trace_paths_pallas(dev.plane_table, o, d, jnp.int32(7), cfg,
                                     rows_per_block=1,
                                     return_block_segments=True)
    diag = np.asarray(diag)
    # [segments; tiles; tiles@seg0; tiles@segs0-2; live-lane sum] x 2
    assert diag.shape == (5, 2)
    segs, tiles = diag[0], diag[1]
    tiles0, tiles3, live = diag[2], diag[3], diag[4]
    assert (segs >= 1).all() and (segs <= cfg.max_segments).all()
    # 4x4 maze fits single tiles: every kind group is evaluated every
    # segment, so tiles = segments * n_groups (3 kinds present).
    np.testing.assert_array_equal(tiles, segs * 3)
    np.testing.assert_array_equal(tiles0, np.full_like(tiles0, 3))
    np.testing.assert_array_equal(tiles3, np.minimum(segs, 3) * 3)
    # Every lane is live on segment 0 (128 lanes at rows_per_block=1);
    # later segments only lose lanes.
    assert (live >= 128).all() and (live <= segs * 128).all()


def test_sinpi_polynomial_accuracy():
    """The kernel's minimax sin(pi*t) and its cos identity must stay
    within 5e-6 of the true functions over the full reduced domain."""
    from mirror_maze_tpu.render.pallas_tracer import _sinpi

    x = np.linspace(-1.0, 1.0, 200001)
    k = np.round(x)
    s = np.asarray(_sinpi(jnp.asarray(x - k))) * (1.0 - 2.0 * np.abs(k))
    c = np.asarray(_sinpi(jnp.asarray(0.5 - np.abs(x))))
    assert np.abs(s - np.sin(np.pi * x)).max() < 5e-6
    assert np.abs(c - np.cos(np.pi * x)).max() < 5e-6


def test_lane_chunk_must_be_positive(rng):
    """Regression: lane_chunk=0 died with a bare ZeroDivisionError and a
    negative value passed Python's divisibility check (4096 % -512 == 0)
    only to build an empty dense_nearest loop — both must be a clear
    ValueError before any kernel work."""
    import pytest

    _, table = _setup()
    o, d = _rays(256, rng)
    for bad in (0, -512):
        cfg = TracerConfig(bounce_limit=1, mirror_limit=1, lane_chunk=bad)
        with pytest.raises(ValueError, match="lane_chunk"):
            trace_paths_pallas(table, o, d, jnp.int32(1), cfg)


@pytest.mark.slow
def test_block_size_invariant_on_deterministic_light(rng):
    """The block size is a SCHEDULING knob for the deterministic light
    component: with jitter-free single-segment shading (+ mirror
    chains), every rows_per_block must produce the identical image —
    only the stochastic scatter RNG is allowed to regroup with block
    size (which is why TracerConfig.block_rows is golden-pinned)."""
    _, table = _setup()
    o, d = _rays(512, rng)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=4, jitter=0.0)
    ref = np.asarray(
        trace_paths_pallas(table, o, d, jnp.int32(3), cfg, rows_per_block=1)
    )
    for rows in (2, 4):
        out = np.asarray(
            trace_paths_pallas(table, o, d, jnp.int32(3), cfg,
                               rows_per_block=rows)
        )
        np.testing.assert_array_equal(out, ref, err_msg=f"rows={rows}")


def test_all_invalid_table_renders_all_miss():
    """A scene with NO live primitives (every plane degenerate, no
    spheres) uploads an EMPTY Morton-filtered table, which packs to an
    all-None group tuple; the kernel must compile and return the
    all-miss frame, not crash on the empty group_meta."""
    from mirror_maze_tpu.render.pallas_tracer import (
        PLANE_WIDTH,
        pack_intersection_tables,
    )

    table = np.zeros((0, PLANE_WIDTH), np.float32)  # post-filter: empty
    tables = pack_intersection_tables(table)
    assert all(g is None for g in tables)
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.concatenate(
        [jnp.zeros((8, 2), jnp.float32), jnp.ones((8, 1), jnp.float32)], 1
    )
    cfg = TracerConfig(bounce_limit=2, mirror_limit=2)
    light = np.asarray(
        trace_paths_pallas(table, o, d, jnp.int32(1), cfg,
                           rows_per_block=1, tables=tables)
    )
    np.testing.assert_array_equal(light, 0.0)


def test_compensated_dot_wiring_far_from_origin(rng):
    """The K=24 compensated hit-test dot (round 5: fixes bf16 edge-test
    loss on far-from-origin geometry at scale on HARDWARE). Under the
    exact interpreter both forms are f32-accurate, so forcing
    compensated_dot=True must agree tightly with the default plain dot
    on a TRANSLATED world (~300 units out, the scale regime) — a
    wiring check on the [Wh|Wh|Wl] / [Gh;Gl;Gh] row order the hardware
    path relies on."""
    import dataclasses

    scene = build_scene(MazeConfig(width=4, height=4))
    # Push the whole world ~300 units from the origin (the coordinate
    # magnitude class of the 64x64 scale maze).
    shift = np.array([290.0, 0.0, 310.0], np.float32)
    scene = dataclasses.replace(scene, origin=np.asarray(scene.origin)
                                + shift[None, :])
    dev = upload_scene(scene)
    o, d = _rays(256, rng)
    o = o + jnp.asarray(shift)[None, :]
    cfg_plain = TracerConfig(bounce_limit=2, mirror_limit=2)
    cfg_comp = dataclasses.replace(cfg_plain, compensated_dot=True)
    lp = np.asarray(trace_paths_pallas(dev.plane_table, o, d,
                                       jnp.int32(7), cfg_plain,
                                       rows_per_block=2,
                                       tables=dev.mxu_tables))
    lc = np.asarray(trace_paths_pallas(dev.plane_table, o, d,
                                       jnp.int32(7), cfg_comp,
                                       rows_per_block=2,
                                       tables=dev.mxu_tables))
    # Identical RNG streams and near-identical arithmetic: rays may only
    # differ where an edge decision sits within ~2^-18*|coord| of a
    # boundary (measure-zero for this scene).
    np.testing.assert_allclose(lc, lp, rtol=1e-4, atol=1e-5)
    # And the jnp reference agrees with both on the translated world.
    lj = np.asarray(trace_paths(dev, o, d, KEY,
                                dataclasses.replace(cfg_plain,
                                                    bounce_limit=1,
                                                    mirror_limit=1)))
    lp1 = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(7),
        dataclasses.replace(cfg_comp, bounce_limit=1, mirror_limit=1),
        rows_per_block=2, tables=dev.mxu_tables))
    np.testing.assert_allclose(lj, lp1, rtol=1e-4, atol=1e-5)


def test_compensated_dot_spheres_far_from_origin(rng):
    """Far-from-origin SPHERES ride the same compensated dot: the
    mode-3 W rows carry c2r2 ~ |c|^2 (~1e5 at scale-world coordinates,
    bf16 absolute error ~200 world units — multiplayer avatars at the
    64x64 maze's edge would have been invisible on silicon). Under the
    exact interpreter, forcing compensated_dot=True must agree with the
    plain dot and with the jnp tracer on a translated sphere scene."""
    import dataclasses

    scene = build_scene(MazeConfig(width=4, height=4))
    shift = np.array([300.0, 0.0, -280.0], np.float32)
    s = scene.num_spheres
    scene = dataclasses.replace(
        scene,
        origin=np.asarray(scene.origin) + shift[None, :],
        sph_center=np.concatenate(
            [np.asarray(scene.sph_center).reshape(s, 3),
             (np.array([[-5.0, 0.0, -10.0]], np.float32)
              + shift[None, :])], axis=0),
        sph_radius=np.concatenate(
            [np.asarray(scene.sph_radius), [1.5]]).astype(np.float32),
        sph_color=np.concatenate(
            [np.asarray(scene.sph_color).reshape(s, 3),
             [[0.9, 0.3, 0.2]]], axis=0).astype(np.float32),
        sph_is_mirror=np.concatenate(
            [np.asarray(scene.sph_is_mirror), [False]]).astype(bool),
        sph_emission=np.concatenate(
            [np.asarray(scene.sph_emission).reshape(s, 4),
             [[0.9, 0.3, 0.2, 1.0]]], axis=0).astype(np.float32),
        sph_ior=np.concatenate(
            [np.asarray(scene.sph_ior), [0.0]]).astype(np.float32),
        sph_tex_kind=np.concatenate(
            [np.asarray(scene.sph_tex_kind), [0]]).astype(np.uint8),
        sph_tex_scale=np.concatenate(
            [np.asarray(scene.sph_tex_scale), [1.0]]).astype(np.float32),
        sph_tex_color2=np.concatenate(
            [np.asarray(scene.sph_tex_color2).reshape(s, 3),
             [[0.0, 0.0, 0.0]]], axis=0).astype(np.float32),
    )
    dev = upload_scene(scene)
    o, d = _rays(256, rng)
    o = o + jnp.asarray(shift)[None, :]
    cfg = TracerConfig(bounce_limit=1, mirror_limit=1)
    cfg_comp = dataclasses.replace(cfg, compensated_dot=True)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(dev.plane_table, o, d,
                                       jnp.int32(7), cfg_comp,
                                       rows_per_block=2,
                                       tables=dev.mxu_tables))
    # Grazing-sphere rays may flip: at |c| ~ 400 the quadratic's
    # disc = b^2 - q cancels ~1e5-scale terms down to ~r^2, so BOTH
    # exact-class backends sit within f32 cancellation noise of the
    # tangent margin and can disagree on near-tangent rays
    # (measure-zero; 2/256 at this seed). Gate on the agreement
    # fraction, exact where agreeing.
    per_ray = np.abs(lj - lp).max(axis=1)
    agree = per_ray < 1e-4
    assert agree.mean() >= 0.99, np.where(~agree)[0]
    np.testing.assert_allclose(lj[agree], lp[agree], rtol=1e-4, atol=1e-5)
    # The sphere is actually hit by some ray (the test has teeth).
    from mirror_maze_tpu.render.intersect import nearest_hit_brute

    t, idx = nearest_hit_brute(dev, o, d, cfg.t_min)
    assert (np.asarray(idx) >= dev.num_planes).any()


def test_slab_precompute_is_bitwise_identical_multitile(rng):
    """TracerConfig.slab_precompute only moves the slab-test schedule
    (precomputed VMEM scratch vs in-loop chains); skip decisions, tile
    order, and all arithmetic are unchanged, so the traced image must be
    BITWISE identical on a multi-tile scene."""
    import dataclasses

    from mirror_maze_tpu.scene.builder import Scene

    r = np.random.default_rng(23)
    n = 150   # > PLANE_TILE -> multi-tile
    em = np.concatenate(
        [r.uniform(0, 1, (n, 3)),
         (r.random((n, 1)) < 0.3) * r.uniform(0, 2, (n, 1))], axis=1
    )
    scene = Scene(
        origin=r.uniform(-20, 20, (n, 3)).astype(np.float32),
        v=(r.normal(size=(n, 3)) * 2).astype(np.float32),
        u=(r.normal(size=(n, 3)) * 2).astype(np.float32),
        color=r.uniform(0, 1, (n, 3)).astype(np.float32),
        is_mirror=r.random(n) < 0.2,
        emission=em.astype(np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    dev = upload_scene(scene)
    o, d = _rays(256, rng, extent=22.0)
    cfg = TracerConfig(bounce_limit=2, mirror_limit=2)
    anchor = jnp.asarray([2.0, -1.0, 0.5])
    lp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(7), cfg, rows_per_block=2,
        tables=dev.mxu_tables, anchor=anchor))
    ls = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(7),
        dataclasses.replace(cfg, slab_precompute=True),
        rows_per_block=2, tables=dev.mxu_tables, anchor=anchor))
    np.testing.assert_array_equal(lp, ls)
