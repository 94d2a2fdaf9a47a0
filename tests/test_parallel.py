"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md section 4: fake the device mesh with
xla_force_host_platform_device_count — no TPU pod needed in CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import (
    CameraConfig,
    EngineConfig,
    MazeConfig,
    ScreenConfig,
    TracerConfig,
)
from mirror_maze_tpu.parallel.shard import (
    batch_cameras,
    make_mesh,
    make_sharded_renderer,
)
from mirror_maze_tpu.render import make_camera, upload_scene
from mirror_maze_tpu.render.pipeline import render_pixels
from mirror_maze_tpu.scene import build_scene


def _cfg():
    return EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=32, height=16, samples_per_pixel=2),
        intersector="brute",
    )


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"cam": 4, "tile": 2}
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    assert mesh.devices.shape == (2, 2)


def test_sharded_render_runs_and_assembles():
    cfg = _cfg()
    mesh = make_mesh(4, 2)
    dev = upload_scene(build_scene(cfg.maze))
    base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    cams = batch_cameras(
        [base._replace(center=base.center + jnp.float32(i)) for i in range(4)]
    )
    render = make_sharded_renderer(cfg, mesh)
    frames, mean_lum = render(dev, cams, jax.random.PRNGKey(0))
    assert frames.shape == (4, 16, 32, 3)
    f = np.asarray(frames)
    assert np.isfinite(f).all()
    assert np.isfinite(float(mean_lum))
    np.testing.assert_allclose(float(mean_lum), f.mean(), rtol=1e-5)
    # Different camera positions must render different frames.
    assert not np.array_equal(f[0], f[1])


def test_sharded_matches_single_device():
    """The sharded render must equal the unsharded render of each camera
    (same per-(camera, tile) RNG stream derivation)."""
    cfg = _cfg()
    mesh = make_mesh(2, 2)
    dev = upload_scene(build_scene(cfg.maze))
    base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    cams = [base, base._replace(center=base.center + 1.0)]
    render = make_sharded_renderer(cfg, mesh)
    frames, _ = render(dev, batch_cameras(cams), jax.random.PRNGKey(42))
    f = np.asarray(frames)

    # Rebuild the same computation without the mesh.
    h, w = cfg.screen.height, cfg.screen.width
    n_tile = 2
    rows_local = h // n_tile
    key = jax.random.PRNGKey(42)
    for ci, cam in enumerate(cams):
        rows = []
        for ti in range(n_tile):
            ys = ti * rows_local + jnp.arange(rows_local)
            xs = jnp.arange(w)
            gx = jnp.broadcast_to(xs[None, :], (rows_local, w))
            gy = jnp.broadcast_to(ys[:, None], (rows_local, w))
            pix = jnp.stack([gx, gy], -1).reshape(-1, 2)
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 65536 + 0), ti)
            cols = render_pixels(dev, cam, pix, k, cfg)
            rows.append(np.asarray(cols).reshape(rows_local, w, 3))
        expected = np.concatenate(rows, axis=0)
        np.testing.assert_allclose(f[ci], expected, rtol=1e-5, atol=1e-6)


def _featured_scene(feature):
    """The 4x4 maze scene with one beyond-the-reference feature placed
    in front of the spawn (-5, 0, -15, looking +z)."""
    import dataclasses

    s = build_scene(MazeConfig(width=4, height=4))
    if feature == "spheres":
        return dataclasses.replace(
            s,
            sph_center=np.array([[-5.0, 0.0, -10.0]], np.float32),
            sph_radius=np.array([1.5], np.float32),
            sph_color=np.array([[0.9, 0.2, 0.2]], np.float32),
            sph_is_mirror=np.array([False]),
            sph_emission=np.array([[1.0, 0.5, 0.5, 1.0]], np.float32),
        )
    if feature == "glass":
        return dataclasses.replace(
            s,
            sph_center=np.array([[-5.0, 0.0, -10.0]], np.float32),
            sph_radius=np.array([1.5], np.float32),
            sph_color=np.array([[0.9, 0.95, 1.0]], np.float32),
            sph_is_mirror=np.array([False]),
            sph_emission=np.zeros((1, 4), np.float32),
            sph_ior=np.array([1.5], np.float32),
        )
    if feature == "triangles":
        cat = lambda a, b: np.concatenate(
            [np.asarray(a), np.asarray(b, np.asarray(a).dtype)], axis=0
        )
        return dataclasses.replace(
            s,
            origin=cat(s.origin, [[-7.0, 2.0, -10.0]]),
            u=cat(s.u, [[4.0, 0.0, 0.0]]),
            v=cat(s.v, [[0.0, -4.0, 0.0]]),
            color=cat(s.color, [[0.2, 0.9, 0.3]]),
            is_mirror=cat(s.is_mirror, [False]),
            emission=cat(s.emission, [[0.5, 1.0, 0.5, 1.5]]),
            kind=cat(s.kind, [3]),
            ior=cat(s.ior, [0.0]),
            tex_kind=cat(s.tex_kind, [0]),
            tex_scale=cat(s.tex_scale, [1.0]),
            tex_color2=cat(s.tex_color2, [[0.0, 0.0, 0.0]]),
        )
    if feature == "textures":
        # World checker on the floor/ceiling/boundary planes.
        world = np.asarray(s.kind) == 2
        return dataclasses.replace(
            s,
            tex_kind=np.where(world, 2, 0).astype(np.uint8),
            tex_scale=np.full(s.num_planes, 3.0, np.float32),
            tex_color2=np.broadcast_to(
                np.array([0.8, 0.1, 0.1], np.float32), (s.num_planes, 3)
            ).copy(),
        )
    raise ValueError(feature)


@pytest.mark.slow
@pytest.mark.parametrize(
    "feature", ["spheres", "glass", "triangles", "textures"]
)
def test_sharded_features_match_unsharded(feature):
    """Every beyond-the-reference primitive/material (spheres, glass,
    triangles, textures) through the SHARDED paths: the sharded
    renderer must match the unsharded render_pixels EXACTLY on the
    featured scene, and the tile-sharded interactive engine must render
    it (frames finite and visibly different from the feature-free
    maze)."""
    from mirror_maze_tpu.parallel.shard import make_sharded_engine
    from mirror_maze_tpu.runtime.state import FrameInputs

    cfg = _cfg()
    dev = upload_scene(_featured_scene(feature))
    base_dev = upload_scene(build_scene(MazeConfig(width=4, height=4)))
    n_tile = 2
    mesh = make_mesh(1, n_tile)

    # 1. Renderer parity: shard_map output == unsharded per-tile calls.
    base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    render = make_sharded_renderer(cfg, mesh)
    frames, _ = render(dev, batch_cameras([base]), jax.random.PRNGKey(7))
    f = np.asarray(frames)[0]
    h, w = cfg.screen.height, cfg.screen.width
    rows_local = h // n_tile
    key = jax.random.PRNGKey(7)
    rows = []
    for ti in range(n_tile):
        ys = ti * rows_local + jnp.arange(rows_local)
        gx = jnp.broadcast_to(jnp.arange(w)[None, :], (rows_local, w))
        gy = jnp.broadcast_to(ys[:, None], (rows_local, w))
        pix = jnp.stack([gx, gy], -1).reshape(-1, 2)
        k = jax.random.fold_in(jax.random.fold_in(key, 0), ti)
        cols = render_pixels(dev, base, pix, k, cfg)
        rows.append(np.asarray(cols).reshape(rows_local, w, 3))
    np.testing.assert_allclose(
        f, np.concatenate(rows, axis=0), rtol=1e-5, atol=1e-6
    )

    # 2. The interactive tile-sharded engine renders the feature.
    ecfg = cfg.replace(screen=ScreenConfig(
        width=32, height=32, samples_per_pixel=2, chunks_per_frame=64,
    ))
    init_fn, step_fn = make_sharded_engine(ecfg, mesh)
    st, st0 = init_fn(seed=0), init_fn(seed=0)
    for _ in range(3):
        st, frame = step_fn(dev, st, FrameInputs.idle())
        st0, frame0 = step_fn(base_dev, st0, FrameInputs.idle())
    frame, frame0 = np.asarray(frame), np.asarray(frame0)
    assert np.isfinite(frame.astype(np.float32)).all()
    assert not np.array_equal(frame, frame0), feature


@pytest.mark.slow
def test_watchdog_rolls_back_poisoned_sharded_state():
    """A `play --sharded-bands` session gets the SAME rollback
    protection as single-chip play: the watchdog's snapshot/copy cycle
    must preserve the ShardedEngineState's shardings so the recovered
    state feeds straight back into the shard_map step."""
    from mirror_maze_tpu.parallel.shard import make_sharded_engine
    from mirror_maze_tpu.runtime.state import FrameInputs
    from mirror_maze_tpu.runtime.watchdog import Watchdog, state_is_finite

    n_tile = 2
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=32, height=16 * n_tile,
                            samples_per_pixel=2,
                            chunks_per_frame=4 * n_tile),
        intersector="brute",
    )
    mesh = make_mesh(1, n_tile)
    dev = upload_scene(build_scene(cfg.maze))
    init_fn, step_fn = make_sharded_engine(cfg, mesh)
    st = init_fn(seed=0)
    wd = Watchdog(interval=1)
    for _ in range(3):
        st, _ = step_fn(dev, st, FrameInputs.make(w=True))
        st = wd.check(st)
    assert wd.rollbacks == 0
    good_center = np.asarray(st.cam_center)

    bad = st._replace(cam_center=st.cam_center * np.float32("nan"))
    assert not state_is_finite(bad)
    recovered = wd.check(bad)
    assert wd.rollbacks == 1
    np.testing.assert_array_equal(
        np.asarray(recovered.cam_center), good_center
    )
    # The recovered state's shardings must satisfy the shard_map step:
    # the engine continues (and can roll back a second time).
    recovered, frame = step_fn(dev, recovered, FrameInputs.idle())
    assert state_is_finite(recovered)
    assert np.isfinite(np.asarray(frame).astype(np.float32)).all()
    bad2 = recovered._replace(quat=recovered.quat * np.float32("inf"))
    recovered2 = wd.check(bad2)
    assert wd.rollbacks == 2
    assert state_is_finite(recovered2)
    step_fn(dev, recovered2, FrameInputs.idle())


@pytest.mark.slow
def test_graft_entry_compiles_and_dryruns():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    ge = importlib.import_module("__graft_entry__")
    fn, args = ge.entry()
    jax.jit(fn).lower(*args)  # compile-check
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_dryrun_as_the_driver_invokes_it():
    """Round-1 regression: MULTICHIP_r01.json was ok=false because the
    driver runs ``dryrun_multichip(8)`` in a FRESH process on a 1-device
    host, where the conftest's 8-device CPU forcing does not exist. This
    test reproduces that invocation: a subprocess whose backend exposes
    exactly ONE device (no xla_force_host_platform_device_count), so
    dryrun_multichip must bootstrap its own virtual 8-device CPU mesh in
    a grandchild process and exit 0."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # One CPU device, like the bench host's one TPU: keep the platform
    # pinned to cpu (so the test never rides the axon tunnel) but strip
    # the conftest's virtual-device-count forcing.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    child = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", child], env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


@pytest.mark.slow
def test_sharded_renderer_pallas_backend():
    """The fused pallas kernel must compose with shard_map (per-shard
    pallas_call under a (cam, tile) mesh) — config 5 runs it on real
    meshes, so the interpreter path is exercised here."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
    )
    from mirror_maze_tpu.parallel.shard import (
        batch_cameras,
        make_mesh,
        make_sharded_renderer,
    )
    from mirror_maze_tpu.render import make_camera, upload_scene
    from mirror_maze_tpu.scene import build_scene

    n = min(2, len(jax.devices()))
    mesh = make_mesh(n, 1)
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=32, height=16, samples_per_pixel=2),
        intersector="pallas",
    )
    scene = upload_scene(build_scene(cfg.maze))
    base = make_camera(cfg.camera, 2.0)
    cams = batch_cameras(
        [base._replace(center=base.center + jnp.float32(i)) for i in range(n)]
    )
    render = make_sharded_renderer(cfg, mesh)
    frames, mean_lum = render(scene, cams, jax.random.PRNGKey(0))
    assert frames.shape == (n, 16, 32, 3)
    assert np.isfinite(np.asarray(frames)).all()
    assert float(mean_lum) > 0.0


def _sharded_screen_to_spatial(screen_cm, cfg, n_tile):
    """Assemble a tile-sharded CHUNK-MAJOR screen into the spatial frame."""
    import jax.numpy as _jnp

    from mirror_maze_tpu.parallel.shard import _band_screen_cfg
    from mirror_maze_tpu.render.accumulate import cm_to_spatial

    band = _band_screen_cfg(cfg, n_tile)
    blocks = np.asarray(screen_cm).reshape(n_tile, band.total_chunks, -1)
    return np.concatenate(
        [np.asarray(cm_to_spatial(_jnp.asarray(b), band)) for b in blocks],
        axis=0,
    )


@pytest.mark.slow
def test_sharded_engine_matches_camera_and_blurs_seamless():
    """Tile-sharded interactive engine: camera trajectory must be
    bit-identical to the single-chip step (replicated math), output must
    assemble to the full screen, and the halo-exchanged blur must leave
    no zero-row seams at band boundaries."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
    )
    from mirror_maze_tpu.parallel.shard import make_mesh, make_sharded_engine
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step
    from mirror_maze_tpu.scene import build_scene

    n_tile = min(4, len(jax.devices()))
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=32, height=16 * n_tile, samples_per_pixel=2,
                            chunks_per_frame=4 * n_tile),
        intersector="brute",
    )
    mesh = make_mesh(1, n_tile)
    scene = upload_scene(build_scene(cfg.maze))

    init_fn, step_fn = make_sharded_engine(cfg, mesh)
    st = init_fn(seed=0)
    ref = init_state(cfg, seed=0)
    step1 = make_step(scene, cfg)

    script = (
        [FrameInputs.make(w=True)] * 5
        + [FrameInputs.make(mouse_dx=9.0)] * 2
        + [FrameInputs.idle()] * 10
    )
    frame = None
    for inp in script:
        st, frame = step_fn(scene, st, inp)
        ref, _ = step1(ref, inp)

    # Camera trajectory identical to the single-chip engine.
    np.testing.assert_array_equal(np.asarray(st.cam_center), np.asarray(ref.cam_center))
    np.testing.assert_array_equal(np.asarray(st.quat), np.asarray(ref.quat))
    assert int(st.frame) == int(ref.frame)

    f = np.asarray(frame)
    assert f.shape == (cfg.screen.height, cfg.screen.width, 3)
    assert f.dtype == np.uint8
    assert np.isfinite(np.asarray(st.screen)).all()
    # After 17 frames of 1/4-screen-per-frame refresh + blur, no band
    # boundary row may be systematically black while its neighbors shine.
    fs = _sharded_screen_to_spatial(st.screen, cfg, n_tile)
    assert fs.sum() > 0
    for b in range(1, n_tile):
        edge = fs[16 * b - 1: 16 * b + 1].mean()
        inner = fs[16 * b - 3: 16 * b + 3].mean()
        if inner > 0:
            assert edge > 0.0


@pytest.mark.slow
@pytest.mark.slow
def test_sharded_engine_sorted_window():
    """sort_chunk_window must be honored on the mesh (it was silently
    dropped once): the sorted step runs, refreshes the same per-band
    chunk SET as unsorted (order-only change), and stays finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_maze_tpu.config import CameraConfig, EngineConfig, MazeConfig, ScreenConfig
    from mirror_maze_tpu.parallel.shard import make_mesh, make_sharded_engine
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs
    from mirror_maze_tpu.scene import build_scene

    n_tile = min(2, len(jax.devices()))
    base = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=32, height=16 * n_tile,
                            samples_per_pixel=2,
                            chunks_per_frame=4 * n_tile),
        intersector="brute",
    )
    import dataclasses

    mesh = make_mesh(1, n_tile)
    dev = upload_scene(build_scene(base.maze))
    frames, states = {}, {}
    for sort in (False, True):
        cfg = base.replace(screen=dataclasses.replace(
            base.screen, sort_chunk_window=sort))
        init_fn, step_fn = make_sharded_engine(cfg, mesh)
        st = init_fn(seed=0)
        for _ in range(4):
            st, frame = step_fn(dev, st, FrameInputs.idle())
        frames[sort] = np.asarray(frame)
        states[sort] = st
    for f in frames.values():
        assert np.isfinite(f.astype(np.float32)).all()
    # The sort changes ray->block packing only: queue state identical...
    np.testing.assert_array_equal(
        np.asarray(states[False].perm), np.asarray(states[True].perm))
    np.testing.assert_array_equal(
        np.asarray(states[False].cursor), np.asarray(states[True].cursor))
    # ...and the sorted path actually executed (per-ray RNG regrouping
    # makes the sampled image differ).
    assert not np.array_equal(frames[False], frames[True])


def test_sharded_engine_content_matches_full_frame_render():
    """Deterministic content check: with jitter=0, single-segment paths,
    full refresh in one frame, and blur/quantize off, the sharded
    engine's assembled screen must equal render_full_frame row-bands
    bit-exactly (regression: band-local screen heights once corrupted
    ray directions, rendering bands from the wrong viewport rows)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
        TracerConfig,
    )
    from mirror_maze_tpu.parallel.shard import make_mesh, make_sharded_engine
    from mirror_maze_tpu.render import make_camera, render_full_frame, upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs
    from mirror_maze_tpu.scene import build_scene

    n_tile = min(4, len(jax.devices()))
    h = 16 * n_tile
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        tracer=TracerConfig(bounce_limit=1, mirror_limit=1, jitter=0.0),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(
            width=64, height=h, samples_per_pixel=1,
            chunks_per_frame=(64 // 4) * (h // 4),  # full refresh / frame
            feedback_blur=False, quantize_8bit=False,
        ),
        intersector="brute",
    )
    mesh = make_mesh(1, n_tile)
    scene = upload_scene(build_scene(cfg.maze))

    init_fn, step_fn = make_sharded_engine(cfg, mesh)
    st = init_fn(seed=0)
    st, _ = step_fn(scene, st, FrameInputs.idle())
    sharded = _sharded_screen_to_spatial(st.screen, cfg, n_tile)

    cam = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    # Single-segment emission light is deterministic (RNG only affects
    # scatter directions, which never shade with bounce_limit=1), so any
    # key yields the same image.
    ref = np.asarray(render_full_frame(scene, cam, jax.random.PRNGKey(0), cfg))
    np.testing.assert_array_equal(sharded, ref)


@pytest.mark.slow
def test_sharded_pallas_present_bit_identical_across_seams():
    """The fused Pallas present kernel with ppermute'd halo rows
    (_present_with_halo) must be bit-identical to (a) the XLA halo blur
    + quantize path on the same sharded engine and (b) the single-chip
    step blurring the FULL screen — i.e. embedding the neighbor band's
    boundary row reproduces the un-sharded blur exactly at band seams.
    Deterministic setup: jitter=0, single-segment paths, full refresh."""
    import dataclasses

    from mirror_maze_tpu.parallel.shard import make_mesh, make_sharded_engine
    from mirror_maze_tpu.render.accumulate import cm_to_spatial
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step

    n_tile = min(4, len(jax.devices()))
    h = 16 * n_tile
    for quant in (True, False):
        cfg = EngineConfig(
            maze=MazeConfig(width=4, height=4),
            tracer=TracerConfig(bounce_limit=1, mirror_limit=1, jitter=0.0),
            camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
            screen=ScreenConfig(
                width=64, height=h, samples_per_pixel=1,
                chunks_per_frame=(64 // 4) * (h // 4),  # full refresh
                feedback_blur=True, quantize_8bit=quant,
                pallas_present=True,
            ),
            intersector="brute",
        )
        mesh = make_mesh(1, n_tile)
        scene = upload_scene(build_scene(cfg.maze))

        init_p, step_p = make_sharded_engine(cfg, mesh)
        st_p = init_p(seed=0)
        st_p, frame_p = step_p(scene, st_p, FrameInputs.idle())

        cfg_x = dataclasses.replace(
            cfg, screen=dataclasses.replace(cfg.screen, pallas_present=False)
        )
        init_x, step_x = make_sharded_engine(cfg_x, mesh)
        st_x = init_x(seed=0)
        st_x, frame_x = step_x(scene, st_x, FrameInputs.idle())

        np.testing.assert_array_equal(
            np.asarray(st_p.screen), np.asarray(st_x.screen))
        np.testing.assert_array_equal(
            np.asarray(frame_p), np.asarray(frame_x))

        # vs the single-chip step blurring the full (un-banded) screen:
        # the halo exchange must make band seams invisible, bit-exactly.
        ref = init_state(cfg, seed=0)
        ref, _ = make_step(scene, cfg)(ref, FrameInputs.idle())
        np.testing.assert_array_equal(
            _sharded_screen_to_spatial(st_p.screen, cfg, n_tile),
            np.asarray(cm_to_spatial(ref.screen, cfg.screen)),
        )


@pytest.mark.slow
def test_sharded_engine_bvh_derives_exact_traversal_bounds():
    """The sharded engine must derive exact traversal bounds from the
    concrete scene at first step (like runtime/step.py) instead of
    trusting fixed defaults that can silently drop primitives; its
    camera trajectory must match the single-chip bvh step."""
    import dataclasses

    from mirror_maze_tpu.parallel.shard import make_mesh, make_sharded_engine
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step

    n_tile = min(2, len(jax.devices()))
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=32, height=16 * n_tile,
                            samples_per_pixel=2,
                            chunks_per_frame=4 * n_tile),
        intersector="bvh",
    )
    mesh = make_mesh(1, n_tile)
    scene = upload_scene(build_scene(cfg.maze))
    init_fn, step_fn = make_sharded_engine(cfg, mesh)  # no bounds passed
    st = init_fn(seed=0)
    ref = init_state(cfg, seed=0)
    ref_step = make_step(scene, cfg)
    for _ in range(3):
        st, frame = step_fn(scene, st, FrameInputs.make(w=True))
        ref, _ = ref_step(ref, FrameInputs.make(w=True))
    assert np.isfinite(np.asarray(st.screen)).all()
    np.testing.assert_array_equal(
        np.asarray(st.cam_center), np.asarray(ref.cam_center))


@pytest.mark.slow
def test_sharded_scan_engine_matches_per_frame_engine():
    """make_sharded_scan_engine (n frames per launch via lax.scan inside
    the shard_map) must produce the SAME final state and frame as n
    per-frame sharded launches — pure launch-batching, no semantics."""
    from mirror_maze_tpu.parallel.shard import (
        make_mesh,
        make_sharded_engine,
        make_sharded_scan_engine,
    )
    from mirror_maze_tpu.runtime.state import FrameInputs
    from mirror_maze_tpu.runtime.step import stack_inputs

    n_tile = min(4, len(jax.devices()))
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=32, height=16 * n_tile,
                            samples_per_pixel=2,
                            chunks_per_frame=4 * n_tile),
        intersector="brute",
    )
    mesh = make_mesh(1, n_tile)
    scene = upload_scene(build_scene(cfg.maze))
    script = (
        [FrameInputs.make(w=True)] * 3
        + [FrameInputs.make(mouse_dx=9.0)]
        + [FrameInputs.idle()] * 4
    )

    init1, step1 = make_sharded_engine(cfg, mesh)
    st1 = init1(seed=0)
    for inp in script:
        st1, frame1 = step1(scene, st1, inp)

    initn, scann = make_sharded_scan_engine(cfg, mesh, len(script))
    stn = initn(seed=0)
    stn, framen = scann(scene, stn, stack_inputs(script))

    for a, b in zip(st1, stn):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(frame1), np.asarray(framen))


@pytest.mark.slow
def test_scale_config_per_band_tile_skip_matches_single_chip():
    """Config-5 geometry (64x64 maze, thousands of planes, many 128-plane
    tiles): the linear-scaling argument for band sharding rests on each
    band's Morton-sorted chunk windows keeping the SAME per-block
    tile-skip efficiency as single-chip windows (PERF.md "large scenes").
    Measure the kernel's tiles-tested-per-block diagnostic on a
    single-chip window vs band-local windows covering the same screen
    fraction — bands must not degrade it."""
    import dataclasses

    from mirror_maze_tpu.config import TracerConfig
    from mirror_maze_tpu.ops.sampling import ray_jitter
    from mirror_maze_tpu.parallel.shard import _band_screen_cfg
    from mirror_maze_tpu.render.camera import make_camera, ray_directions
    from mirror_maze_tpu.render.scheduler import (
        chunk_origin_xy,
        chunk_pixels,
        sort_window_morton,
    )
    from mirror_maze_tpu.utils.profiling import tracer_segment_histogram

    cfg = EngineConfig(
        maze=MazeConfig(width=64, height=64),
        tracer=TracerConfig(bounce_limit=5, mirror_limit=16),
        camera=CameraConfig(spawn=(-5.0, 0.0, -45.0)),
        screen=ScreenConfig(width=1024, height=512, samples_per_pixel=4,
                            sort_chunk_window=True),
        intersector="pallas",
    )
    dev = upload_scene(build_scene(cfg.maze))
    n_tiles = max(g[2].shape[0] for g in dev.mxu_tables if g is not None)
    assert n_tiles >= 8  # genuinely many-tile (config-5 regime)

    spp = cfg.screen.samples_per_pixel
    cam = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    jkey = jax.random.PRNGKey(3)

    def window_rays(ids, screen_cfg, row_offset):
        ids = sort_window_morton(jnp.asarray(ids, jnp.int32), screen_cfg)
        xy = chunk_origin_xy(ids, screen_cfg).at[:, 1].add(row_offset)
        pix = chunk_pixels(xy, screen_cfg.chunk_width)
        base = ray_directions(cam, pix, float(cfg.screen.width),
                              float(cfg.screen.height))
        jit = ray_jitter(jkey, (pix.shape[0], spp), cfg.tracer.jitter)
        dirs = (base[:, None, :] + jit).reshape(-1, 3)
        ori = jnp.broadcast_to(cam.center, dirs.shape)
        return ori, dirs

    k_total = 32  # chunks per frame window in this reduced setup
    rng_np = np.random.default_rng(0)

    # Single-chip: one Morton-sorted window over the full chunk grid.
    ids = rng_np.permutation(cfg.screen.total_chunks)[:k_total]
    o, d = window_rays(ids, cfg.screen, 0)
    single = tracer_segment_histogram(dev, cfg, o, d, rows_per_block=2)

    # Bands: n_tile band-local windows of k_total/n_tile chunks each,
    # exactly how the sharded engine pops them (shard.py local_step).
    n_tile = 4
    band = _band_screen_cfg(
        dataclasses.replace(cfg, screen=dataclasses.replace(
            cfg.screen, chunks_per_frame=k_total)), n_tile)
    band_tiles = []
    for ti in range(n_tile):
        bids = rng_np.permutation(band.total_chunks)[: k_total // n_tile]
        o, d = window_rays(bids, band, ti * band.height)
        h = tracer_segment_histogram(dev, cfg, o, d, rows_per_block=2)
        band_tiles.append(h["mean_tiles"])

    mean_band = float(np.mean(band_tiles))
    # Band windows are MORE localized than full-screen windows, so their
    # tile skip must be at least comparable (allow 25% slack for the
    # smaller per-band sample).
    assert mean_band <= 1.25 * single["mean_tiles"], (
        mean_band, single["mean_tiles"], band_tiles)


def test_dryrun_reexec_has_recursion_guard(monkeypatch):
    """Regression: if the virtual-device flags fail to take effect in
    the dryrun's CPU child (conflicting XLA_FLAGS, sitecustomize drift),
    the child must fail loudly instead of re-exec'ing another child
    forever — an unbounded blocking subprocess chain."""
    import pytest

    import __graft_entry__ as g

    monkeypatch.setenv("_MMX_DRYRUN_CHILD", "1")
    with pytest.raises(RuntimeError, match="bootstrap is broken"):
        g._reexec_on_virtual_cpu_mesh(8)


@pytest.mark.slow
def test_interactive_loop_sharded_bands(monkeypatch):
    """play --sharded-bands: InteractiveLoop drives the tile-sharded
    engine (and its scan-batched variant) — frames must assemble to the
    full screen and the state must advance finite, with stdin headless
    (idle input path)."""
    import io
    import sys

    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    n_tile = min(2, len(jax.devices()))
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=32, height=16 * n_tile,
                            samples_per_pixel=2,
                            chunks_per_frame=4 * n_tile),
        intersector="brute",
    )
    scene = upload_scene(build_scene(cfg.maze))

    # stdin is typically not a tty under pytest; force the headless
    # branch deterministically either way.
    monkeypatch.setattr(sys, "stdin", io.StringIO())

    for batch in (1, 3):
        loop = InteractiveLoop(scene, cfg, seed=0, batch_frames=batch,
                               sharded_bands=n_tile)
        loop.run(max_frames=6, display=None, watchdog_interval=4)
        assert int(loop.state.frame) >= 6
        f = np.asarray(loop.frame)
        assert f.shape == (cfg.screen.height, cfg.screen.width, 3)
        assert f.dtype == np.uint8
        assert np.isfinite(np.asarray(loop.state.screen)).all()


@pytest.mark.slow
def test_interactive_loop_sharded_batched_bvh(monkeypatch):
    """Regression: sharded play with batch_frames > 1 and the bvh
    intersector died at trace — the outer jit wrapped the lazy
    traversal-bounds derivation, which then saw TRACER scene arrays
    (np.asarray on a tracer raises). InteractiveLoop must derive bounds
    eagerly from the concrete scene and pass them through."""
    import io
    import sys

    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    n_tile = min(2, len(jax.devices()))
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=32, height=16 * n_tile,
                            samples_per_pixel=2,
                            chunks_per_frame=4 * n_tile),
        intersector="bvh",
    )
    scene = upload_scene(build_scene(cfg.maze))
    monkeypatch.setattr(sys, "stdin", io.StringIO())
    loop = InteractiveLoop(scene, cfg, seed=0, batch_frames=3,
                           sharded_bands=n_tile)
    loop.run(max_frames=3, display=None, watchdog_interval=None)
    f = np.asarray(loop.frame)
    assert f.shape == (cfg.screen.height, cfg.screen.width, 3)
    assert np.isfinite(np.asarray(loop.state.screen)).all()


def test_lazy_bounds_step_rejects_tracer_scene_clearly():
    """The sharded engines derive bvh traversal bounds lazily from the
    CONCRETE scene; if a caller re-wraps the step in an outer jit, the
    derivation must fail with an actionable error naming the fix, not a
    raw TracerArrayConversionError from np.asarray."""
    import pytest

    from mirror_maze_tpu.parallel.shard import make_mesh, make_sharded_engine
    from mirror_maze_tpu.runtime.state import FrameInputs

    n_tile = min(2, len(jax.devices()))
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=1, mirror_limit=1),
        screen=ScreenConfig(width=32, height=16 * n_tile,
                            samples_per_pixel=1,
                            chunks_per_frame=2 * n_tile),
        intersector="bvh",
    )
    scene = upload_scene(build_scene(cfg.maze))
    mesh = make_mesh(1, n_tile)
    init_fn, step_fn = make_sharded_engine(cfg, mesh)  # no explicit bounds
    state = init_fn(seed=0)
    outer = jax.jit(step_fn)
    with pytest.raises(ValueError, match="CONCRETE scene"):
        outer(scene, state, FrameInputs.idle())


@pytest.mark.slow
@pytest.mark.slow
def test_interactive_loop_sharded_adaptive_hot_input():
    """Sharded play with batch_frames > 1 and LIVE key input: the
    adaptive path must serve hot frames via the per-frame sharded twin
    and the camera must actually move (keys land, not idle-dropped)."""
    import os
    import pty
    import sys

    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    n_tile = min(2, len(jax.devices()))
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=32, height=16 * n_tile,
                            samples_per_pixel=2,
                            chunks_per_frame=4 * n_tile),
        intersector="brute",
    )
    scene = upload_scene(build_scene(cfg.maze))
    loop = InteractiveLoop(scene, cfg, seed=0, batch_frames=4,
                           sharded_bands=n_tile)
    calls = {"one": 0}
    real_one = loop.step_one

    def one(st, inp):
        calls["one"] += 1
        return real_one(st, inp)

    loop.step_one = one
    z0 = float(np.asarray(loop.state.cam_center)[2])

    master, slave = pty.openpty()
    old_stdin = sys.stdin
    try:
        import tty as tty_mod

        tty_mod.setcbreak(slave)
        sys.stdin = os.fdopen(slave, "r", closefd=False)
        os.write(master, b"www")
        loop.run(max_frames=3, display=None, watchdog_interval=None)
    finally:
        sys.stdin = old_stdin
        os.close(master)
        os.close(slave)
    assert calls["one"] >= 1                       # hot path used
    z1 = float(np.asarray(loop.state.cam_center)[2])
    assert z1 > z0                                 # walked forward

    # Regression: a SECOND run() inherited the previous run's hot window
    # (_had_input/_active_until), and a headless second run could then
    # re-arm it every frame — pinning the session at per-frame stepping
    # and defeating the batch-latency amortization. A fresh headless run
    # must step batched from frame 0.
    import io

    calls_after_first = calls["one"]
    sys.stdin = io.StringIO()
    try:
        loop.run(max_frames=4, display=None, watchdog_interval=None)
    finally:
        sys.stdin = old_stdin
    assert calls["one"] == calls_after_first       # no single-stepping


@pytest.mark.slow
def test_sharded_renderer_sphere_scene_all_backends():
    """Sphere primitives ride through the sharded multi-chip renderer:
    a maze + spheres scene rendered on the cam x tile mesh must equal
    the unsharded render_pixels of each camera (brute, and bvh whose
    traversal bounds are derived lazily from the plane BVH while the
    spheres live in the dense post-pass fold), and the pallas kernel's
    mode-3 group must run under shard_map without structural issues."""
    import dataclasses

    base_scene = build_scene(MazeConfig(width=4, height=4))
    scene = dataclasses.replace(
        base_scene,
        sph_center=np.array(
            [[3.0, -3.0, 3.0], [6.0, -2.0, 5.0]], np.float32),
        sph_radius=np.array([1.2, 0.8], np.float32),
        sph_color=np.array(
            [[0.9, 0.2, 0.2], [0.2, 0.9, 0.2]], np.float32),
        sph_is_mirror=np.array([False, True]),
        sph_emission=np.array(
            [[1.0, 0.5, 0.2, 2.0], [0, 0, 0, 0]], np.float32),
        sph_ior=np.zeros(2, np.float32),
    )
    dev = upload_scene(scene)
    mesh = make_mesh(2, 2)
    # Cameras looking INTO the maze at the spheres.
    cam_cfg = CameraConfig(spawn=(3.0, -3.0, -2.0), look_dir=(0, 0, 1))
    for intersector in ("brute", "bvh"):
        cfg = dataclasses.replace(_cfg(), intersector=intersector,
                                  camera=cam_cfg)
        base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
        cams = [base, base._replace(center=base.center + 0.5)]
        frames, _ = make_sharded_renderer(cfg, mesh)(
            dev, batch_cameras(cams), jax.random.PRNGKey(7))
        f = np.asarray(frames)
        assert np.isfinite(f).all() and f.max() > 0, intersector
        h, w = cfg.screen.height, cfg.screen.width
        rows_local = h // 2
        for ci, cam in enumerate(cams):
            rows = []
            for ti in range(2):
                ys = ti * rows_local + jnp.arange(rows_local)
                gx = jnp.broadcast_to(jnp.arange(w)[None, :], (rows_local, w))
                gy = jnp.broadcast_to(ys[:, None], (rows_local, w))
                pix = jnp.stack([gx, gy], -1).reshape(-1, 2)
                k = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(7), ci * 65536), ti)
                cols = render_pixels(dev, cam, pix, k, cfg)
                rows.append(np.asarray(cols).reshape(rows_local, w, 3))
            np.testing.assert_allclose(
                f[ci], np.concatenate(rows, axis=0), rtol=1e-5, atol=1e-6,
                err_msg=intersector)
    # Pallas: the mode-3 sphere group under shard_map (interpreted
    # pallas_call per shard). Smoke-level like the plane-scene pallas
    # sharded test: finite, lit frames.
    cfg = dataclasses.replace(_cfg(), intersector="pallas", camera=cam_cfg)
    base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    cams = batch_cameras([base, base._replace(center=base.center + 0.5)])
    frames, mean_lum = make_sharded_renderer(cfg, mesh)(
        dev, cams, jax.random.PRNGKey(7))
    assert np.isfinite(np.asarray(frames)).all()
    assert float(mean_lum) > 0.0


@pytest.mark.slow
def test_sharded_renderer_triangle_mesh_all_backends():
    """Triangle meshes ride through the sharded multi-chip renderer:
    a maze world with a mirror icosphere dropped in (merge_scenes, so
    quads AND kind-3 triangles share the plane arrays) rendered on the
    cam x tile mesh must equal the unsharded render_pixels of each
    camera (brute/bvh switch acceptance per primitive), and the pallas
    kernel's mode-4 triangle group must run under shard_map."""
    import dataclasses

    from mirror_maze_tpu.scene.mesh import icosphere, merge_scenes, mesh_scene

    maze = build_scene(MazeConfig(width=4, height=4))
    verts, faces = icosphere(subdivisions=1, radius=1.0,
                             center=(3.0, -2.5, 3.0))
    ball = mesh_scene(verts, faces, color=(0.1, 0.1, 0.1), is_mirror=True)
    scene = merge_scenes(maze, ball)
    assert (np.asarray(scene.kind) == 3).sum() == faces.shape[0]
    dev = upload_scene(scene)
    assert dev.mxu_tables[4] is not None     # triangle group present
    mesh = make_mesh(2, 2)
    cam_cfg = CameraConfig(spawn=(3.0, -2.5, -1.0), look_dir=(0, 0, 1))
    for intersector in ("brute", "bvh"):
        cfg = dataclasses.replace(_cfg(), intersector=intersector,
                                  camera=cam_cfg)
        base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
        cams = [base, base._replace(center=base.center + 0.5)]
        frames, _ = make_sharded_renderer(cfg, mesh)(
            dev, batch_cameras(cams), jax.random.PRNGKey(11))
        f = np.asarray(frames)
        assert np.isfinite(f).all() and f.max() > 0, intersector
        h, w = cfg.screen.height, cfg.screen.width
        rows_local = h // 2
        for ci, cam in enumerate(cams):
            rows = []
            for ti in range(2):
                ys = ti * rows_local + jnp.arange(rows_local)
                gx = jnp.broadcast_to(jnp.arange(w)[None, :], (rows_local, w))
                gy = jnp.broadcast_to(ys[:, None], (rows_local, w))
                pix = jnp.stack([gx, gy], -1).reshape(-1, 2)
                k = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(11), ci * 65536),
                    ti)
                cols = render_pixels(dev, cam, pix, k, cfg)
                rows.append(np.asarray(cols).reshape(rows_local, w, 3))
            np.testing.assert_allclose(
                f[ci], np.concatenate(rows, axis=0), rtol=1e-5, atol=1e-6,
                err_msg=intersector)
    # Pallas: the mode-4 triangle group under shard_map (interpreted
    # pallas_call per shard) — finite, lit frames.
    cfg = dataclasses.replace(_cfg(), intersector="pallas", camera=cam_cfg)
    base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    cams = batch_cameras([base, base._replace(center=base.center + 0.5)])
    frames, mean_lum = make_sharded_renderer(cfg, mesh)(
        dev, cams, jax.random.PRNGKey(11))
    assert np.isfinite(np.asarray(frames)).all()
    assert float(mean_lum) > 0.0


@pytest.mark.slow
def test_sharded_renderer_glass_and_texture_all_backends():
    """Dielectrics and procedural textures ride through the sharded
    multi-chip renderer: a maze world with a glass sphere and a
    world-checkered mirror sphere rendered on the cam x tile mesh must
    equal the unsharded render_pixels of each camera (brute/bvh), and
    the pallas kernel's glass group + doubled property block must run
    under shard_map. fresnel=False keeps the glass paths deterministic
    for the equality check."""
    import dataclasses

    base_scene = build_scene(MazeConfig(width=4, height=4))
    scene = dataclasses.replace(
        base_scene,
        sph_center=np.array(
            [[3.0, -3.0, 3.0], [6.0, -2.0, 5.0]], np.float32),
        sph_radius=np.array([1.2, 0.8], np.float32),
        sph_color=np.array(
            [[0.95, 0.97, 1.0], [0.9, 0.8, 0.2]], np.float32),
        sph_is_mirror=np.array([False, True]),
        sph_emission=np.zeros((2, 4), np.float32),
        sph_ior=np.array([1.5, 0.0], np.float32),
        sph_tex_kind=np.array([0, 2], np.uint8),
        sph_tex_scale=np.array([1.0, 0.8], np.float32),
        sph_tex_color2=np.array([[0, 0, 0], [0.2, 0.2, 0.9]], np.float32),
    )
    dev = upload_scene(scene)
    assert dev.sph_ior is not None and dev.sph_tex is not None
    mesh = make_mesh(2, 2)
    cam_cfg = CameraConfig(spawn=(3.0, -3.0, -2.0), look_dir=(0, 0, 1))
    for intersector in ("brute", "bvh"):
        cfg = dataclasses.replace(_cfg(), intersector=intersector,
                                  camera=cam_cfg)
        cfg = dataclasses.replace(
            cfg, tracer=dataclasses.replace(cfg.tracer, fresnel=False))
        base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
        cams = [base, base._replace(center=base.center + 0.5)]
        frames, _ = make_sharded_renderer(cfg, mesh)(
            dev, batch_cameras(cams), jax.random.PRNGKey(7))
        f = np.asarray(frames)
        assert np.isfinite(f).all() and f.max() > 0, intersector
        h, w = cfg.screen.height, cfg.screen.width
        rows_local = h // 2
        for ci, cam in enumerate(cams):
            rows = []
            for ti in range(2):
                ys = ti * rows_local + jnp.arange(rows_local)
                gx = jnp.broadcast_to(jnp.arange(w)[None, :], (rows_local, w))
                gy = jnp.broadcast_to(ys[:, None], (rows_local, w))
                pix = jnp.stack([gx, gy], -1).reshape(-1, 2)
                k = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(7), ci * 65536), ti)
                cols = render_pixels(dev, cam, pix, k, cfg)
                rows.append(np.asarray(cols).reshape(rows_local, w, 3))
            np.testing.assert_allclose(
                f[ci], np.concatenate(rows, axis=0), rtol=1e-5, atol=1e-6,
                err_msg=intersector)
    # Pallas: glass sphere group (mode 5) + 64-row props under
    # shard_map (interpreted pallas_call per shard): finite, lit.
    cfg = dataclasses.replace(_cfg(), intersector="pallas", camera=cam_cfg)
    cfg = dataclasses.replace(
        cfg, tracer=dataclasses.replace(cfg.tracer, fresnel=False))
    base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    cams = batch_cameras([base, base._replace(center=base.center + 0.5)])
    frames, mean_lum = make_sharded_renderer(cfg, mesh)(
        dev, cams, jax.random.PRNGKey(7))
    assert np.isfinite(np.asarray(frames)).all()
    assert float(mean_lum) > 0.0


@pytest.mark.slow
def test_sharded_engine_adaptive_refresh_steps():
    """ScreenConfig.adaptive_refresh is honored per band on the mesh
    (each band reorders its own queue from its own screen rows)."""
    import jax
    import numpy as np

    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
    )
    from mirror_maze_tpu.parallel.shard import make_mesh, make_sharded_engine
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs
    from mirror_maze_tpu.scene import build_scene

    n_tile = 2
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=32, height=16 * n_tile, samples_per_pixel=1,
                            chunks_per_frame=8 * n_tile,
                            adaptive_refresh=True),
        intersector="brute",
    )
    mesh = make_mesh(1, n_tile)
    scene = upload_scene(build_scene(cfg.maze))
    init_fn, step_fn = make_sharded_engine(cfg, mesh)
    st = init_fn(seed=0)
    c_band = cfg.screen.total_chunks // n_tile
    for _ in range(2 * (c_band // 8) + 2):   # cross at least two wraps
        st, frame = step_fn(scene, st, FrameInputs.idle())
    perm = np.asarray(st.perm).reshape(n_tile, c_band)
    for t in range(n_tile):                  # per-band queues stay permutations
        assert sorted(perm[t].tolist()) == list(range(c_band))
    assert np.asarray(frame).shape == (cfg.screen.height, cfg.screen.width, 3)
