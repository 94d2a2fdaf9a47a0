"""Noise texture (reference RNG seed source) + checkpoint/resume."""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mirror_maze_tpu.config import MazeConfig, TracerConfig
from mirror_maze_tpu.render import upload_scene
from mirror_maze_tpu.render.pallas_tracer import trace_paths_pallas
from mirror_maze_tpu.scene import build_scene
from mirror_maze_tpu.utils.noise import generate_noise, sample_noise

KEY = jax.random.PRNGKey(0)


def test_generate_noise_deterministic_and_uniform():
    a = generate_noise(64, seed=1)
    b = generate_noise(64, seed=1)
    c = generate_noise(64, seed=2)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= 0.0 and a.max() < 1.0
    assert abs(a.mean() - 0.5) < 0.02  # white noise


def test_sample_noise_wraps():
    tex = generate_noise(16)
    pix = jnp.array([[1, 2], [17, 18], [33, 34]], jnp.int32)
    v = np.asarray(sample_noise(tex, pix))
    assert v[0] == v[1] == v[2]


@pytest.mark.slow
def test_noise_rng_changes_grain_not_statistics(rng):
    scene = build_scene(MazeConfig(width=4, height=4))
    dev = upload_scene(scene)
    cfg = TracerConfig(bounce_limit=3, mirror_limit=2)
    o = jnp.broadcast_to(jnp.array([-5.0, 0.0, -15.0]), (512, 3))
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    base = np.asarray(trace_paths_pallas(dev.plane_table, o, d, jnp.int32(3), cfg))
    srow = sample_noise(dev.noise, jnp.zeros((512, 2), jnp.int32) + jnp.arange(512)[:, None])
    noised = np.asarray(trace_paths_pallas(dev.plane_table, o, d, jnp.int32(3), cfg,
                                           seed_row=srow))
    assert not np.array_equal(base, noised)         # different grain
    assert abs(base.mean() - noised.mean()) < 0.1   # same lighting
    # zero seed_row must be bit-identical to no seed_row (stream unchanged)
    z = np.asarray(trace_paths_pallas(dev.plane_table, o, d, jnp.int32(3), cfg,
                                      seed_row=jnp.zeros((512,), jnp.float32)))
    assert np.array_equal(base, z)


@pytest.mark.slow
def test_pipeline_noise_rng_flag(tiny_cfg, tiny_device_scene):
    from mirror_maze_tpu.render import make_camera
    from mirror_maze_tpu.render.pipeline import render_pixels

    cfg = tiny_cfg.replace(
        intersector="pallas",
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2, noise_rng=True),
    )
    cam = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    pix = jnp.stack(
        jnp.meshgrid(jnp.arange(8), jnp.arange(8), indexing="xy"), -1
    ).reshape(-1, 2)
    cols = np.asarray(render_pixels(tiny_device_scene, cam, pix, KEY, cfg))
    assert np.isfinite(cols).all()


def test_state_checkpoint_roundtrip(tmp_path, tiny_cfg, tiny_device_scene):
    from mirror_maze_tpu.runtime.state import (
        FrameInputs,
        init_state,
        load_state,
        save_state,
    )
    from mirror_maze_tpu.runtime.step import make_step

    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=7)
    for _ in range(3):
        st, _ = step(st, FrameInputs.make(w=True, mouse_dx=3.0))
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, st)
    st2 = load_state(path)
    for a, b in zip(st, st2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # resumed run continues identically
    sa, _ = step(st, FrameInputs.idle())
    sb, _ = step(st2, FrameInputs.idle())
    for a, b in zip(sa, sb):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_tracer_segment_histogram(tiny_cfg, tiny_device_scene, rng):
    from mirror_maze_tpu.utils.profiling import tracer_segment_histogram

    o = jnp.broadcast_to(jnp.array([-5.0, 0.0, -15.0]), (256, 3))
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h = tracer_segment_histogram(
        tiny_device_scene, tiny_cfg, o, jnp.asarray(d), rows_per_block=1
    )
    assert sum(h["histogram"]) == 2  # 256 rays / 128-ray blocks
    assert 1.0 <= h["mean"] <= h["max_segments"]


@pytest.mark.slow
def test_watchdog_rolls_back_poisoned_state(tiny_cfg, tiny_device_scene):
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step
    from mirror_maze_tpu.runtime.watchdog import Watchdog, state_is_finite

    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=0)
    wd = Watchdog(interval=1)
    for _ in range(3):
        st, _ = step(st, FrameInputs.make(w=True))
        st = wd.check(st)
    assert wd.rollbacks == 0
    good_center = np.asarray(st.cam_center)

    # poison the state as an unforeseen numeric failure would
    bad = st._replace(cam_center=st.cam_center * np.float32("nan"))
    assert not state_is_finite(bad)
    recovered = wd.check(bad)
    assert wd.rollbacks == 1
    assert np.array_equal(np.asarray(recovered.cam_center), good_center)
    # engine continues from the snapshot
    recovered, _ = step(recovered, FrameInputs.idle())
    assert state_is_finite(recovered)


def test_watchdog_counts_frames_not_launches(tiny_cfg):
    """Batched drivers (lax.scan steps) advance many engine frames per
    launch; check(state, n=batch) must keep the validation cadence
    frame-periodic — interval=8 with n=4 validates every 2nd call."""
    from mirror_maze_tpu.runtime.state import init_state
    from mirror_maze_tpu.runtime.watchdog import Watchdog

    st = init_state(tiny_cfg, seed=0)
    wd = Watchdog(interval=8)
    wd.check(st, n=4)          # first call always snapshots
    assert wd._snapshot is not None
    bad = st._replace(quat=st.quat * np.float32("nan"))
    wd.check(bad, n=4)         # 4 < 8 frames since snapshot: not validated
    assert wd.rollbacks == 0
    wd.check(bad, n=4)         # 8 frames reached: validated -> rollback
    assert wd.rollbacks == 1


def test_watchdog_raises_without_snapshot(tiny_cfg):
    from mirror_maze_tpu.runtime.state import init_state
    from mirror_maze_tpu.runtime.watchdog import Watchdog

    st = init_state(tiny_cfg, seed=0)
    bad = st._replace(quat=st.quat * np.float32("inf"))
    wd = Watchdog(interval=1)
    with pytest.raises(FloatingPointError):
        wd.check(bad)


REF_NOISE = "/root/reference/textures/noiseTexture-2.png"


@pytest.mark.skipif(not os.path.exists(REF_NOISE),
                    reason="reference texture not present")
def test_reference_noise_texture_loads_and_is_correlated():
    """The reference's actual noise texture (`main.rs:354, 667-695`) must
    load as the engine's seed texture — and it is NOT white noise: its
    grain is spatially smooth (lag-1 autocorrelation ~0.33), which is
    part of the reference's signature look; the procedural fallback is
    white (autocorr ~0). This is the measured basis for exposing
    --noise-png instead of claiming procedural parity."""
    from mirror_maze_tpu.utils.noise import load_noise_png

    t = load_noise_png(REF_NOISE)
    assert t.shape == (512, 512)
    assert t.min() >= 0.0 and t.max() < 1.0

    def lag1(a):
        return np.corrcoef(a[:, :-1].ravel(), a[:, 1:].ravel())[0, 1]

    assert lag1(t) > 0.2                      # spatially correlated
    assert abs(lag1(generate_noise())) < 0.05  # procedural is white
    # Statistically distinct textures -> distinct grain sources.
    assert abs(t.std() - generate_noise().std()) > 0.05


@pytest.mark.skipif(not os.path.exists(REF_NOISE),
                    reason="reference texture not present")
def test_noise_png_flows_through_scene_and_cli_plumbing():
    """upload_scene(noise=...) and the --noise-png CLI path must carry
    the loaded texture into the device scene used for seeding."""
    from mirror_maze_tpu.utils.noise import load_noise_png

    t = load_noise_png(REF_NOISE)
    scene = build_scene(MazeConfig(width=4, height=4))
    dev = upload_scene(scene, noise=t)
    np.testing.assert_allclose(np.asarray(dev.noise), t, rtol=1e-6)
    pix = jnp.array([[0, 0], [1, 0], [511, 511]], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(sample_noise(dev.noise, pix)),
        [t[0, 0], t[0, 1], t[511, 511]], rtol=1e-6)


def test_noise_rng_honored_on_jnp_backends(tiny_cfg):
    """Round-1 gap: noise_rng was silently ignored off the pallas path.
    The brute backend must now fold the per-pixel noise sample into its
    scatter streams: noise_rng=True vs False must differ, a constant
    texture must behave like a shared stream, and lighting statistics
    must be preserved."""
    from mirror_maze_tpu.render import make_camera
    from mirror_maze_tpu.render.pipeline import render_pixels

    scene = build_scene(tiny_cfg.maze)
    base_cfg = tiny_cfg.replace(intersector="brute")
    cam = make_camera(base_cfg.camera,
                      base_cfg.screen.width / base_cfg.screen.height)
    pix = jnp.stack(
        jnp.meshgrid(jnp.arange(8), jnp.arange(8), indexing="xy"), -1
    ).reshape(-1, 2)

    tr = TracerConfig(bounce_limit=3, mirror_limit=2)
    dev = upload_scene(scene)
    off = np.asarray(render_pixels(
        dev, cam, pix, KEY, base_cfg.replace(tracer=tr)))
    on_cfg = base_cfg.replace(
        tracer=TracerConfig(bounce_limit=3, mirror_limit=2, noise_rng=True))
    on = np.asarray(render_pixels(dev, cam, pix, KEY, on_cfg))
    assert not np.array_equal(off, on)           # grain differs
    assert np.isfinite(on).all()
    assert abs(off.mean() - on.mean()) < 0.1     # same lighting

    # Two uploads with different textures give different grain; the same
    # texture reproduces bit-identically.
    dev_t = upload_scene(scene, noise=generate_noise(seed=5))
    a = np.asarray(render_pixels(dev_t, cam, pix, KEY, on_cfg))
    b = np.asarray(render_pixels(dev_t, cam, pix, KEY, on_cfg))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, on)


def test_jnp_seed_row_does_not_collapse_identical_rays():
    """Regression: the jnp tracer once derived scatter keys solely from
    the noise VALUE, so rays sharing a texel — all spp samples of a
    pixel, or whole swathes of the screen with an 8-bit PNG's 256
    distinct values — drew bit-identical scatter streams, collapsing the
    sample mean to ~1 effective sample. The per-ray index must be folded
    in too (matching the pallas kernel's _pcg_init)."""
    from mirror_maze_tpu.ops.vecmath import normalize
    from mirror_maze_tpu.render.tracer import trace_paths

    scene = build_scene(MazeConfig(width=4, height=4))
    dev = upload_scene(scene)
    cfg = TracerConfig(bounce_limit=5, mirror_limit=2)
    # 64 IDENTICAL rays angled up toward the emissive ceiling panels,
    # one shared noise texel value — the pathological pre-fix
    # configuration gave exactly ONE unique light value here; with the
    # ray index folded in, scattered paths diversify (measured ~11
    # unique of 64 at this geometry — many paths legitimately add no
    # emission and coincide at the deterministic component).
    o = jnp.broadcast_to(jnp.array([-5.0, 0.0, -15.0]), (64, 3))
    d = jnp.broadcast_to(
        normalize(jnp.array([0.0, 0.9, 0.3])), (64, 3)
    )
    srow = jnp.full((64,), 0.37, jnp.float32)
    light = np.asarray(trace_paths(dev, o, d, KEY, cfg, seed_row=srow))
    assert np.isfinite(light).all()
    assert np.unique(light, axis=0).shape[0] > 4  # diverse scatter paths


def test_load_state_rejects_mismatched_checkpoint(tmp_path, tiny_cfg):
    """load_state with a config must fail FAST and clearly on checkpoint
    mismatches (wrong resolution/chunking, pre-chunk-major spatial
    layout, not-a-checkpoint files) instead of dying with an opaque
    scatter shape error inside the first jitted step."""
    import dataclasses

    from mirror_maze_tpu.runtime.state import (
        init_state,
        load_state,
        save_state,
    )

    st = init_state(tiny_cfg, seed=0)
    path = os.path.join(tmp_path, "ok.npz")
    save_state(path, st)
    # Matching config passes and stays bit-exact.
    st2 = load_state(path, tiny_cfg)
    for a, b in zip(st, st2):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # Different screen geometry is rejected with a clear message.
    other = dataclasses.replace(
        tiny_cfg,
        screen=dataclasses.replace(
            tiny_cfg.screen, width=tiny_cfg.screen.width * 2
        ),
    )
    with pytest.raises(ValueError, match="screen shape"):
        load_state(path, other)

    # A legacy spatial [H, W, 3] screen names the layout in the error.
    legacy = st._replace(
        screen=jnp.zeros(
            (tiny_cfg.screen.height, tiny_cfg.screen.width, 3), jnp.float32
        )
    )
    lpath = os.path.join(tmp_path, "legacy.npz")
    save_state(lpath, legacy)
    with pytest.raises(ValueError, match="chunk-major"):
        load_state(lpath, tiny_cfg)

    # Not a checkpoint at all.
    npath = os.path.join(tmp_path, "not_ckpt.npz")
    np.savez(npath, foo=np.zeros(3))
    with pytest.raises(ValueError, match="lacks field"):
        load_state(npath, tiny_cfg)
