"""Quantified look-parity harness (SURVEY.md section 7, hard part #5).

The reference's "fuzzy dreamlike" look emerges from three interacting
mechanisms; this module pins each to reference-derived NUMBERS instead
of eyeballing:

1. staggered refresh: at the reference operating point (1024x768,
   4-px chunks, 768 chunks/frame — `main.rs:599-603, 646-650`) a full
   repaint takes exactly 64 frames, each frame's window is disjoint
   from the previous 63, and the epoch repeats the same order
   (the reference refills from the same shuffled master list,
   `main.rs:309-326`); rotation resets the queue (`main.rs:836-841`);
2. feedback blur: the fragment shader's cross blur with write-back
   (`shaders.metal:219-222`) applied k times has the closed-form
   impulse response h^(*k), h = [center 1/3, 4-neighbors 1/6];
3. noise-texture grain: the reference's own `noiseTexture-2.png` is
   SMOOTH (measured lag-1 autocorrelation ~0.334, not white) — and its
   seed expression `uint seed = noise.x + noise.y + hash(texid) + time`
   (`shaders.metal:298`) TRUNCATES the float sample to an integer in
   {0, 1, 2}, so the texture contributes at most ~1.6 bits to the
   per-thread seed. This repo's `--noise-png` path mixes the full
   24-bit sample (render/pipeline.py seed_row) — a documented
   strengthening; grain statistics are pinned at the kernel level in
   tests/test_noise_ckpt.py.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import ScreenConfig
from mirror_maze_tpu.render.accumulate import feedback_blur
from mirror_maze_tpu.render.scheduler import init_permutation, take_chunks
from mirror_maze_tpu.utils.noise import generate_noise, load_noise_png

REF_NOISE = "/root/reference/textures/noiseTexture-2.png"


# --- 1. staggered-refresh cadence -------------------------------------------


def test_full_repaint_cadence_is_64_frames_at_reference_defaults():
    import jax

    cfg = ScreenConfig()  # 1024x768, chunk 4 -> 49,152 chunks
    cpf = cfg.effective_chunks_per_frame
    assert cfg.total_chunks == 49_152 and cpf == 768  # main.rs:646-650
    assert cfg.total_chunks // cpf == 64              # the 64-frame repaint

    perm = init_permutation(jax.random.PRNGKey(0), cfg)
    cursor = jnp.int32(0)
    seen: set[int] = set()
    windows = []
    for frame in range(64):
        ids, cursor = take_chunks(perm, cursor, cpf)
        ids = np.asarray(ids)
        w = set(ids.tolist())
        assert len(w) == cpf
        assert not (w & seen), f"frame {frame} re-refreshed a chunk early"
        seen |= w
        windows.append(ids)
    assert len(seen) == cfg.total_chunks  # full repaint after exactly 64
    # Epoch 2 repeats the same order (same master list, main.rs:309-326).
    ids, cursor = take_chunks(perm, cursor, cpf)
    np.testing.assert_array_equal(np.asarray(ids), windows[0])


@pytest.mark.slow
def test_rotation_resets_queue_translation_does_not():
    """The queue regenerates ONLY on rotation (`main.rs:836-841`):
    turning re-renders the whole view; walking does not."""
    import jax

    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
    )
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step
    from mirror_maze_tpu.scene import build_scene

    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=32, height=32, samples_per_pixel=1,
                            chunks_per_frame=8),
        intersector="brute",
    )
    step = make_step(upload_scene(build_scene(cfg.maze)), cfg)
    st = init_state(cfg, seed=0)
    st, _ = step(st, FrameInputs.idle())
    perm0, cur0 = np.asarray(st.perm), int(st.cursor)
    st, _ = step(st, FrameInputs.make(w=True))      # translation
    assert np.array_equal(np.asarray(st.perm), perm0)
    assert int(st.cursor) == (cur0 + 8) % cfg.screen.total_chunks
    st, _ = step(st, FrameInputs.make(mouse_dx=5.0))  # rotation
    assert not np.array_equal(np.asarray(st.perm), perm0)
    # Reference ordering (`main.rs:778` pop, then `836-841` reset): the
    # frame pops from the OLD queue first, the reset lands after — so
    # the fresh queue starts its full repaint on the NEXT frame.
    assert int(st.cursor) == 0


# --- 2. feedback-blur impulse response --------------------------------------


def _cross_kernel() -> np.ndarray:
    h = np.zeros((3, 3))
    h[1, 1] = 1.0 / 3.0
    h[0, 1] = h[2, 1] = h[1, 0] = h[1, 2] = 1.0 / 6.0
    return h


def _conv2(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    out = np.zeros_like(a)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out += h[dy + 1, dx + 1] * np.roll(np.roll(a, dy, 0), dx, 1)
    return out


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_blur_impulse_response_matches_closed_form(k):
    n = 33
    img = np.zeros((n, n, 3), np.float32)
    img[n // 2, n // 2] = 1.0
    out = np.asarray(img)
    for _ in range(k):
        out = np.asarray(feedback_blur(jnp.asarray(out)))
    expect = np.zeros((n, n))
    expect[n // 2, n // 2] = 1.0
    h = _cross_kernel()
    for _ in range(k):
        expect = _conv2(expect, h)
    # The impulse never reaches the edge for k <= 4, so clamping is moot.
    np.testing.assert_allclose(out[..., 0], expect, atol=1e-6)
    np.testing.assert_allclose(out[..., 1], expect, atol=1e-6)


def test_blur_closed_form_values():
    """Spot-check the analytic taps: k=1 center 1/3 and cross 1/6
    (`shaders.metal:219-222`); k=2 center 1/9 + 4*(1/36) = 2/9."""
    n = 9
    img = np.zeros((n, n, 3), np.float32)
    img[4, 4] = 1.0
    b1 = np.asarray(feedback_blur(jnp.asarray(img)))
    assert abs(b1[4, 4, 0] - 1 / 3) < 1e-7
    for y, x in ((3, 4), (5, 4), (4, 3), (4, 5)):
        assert abs(b1[y, x, 0] - 1 / 6) < 1e-7
    assert b1[3, 3, 0] == 0.0  # diagonals are NOT in the cross
    b2 = np.asarray(feedback_blur(jnp.asarray(b1)))
    assert abs(b2[4, 4, 0] - 2 / 9) < 1e-7
    # Energy is conserved away from edges (the kernel sums to 1).
    assert abs(b2[..., 0].sum() - 1.0) < 1e-6


# --- 3. noise-texture grain ---------------------------------------------------


def _lag1(a: np.ndarray) -> float:
    a = a - a.mean()
    return float((a[:, 1:] * a[:, :-1]).mean() / (a * a).mean())


@pytest.mark.skipif(not os.path.exists(REF_NOISE),
                    reason="reference texture not present")
def test_reference_noise_texture_is_smooth_lag1_a_third():
    t = load_noise_png(REF_NOISE)
    assert t.shape == (512, 512)
    # Measured 0.334 along both axes — smooth, decidedly not white.
    assert 0.30 < _lag1(t) < 0.37
    assert 0.30 < _lag1(t.T) < 0.37


def test_procedural_noise_is_white():
    g = generate_noise()
    assert abs(_lag1(g)) < 0.02
    assert abs(_lag1(g.T)) < 0.02
    # Uniform in [0, 1): mean 1/2, var 1/12.
    assert abs(g.mean() - 0.5) < 0.01
    assert abs(g.var() - 1 / 12) < 0.01


@pytest.mark.skipif(not os.path.exists(REF_NOISE),
                    reason="reference texture not present")
def test_reference_seed_expression_truncates_texture_to_two_bits():
    """`uint seed = noise.x + noise.y + ...` (`shaders.metal:298`): the
    float sum in [0, 2] truncates to {0, 1, 2} — at most ~1.6 bits of
    texture entropy per thread. Pinning this documents WHY this repo's
    seed_row mixes the full 24-bit sample instead (a strengthening, not
    a deviation: the reference's own texture contribution is almost
    entirely discarded by its cast)."""
    t = load_noise_png(REF_NOISE)
    contrib = np.trunc(t + t)  # noise.x + noise.y; r==g in this texture
    vals = set(np.unique(contrib).tolist())
    assert vals <= {0.0, 1.0, 2.0}
    # The truncated contribution carries well under 2 bits of entropy.
    p = np.bincount(contrib.astype(int).ravel(), minlength=3) / contrib.size
    entropy = -(p[p > 0] * np.log2(p[p > 0])).sum()
    assert entropy < 1.7
