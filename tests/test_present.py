"""Fused Pallas present kernel (render/present.py) vs the XLA chunk-major
blur: must be BIT-identical under jit (the engine always runs jitted), at
every size/edge case the strip picker produces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import ScreenConfig
from mirror_maze_tpu.render.accumulate import (
    cm_to_spatial,
    feedback_blur,
    feedback_blur_cm,
    quantize_8bit,
    spatial_to_cm,
)
from mirror_maze_tpu.render.present import _pick_lane_strip, present


@pytest.mark.parametrize("w,h,cw", [
    (32, 16, 4),     # tiny (test screens)
    (64, 48, 4),     # several strips
    (1920, 96, 4),   # full 1080p width
    (32, 28, 4),     # Cy=7: prime strip height
    (24, 12, 2),     # non-default chunk width
    (168, 84, 42),   # widest fused-path chunk (3*42 = 126 <= 128 halo
                     # lanes), single strip (L not 128-divisible)
    (1344, 84, 42),  # widest chunk, MULTI-strip: border shifts read 126
                     # of the 128 halo lanes
])
def test_present_matches_xla_blur_bitwise(w, h, cw):
    cfg = ScreenConfig(width=w, height=h, chunk_width=cw)
    rng = np.random.default_rng(hash((w, h, cw)) % 2**32)
    cm = jnp.asarray(
        rng.random((cfg.total_chunks, cw * cw * 3), np.float32)
    )
    for quantize in (False, True):
        def ref_fn(x):
            y = feedback_blur_cm(x, cfg)
            return quantize_8bit(y) if quantize else y

        ref = np.asarray(jax.jit(ref_fn)(cm))
        got = np.asarray(present(cm, cfg, quantize=quantize))
        np.testing.assert_array_equal(got, ref)


def test_present_rejects_chunks_wider_than_the_halo():
    """Chunks with 3*chunk_width beyond the halo lanes must be a clear
    ValueError at the kernel entry (regression: an opaque out-of-bounds
    slice deep in kernel tracing). ScreenConfig rejects such configs on
    the fused path already; this guards direct/exotic callers."""
    cfg = ScreenConfig(width=192, height=96, chunk_width=48,
                       pallas_present=False)
    cm = jnp.zeros((cfg.total_chunks, 48 * 48 * 3), jnp.float32)
    with pytest.raises(ValueError, match="halo lanes"):
        present(cm, cfg, quantize=False)


def test_cm_blur_matches_spatial_blur_bitwise():
    """feedback_blur_cm (the kernel's reference) must itself equal the
    original spatial blur exactly."""
    cfg = ScreenConfig(width=64, height=32, chunk_width=4)
    rng = np.random.default_rng(9)
    cm = jnp.asarray(rng.random((cfg.total_chunks, 48), np.float32))

    def a(x):
        return feedback_blur_cm(x, cfg)

    def b(x):
        return spatial_to_cm(feedback_blur(cm_to_spatial(x, cfg)), cfg)

    np.testing.assert_array_equal(
        np.asarray(jax.jit(a)(cm)), np.asarray(jax.jit(b)(cm))
    )


def test_pick_lane_strip():
    # 1080p: Cy=270, L=23040 -> largest 128-multiple divisor within the
    # ~2.5 MB center budget (270 * Lb * 4 bytes).
    assert _pick_lane_strip(270, 23040) == 768
    # tiny screens: no 128-aligned divisor -> single full-width block
    assert _pick_lane_strip(4, 144) == 144
    assert _pick_lane_strip(4, 384) == 384


def test_pick_lane_strip_over_budget_returns_narrowest():
    """Regression: when no 128-multiple strip fit the VMEM budget (very
    tall screens), the fallthrough returned the FULL row width — a
    many-MB single block guaranteed not to lower. It must return the
    narrowest 128-multiple strip instead."""
    from mirror_maze_tpu.render.present import _pick_lane_strip

    # cy huge: even Lb=128 exceeds the budget -> narrowest, not L.
    assert _pick_lane_strip(4096, 1280 * 48) == 128
    # Normal screens keep the largest in-budget divisor behavior.
    assert _pick_lane_strip(4, 768) == 768
    # Non-128-aligned tiny rows still fall back to L.
    assert _pick_lane_strip(4, 96) == 96
