"""Screen accumulation, feedback blur, and 8-bit quantization.

The reference accumulates into a private RGBA8Unorm screen texture
(`main.rs:699-709`): the compute kernel writes freshly traced chunks into it,
then the present pass's fragment shader reads each pixel plus its 4-neighbor
cross, averages, and writes the blurred value BACK into the screen texture
(`shaders.metal:214-225`) — a feedback loop that compounds across frames and,
together with the 1/64 staggered chunk refresh, produces the signature
dreamlike smear. The 8-bit texture quantizes after every write, which is
what lets the feedback settle instead of blurring to mush; we replicate that
as an explicit quantization step (ScreenConfig.quantize_8bit).

Deviation (documented): the reference's fragment shader reads out-of-bounds
at screen edges (uint2 + (-1,0) wraps; undefined behavior in Metal). We
clamp to the edge instead.

Known faithful artifact: dim radial light falloffs show concentric
banding rings under 8-bit quantization + blur feedback — the reference's
RGBA8Unorm screen behaves identically; set quantize_8bit=False for
float accumulation without it.
"""

from __future__ import annotations

import jax.numpy as jnp


def scatter_chunks(
    screen: jnp.ndarray,       # [H, W, 3] float32
    pixel_xy: jnp.ndarray,     # [K, 2] int32 (x, y)
    colors: jnp.ndarray,       # [K, 3] float32
) -> jnp.ndarray:
    """Write traced pixels into a SPATIAL screen (the kernel's
    texout.write, `shaders.metal:366`).

    SUPERSEDED on the engine's hot path by the chunk-major screen +
    scatter_chunk_rows (measured 0.09 ms vs this form's 1.49 ms at the
    1080p operating point — TPU scatter cost is per-INDEX, so 16x fewer
    contiguous 48-float rows win 16x; a windowed [4,4,3] scatter into
    the spatial screen was ALSO measured, 22 ms, XLA lowers window
    scatters far worse than flat ones). Kept for offline/comparison use.

    unique_indices: every engine window's pixels are distinct by
    construction (chunk ids come from a permutation slice; the doubled-
    permutation wrap never overlaps itself within one window), freeing
    XLA from ordered-write semantics."""
    return screen.at[pixel_xy[:, 1], pixel_xy[:, 0]].set(
        colors, mode="drop", unique_indices=True
    )


# --- Chunk-major screen layout ------------------------------------------------
#
# The persistent accumulation buffer lives CHUNK-MAJOR in the engine
# state: row c = the 4x4 pixel chunk with scheduler id c, flattened in
# chunk_pixels order (x-offset slow, y-offset fast, then rgb —
# `shaders.metal:271-275`). The per-frame refresh then writes K whole
# rows of 48 contiguous floats (one XLA row scatter, 0.09 ms at 1080p)
# instead of K*16 scattered pixels (1.49 ms) — TPU scatters pay per
# index, not per byte. The spatial [H, W, 3] view needed by the blur and
# the display is two reshape/transposes away, which XLA fuses into the
# blur's loop nest at HBM bandwidth (measured noise-level next to the
# scatter win).


def scatter_chunk_rows(
    screen_cm: jnp.ndarray,    # [C, cw*cw*3] float32 chunk-major screen
    chunk_ids: jnp.ndarray,    # [K] int32 scheduler chunk ids
    colors: jnp.ndarray,       # [K*cw*cw, 3] float32 in chunk_pixels order
) -> jnp.ndarray:
    """Write one frame's refreshed chunks as whole chunk-major rows."""
    k = chunk_ids.shape[0]
    return screen_cm.at[chunk_ids].set(
        colors.reshape(k, -1), mode="drop", unique_indices=True
    )


def cm_to_spatial(cm: jnp.ndarray, screen_cfg) -> jnp.ndarray:
    """Chunk-major [C, cw*cw*3] -> spatial [H, W, 3]."""
    cw = screen_cfg.chunk_width
    t = cm.reshape(screen_cfg.chunks_y, screen_cfg.chunks_x, cw, cw, 3)
    # axes: (cy, cx, x_off, y_off, c) -> (cy, y_off, cx, x_off, c)
    return t.transpose(0, 3, 1, 2, 4).reshape(
        screen_cfg.height, screen_cfg.width, 3
    )


def feedback_blur_cm(cm: jnp.ndarray, screen_cfg) -> jnp.ndarray:
    """The cross blur computed DIRECTLY on the chunk-major layout —
    bit-identical to feedback_blur(cm_to_spatial(...)) (tested), with no
    25 MB transposes: measured 1.14 ms for the whole
    scatter+blur+quantize stage at 1080p vs 5.89 ms for the
    transpose-sandwich form and 1.36 ms for the spatial pixel-scatter
    form it replaces.

    Neighbors: within a chunk they are yo/xo shifts; across chunk
    boundaries the first/last pixel row of the adjacent chunk row
    (clamped at the screen edge, like the spatial blur's edge pad)."""
    cw = screen_cfg.chunk_width
    cy, cx = screen_cfg.chunks_y, screen_cfg.chunks_x
    t = cm.reshape(cy, cx, cw, cw, 3)   # (cy, cx, x_off, y_off, c)
    last = cw - 1
    # y-1 (up): inner yo 1.. <- yo 0..; yo=0 <- prev chunk row's yo=last
    prev_y = jnp.concatenate(
        [t[0:1, :, :, 0:1], t[:-1, :, :, last:]], axis=0
    )
    u = jnp.concatenate([prev_y, t[:, :, :, : last]], axis=3)
    # y+1 (down)
    next_y = jnp.concatenate(
        [t[1:, :, :, 0:1], t[-1:, :, :, last:]], axis=0
    )
    d = jnp.concatenate([t[:, :, :, 1:], next_y], axis=3)
    # x-1 (left): xo axis 2, cx axis 1
    prev_x = jnp.concatenate([t[:, 0:1, 0:1], t[:, :-1, last:]], axis=1)
    l = jnp.concatenate([prev_x, t[:, :, : last]], axis=2)
    next_x = jnp.concatenate([t[:, 1:, 0:1], t[:, -1:, last:]], axis=1)
    r = jnp.concatenate([t[:, :, 1:], next_x], axis=2)
    out = (t + (l + r) / 2.0 + (u + d) / 2.0) / 3.0
    return out.reshape(cy * cx, cw * cw * 3)


def spatial_to_cm(sp: jnp.ndarray, screen_cfg) -> jnp.ndarray:
    """Spatial [H, W, 3] -> chunk-major [C, cw*cw*3]."""
    cw = screen_cfg.chunk_width
    t = sp.reshape(screen_cfg.chunks_y, cw, screen_cfg.chunks_x, cw, 3)
    # axes: (cy, y_off, cx, x_off, c) -> (cy, cx, x_off, y_off, c)
    return t.transpose(0, 2, 3, 1, 4).reshape(
        screen_cfg.total_chunks, cw * cw * 3
    )


def feedback_blur(screen: jnp.ndarray) -> jnp.ndarray:
    """Cross blur (c + (l+r)/2 + (u+d)/2) / 3 (`shaders.metal:219-222`)."""
    p = jnp.pad(screen, ((1, 1), (1, 1), (0, 0)), mode="edge")
    c = p[1:-1, 1:-1]
    l = p[1:-1, :-2]
    r = p[1:-1, 2:]
    u = p[:-2, 1:-1]
    d = p[2:, 1:-1]
    return (c + (l + r) / 2.0 + (u + d) / 2.0) / 3.0


def quantize_8bit(screen: jnp.ndarray) -> jnp.ndarray:
    """RGBA8Unorm write semantics: clamp to [0,1], quantize to 256 levels."""
    return jnp.round(jnp.clip(screen, 0.0, 1.0) * 255.0) / 255.0


def to_display(screen: jnp.ndarray) -> jnp.ndarray:
    """uint8 frame for presentation/IO."""
    return jnp.round(jnp.clip(screen, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def present_stage(screen, screen_cfg, pallas_fn, xla_blur_fn):
    """The present-policy dispatch (`shaders.metal:214-225` + RGBA8
    write semantics), shared by the single-chip step (runtime/step.py)
    and the sharded band step (parallel/shard.py) so the two engines
    cannot drift: blur -> fused pallas kernel if configured, else XLA
    blur + quantize; no blur -> quantize alone. Only the blur
    implementations differ between callers (the sharded ones embed
    ppermute'd band halos), so they arrive as the two callables:
    ``pallas_fn(screen, quantize=bool)`` and ``xla_blur_fn(screen)``.
    """
    if screen_cfg.feedback_blur:
        if screen_cfg.pallas_present:
            return pallas_fn(screen, quantize=screen_cfg.quantize_8bit)
        screen = xla_blur_fn(screen)
        if screen_cfg.quantize_8bit:
            screen = quantize_8bit(screen)
        return screen
    if screen_cfg.quantize_8bit:
        return quantize_8bit(screen)
    return screen
