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
    """Write traced pixels into the screen (the kernel's texout.write,
    `shaders.metal:366`).

    unique_indices: every engine window's pixels are distinct by
    construction (chunk ids come from a permutation slice; the doubled-
    permutation wrap never overlaps itself within one window), freeing
    XLA from ordered-write semantics. A chunk-BLOCKED scatter (16x fewer
    indices, 48-float windows) was measured at 22 ms/frame vs this
    formulation's 12.7 at 1080p — XLA lowers windowed scatters far worse
    than flat ones; do not "optimize" this back."""
    return screen.at[pixel_xy[:, 1], pixel_xy[:, 0]].set(
        colors, mode="drop", unique_indices=True
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
