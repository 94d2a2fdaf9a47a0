"""Progressive pixel-chunk scheduler (device-resident).

The reference divides the screen into 4x4-pixel chunks, shuffles all chunk
origins once (`gen_pixels`, `main.rs:293-307`), and pops a fixed number per
frame, refilling from the same shuffled master list when exhausted
(`random_pixels`, `main.rs:309-326`) — so a full repaint takes ~64 frames
and each epoch repeats the same chunk order. On camera rotation the queue is
regenerated with a fresh shuffle (`main.rs:836-841`).

TPU recast: the queue is a device-resident permutation of chunk ids plus a
cursor; per frame we dynamic-slice the next window (wrapping over a doubled
view of the permutation so a frame may straddle the epoch boundary, exactly
like the reference's mid-frame refill), advance the cursor mod C, and on
rotation replace the permutation via jax.random.permutation and reset the
cursor. No host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ScreenConfig


def init_permutation(key: jax.Array, cfg: ScreenConfig) -> jnp.ndarray:
    """Fresh shuffled chunk-id permutation [C] (gen_pixels equivalent)."""
    return jax.random.permutation(key, cfg.total_chunks).astype(jnp.int32)


def take_chunks(
    perm: jnp.ndarray, cursor: jnp.ndarray, n: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pop the next n chunk ids; returns (ids [n], new_cursor)."""
    total = perm.shape[0]
    doubled = jnp.concatenate([perm, perm])
    ids = jax.lax.dynamic_slice(doubled, (cursor,), (n,))
    return ids, (cursor + n) % total


def adaptive_reorder(
    perm: jnp.ndarray,
    cursor: jnp.ndarray,
    cursor_next: jnp.ndarray,
    screen_rows: jnp.ndarray,
) -> jnp.ndarray:
    """Detail-guided epoch reorder (ScreenConfig.adaptive_refresh).

    BEYOND the reference (whose refill always replays one random order,
    `main.rs:309-326`): when the queue wraps into a new epoch, reorder
    it by DESCENDING per-chunk luminance variance of the accumulated
    chunk-major screen — high-variance chunks (edges, light falloff,
    residual grain) refresh first, so detail converges sooner at the
    same ray budget. Still a permutation (argsort), so every chunk
    refreshes exactly once per epoch: the full-repaint cadence and the
    progressive look's coverage guarantees are untouched — only the
    order within an epoch changes. One [C] variance + argsort per WRAP
    (not per frame); fully device-resident.

    Rotation resets keep the reference's fresh random shuffle (the
    post-rotation screen is stale, so its variance is not a signal for
    the new view); adaptive order kicks in again at the next wrap.
    """
    c = screen_rows.shape[0]
    px = screen_rows.reshape(c, -1, 3)
    luma = (0.2126 * px[..., 0] + 0.7152 * px[..., 1]
            + 0.0722 * px[..., 2])
    var = jnp.var(luma, axis=1)
    wrapped = cursor_next <= cursor  # take_chunks advanced past the end
    # The cursor lands mid-array after a straddling pop, so ROLL the
    # priority order to start exactly at cursor_next — the new epoch's
    # first window gets the highest-variance chunks.
    return jax.lax.cond(
        wrapped,
        lambda p: jnp.roll(jnp.argsort(-var), cursor_next).astype(p.dtype),
        lambda p: p,
        perm,
    )


def sort_window_morton(ids: jnp.ndarray, cfg: ScreenConfig) -> jnp.ndarray:
    """Reorder one popped chunk window along a Morton (Z-order) curve.

    The window's chunk SET is unchanged — which chunks refresh this frame
    (and hence the reference's 1/64 staggered-repaint look,
    `main.rs:293-326`) is untouched; only the order rays are laid out in
    is. Consecutive window entries then sit in compact screen regions, so
    every tracer block (render/pallas_tracer.py) sees spatially coherent
    rays and the per-tile AABB skip stays effective even with blocks
    spanning many chunks — the lever that lets large scenes (config 5)
    use wide, latency-amortizing blocks instead of one-chunk blocks
    (PERF.md "large scenes prefer SMALL blocks").

    Cost: one [G] argsort per frame (G = chunks/frame, ~8k at config 5)
    — noise next to the trace. Enabled by ScreenConfig.sort_chunk_window.
    """
    from ..ops.morton import morton2

    cx = (ids % cfg.chunks_x).astype(jnp.uint32)
    cy = (ids // cfg.chunks_x).astype(jnp.uint32)
    return ids[jnp.argsort(morton2(cx, cy))]


def chunk_origin_xy(ids: jnp.ndarray, cfg: ScreenConfig) -> jnp.ndarray:
    """Decode chunk ids to pixel-space origins [n, 2] (x, y)."""
    cx = (ids % cfg.chunks_x) * cfg.chunk_width
    cy = (ids // cfg.chunks_x) * cfg.chunk_width
    return jnp.stack([cx, cy], axis=-1).astype(jnp.int32)


def chunk_pixels(origins_xy: jnp.ndarray, chunk_width: int) -> jnp.ndarray:
    """Expand chunk origins [G, 2] to per-pixel coords [G*cw*cw, 2].

    Pixel order inside a chunk matches the reference thread->pixel map
    (`shaders.metal:271-275`): pixel_number/chunk is the x offset,
    pixel_number%chunk the y offset.
    """
    g = origins_xy.shape[0]
    pn = jnp.arange(chunk_width * chunk_width, dtype=jnp.int32)
    off = jnp.stack([pn // chunk_width, pn % chunk_width], axis=-1)  # [cw*cw, 2]
    pix = origins_xy[:, None, :] + off[None, :, :]
    return pix.reshape(g * chunk_width * chunk_width, 2)
