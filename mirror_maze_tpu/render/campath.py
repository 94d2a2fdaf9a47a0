"""Camera paths for offline animation (the `animate` CLI).

Extension beyond the reference (its only camera driver is live mouse/WASD
input, `main.rs:780-939`): deterministic camera paths — an in-place yaw
spin, a look-at orbit, and piecewise-linear waypoint flythroughs — each
producing a batched `Camera` pytree (leading axis = frame) that renders
through the same pipeline as everything else (`render_full_frame` under
`lax.map`, or the sharded multicam renderer, whose camera batch axis IS
the frame axis here).

All paths build rotations with `ops.quat.aim` (exact, roll-free) rather
than the reference's `from_look_dir`, whose asin fold-back quirk
(`maths.rs:139-156`) caps it at 90 degrees — a 360-degree orbit needs the
exact form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import quat as quat_ops
from ..ops.vecmath import normalize
from .camera import Camera


def _batched(base: Camera, centers: jnp.ndarray, looks: jnp.ndarray) -> Camera:
    """Batched Camera from per-frame centers [N,3] + look dirs [N,3],
    keeping base focal/viewport (broadcast to the frame axis)."""
    n = centers.shape[0]
    return Camera(
        center=centers.astype(jnp.float32),
        rotation=quat_ops.aim(looks.astype(jnp.float32)),
        focal=jnp.broadcast_to(base.focal, (n,)),
        viewport=jnp.broadcast_to(base.viewport, (n, 2)),
    )


def spin_cameras(base: Camera, look0, n: int, turns: float = 1.0) -> Camera:
    """Yaw the camera in place: a full sweep of `turns` revolutions about
    world y from the azimuth of `look0`, keeping its elevation. The frame
    endpoint is exclusive so a 1-turn GIF loops seamlessly."""
    look0 = normalize(jnp.asarray(look0, jnp.float32))
    azim0 = jnp.arctan2(-look0[0], look0[2])
    elev = jnp.arcsin(jnp.clip(look0[1], -1.0, 1.0))
    t = jnp.arange(n, dtype=jnp.float32) / n
    azim = azim0 + 2.0 * jnp.pi * turns * t
    looks = jnp.stack(
        [-jnp.sin(azim) * jnp.cos(elev),
         jnp.broadcast_to(jnp.sin(elev), azim.shape),
         jnp.cos(azim) * jnp.cos(elev)],
        axis=-1,
    )
    centers = jnp.broadcast_to(base.center, (n, 3))
    return _batched(base, centers, looks)


def orbit_cameras(
    base: Camera, center, radius: float, height: float, n: int,
    turns: float = 1.0,
) -> Camera:
    """Circle the camera around `center` at `radius` (xz plane) and
    `height` above it, always aiming at the center point."""
    c = jnp.asarray(center, jnp.float32)
    t = jnp.arange(n, dtype=jnp.float32) / n
    theta = 2.0 * jnp.pi * turns * t
    pos = c + jnp.stack(
        [radius * jnp.cos(theta),
         jnp.full_like(theta, height),
         radius * jnp.sin(theta)],
        axis=-1,
    )
    return _batched(base, pos, c - pos)


def waypoint_cameras(
    base: Camera, points, n: int, target=None, looks=None
) -> Camera:
    """Piecewise-linear flythrough of `points` [K,3]. The camera aims at
    a fixed `target`, or interpolates the per-waypoint `looks` [K,3]
    (normalized lerp); with neither, it looks along its direction of
    travel (per-segment tangent)."""
    pts = jnp.asarray(points, jnp.float32)
    k = pts.shape[0]
    assert k >= 2, "waypoint path needs >= 2 points"
    t = jnp.arange(n, dtype=jnp.float32) / max(n - 1, 1) * (k - 1)
    seg = jnp.clip(t.astype(jnp.int32), 0, k - 2)
    frac = (t - seg.astype(jnp.float32))[:, None]
    p0, p1 = pts[seg], pts[seg + 1]
    pos = p0 * (1.0 - frac) + p1 * frac
    if target is not None:
        look = jnp.asarray(target, jnp.float32) - pos
    elif looks is not None:
        lk = jnp.asarray(looks, jnp.float32)
        look = lk[seg] * (1.0 - frac) + lk[seg + 1] * frac
    else:
        look = p1 - p0
    return _batched(base, pos, look)


def render_path(scene, cams: Camera, key: jax.Array, cfg) -> jnp.ndarray:
    """Render every camera on the path: [N, H, W, 3] float display frames.

    One jitted launch: `lax.map` over the frame axis around
    `render_full_frame` (itself row-batched), then the display transform.
    Scene/cams/key are arguments, not closure captures (CLAUDE.md: no
    device arrays closed over jitted functions)."""
    from .accumulate import to_display
    from .pipeline import render_full_frame

    @jax.jit
    def run(scene, cams, key):
        n = cams.center.shape[0]
        keys = jax.random.split(key, n)

        def one(args):
            cam, k = args
            return to_display(render_full_frame(scene, cam, k, cfg))

        return jax.lax.map(one, (cams, keys))

    return run(scene, cams, key)
