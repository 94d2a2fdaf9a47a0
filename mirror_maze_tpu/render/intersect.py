"""Ray-scene intersection: primitives + two nearest-hit backends.

Reimplements the reference's device intersectors — ray-rect
(`shaders.metal:51-67`) and slab ray-AABB (`shaders.metal:87-95`) — and its
iterative ordered BVH traversal (`shaders.metal:115-156`), recast for TPU:

- ``nearest_hit_brute``: every ray against every plane as a pair of
  [R,3]x[3,P] contractions + vectorized in-rectangle tests. Branchless,
  MXU/VPU-friendly; wins for the small plane counts of configs 1-4
  (SURVEY.md section 7 "hard parts" #1).
- ``nearest_hit_bvh``: the reference's near-child-first stack traversal,
  vectorized over rays with per-ray stacks and liveness masks (SIMT style).
  Scales to large scenes at the cost of gathers.

Both return (t, plane_index) with t = BIG for misses. The hit-acceptance
rule matches the reference exactly: t > t_min (0.1) and strictly closer than
the current hit, point inside the rectangle, non-parallel ray
(`shaders.metal:63`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .scenebuf import DeviceScene

BIG = 1e30


def ray_aabb(
    o: jnp.ndarray,      # [..., 3]
    d: jnp.ndarray,      # [..., 3]
    t_cur: jnp.ndarray,  # [...]
    bmin: jnp.ndarray,   # [..., 3]
    bmax: jnp.ndarray,   # [..., 3]
) -> jnp.ndarray:
    """Slab test; returns entry distance or BIG (`shaders.metal:87-95`)."""
    inv = 1.0 / d
    t1 = (bmin - o) * inv
    t2 = (bmax - o) * inv
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tf >= tn) & (tn < t_cur) & (tf > 0.0)
    return jnp.where(hit, tn, BIG)


def ray_plane_gathered(
    o: jnp.ndarray, d: jnp.ndarray, scene: DeviceScene,
    pid: jnp.ndarray, t_min: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ray-rect test against per-ray gathered plane ids [R] -> (t, ok)."""
    n = scene.normal[pid]
    denom = jnp.sum(d * n, axis=-1)
    t = (scene.d[pid] - jnp.sum(o * n, axis=-1)) / denom
    x = o + t[..., None] * d
    s1 = jnp.sum(x * scene.w1[pid], axis=-1) - scene.b1[pid]
    s2 = jnp.sum(x * scene.w2[pid], axis=-1) - scene.b2[pid]
    ok = (
        scene.valid[pid]
        & (denom != 0.0)
        & (t > t_min)
        & (s1 >= 0.0) & (s1 <= 1.0)
        & (s2 >= 0.0) & (s2 <= 1.0)
    )
    return t, ok


def nearest_hit_brute(
    scene: DeviceScene, o: jnp.ndarray, d: jnp.ndarray, t_min: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All-planes nearest hit. o, d: [R, 3] -> (t [R], idx [R]).

    The plane equation t = (c - o.n)/(d.n) and both edge projections expand
    into ray-matrix contractions against precomputed per-plane constants, so
    the whole scene test is six [R,3]x[3,P] matmuls + elementwise selects.
    Ties pick the lowest plane index (the reference's pick among coincident
    planes is BVH-traversal-order dependent; any consistent rule matches one
    valid reference ordering).
    """
    on = o @ scene.normal.T          # [R, P]
    dn = d @ scene.normal.T
    t = (scene.d[None, :] - on) / dn
    s1 = (o @ scene.w1.T) + t * (d @ scene.w1.T) - scene.b1[None, :]
    s2 = (o @ scene.w2.T) + t * (d @ scene.w2.T) - scene.b2[None, :]
    ok = (
        scene.valid[None, :]
        & (dn != 0.0)
        & (t > t_min)
        & (s1 >= 0.0) & (s1 <= 1.0)
        & (s2 >= 0.0) & (s2 <= 1.0)
    )
    t = jnp.where(ok, t, BIG)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    return jnp.min(t, axis=-1), idx


def _push(stack, sp, node, mask):
    """Masked push onto per-ray stacks. stack [R, S], sp [R], node [R]."""
    r = jnp.arange(stack.shape[0])
    slot = jnp.minimum(sp, stack.shape[1] - 1)
    new_col = jnp.where(mask, node, stack[r, slot])
    stack = stack.at[r, slot].set(new_col)
    return stack, sp + mask.astype(sp.dtype)


@partial(jax.jit, static_argnames=("t_min", "max_depth", "max_leaf"))
def nearest_hit_bvh(
    scene: DeviceScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min: float,
    max_depth: int,
    max_leaf: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized ordered stack traversal (`shaders.metal:115-156`).

    Every ray walks its own path: gathers node data by id, descends the
    nearer child first, pushes the farther child when also hit, and tests
    up to max_leaf primitives per leaf under masks. Rays whose stacks empty
    go inactive; the while_loop exits when all are done.
    """
    n_rays = o.shape[0]
    t0 = jnp.full((n_rays,), BIG, dtype=jnp.float32)
    idx0 = jnp.zeros((n_rays,), dtype=jnp.int32)
    stack0 = jnp.zeros((n_rays, max_depth + 2), dtype=jnp.int32)
    sp0 = jnp.ones((n_rays,), dtype=jnp.int32)  # root pre-pushed at slot 0

    def cond(st):
        return jnp.any(st[3] > 0)

    def body(st):
        t, idx, stack, sp = st
        live = sp > 0
        r = jnp.arange(n_rays)
        cur = stack[r, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(live, sp - 1, sp)

        ct = scene.bvh_count[cur]
        lf = scene.bvh_left_first[cur]
        is_leaf = ct >= 1

        # Leaf: masked loop over primitive slots (`shaders.metal:128`).
        for k in range(max_leaf):
            slot = lf + jnp.minimum(k, jnp.maximum(ct - 1, 0))
            pid = scene.bvh_prim[slot]
            tk, ok = ray_plane_gathered(o, d, scene, pid, t_min)
            upd = live & is_leaf & (k < ct) & ok & (tk < t)
            t = jnp.where(upd, tk, t)
            idx = jnp.where(upd, pid, idx)

        # Interior: ordered descent (`shaders.metal:134-154`).
        lc, rc = lf, lf + 1
        d1 = ray_aabb(o, d, t, scene.bvh_min[lc], scene.bvh_max[lc])
        d2 = ray_aabb(o, d, t, scene.bvh_min[rc], scene.bvh_max[rc])
        near = jnp.where(d1 <= d2, lc, rc)
        far = jnp.where(d1 <= d2, rc, lc)
        dn = jnp.minimum(d1, d2)
        df = jnp.maximum(d1, d2)
        interior = live & ~is_leaf
        stack, sp = _push(stack, sp, far, interior & (dn < BIG) & (df < BIG))
        stack, sp = _push(stack, sp, near, interior & (dn < BIG))
        return t, idx, stack, sp

    t, idx, _, _ = jax.lax.while_loop(cond, body, (t0, idx0, stack0, sp0))
    return t, idx
