"""Ray-scene intersection: primitives + two nearest-hit backends.

Reimplements the reference's device intersectors — ray-rect
(`shaders.metal:51-67`) and slab ray-AABB (`shaders.metal:87-95`) — and its
iterative ordered BVH traversal (`shaders.metal:115-156`), recast for TPU:

- ``nearest_hit_brute``: every ray against every plane as a pair of
  [R,3]x[3,P] contractions + vectorized in-rectangle tests. Branchless,
  MXU/VPU-friendly; wins for the small plane counts of configs 1-4
  (SURVEY.md section 7 "hard parts" #1).
- ``nearest_hit_exact``: the same dense test with explicit full-f32 FMA
  contractions (no MXU bf16 input truncation) — the traversal's
  hardware-exactness class at dense-path speed (27.7x the traversal at
  config-2 scale, bit-identical results to it on silicon; PERF.md).
- ``nearest_hit_bvh``: the reference's near-child-first stack traversal,
  vectorized over rays with per-ray stacks and liveness masks (SIMT
  style). Kept as the parity backend; measured at its serial-latency
  floor (PERF.md "bvh floor decomposition").

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


def sphere_ts(
    scene: DeviceScene, o: jnp.ndarray, d: jnp.ndarray, t_min: float
) -> jnp.ndarray:
    """Per-(ray, sphere) hit distances [R, S]; BIG where missed.

    The reference carries a ray-sphere intersector as DEAD code
    (`shaders.metal:69-85` — never dispatched, and with a sign bug: its
    half-chord is sqrt(r^2 + p^2) where circle geometry needs
    sqrt(r^2 - p^2)). This is the corrected near-root quadratic in the
    engine's MXU-friendly affine form: with b = d.o - d.c and
    q = |o|^2 - 2 o.c + (|c|^2 - r^2), a hit needs disc = b^2 - q > 0
    and t = -b - sqrt(disc) > t_min. Near root only: rays starting
    inside a sphere pass through (same convention as the reference's
    near-root-only dead code). Both b and q are contractions against
    per-sphere constants — the same quantities the pallas kernel's
    sphere group computes on the MXU (mode 3, pallas_tracer.py).
    """
    sdo = jnp.sum(o * d, axis=-1, keepdims=True)       # [R, 1]
    soo = jnp.sum(o * o, axis=-1, keepdims=True)
    b = sdo - d @ scene.sph_center.T                   # [R, S]
    # q via one [R,4]x[4,S] contraction mirroring the kernel's W row
    # (-2c | c2r2), so the summation order matches the MXU quantity.
    w1 = jnp.concatenate(
        [-2.0 * scene.sph_center, scene.sph_c2r2[:, None]], axis=-1
    )                                                  # [S, 4]
    ones = jnp.ones_like(o[..., :1])
    q = soo + jnp.concatenate([o, ones], axis=-1) @ w1.T
    disc = b * b - q
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    ts = -b - root
    ok = (disc > 0.0) & (ts > t_min)
    if scene.sph_ior is not None:
        # GLASS spheres (ior > 0) are closed surfaces: a refracted ray
        # travelling inside must be able to exit, so when the near root
        # is behind t_min the FAR root -b + sqrt(disc) is accepted —
        # smallest-positive-root semantics (the pallas kernel's mode-5
        # group computes the identical expression). Opaque spheres keep
        # the reference's near-root-only pass-through convention
        # (`shaders.metal:69-85`), statically so for glass-free scenes.
        tf = -b + root
        far_ok = (disc > 0.0) & (tf > t_min) & (scene.sph_ior > 0.0)[None, :]
        ts = jnp.where(ok, ts, jnp.where(far_ok, tf, ts))
        ok = ok | far_ok
    return jnp.where(ok, ts, BIG)


def _merge_spheres(scene, o, d, t_min, t, idx):
    """Fold sphere hits into a plane-backend (t, idx) result; sphere i
    reports index num_planes + i. Strictly-closer wins, so an exact
    plane/sphere tie keeps the plane (measure-zero)."""
    ts = sphere_ts(scene, o, d, t_min)
    ts_min = jnp.min(ts, axis=-1)
    s_idx = jnp.argmin(ts, axis=-1).astype(jnp.int32)
    better = ts_min < t
    return (
        jnp.where(better, ts_min, t),
        jnp.where(better, scene.num_planes + s_idx, idx),
    )


def _dense_nearest(scene, o, d, t_min, dot3):
    """Shared dense all-primitives nearest hit, parameterized on the
    [R,3]x[P,3] contraction (nearest_hit_brute passes a matmul;
    nearest_hit_exact passes explicit FMAs that never touch the MXU)."""
    on = dot3(o, scene.normal)       # [R, P]
    dn = dot3(d, scene.normal)
    t = (scene.d[None, :] - on) / dn
    s1 = dot3(o, scene.w1) + t * dot3(d, scene.w1) - scene.b1[None, :]
    s2 = dot3(o, scene.w2) + t * dot3(d, scene.w2) - scene.b2[None, :]
    # Upper acceptance bound by primitive class: quads test each
    # barycentric-style coordinate against 1; triangles (kind 3) test
    # their SUM — s1/s2 are the true barycentric coordinates of the
    # (u, v) edge pair, so s1 + s2 <= 1 cuts the parallelogram along
    # its diagonal (scene/builder.py Scene.kind).
    ok = (
        scene.valid[None, :]
        & (dn != 0.0)
        & (t > t_min)
        & (s1 >= 0.0) & (s2 >= 0.0)
        & jnp.where(
            scene.is_tri[None, :],
            s1 + s2 <= 1.0,
            (s1 <= 1.0) & (s2 <= 1.0),
        )
    )
    t = jnp.where(ok, t, BIG)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    t = jnp.min(t, axis=-1)
    if scene.num_spheres:
        return _merge_spheres(scene, o, d, t_min, t, idx)
    return t, idx


def nearest_hit_brute(
    scene: DeviceScene, o: jnp.ndarray, d: jnp.ndarray, t_min: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All-primitives nearest hit. o, d: [R, 3] -> (t [R], idx [R]).

    The plane equation t = (c - o.n)/(d.n) and both edge projections expand
    into ray-matrix contractions against precomputed per-plane constants, so
    the whole scene test is six [R,3]x[3,P] matmuls + elementwise selects.
    Ties pick the lowest plane index (the reference's pick among coincident
    planes is BVH-traversal-order dependent; any consistent rule matches one
    valid reference ordering). Scenes with spheres fold them in via
    ``sphere_ts``; sphere i is index num_planes + i (statically absent
    for sphere-free scenes — the generated mazes trace unchanged).
    """
    return _dense_nearest(scene, o, d, t_min, lambda a, b: a @ b.T)


def nearest_hit_exact(
    scene: DeviceScene, o: jnp.ndarray, d: jnp.ndarray, t_min: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """nearest_hit_brute with full-f32 arithmetic (the EXACT backend).

    On TPU hardware the MXU truncates f32 matmul inputs to bf16
    (single-pass, measured bitwise — PERF.md "hardware numerics"), so
    nearest_hit_brute's contractions carry ~2^-8 input error. Here each
    contraction is written as explicit per-component multiply-adds —
    three broadcast FMAs the VPU executes in full f32 (and a form XLA's
    algebraic simplifier does not rewrite into a dot) — giving the same
    exactness class as the BVH traversal's gathered FMAs at dense-path
    speed: measured 14.8 us vs brute's 11.3 us per 12,288-ray segment at
    config-2 scale, where the traversal costs ~2-5 ms (PERF.md "bvh
    floor decomposition"). This is the hardware-side validation
    reference (`bench.py --validate`) and a practical exact render
    backend (``intersector="exact"``) for small/medium scenes; unlike
    the traversal it is O(R*P), so very large scenes still belong to
    pallas (tiles + skip) or bvh.
    """

    def dot3(a, b):
        return (
            a[:, 0:1] * b[None, :, 0]
            + a[:, 1:2] * b[None, :, 1]
            + a[:, 2:3] * b[None, :, 2]
        )

    return _dense_nearest(scene, o, d, t_min, dot3)


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

    Every ray walks its own path: descends the nearer child first,
    pushes the farther child when also hit, and tests up to max_leaf
    primitives per leaf under masks. Rays whose work runs out go
    inactive; the while_loop exits when all are done.

    TPU memory layout (the first version gathered ~25 separate [R]
    columns per iteration and ran gather-bound): per-iteration state is
    fetched by THREE row gathers — node ints [M, 2] (count, left_first),
    BOTH children's AABBs packed at the parent row [M, 12], and one
    leaf-ordered plane-constant row [N, 15] per slot (prim indirection
    pre-resolved, the plane id riding along as an f32 column). The
    stack itself is stack-major [S, R] with one-hot level select/merge
    (no scatter/gather at all — see the inline comment), and the nearer
    child is followed DIRECTLY (only the far child is pushed). Visit
    order, tie
    behavior (first-visited strictly-closer wins), and all acceptance
    arithmetic are identical to the reference traversal, so results
    match `nearest_hit_brute` exactly (tested).
    """
    n_rays = o.shape[0]
    m = scene.bvh_min.shape[0]
    inv = 1.0 / d  # loop-invariant slab reciprocals (bitwise = ray_aabb's)

    # Packed traversal operands — built from the DeviceScene fields here
    # (cheap: O(M + N) concats), hoisted out of the loop by XLA.
    # left_first indexes prim slots for leaves, so clip for the (masked)
    # child-box rows.
    #
    # TPU gather cost is per-INDEX, not per-byte (PERF.md), so the loop
    # body performs exactly TWO row gathers per iteration:
    # - noderow [M, 14]: BOTH children's AABBs + (count, left_first) as
    #   exact small-int f32 columns — one gather where node ints and
    #   child boxes used to be two;
    # - leafpack [N, max_leaf*15]: every leaf's FULL primitive list
    #   pre-packed at its first slot row (slot j's row holds plane rows
    #   j..j+max_leaf-1), so a leaf visit fetches ALL its primitives in
    #   one gather where each used to take its own (max_leaf gathers).
    lc_all = jnp.clip(scene.bvh_left_first, 0, m - 1)
    rc_all = jnp.clip(scene.bvh_left_first + 1, 0, m - 1)
    noderow = jnp.concatenate(
        [scene.bvh_min[lc_all], scene.bvh_max[lc_all],
         scene.bvh_min[rc_all], scene.bvh_max[rc_all],
         scene.bvh_count.astype(jnp.float32)[:, None],
         scene.bvh_left_first.astype(jnp.float32)[:, None]], axis=-1
    )                                                          # [M, 14]
    pid_all = scene.bvh_prim
    plane = jnp.concatenate(
        [scene.normal[pid_all], scene.d[pid_all][:, None],
         scene.w1[pid_all], scene.b1[pid_all][:, None],
         scene.w2[pid_all], scene.b2[pid_all][:, None],
         scene.valid[pid_all].astype(jnp.float32)[:, None],
         pid_all.astype(jnp.float32)[:, None],
         scene.is_tri[pid_all].astype(jnp.float32)[:, None]], axis=-1
    )                                                          # [N, 15]
    n_slots = plane.shape[0]
    # Leaf rows are contiguous slot runs (left_first..left_first+ct-1),
    # so shifting the plane table max_leaf-1 times and concatenating on
    # the feature axis puts every leaf's whole list on its first row.
    # Rows past a leaf's count hold the NEXT slots' planes — garbage the
    # k < ct mask already rejects (zero pad rows likewise fail valid>0).
    pad = jnp.zeros((max(max_leaf - 1, 0), plane.shape[1]), plane.dtype)
    plane_pad = jnp.concatenate([plane, pad], axis=0)
    leafpack = jnp.concatenate(
        [plane_pad[k: k + n_slots] for k in range(max_leaf)], axis=-1
    )                                                          # [N, L*15]

    def slab(bmin, bmax, t_cur):
        # Same arithmetic as ray_aabb (inv hoisted — identical value).
        t1 = (bmin - o) * inv
        t2 = (bmax - o) * inv
        tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tf >= tn) & (tn < t_cur) & (tf > 0.0)
        return jnp.where(hit, tn, BIG)

    t0 = jnp.full((n_rays,), BIG, dtype=jnp.float32)
    idx0 = jnp.zeros((n_rays,), dtype=jnp.int32)
    # Stack-MAJOR [S, R] with one-hot select/merge: a per-ray [R, S]
    # stack needs an R-index scatter per push and gather per pop, and
    # TPU scatter/gather cost is per-INDEX (PERF.md, the chunk-major
    # screen lesson). S is tiny (exact derived depth + 2), so a level
    # mask + where is ~4S pure-VPU elementwise ops instead.
    n_levels = max_depth + 2
    stack0 = jnp.zeros((n_levels, n_rays), dtype=jnp.int32)
    levels = jnp.arange(n_levels, dtype=jnp.int32)[:, None]   # [S, 1]
    sp0 = jnp.zeros((n_rays,), dtype=jnp.int32)
    cur0 = jnp.zeros((n_rays,), dtype=jnp.int32)   # start at the root
    live0 = jnp.ones((n_rays,), dtype=bool)

    def cond(st):
        return jnp.any(st[5])

    def body(st):
        t, idx, stack, sp, cur, live = st
        nr = noderow[cur]                          # [R, 14] — gather 1 of 2
        ct = nr[:, 12].astype(jnp.int32)
        lf = nr[:, 13].astype(jnp.int32)
        is_leaf = ct >= 1

        # Leaf: ONE gather fetches the whole packed primitive list
        # (`shaders.metal:128`); arithmetic identical to the per-slot
        # form. For interior nodes lf is a child NODE id (garbage as a
        # slot row) — clipped and fully masked by is_leaf.
        lp = leafpack[jnp.clip(lf, 0, n_slots - 1)]  # [R, L*15] — gather 2
        for k in range(max_leaf):
            pk = lp[:, 15 * k: 15 * (k + 1)]       # [R, 15]
            nrm = pk[:, 0:3]
            denom = jnp.sum(d * nrm, axis=-1)
            tk = (pk[:, 3] - jnp.sum(o * nrm, axis=-1)) / denom
            x = o + tk[..., None] * d
            s1 = jnp.sum(x * pk[:, 4:7], axis=-1) - pk[:, 7]
            s2 = jnp.sum(x * pk[:, 8:11], axis=-1) - pk[:, 11]
            ok = (
                (pk[:, 12] > 0.0)
                & (denom != 0.0)
                & (tk > t_min)
                & (s1 >= 0.0) & (s2 >= 0.0)
                & jnp.where(
                    pk[:, 14] > 0.0,            # triangle (kind 3)
                    s1 + s2 <= 1.0,
                    (s1 <= 1.0) & (s2 <= 1.0),
                )
            )
            upd = live & is_leaf & (k < ct) & ok & (tk < t)
            t = jnp.where(upd, tk, t)
            idx = jnp.where(upd, pk[:, 13].astype(jnp.int32), idx)

        # Interior: ordered descent (`shaders.metal:134-154`) — follow
        # the near child directly; push only the far child.
        boxes = nr[:, 0:12]
        d1 = slab(boxes[:, 0:3], boxes[:, 3:6], t)
        d2 = slab(boxes[:, 6:9], boxes[:, 9:12], t)
        near = jnp.where(d1 <= d2, lf, lf + 1)
        far = jnp.where(d1 <= d2, lf + 1, lf)
        dn = jnp.minimum(d1, d2)
        df = jnp.maximum(d1, d2)
        interior = live & ~is_leaf
        go_near = interior & (dn < BIG)
        push_far = go_near & (df < BIG)

        slot_p = jnp.minimum(sp, n_levels - 1)
        put = (levels == slot_p[None, :]) & push_far[None, :]
        stack = jnp.where(put, far[None, :], stack)
        sp = sp + push_far.astype(sp.dtype)

        # Advance: near child, else pop the most recent far, else done.
        need_pop = live & ~go_near                 # incl. every leaf visit
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        take = levels == jnp.maximum(sp, 0)[None, :]
        popped = jnp.sum(jnp.where(take, stack, 0), axis=0)
        cur = jnp.where(go_near, near, jnp.where(can_pop, popped, cur))
        live = live & (go_near | can_pop)
        return t, idx, stack, sp, cur, live

    t, idx, *_ = jax.lax.while_loop(
        cond, body, (t0, idx0, stack0, sp0, cur0, live0)
    )
    if scene.num_spheres:
        # Spheres sit outside the plane BVH (their count is small and
        # scene-author-controlled); one dense pass after the traversal —
        # exactly the brute backend's fold, so both backends agree.
        return _merge_spheres(scene, o, d, t_min, t, idx)
    return t, idx
