"""Pallas wavefront path tracer — the fused TPU megakernel.

This is the TPU-native recast of the reference's Metal compute kernel
(`shaders.metal:245-368`). One pallas program owns a block of B rays
living entirely in VMEM; the whole bounce loop (nearest-hit search,
shading, scattering, RNG) runs on-chip, so no [rays x planes]
intermediate ever touches HBM.

The nearest-hit search is structured around the MXU (v2 design; the v1
kernel swept the plane table with a scalar fori_loop at ~45 VPU ops per
(ray, plane) pair and was VPU-bound at ~30 Mrays/s):

- Per-ray state (positions, directions, throughput, light, RNG, masks)
  rides WIDE — (8, B/8) blocks filling whole (8, 128) vregs — so the
  shading/scatter/RNG stage runs at full VPU utilization (as [1, B]
  rows it ran at 1/8 and was ~40% of the kernel; PERF.md "layout
  lesson"). Rays-on-lanes layout is materialized only around the MXU.
- All six per-(ray, plane) dot products that a ray-rect test needs
  (`shaders.metal:51-67`: plane-equation numerator/denominator and the
  two edge projections of the hit point, each split into its origin- and
  direction-dependent halves) are ONE matmul on the MXU:
      A[6P, B] = W[6P, 8] @ G[8, B]
  where G stacks (ox,oy,oz,1,dx,dy,dz,0) and W packs plane constants.
  The MXU runs concurrently with the VPU, so these ~30 of the ~45
  per-pair flops become (nearly) free.
- The remaining hit test is ~15 elementwise VPU ops on [P, B] tiles:
      t = numer/denom; s1 = o1 + t*d1; s2 = o2 + t*d2;
      ok = (t > t_min) & (0 <= s1 <= 1) & (0 <= s2 <= 1)
  followed by a sublane min-reduction for the nearest t.
- The hit plane's properties (normal/albedo/emission/mirror flag) are
  selected without gathers by a second matmul: the one-hot nearest mask
  [P, B] contracted against the property table [32, P] on the MXU
  (split-precision rows: bf16-exact hi + f32 residual, folded after).
- Invalid / padding planes are encoded directly in W (numerator -1,
  denominator 0 => t = -inf, always rejected) so no validity lane-ops
  are spent.

Mapping from the reference:
- threadgroup-of-1024-threads per 4x4 chunk  ->  grid program per block
  of B rays;
- per-thread BVH stack traversal (`shaders.metal:115-156`)  ->  dense
  all-planes test via MXU matmuls (branchless; wins over a divergent
  stack walk below a few thousand planes, SURVEY.md section 7 "hard
  parts" #1);
- the data-dependent `for n < bounce_limit + mirror_hits` loop
  (`shaders.metal:306`)  ->  a while_loop with per-lane liveness masks
  and an all-dead early exit;
- PCG hash + noise texture RNG (`shaders.metal:181-186, 288-300`)  ->
  the same PCG hash, vectorized per lane (portable across Mosaic and
  the interpreter, unlike pltpu.prng_random_bits);
- rejection-sampled unit vectors (`shaders.metal:315-318`)  ->
  closed-form (z, phi) sphere sampling (distribution-equivalent, fixed
  shape);
- threadgroup tree reduction (`shaders.metal:342-367`)  ->  plain jnp
  mean over the sample axis outside the kernel.

Scene encoding: one Morton-ordered [P, 32] float32 table (see PLANE_COLS)
built once at upload, together with its packed matmul operands
(pack_intersection_tables -> DeviceScene.mxu_*). Scenes beyond 128 planes
are processed in spatially-compact plane tiles with a conservative
per-tile AABB skip, so both VMEM use and per-segment work stay bounded at
config-5 scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TracerConfig

BIG = 1e30
LANES = 128

# Stage-stub ablation switch for kernel anatomy measurements (PERF.md
# methodology: each variant's frame time is normalized by its own
# measured segments/tiles, because ablations change ray termination).
# Read at TRACE time; default "" is the production kernel. Values:
#   "noskip" — run every tile unconditionally (cond removed; the then-
#              unused slab arithmetic is likely DCE'd by the compiler —
#              bounded at <= 0.8% of the config-5 frame by the
#              slab_precompute measurement, so the anatomy's
#              fixed/per-tile split is unaffected at that scale):
#              isolates the skip's win and the per-tile true cost at
#              full tile count;
#   "nodot"  — replace the hit-test MXU dot with a cheap broadcast
#              multiply: isolates the MXU stage.
# IMAGE-AFFECTING (except noskip): measurement tools only. A "nosel"
# variant (skip the select dot) CRASHED the axon server's Mosaic
# compiler (jellyfish lowering check failure) and took the relay down —
# removed; do not reintroduce degenerate-stage stubs on this target.
import os as _os

_ABLATE = _os.environ.get("MMX_KERNEL_ABLATE", "")

# Column layout of the plane table.
PLANE_COLS = dict(
    normal=(0, 3), d=3, w1=(4, 7), b1=7, w2=(8, 11), b2=11,
    color=(12, 15), emission=(15, 18),  # premultiplied rgb * strength
    is_mirror=18, valid=19,
    aabb_lo=(20, 23), aabb_hi=(23, 26),  # quad bounding box
    kind=26,  # closed-world test class (scene/builder.py Scene.kind)
    ior=27,   # dielectric index of refraction (0 = opaque, Scene.ior)
    tex_kind=28,  # procedural texture (0 none / 1 UV / 2 world checker)
    tex_scale=29,
    tex_color2=(30, 33),
)
PLANE_WIDTH = 40
PROP_WIDTH = 16  # rows of one property block of the transposed table


def build_plane_table(der, scene=None) -> np.ndarray:
    """Pack SceneDerived into the kernel's [P, 32] table.

    When the raw Scene is given, columns 20:26 carry each quad's AABB
    (over all four parallelogram corners), which feeds the kernel's
    per-tile conservative skip. Without a scene the AABB columns default
    to (-BIG, +BIG) — infinite boxes that disable the skip rather than
    silently skipping everything."""
    p = der.normal.shape[0]
    t = np.zeros((p, PLANE_WIDTH), np.float32)
    t[:, 20:23] = -BIG
    t[:, 23:26] = BIG
    t[:, 0:3] = der.normal
    t[:, 3] = der.d
    t[:, 4:7] = der.w1
    t[:, 7] = der.b1
    t[:, 8:11] = der.w2
    t[:, 11] = der.b2
    t[:, 12:15] = der.color
    t[:, 15:18] = der.emission[:, :3] * der.emission[:, 3:4]
    t[:, 18] = der.is_mirror.astype(np.float32)
    t[:, 19] = der.valid.astype(np.float32)
    if scene is not None:
        o = np.asarray(scene.origin, np.float32)
        u = np.asarray(scene.u, np.float32)
        v = np.asarray(scene.v, np.float32)
        corners = np.stack([o, o + u, o + v, o + u + v], axis=1)  # [P,4,3]
        t[:, 20:23] = corners.min(axis=1)
        t[:, 23:26] = corners.max(axis=1)
        # Triangles (kind 3) span only the three corners o, o+u, o+v —
        # dropping the parallelogram's far corner keeps their tile
        # AABBs tight (better slab-skip culling on dense meshes).
        tri = np.asarray(scene.kind) == 3
        if tri.any():
            c3 = corners[:, :3]
            t[tri, 20:23] = c3.min(axis=1)[tri]
            t[tri, 23:26] = c3.max(axis=1)[tri]
        t[:, 26] = np.asarray(scene.kind, np.float32)
        t[:, 27] = np.asarray(scene.ior, np.float32)
        t[:, 28] = np.asarray(scene.tex_kind, np.float32)
        t[:, 29] = np.asarray(scene.tex_scale, np.float32)
        t[:, 30:33] = np.asarray(scene.tex_color2, np.float32)
    return t


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


PLANE_TILE = 128  # planes per VMEM tile of the nearest-hit sweep


def _morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit integer arrays into Morton codes (the
    shared ops/morton.py interleave — same curve as the chunk-window
    sort, by construction)."""
    from ..ops.morton import morton2

    return morton2(x.astype(np.uint64), y.astype(np.uint64))


def spatial_plane_order(plane_table) -> np.ndarray:
    """Plane permutation clustering nearby planes into the same tile.

    Sorts by Morton code of the quad AABB midpoint's (x, z) so each
    128-plane tile covers a compact maze region with a tight AABB — the
    basis of the kernel's per-tile conservative skip (world-spanning
    planes like the floor simply make their own tile unskippable).
    Stable, so coincident planes keep their original relative order.
    """
    return np.argsort(spatial_plane_order_key(plane_table), kind="stable")


def spatial_plane_order_key(plane_table) -> np.ndarray:
    """Morton code [P] of each quad's AABB midpoint (x, z)."""
    t = np.asarray(plane_table)
    lo, hi = t[:, 20:23], t[:, 23:26]
    cx = (lo[:, 0] + hi[:, 0]) * 0.5
    cz = (lo[:, 2] + hi[:, 2]) * 0.5
    qx = np.clip((cx - cx.min()) * 8.0, 0, 65535).astype(np.uint64)
    qz = np.clip((cz - cz.min()) * 8.0, 0, 65535).astype(np.uint64)
    return _morton2(qx, qz)


# Quantities per W tile by test mode (closed-world specialization):
# mode 0 (full rect test) needs all 6; mode 1 (along-wall only) needs 4;
# mode 2 (plane test only) needs numer/denom. Mode 3 is the SPHERE
# group (render/intersect.py sphere_ts): the quadratic's b and q terms
# are affine in (o, d), so they ride the same fused MXU dot as the
# plane quantities — 2 rows per sphere. Mode 4 is the TRIANGLE group
# (Scene.kind == 3): the same 6 plane quantities as mode 0, with the
# barycentric acceptance s1 >= 0, s2 >= 0, s1 + s2 <= 1 in place of
# the quad's per-edge [0, 1] tests. Modes 5-7 are the GLASS groups
# (Scene.ior > 0): 5 = glass spheres (mode-3 quadratic with
# smallest-POSITIVE-root acceptance — a closed glass surface must be
# exit-able from inside), 6 = glass quads (mode-0 test), 7 = glass
# triangles (mode-4 test). Their existence in the group structure is
# what makes the kernel's dielectric shading stage STATIC: glass-free
# scenes compile the identical pre-dielectric program.
MODE_QUANTITIES = {0: 6, 1: 4, 2: 2, 3: 2, 4: 6, 5: 2, 6: 6, 7: 6}


def _pack_group(t: np.ndarray, mode: int, tile: int = PLANE_TILE,
                textured: bool = False):
    """Pack one kind-homogeneous [Pk, 32] sub-table into tiled matmul
    operands: (W [T, q*PT, 8], propsT [T, 32, PT], aabbs [T, 8]) with
    q = MODE_QUANTITIES[mode] and PT = min(Pk8, tile). Row blocks
    of W within a tile, in units of PT (modes keep a prefix of this):
      0: numerator   = d - O.n        -> coeffs [-n, d | 0]
      1: denominator = D.n            -> coeffs [0    | n, 0]
      2: o1 = O.w1 - b1               -> coeffs [w1, -b1 | 0]
      3: d1 = D.w1                    -> coeffs [0    | w1, 0]
      4: o2 = O.w2 - b2               -> coeffs [w2, -b2 | 0]
      5: d2 = D.w2                    -> coeffs [0    | w2, 0]
    against G rows (ox, oy, oz, 1, dx, dy, dz, 0). Invalid or padding
    planes get numerator -1 and denominator 0, so t = NaN/-inf and every
    hit test rejects them with zero extra lane work.

    Runs in HOST NumPy on the concrete table: eager device ops here
    each paid a small-program compile over the remote-dispatch tunnel
    (measured 36-72 s of upload_scene's one-time cost; bf16 split via
    ml_dtypes matches the XLA convert bit-for-bit).
    """
    p = t.shape[0]
    pt = min(_round_up(p, 8), tile)
    n_tiles = -(-_round_up(p, 8) // pt)
    p8 = n_tiles * pt
    t = np.pad(t, ((0, p8 - p), (0, 0)))
    valid = t[:, 19:20] > 0.0

    # Per-tile conservative AABBs for the kernel's slab-test skip.
    # Padding/invalid rows get an empty box (lo=+BIG, hi=-BIG) so they
    # never un-skip a tile. The 1e-2 inflation absorbs the
    # approximate-reciprocal slab error so the skip stays conservative.
    lo = np.where(valid, t[:, 20:23], BIG).reshape(n_tiles, pt, 3)
    hi = np.where(valid, t[:, 23:26], -BIG).reshape(n_tiles, pt, 3)
    aabbs = np.concatenate(
        [lo.min(axis=1) - 1e-2, hi.max(axis=1) + 1e-2,
         np.zeros((n_tiles, 2), np.float32)], axis=1
    ).astype(np.float32)                                      # [T, 8]

    n = np.where(valid, t[:, 0:3], 0.0)
    d = np.where(valid, t[:, 3:4], -1.0)
    w1, b1 = t[:, 4:7], t[:, 7:8]
    w2, b2 = t[:, 8:11], t[:, 11:12]
    z1 = np.zeros((p8, 1), np.float32)
    z4 = np.zeros((p8, 4), np.float32)

    quantities = [
        np.concatenate([-n, d, z4], axis=1),                 # numer
        np.concatenate([z4, n, z1], axis=1),                 # denom
        np.concatenate([w1, -b1, z4], axis=1),               # o1
        np.concatenate([z4, w1, z1], axis=1),                # d1
        np.concatenate([w2, -b2, z4], axis=1),               # o2
        np.concatenate([z4, w2, z1], axis=1),                # d2
    ][: MODE_QUANTITIES[mode]]
    # [q, T, PT, 8] -> [T, q*PT, 8] (quantity-major inside each tile)
    q = np.stack([x.reshape(n_tiles, pt, 8) for x in quantities], axis=1)
    w = q.reshape(n_tiles, len(quantities) * pt, 8)

    props = np.concatenate(
        [
            t[:, 0:3],     # normal
            t[:, 12:15],   # albedo
            t[:, 15:18],   # emission (premultiplied)
            t[:, 18:19],   # is_mirror
            np.zeros((p8, 2), np.float32),   # (sphere-only rows 10-11)
            # Row 12: dielectric ior (PLANE_COLS ior). Zero on every
            # opaque group by the kind/ior partition, so the kernel's
            # selected row 12 is the winner's ior with no masking.
            np.where(valid, t[:, 27:28], 0.0),
            np.zeros((p8, PROP_WIDTH - 13), np.float32),
        ],
        axis=1,
    )                                                          # [P8, 16]
    if textured:
        # Second property block (textured scenes only — the kernel's
        # select dot stays ONE MXU M-tile at 64 rows, so this is free
        # on the matmul): texture params + the dual-basis constants the
        # kernel needs to rebuild the winner's (s1, s2) for UV checkers.
        props2 = np.concatenate(
            [
                np.where(valid, t[:, 28:29], 0.0),   # tex_kind
                np.where(valid, t[:, 29:30], 1.0),   # tex_scale
                t[:, 30:33],                          # tex_color2
                t[:, 4:7], t[:, 7:8],                 # w1, b1
                t[:, 8:11], t[:, 11:12],              # w2, b2
                np.zeros((p8, PROP_WIDTH - 13), np.float32),
            ],
            axis=1,
        )                                                      # [P8, 16]
        props = np.concatenate([props, props2], axis=1)       # [P8, 32]
    # SPLIT-PRECISION select operand: on hardware the MXU truncates f32
    # matmul inputs to bf16 (single-pass; measured bitwise on v5e), so a
    # plain props operand returns bf16(property) — up to 2^-8 relative
    # error on every selected normal/albedo/emission whose value is not
    # bf16-exact (the generated maze's axis-aligned normals and snapped
    # constants mostly are; arbitrary scenes are not — measured as a
    # systematic ~1e-3..1e-2 luminance error on random quad soups,
    # PERF.md "hardware numerics"). Storing bf16-exact hi rows plus f32
    # residual rows and selecting BOTH through the same one-hot recovers
    # ~2^-17 relative precision for free: 32 rows is still one MXU
    # M-tile, so the pass count (the stage's whole cost) is unchanged,
    # and the fold-back is one VPU add. hi is bf16-representable so its
    # product is exact; the residual (exact in f32 by Sterbenz — hi is
    # within 2^-8 of props) only suffers its OWN bf16 truncation,
    # leaving ~2^-17 total. Under the exact CPU interpreter
    # hi + residual == props bitwise, so goldens are unchanged.
    hi = props.astype(ml_dtypes.bfloat16).astype(np.float32)
    props = np.concatenate([hi, props - hi], axis=1)    # [P8, 32 or 64]
    props_t = props.reshape(n_tiles, pt, props.shape[1]).transpose(0, 2, 1)
    return w, props_t, aabbs


SPHERE_WIDTH = 18  # columns of the sphere table (build_sphere_table)


def build_sphere_table(scene) -> np.ndarray:
    """Pack Scene sphere arrays into the kernel's [S, 18] table:
    0:3 center, 3 inv_r, 4 |c|^2 - r^2, 5:8 albedo, 8:11 premultiplied
    emission, 11 is_mirror, 12 ior (0 = opaque, Scene.sph_ior),
    13 tex_kind, 14 tex_scale, 15:18 tex_color2. c2r2 is summed in
    float64 then rounded once (the same constant upload_scene derives
    for the jnp backends)."""
    c = np.asarray(scene.sph_center, np.float32)
    r = np.asarray(scene.sph_radius, np.float32)
    em = np.asarray(scene.sph_emission, np.float32)
    t = np.zeros((c.shape[0], SPHERE_WIDTH), np.float32)
    t[:, 0:3] = c
    t[:, 3] = 1.0 / r
    t[:, 4] = (
        np.sum(c.astype(np.float64) ** 2, axis=-1)
        - r.astype(np.float64) ** 2
    ).astype(np.float32)
    t[:, 5:8] = np.asarray(scene.sph_color, np.float32)
    t[:, 8:11] = em[:, :3] * em[:, 3:4]
    t[:, 11] = np.asarray(scene.sph_is_mirror).astype(np.float32)
    t[:, 12] = np.asarray(scene.sph_ior, np.float32)
    t[:, 13] = np.asarray(scene.sph_tex_kind, np.float32)
    t[:, 14] = np.asarray(scene.sph_tex_scale, np.float32)
    t[:, 15:18] = np.asarray(scene.sph_tex_color2, np.float32)
    return t


def _bf16_round_trip(xp, x):
    """bf16(x) as float32 — round-to-nearest-even, host and IN-JIT.

    The host path is ml_dtypes (what the plane packer uses). The traced
    path MUST NOT be ``astype(bf16).astype(f32)``: on TPU, XLA folds
    that up-down convert chain to the identity (measured on silicon,
    round 4 — refreshed props arrived un-split, hi = x and residual 0,
    silently discarding the split-precision select's whole point), so
    the rounding is spelled in integer bit ops the compiler cannot
    elide: u + 0x7FFF + (u >> 16 & 1), truncate — classic RNE to the
    top 16 bits, bitwise-equal to ml_dtypes for all finite values
    (pinned by tests on CPU and by the silicon refresh check)."""
    if xp is np:
        return x.astype(ml_dtypes.bfloat16).astype(np.float32)
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = (
        u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    ) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32)


def _sphere_group_ops(xp, t, tile: int, textured: bool):
    """Sphere-group packing, parameterized over the array namespace so
    the HOST packer (xp=numpy, upload time — eager device ops here paid
    36-72 s of remote-tunnel compiles, see _pack_group) and the IN-JIT
    twin (xp=jax.numpy, per-step — dynamic sphere centers) are one
    implementation that cannot drift. Pack the [S, 18] sphere table
    (build_sphere_table) into tiled matmul operands
    (W [T, 2*PT, 8], propsT [T, 32, PT], aabbs [T, 8]) — the mode-3
    analog of _pack_group. W row blocks per tile (quantity-major):
      0: b-part  = -D.c                 -> coeffs [0, 0      | -c, 0]
      1: q-part  = -2 O.c + (|c|^2-r^2) -> coeffs [-2c, c2r2 | 0, 0]
    so with the per-ray scalars s_do = D.O and s_oo = |O|^2 the hit
    test is b = s_do + A0, disc = b^2 - (s_oo + A1),
    t = -b - sqrt(disc), accepted when disc > 0 and t > t_min
    (render/intersect.py sphere_ts — the corrected form of the
    reference's dead sphere intersector, `shaders.metal:69-85`).
    Padding rows get q-constant +BIG: disc = b^2 - (s_oo + BIG) < 0
    for any live ray, so they never hit. Property rows: 0:3 CENTER
    (the normal is reconstructed post-select as (hit - c) * inv_r),
    3:6 albedo, 6:9 emission, 9 is_mirror, 10 inv_r, 11 is_sphere=1.
    """
    s = t.shape[0]
    pt = min(_round_up(s, 8), tile)
    n_tiles = -(-_round_up(s, 8) // pt)
    s8 = n_tiles * pt
    valid = np.arange(s8)[:, None] < s      # static (shape-derived)
    t = xp.pad(t, ((0, s8 - s), (0, 0)))

    c = t[:, 0:3]
    lo = xp.where(valid, c - 1.0 / xp.where(valid, t[:, 3:4], 1.0), BIG)
    hi = xp.where(valid, c + 1.0 / xp.where(valid, t[:, 3:4], 1.0), -BIG)
    lo = lo.reshape(n_tiles, pt, 3)
    hi = hi.reshape(n_tiles, pt, 3)
    aabbs = xp.concatenate(
        [lo.min(axis=1) - 1e-2, hi.max(axis=1) + 1e-2,
         xp.zeros((n_tiles, 2), np.float32)], axis=1
    ).astype(np.float32)                                      # [T, 8]

    z3 = xp.zeros((s8, 3), np.float32)
    z1 = xp.zeros((s8, 1), np.float32)
    c2r2 = xp.where(valid, t[:, 4:5], BIG)
    quantities = [
        xp.concatenate([z3, z1, -c, z1], axis=1),             # b-part
        xp.concatenate([-2.0 * c, c2r2, z3, z1], axis=1),     # q-part
    ]
    q = xp.stack([x.reshape(n_tiles, pt, 8) for x in quantities], axis=1)
    w = q.reshape(n_tiles, 2 * pt, 8)

    vf = valid.astype(np.float32)
    props = xp.concatenate(
        [
            c * vf,                # center (normal reconstruction)
            t[:, 5:8],             # albedo
            t[:, 8:11],            # emission (premultiplied)
            t[:, 11:12],           # is_mirror
            t[:, 3:4] * vf,        # inv_r
            xp.asarray(vf),        # is_sphere flag
            t[:, 12:13] * vf,      # ior (0 = opaque; mode-5 group only)
            xp.zeros((s8, PROP_WIDTH - 13), np.float32),
        ],
        axis=1,
    )                                                          # [S8, 16]
    if textured:
        # Second block (textured scenes): texture params; the dual-
        # basis slots stay zero (UV checkers are undefined on spheres —
        # Scene validation rejects sph_tex_kind 1).
        props2 = xp.concatenate(
            [
                t[:, 13:14] * vf,                     # tex_kind
                xp.where(valid, t[:, 14:15], 1.0),   # tex_scale
                t[:, 15:18],                          # tex_color2
                xp.zeros((s8, PROP_WIDTH - 5), np.float32),
            ],
            axis=1,
        )
        props = xp.concatenate([props, props2], axis=1)       # [S8, 32]
    hi_p = _bf16_round_trip(xp, props)
    props = xp.concatenate([hi_p, props - hi_p], axis=1)
    props_t = props.reshape(n_tiles, pt, props.shape[1]).transpose(0, 2, 1)
    return w, props_t, aabbs


def _pack_sphere_group(t: np.ndarray, tile: int = PLANE_TILE,
                       textured: bool = False):
    """Host-NumPy sphere-group packer (upload time) — see
    _sphere_group_ops for the layout contract."""
    return _sphere_group_ops(np, np.asarray(t), tile, textured)


def pack_sphere_group_jnp(t, tile: int = PLANE_TILE,
                          textured: bool = False):
    """In-jit twin of _pack_sphere_group over a TRACED [S, 18] sphere
    table: bitwise-identical operands on equal input (same
    _sphere_group_ops code path; tests/test_multiplayer.py pins it).
    This is what makes sphere MXU operands DYNAMIC: deriving them from
    scene ARGUMENTS inside the jitted step lets moved sphere centers
    (multiplayer avatars, parallel/multiplayer.py) reach the pallas
    kernel with no recompile and no host repack — upload-time packing
    alone would bake the avatars' park positions."""
    return _sphere_group_ops(jnp, jnp.asarray(t), tile, textured)


def pack_intersection_tables(plane_table, tile_by_mode=None,
                             sphere_table=None):
    """Derive the kernel's matmul operands from the [P, 32] plane table.

    Returns an 8-tuple indexed by test mode: entries 0-2 the OPAQUE
    planes by closed-world kind (Scene.kind), entry 3 the opaque sphere
    group, entry 4 the opaque TRIANGLE group (plane rows of kind 3,
    packed like mode 0 but with the barycentric acceptance — see
    tile_tv_from_a), entries 5-7 the GLASS groups (ior > 0): 5 glass
    spheres (smallest-positive-root acceptance), 6 glass quads (full
    mode-0 test regardless of kind — always correct), 7 glass
    triangles. Entry k is None when the scene has no mode-k primitives,
    else the tiled (W, propsT, aabbs) operands from
    _pack_group/_pack_sphere_group — tiles of at most PLANE_TILE
    primitives (overridable per mode via ``tile_by_mode``, a
    {mode: tile} dict) so [prims, rays] intermediates stay
    VMEM-resident at ANY scene size (config 5's 64x64 maze has
    thousands of planes).
    The tuple's None/operand structure is static under jit; the
    kind/ior partition itself requires a CONCRETE table (it is done
    once at scene upload — see DeviceScene.mxu_tables). In particular
    the presence of any mode-5/6/7 entry is what statically enables
    the kernel's dielectric shading stage.

    ``sphere_table`` is a concrete [S, 18] array from
    build_sphere_table (None or empty for plane-only scenes — whose
    operand structure, and therefore traced kernel, is unchanged).
    Tables without kind info (column 26 zero) land entirely in mode 0,
    preserving the unspecialized behavior.
    """
    t = np.asarray(plane_table)
    kinds = t[:, 26].astype(np.int32)
    glass = t[:, 27] > 0.0
    sph = (
        np.asarray(sphere_table)
        if sphere_table is not None and np.asarray(sphere_table).shape[0]
        else np.zeros((0, SPHERE_WIDTH), np.float32)
    )
    # Textured is a GLOBAL property: every group's props operand must
    # share one row count (the single-tile phase concatenates them and
    # the kernel's sel width is static), so any textured primitive
    # anywhere doubles every group's property block.
    textured = bool((t[:, 28] > 0).any() or (sph[:, 13] > 0).any())
    groups = []
    for mode in (0, 1, 2):
        rows = t[(kinds == mode) & ~glass]
        if rows.shape[0] == 0:
            groups.append(None)
        else:
            tile = (tile_by_mode or {}).get(mode, PLANE_TILE)
            groups.append(
                _pack_group(np.asarray(rows), mode, tile, textured)
            )

    sph_glass = sph[:, 12] > 0.0
    for mode, rows in ((3, sph[~sph_glass]), (5, sph[sph_glass])):
        if rows.shape[0]:
            tile = (tile_by_mode or {}).get(mode, PLANE_TILE)
            groups.append(
                _pack_sphere_group(np.asarray(rows), tile, textured)
            )
        else:
            groups.append(None)
    # Order the tuple by mode index: 0,1,2,3,4,5,6,7 — the sphere modes
    # were appended as (3, 5); insert 4 between them, then 6 and 7.
    mode3, mode5 = groups[3], groups[4]
    groups = groups[:3]
    for mode, rows in (
        (4, t[(kinds == 3) & ~glass]),
        (6, t[(kinds != 3) & glass]),
        (7, t[(kinds == 3) & glass]),
    ):
        if rows.shape[0]:
            tile = (tile_by_mode or {}).get(mode, PLANE_TILE)
            groups.append(
                _pack_group(np.asarray(rows), mode, tile, textured)
            )
        else:
            groups.append(None)
    return (groups[0], groups[1], groups[2], mode3, groups[3],
            mode5, groups[4], groups[5])


def _sinpi(t):
    """sin(pi*t) for t in [-0.5, 0.5]: odd minimax polynomial, max abs
    error ~3e-6. The stock jnp.sin/jnp.cos expansions measured 23% of
    the WHOLE kernel (PERF.md); at this accuracy the scatter direction's
    angular deviation is invisible and the direction is re-normalized
    downstream anyway."""
    t2 = t * t
    return t * (3.14159099 + t2 * (
        -5.16747237 + t2 * (2.54484882 + t2 * -0.56204532)))


def _pcg_init(seed, shape):
    """Per-lane PCG state from a scalar seed + ray linear index — the TPU
    equivalent of the reference's per-thread seed from pixel coords + time
    (`shaders.metal:288-300`). Plain integer ops: works identically under
    the Mosaic compiler and the interpreter (whose pltpu.prng_random_bits
    silently returns zeros), and makes goldens backend-independent.

    The index is the ROW-MAJOR linear position, so a block's per-ray
    streams are independent of the carry layout (the kernel runs ray
    state wide, (8, B/8), but seeds exactly as the historical (1, B)
    row did: ray r -> seed + r*15823)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    state = (
        seed.astype(jnp.uint32)
        + (rows * jnp.uint32(shape[1]) + cols) * jnp.uint32(15823)
    )
    # Full avalanche so adjacent lanes (adjacent pixels/samples) start
    # statistically independent: one LCG round alone leaves low-bit
    # structure that shows up as concentric-ring noise patterns on walls
    # (sequential seeds -> correlated (z, phi) scatter draws). Two
    # xorshift-multiply scrambles (PCG output permutation) kill it; runs
    # once per program, so cost is nil.
    for _ in range(2):
        state = state * jnp.uint32(747796405) + jnp.uint32(291336453)
        word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
        state = (word >> 22) ^ word
    return state


def _pcg_word(state):
    """Advance the per-lane PCG state; returns (new_state, uint32 word).
    This is the reference's RNG verbatim (`shaders.metal:181-186`)."""
    state = state * jnp.uint32(747796405) + jnp.uint32(291336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return state, (word >> 22) ^ word


def _pcg_uniform(state):
    """Advance the per-lane PCG state; returns (new_state, float32 in
    [0,1))."""
    state, word = _pcg_word(state)
    # Mosaic has no uint32->f32 cast; the top 24 bits fit in a positive
    # int32, so bitcast then convert.
    top24 = pltpu.bitcast(word >> 8, jnp.int32)
    return state, top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _pcg_uniform_pair(state):
    """One PCG advance -> TWO independent float32 uniforms in [0,1) from
    the word's 16-bit halves. Half the integer work of two full draws;
    2^-16 quantization is far below anything visible in a scatter
    direction (the 8-bit display quantization dominates by 8 bits)."""
    state, word = _pcg_word(state)
    lo = pltpu.bitcast(word & jnp.uint32(0xFFFF), jnp.int32)
    hi = pltpu.bitcast(word >> 16, jnp.int32)
    scale = jnp.float32(1.0 / (1 << 16))
    return state, lo.astype(jnp.float32) * scale, hi.astype(jnp.float32) * scale


def _tracer_kernel(
    seed_ref,     # SMEM [1] int32
    *refs,        # per group: (aabb SMEM [T,8], W VMEM [T,q*PT,8],
                  #             propsT VMEM [T,32,PT], order SMEM [T]);
                  # then g_ref, out_ref
    group_meta: tuple,   # static ((mode, n_tiles, pt), ...) per group
    max_segments: int,
    bounce_limit: int,
    mirror_limit: int,
    mirror_tint: float,
    t_min: float,
    sky: tuple,          # static (r, g, b, strength, lighting_factor)
    lane_chunk: int,     # dense_nearest chunk width (lanes)
    exact_rcp: bool,     # exact reciprocals (interpret mode; see _rcp)
    fresnel: bool,       # Schlick reflect/refract split (TracerConfig)
    compensated: bool,   # K=24 hi/lo hit-test dot (TracerConfig
                         # compensated_dot; see _split24 below)
    slab_precompute: bool,   # precomputed slab schedule (TracerConfig)
):
    g_ref = refs[-2]     # VMEM [8, B] ray block: ox,oy,oz,1,dx,dy,dz,seed
    out_ref = refs[-1]   # VMEM out [8, B] rows 0..2 = gathered light
    # Dielectric stage present iff the scene has glass groups — a STATIC
    # property of the group structure, so glass-free scenes compile the
    # identical pre-dielectric program (and RNG stream).
    has_glass = any(m[0] in (5, 6, 7) for m in group_meta)
    # Texture stage present iff the props operands carry the doubled
    # block (group_meta[i][3] = folded sel rows; uniform across groups
    # by construction, pack_intersection_tables). Static like has_glass:
    # untextured scenes compile the identical pre-texture program.
    # A scene with NO live primitives at all (every table entry None —
    # all planes degenerate, no spheres) has no groups; it renders the
    # all-miss frame through the untextured fallthrough.
    sel_rows = group_meta[0][3] if group_meta else PROP_WIDTH
    has_tex = sel_rows == 2 * PROP_WIDTH
    # Reciprocal selector. On HARDWARE the approximate VPU reciprocal is
    # ~2^-16 relative (measured, PERF.md "hardware numerics") — far
    # inside every margin this kernel relies on. The TPU-semantics
    # INTERPRETER emulates it at ~2^-8 (measured max 3.9e-3 relative),
    # i.e. the interpreter is COARSER than the chip: edge-margin hits
    # within ~2e-3 of a boundary flip on CPU but not on hardware, and
    # the slab skip's 1e-3 conservative widening is narrower than the
    # interpreter's rcp error. Interpret runs therefore use exact
    # division, which is CLOSER to hardware behavior, keeping the CPU
    # suite's pallas-vs-jnp exactness property honest.
    if exact_rcp:
        _rcp = lambda x: 1.0 / x
    else:
        _rcp = lambda x: pl.reciprocal(x, approx=True)
    pid = pl.program_id(0)
    b = g_ref.shape[1]
    shape = (1, b)
    # Per-ray state (positions, directions, throughput, light, RNG, masks)
    # is carried WIDE — (8, B/8) instead of (1, B) — so every elementwise
    # shading/RNG op runs on fully-populated (8, 128) vregs. A (1, B) f32
    # row occupies B/128 vregs with ONE of eight sublanes live, so the
    # whole scatter/shade stage (measured ~40% of the kernel, PERF.md) ran
    # at 1/8 VPU utilization. Lane layout [*, B] (rays on lanes) is only
    # materialized where the MXU needs it: the G operand of the hit-test
    # matmul and the [PT, B] test/select stage. `lane`/`wide` are row-major
    # relayouts (sublane regroupings — no cross-lane data movement), so
    # ray r is column r in lane layout and (r // (B/8), r % (B/8)) wide.
    wshape = (8, b // 8)
    wb = b // 8
    # Mosaic's vector layout inference rejects the rank-changing
    # reshape (1, B) <-> (8, B/8) ("unsupported shape cast"), so the
    # relayout is spelled out — row-major-equivalent (ray r sits at
    # column r in lane layout and (r // (B/8), r % (B/8)) wide), all
    # sublane regroupings, no cross-lane movement. wide: lane-aligned
    # slices concatenated on sublanes. lane: plain row slices keep their
    # sublane offset (which tpu.concatenate rejects on the non-concat
    # dim), so each row is first rotated to sublane 0 with pltpu.roll.
    wide = lambda x: jnp.concatenate(
        [x[:, i * wb:(i + 1) * wb] for i in range(8)], axis=0
    )
    lane = lambda x: jnp.concatenate(
        [pltpu.roll(x, (8 - i) % 8, 0)[0:1, :] for i in range(8)], axis=1
    )
    # Per-lane PCG init; G row 7 optionally carries a per-ray noise-texture
    # sample in [0,1) (the reference's seed source, `shaders.metal:288-300`)
    # — zero when noise_rng is off, leaving the stream unchanged.
    noise_off = (wide(g_ref[7:8]) * jnp.float32(1 << 24)).astype(jnp.int32)
    rng0 = _pcg_init(
        seed_ref[0].astype(jnp.uint32)
        + pid.astype(jnp.uint32) * jnp.uint32(2654435761),
        wshape,
    ) + pltpu.bitcast(noise_off, jnp.uint32)
    f0 = jnp.zeros(wshape, jnp.float32)
    f1 = jnp.ones(wshape, jnp.float32)
    one_row = jnp.ones(shape, jnp.float32)
    zero_row = jnp.zeros(shape, jnp.float32)

    def _bf16v(x):
        """bf16 RNE rounding of an f32 vector, kept in f32 — the exact
        value the MXU's single-pass input truncation will use. Integer
        bit ops via pltpu.bitcast (Mosaic-lowerable; an astype chain is
        folded to identity by XLA-TPU — PERF.md 'hardware numerics')."""
        u = pltpu.bitcast(x, jnp.uint32)
        r = (
            u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
        ) & jnp.uint32(0xFFFF0000)
        return pltpu.bitcast(r, jnp.float32)

    def _split24(x, axis):
        """Hi/lo expansion for the COMPENSATED hit-test dot: with both
        MXU inputs truncated to bf16, edge-test coordinates carry an
        ABSOLUTE error ~2^-9 * |o| — fatal for small rectangles far
        from the origin (the 64x64 scale world spans +-320 units;
        measured on silicon losing ~93% of scene luminance to rejected
        light-panel hits, round 5). Splitting W and G into a
        bf16-exact hi plus f32 residual and contracting
        [Wh|Wh|Wl] @ [Gh;Gl;Gh] = Wh.Gh + Wh.Gl + Wl.Gh recovers
        ~f32 precision (the dropped Wl.Gl term is ~2^-18 relative);
        hi passes the MXU truncation unchanged and the residuals only
        suffer their own ~2^-18-relative truncation. K grows 8 -> 24,
        and MXU pass count is K-INDEPENDENT below K = 128 (PERF.md
        'MXU-pass floor'), so the fix costs no passes. W-side: axis=1
        gives [rows, 24] = [hi | hi | lo]; G-side: axis=0 gives
        [24, B] = [hi; lo; hi]."""
        hi = _bf16v(x)
        lo = x - hi
        if axis == 1:
            return jnp.concatenate([hi, hi, lo], axis=1)
        return jnp.concatenate([hi, lo, hi], axis=0)

    def tile_tv_from_a(mode, pt, a, sdo=None, soo=None):
        """[PT, B] elementwise hit tests over precomputed dot products
        a [q*PT, B]. Returns tv [PT, B] = t where the tile's primitive
        is hit, else BIG. The edge test is specialized by the tile's
        closed-world mode (Scene.kind): 0 tests both quad edges, 1 only
        the along-wall edge (vertical extent guaranteed by
        floor/ceiling), 2 none (world-closing planes), 4 the TRIANGLE
        barycentric test (s1, s2 >= 0, s1 + s2 <= 1). Mode 3 is the
        SPHERE quadratic (render/intersect.py sphere_ts): a carries the
        MXU halves b-part = -D.c and q-part = -2 O.c + c2r2; the
        ray-quadratic scalars ``sdo`` = D.O and ``soo`` = |O|^2 (shared
        by every sphere, [1, chunk] rows) complete b and q. Near root
        only, matching the jnp backends' arithmetic term-for-term.
        Padding spheres carry q-constant +BIG, so disc < 0 rejects them
        with no validity lane work (the mode-3 analog of the plane
        groups' poisoned numer/denom)."""
        if mode in (3, 5):
            bq = sdo + a[0 * pt:1 * pt]
            q = soo + a[1 * pt:2 * pt]
            disc = bq * bq - q
            root = jnp.sqrt(jnp.maximum(disc, 0.0))
            t = -bq - root
            if mode == 5:
                # Glass spheres: smallest POSITIVE root — when the near
                # root is behind t_min (ray inside the sphere) the far
                # root is the exit hit (render/intersect.py sphere_ts,
                # glass branch — identical expression and acceptance).
                t = jnp.where(t > t_min, t, -bq + root)
            return jnp.where((disc > 0.0) & (t > t_min), t, BIG)
        numer = a[0 * pt:1 * pt]
        denom = a[1 * pt:2 * pt]

        # t = numer/denom via _rcp: on hardware the APPROXIMATE
        # reciprocal, no Newton step (exact division under the
        # interpreter — see _rcp above): measured on v5e the approx
        # rcp is ~2^-16 relative, so t
        # (and the hit position advanced with it) is within ~0.5 mm at
        # the world's largest distances — far below anything visible,
        # and 2 VPU ops/plane cheaper. Do NOT "fix" this by
        # reconstructing t from the one-hot-selected plane equation:
        # sel rides an MXU matmul whose f32 inputs are not carried at
        # full precision, and positions rebuilt from sel normals land
        # centimeters off the surface (measured -4% frame luminance).
        # denom == 0 (parallel/invalid) => t = +-inf or NaN (0*inf), and
        # every comparison below rejects it (-inf/NaN via t > t_min;
        # +inf never beats a real hit and equals-BIG columns are
        # discarded by the thresh < BIG guard).
        t = numer * _rcp(denom)
        # In-rectangle iff min(s, 1-s) >= 0 for each tested edge.
        if mode in (0, 6):
            s1 = a[2 * pt:3 * pt] + t * a[3 * pt:4 * pt]
            s2 = a[4 * pt:5 * pt] + t * a[5 * pt:6 * pt]
            m = jnp.minimum(
                jnp.minimum(s1, 1.0 - s1), jnp.minimum(s2, 1.0 - s2)
            )
            ok = (m >= 0.0) & (t > t_min)
        elif mode in (4, 7):
            # Triangle (Scene.kind 3): s1/s2 are the barycentric
            # coordinates of the (u, v) edge pair, so in-triangle iff
            # min(s1, s2, 1 - (s1 + s2)) >= 0. 1 - (s1 + s2) >= 0 is
            # sign-exact for the rounded sum (Sterbenz near 1, rounding
            # monotone elsewhere), so this matches the jnp backends'
            # s1 + s2 <= 1.0 decision bit-for-bit.
            s1 = a[2 * pt:3 * pt] + t * a[3 * pt:4 * pt]
            s2 = a[4 * pt:5 * pt] + t * a[5 * pt:6 * pt]
            m = jnp.minimum(jnp.minimum(s1, s2), 1.0 - (s1 + s2))
            ok = (m >= 0.0) & (t > t_min)
        elif mode == 1:
            s1 = a[2 * pt:3 * pt] + t * a[3 * pt:4 * pt]
            ok = (jnp.minimum(s1, 1.0 - s1) >= 0.0) & (t > t_min)
        else:
            ok = t > t_min
        return jnp.where(ok, t, BIG)

    def dense_nearest(w, specs, props_t, g, sdo=None, soo=None):
        """Dense nearest-hit over one packed (W, propsT) operand pair:
        MXU dot, mode-specialized hit tests, sublane min-reduce, and a
        one-hot property-select matmul (no gathers — the hit index
        never materializes). Computed in LANE CHUNKS of `lane_chunk`
        columns so the [rows, chunk] dot/test/one-hot intermediates
        live in vector registers instead of spilling to VMEM — at the
        bench operating point the monolithic [336, 16384] form spilled
        ~22 MB per block-segment and the spill traffic was ~60% of the
        kernel (PERF.md "register-chunked nearest hit"). Bitwise
        IDENTICAL to the monolithic form at any chunk width: every
        output column depends only on its own lanes.

        ``specs`` = ((mode, pt), ...) row-block layout of W. Returns
        (tmin [1, B], sel [16, B]). One-hot winner: tv <= threshold
        picks the (ok) minimum; no-hit columns (every tv >= BIG) get
        threshold -1, which nothing passes. Exact nearest-t ties SUM
        the tied planes' properties (measure-zero: the scene builder
        insets boundary planes so generated mazes have no coplanar
        pair)."""
        tmins, sels = [], []
        for c0 in range(0, b, lane_chunk):
            gc = jax.lax.slice_in_dim(g, c0, c0 + lane_chunk, axis=1)
            chunk = lambda x: (
                None if x is None
                else jax.lax.slice_in_dim(x, c0, c0 + lane_chunk, axis=1)
            )
            sdo_c, soo_c = chunk(sdo), chunk(soo)
            if _ABLATE == "nodot":
                a_c = w[:, 0:1] * gc[0:1]     # anatomy stub: no MXU pass
            else:
                wk = _split24(w, axis=1) if compensated else w
                a_c = jnp.dot(wk, gc, preferred_element_type=jnp.float32)
            tvs, off = [], 0
            for mode, pt in specs:
                q = MODE_QUANTITIES[mode]
                tvs.append(
                    tile_tv_from_a(mode, pt, a_c[off:off + q * pt],
                                   sdo_c, soo_c)
                )
                off += q * pt
            tv_c = tvs[0] if len(tvs) == 1 else jnp.concatenate(tvs, axis=0)
            tmin_c = jnp.min(tv_c, axis=0, keepdims=True)  # [1, chunk]
            thresh = jnp.where(tmin_c < BIG, tmin_c, -1.0)
            onehot = (tv_c <= thresh).astype(jnp.float32)
            # propsT carries split-precision rows (bf16-exact hi +
            # f32 residual, _pack_group): select both halves through
            # the one one-hot dot and fold on the VPU, recovering the
            # precision the MXU's bf16 input truncation drops. Textured
            # scenes carry a doubled property block (sel rows 16:32 =
            # texture params + dual basis) — still one MXU M-tile.
            s = jnp.dot(props_t, onehot, preferred_element_type=jnp.float32)
            half = s.shape[0] // 2
            sels.append(s[:half] + s[half:])
            tmins.append(tmin_c)
        if len(tmins) == 1:
            return tmins[0], sels[0]
        return (
            jnp.concatenate(tmins, axis=1),
            jnp.concatenate(sels, axis=1),
        )

    def nearest_tile(mode, pt, w, props_t, g, tmin_in, sel_in,
                     sdo=None, soo=None):
        """One plane tile's dense_nearest merged with the running
        winner by a strict-< test: ties ACROSS tiles keep the earlier
        winner (measure-zero, see dense_nearest)."""
        tile_tmin, sel = dense_nearest(
            w, ((mode, pt),), props_t, g, sdo, soo
        )
        better = tile_tmin < tmin_in                          # [1, B]
        return (
            jnp.minimum(tile_tmin, tmin_in),
            jnp.where(better, sel, sel_in),
        )

    def nearest(ox, oy, oz, dx, dy, dz, wide_state):
        """Nearest hit over all groups; returns (tmin, sel, tested)
        where tested is the number of dense plane tiles actually
        evaluated (the tile-skip diagnostic, int32 scalar).

        ``ox..dz`` are LANE-layout [1, B] rows (they feed the MXU G
        operand); ``wide_state`` = (oxw, oyw, ozw, dxw, dyw, dzw,
        alive_w) carries the same components (plus liveness) in the
        WIDE (8, B/8) layout for the per-tile slab test, whose ~20
        per-ray ops per tile otherwise run at 1/8 sublane utilization."""
        g = jnp.concatenate(
            [ox, oy, oz, one_row, dx, dy, dz, zero_row], axis=0
        )                                                     # [8, B]
        if compensated:
            # Hi/lo G for the K=24 compensated dot (_split24) — built
            # ONCE per segment; every tile's dense pass consumes it.
            g = _split24(g, axis=0)                           # [24, B]
        # Ray-quadratic scalars for the sphere group (mode 3): D.O and
        # |O|^2, shared by EVERY sphere, so they are computed once per
        # nearest() call instead of riding per-sphere rows. Statically
        # absent for sphere-free scenes — the traced plane-only kernel
        # is unchanged. Term order matches render/intersect.py
        # sphere_ts (x + y + z left-to-right) for interpreter-exact
        # cross-backend agreement.
        if any(m[0] in (3, 5) for m in group_meta):
            sdo = ox * dx + oy * dy + oz * dz                 # [1, B]
            soo = ox * ox + oy * oy + oz * oz
        else:
            sdo = soo = None
        single = [(gi, m) for gi, m in enumerate(group_meta) if m[1] == 1]
        # Multi-tile groups run LARGEST first: the group with the most
        # tiles (full-height walls in generated mazes) has the tightest
        # per-tile AABBs and is what rays actually hit, so it tightens
        # tmin before sparse groups (light panels, whose 5 world-spanning
        # tiles would otherwise all pass the slab test against the loose
        # phase-1 tmin) reach their skip check.
        multi = sorted(
            ((gi, m) for gi, m in enumerate(group_meta) if m[1] > 1),
            key=lambda gm: -gm[1][1],
        )

        # Phase 1 — all single-tile groups JOINTLY: per-group MXU dot +
        # mode-specialized hit test, ONE shared min across every group's
        # tv, then per-group one-hot selects SUMMED into one sel (a
        # non-winning group's one-hot is all zero). This keeps the
        # closed-world specialization without paying a reduce/select/
        # merge chain per group. It runs FIRST so the world-closing
        # planes (floor/ceiling/boundary — which every ray hits) give
        # each lane a finite tmin before the multi-tile slab skip below,
        # making the t-bound cull effective from the first tile.
        # ONE fused [sum q*PT, 8] x [8, B] dot for every single-tile
        # group, ONE concatenated min/one-hot, ONE [32, sum PT] select
        # dot: the W/props concatenations are loop-invariant (hoistable)
        # and the tv concat is a handful of vreg copies — far cheaper
        # than paying per-group MXU dot round-trips on the critical path.
        if single:
            w_cat = jnp.concatenate(
                [refs[4 * gi + 1][0] for gi, _ in single], axis=0
            )
            props_cat = jnp.concatenate(
                [refs[4 * gi + 2][0] for gi, _ in single], axis=1
            )                                          # [32, sum PT]
            tmin, sel = dense_nearest(
                w_cat, tuple((m[0], m[2]) for _, m in single), props_cat,
                g, sdo, soo,
            )
        else:
            tmin = jnp.full(shape, BIG, jnp.float32)
            sel = jnp.zeros((sel_rows, b), jnp.float32)
        if not multi:
            return (tmin, sel, jnp.int32(len(single)))

        # Slab-test prereqs, all in the WIDE layout. Reciprocals are
        # CLAMPED to +-BIG so zero direction components give
        # huge-but-finite slab distances (never 0*inf=NaN).
        oxw, oyw, ozw, dxw, dyw, dzw, alive_w = wide_state
        clamp = lambda r: jnp.clip(r, -BIG, BIG)
        idx = clamp(_rcp(dxw))
        idy = clamp(_rcp(dyw))
        idz = clamp(_rcp(dzw))
        # The skip compares tn against the running best hit, which the
        # dense passes produce in LANE layout; a WIDE copy rides along
        # in the carry and is refreshed only when a tile actually runs
        # (one relayout amortized against a whole dense pass). Skip
        # decisions are bit-identical to the lane-layout formulation.
        carry = (tmin, sel, jnp.int32(len(single)), wide(tmin))

        def slab_tn_tf(aabb_ref, ti):
            """One tile's conservative slab entry/exit over the wide ray
            state. The accept test widens tn/tf by a relative 1e-3 on
            top of the absolute AABB inflation, dominating the hardware
            approximate-reciprocal error (~2^-16 relative; exact under
            the interpreter — _rcp) at any distance — strictly
            conservative."""
            t1x = (aabb_ref[ti, 0] - oxw) * idx
            t2x = (aabb_ref[ti, 3] - oxw) * idx
            t1y = (aabb_ref[ti, 1] - oyw) * idy
            t2y = (aabb_ref[ti, 4] - oyw) * idy
            t1z = (aabb_ref[ti, 2] - ozw) * idz
            t2z = (aabb_ref[ti, 5] - ozw) * idz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            return tn - jnp.abs(tn) * 1e-3, tf + jnp.abs(tf) * 1e-3

        def make_tile_body(w_ref, props_ref, order_ref, mode, pt, read_tntf):
            """Loop body shared by the two slab schedules: pop the
            (near-to-far) physical tile id, test, and cond-run the dense
            pass. ``read_tntf(ti)`` supplies the tile's slab interval."""
            def tile_body(ti, c):
                tmin_w = c[3]
                ti = order_ref[ti]
                tn, tf = read_tntf(ti)
                could_hit = (tf >= tn) & (tf > 0.0) & (tn < tmin_w) & alive_w

                def run(cc):
                    new_tmin, new_sel = nearest_tile(
                        mode, pt, w_ref[ti], props_ref[ti], g,
                        cc[0], cc[1], sdo, soo,
                    )
                    return (new_tmin, new_sel, cc[2] + 1, wide(new_tmin))

                if _ABLATE == "noskip":       # anatomy: every tile runs
                    return run(c)
                return jax.lax.cond(jnp.any(could_hit), run, lambda cc: cc, c)
            return tile_body

        # Slab-test tile skip: Morton-ordered tiles are spatially
        # compact, and a whole [PT, B] dense test is skipped when NO
        # live lane's ray can enter the tile's AABB closer than its
        # current best hit.
        if not slab_precompute:
            for gi, (mode, n_tiles, pt, _) in multi:
                aabb_ref, w_ref, props_ref, order_ref = (
                    refs[4 * gi:4 * gi + 4]
                )
                body = make_tile_body(
                    w_ref, props_ref, order_ref, mode, pt,
                    lambda ti, aabb_ref=aabb_ref: slab_tn_tf(aabb_ref, ti),
                )
                carry = jax.lax.fori_loop(0, n_tiles, body, carry)
            return carry[:3]

        # PRECOMPUTED schedule (TracerConfig.slab_precompute): every
        # tile's tn/tf is tmin-INDEPENDENT, so all of them are computed
        # up front as statically-unrolled INDEPENDENT chains (they
        # pipeline; inside the serial fori_loop each ~14-op chain is
        # pure latency — the config-5 anatomy's 9.2 us/segment fixed
        # cost) into VMEM scratch, leaving only the 4-op tmin compare +
        # cond in the loop. Bit-identical decisions — same math, same
        # near-to-far order, only the schedule moves.
        def _scoped(*scr):
            c2 = carry
            for si, (gi, (mode, n_tiles, pt, _)) in enumerate(multi):
                aabb_ref = refs[4 * gi]
                tn_ref, tf_ref = scr[2 * si], scr[2 * si + 1]
                for k in range(n_tiles):
                    tn, tf = slab_tn_tf(aabb_ref, k)
                    tn_ref[k] = tn
                    tf_ref[k] = tf
            for si, (gi, (mode, n_tiles, pt, _)) in enumerate(multi):
                _, w_ref, props_ref, order_ref = refs[4 * gi:4 * gi + 4]
                tn_ref, tf_ref = scr[2 * si], scr[2 * si + 1]
                body = make_tile_body(
                    w_ref, props_ref, order_ref, mode, pt,
                    lambda ti, tn_ref=tn_ref, tf_ref=tf_ref: (
                        tn_ref[ti], tf_ref[ti]
                    ),
                )
                c2 = jax.lax.fori_loop(0, n_tiles, body, c2)
            return c2[:3]

        scratch = []
        for gi, (mode, n_tiles, pt, _) in multi:
            scratch += [
                pltpu.VMEM((n_tiles, 8, b // 8), jnp.float32),
                pltpu.VMEM((n_tiles, 8, b // 8), jnp.float32),
            ]
        return pl.run_scoped(_scoped, *scratch)

    def segment(carry):
        (seg, tiles, tiles0, tiles3, live_n, rng_i,
         ox, oy, oz, dx, dy, dz, tr, tg, tb, lr, lg, lb,
         mh, dc, alive_i) = carry
        # Mosaic's scf.while cannot carry vector i1/ui32 — masks ride as
        # int32 and the RNG state as a bitcast int32.
        rng = pltpu.bitcast(rng_i, jnp.uint32)
        alive = alive_i != 0

        tl, sel, tested = nearest(
            lane(ox), lane(oy), lane(oz), lane(dx), lane(dy), lane(dz),
            (ox, oy, oz, dx, dy, dz, alive),
        )
        t = wide(tl)
        nx, ny, nz = wide(sel[0:1]), wide(sel[1:2]), wide(sel[2:3])
        cr, cg, cb = wide(sel[3:4]), wide(sel[4:5]), wide(sel[5:6])
        er, eg, eb = wide(sel[6:7]), wide(sel[7:8]), wide(sel[8:9])
        mir = wide(sel[9:10])
        if any(m[0] in (3, 5) for m in group_meta):
            # Sphere winners carry their CENTER in sel rows 0:3 (a
            # position-dependent normal cannot ride the one-hot select);
            # reconstruct n = (hit - c) * inv_r with the same o + d*t
            # arithmetic the origin update below uses, matching the jnp
            # tracer term-for-term (render/tracer.py). sel row 10 is
            # inv_r, row 11 the is_sphere flag (zero for planes and for
            # no-hit lanes, whose sel is all zero — those lanes keep the
            # plane path and are dead or masked downstream anyway).
            inv_r = wide(sel[10:11])
            is_sph = wide(sel[11:12]) > 0.0
            nx = jnp.where(is_sph, (ox + dx * t - nx) * inv_r, nx)
            ny = jnp.where(is_sph, (oy + dy * t - ny) * inv_r, ny)
            nz = jnp.where(is_sph, (oz + dz * t - nz) * inv_r, nz)

        if has_tex:
            # Procedural checker (Scene.tex_*): odd-parity cells swap
            # the winner's albedo for tex_color2 BEFORE any material
            # use (diffuse attenuation, mirror tint, glass tint).
            # Mirrored term-for-term from render/tracer.py. sel rows
            # 16:32 are the second property block (_pack_group props2):
            # 16 tex_kind, 17 tex_scale, 18:21 color2, 21:24 w1, 24 b1,
            # 25:28 w2, 28 b2. Kind 1 rebuilds the winner's (s1, s2)
            # from the split-precision-selected dual basis (~2^-17 on
            # hardware — cell boundaries can flip within a float ulp of
            # a cell edge, measure-zero); kind 2 uses the hit point.
            # Dead/no-hit lanes carry an all-zero sel (tex_kind 0), so
            # their albedo is untouched.
            tk = wide(sel[16:17])
            tsc = wide(sel[17:18])
            c2r_t = wide(sel[18:19])
            c2g_t = wide(sel[19:20])
            c2b_t = wide(sel[20:21])
            hx = ox + dx * t
            hy = oy + dy * t
            hz = oz + dz * t
            s1t = (hx * wide(sel[21:22]) + hy * wide(sel[22:23])
                   + hz * wide(sel[23:24])) - wide(sel[24:25])
            s2t = (hx * wide(sel[25:26]) + hy * wide(sel[26:27])
                   + hz * wide(sel[27:28])) - wide(sel[28:29])
            f1 = jnp.floor(s1t * tsc) + jnp.floor(s2t * tsc)
            f2 = (jnp.floor(hx / tsc) + jnp.floor(hy / tsc)
                  + jnp.floor(hz / tsc))
            f = jnp.where(tk > 1.5, f2, f1)
            odd = (f - 2.0 * jnp.floor(f * 0.5)) > 0.5
            use2 = (tk > 0.0) & odd
            cr = jnp.where(use2, c2r_t, cr)
            cg = jnp.where(use2, c2g_t, cg)
            cb = jnp.where(use2, c2b_t, cb)

        hit = alive & (t < BIG)
        if sky[3] != 0.0:
            # Miss: sky term (`shaders.metal:336-339`; the reference
            # multiplies it by 0.0 — dead code there, exposed here as
            # TracerConfig.sky_strength, default 0 so this block is
            # statically absent). Matches render/tracer.py: light +=
            # sky_color * lighting_factor^(segment - mirror_hits) *
            # strength, not attenuated by throughput.
            miss = alive & ~hit
            expo = (jnp.broadcast_to(seg, wshape) - mh).astype(jnp.float32)
            if sky[4] > 0.0:
                fac = jnp.exp(expo * jnp.float32(np.log(sky[4]))) * sky[3]
            else:
                # lighting_factor == 0: exp(expo * log 0) would be
                # 0 * -inf = NaN at expo == 0. Match the jnp tracer's pow
                # semantics (0**0 == 1, 0**n == 0). Negative bases are
                # rejected at config time (TracerConfig.__post_init__).
                fac = jnp.where(expo == 0.0, jnp.float32(sky[3]), 0.0)
            lr = jnp.where(miss, lr + sky[0] * fac, lr)
            lg = jnp.where(miss, lg + sky[1] * fac, lg)
            lb = jnp.where(miss, lb + sky[2] * fac, lb)
        dn = dx * nx + dy * ny + dz * nz
        side = -jnp.sign(dn)

        is_mir = mir > 0.0
        # Mirror front faces reflect; everything else that was hit is
        # diffuse (including mirror BACK faces) — diffuse = hit & ~mirror
        # is the same set as the reference's (~is_mir | side == -1).
        mirror = hit & is_mir & (side != -1.0)
        if has_glass:
            # Dielectric winners (sel row 12 = ior > 0; only the glass
            # groups carry nonzero row 12): neither mirror nor diffuse,
            # count against the specular budget (render/tracer.py glass
            # contract).
            iorw = wide(sel[12:13])
            glass = hit & (iorw > 0.0)
            mirror = mirror & ~glass
            diffuse = hit & ~mirror & ~glass
            spec = mirror | glass
        else:
            diffuse = hit & ~mirror
            spec = mirror
        mh_new = mh + spec.astype(jnp.int32)
        mirror_live = mirror & (mh_new < mirror_limit)

        # Uniform unit vector via (z, phi) (distribution-equivalent to the
        # reference's rejection sampling, `shaders.metal:315-319`).
        rng, u1, u2 = _pcg_uniform_pair(rng)
        z = u1 * 2.0 - 1.0
        # phi = pi*x with x uniform in [-1, 1); sin/cos by range-reduced
        # _sinpi (sin via x - round(x) and a quadrant sign, cos via the
        # even identity cos(pi*x) = sin(pi*(0.5 - |x|))).
        x = u2 * 2.0 - 1.0
        k = jnp.round(x)
        sphi = _sinpi(x - k) * (1.0 - 2.0 * jnp.abs(k))
        cphi = _sinpi(0.5 - jnp.abs(x))
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        ux = r * cphi
        uy = r * sphi
        uz = z

        # Diffuse: emission pickup, albedo attenuation, cosine-ish scatter
        # along normal*side + unit vector (`shaders.metal:311-323`).
        lr = jnp.where(diffuse, lr + er * tr, lr)
        lg = jnp.where(diffuse, lg + eg * tg, lg)
        lb = jnp.where(diffuse, lb + eb * tb, lb)
        tr = jnp.where(diffuse, tr * cr, tr)
        tg = jnp.where(diffuse, tg * cg, tg)
        tb = jnp.where(diffuse, tb * cb, tb)
        # Mirror: flat tint + reflect (`shaders.metal:324-330`).
        lr = jnp.where(mirror_live, lr + cr * mirror_tint, lr)
        lg = jnp.where(mirror_live, lg + cg * mirror_tint, lg)
        lb = jnp.where(mirror_live, lb + cb * mirror_tint, lb)

        # New direction: diffuse scatter or mirror reflection, selected
        # BEFORE the (shared) normalization — one rsqrt instead of two.
        # Position and direction update UNCONDITIONALLY: a lane that does
        # not advance (no hit, or mirror budget exhausted) dies this very
        # segment (see `alive` below), so its state is don't-care — the
        # garbage values stay lane-isolated (columns of the G matmul) and
        # every hit test rejects them.
        vx = jnp.where(diffuse, ux + nx * side, dx - 2.0 * dn * nx)
        vy = jnp.where(diffuse, uy + ny * side, dy - 2.0 * dn * ny)
        vz = jnp.where(diffuse, uz + nz * side, dz - 2.0 * dn * nz)

        if has_glass:
            # Dielectric scatter: Snell refraction with optional Schlick
            # Fresnel (static `fresnel`), mirrored term-for-term from
            # render/tracer.py's glass branch. Computed on the UNIT
            # direction (d is exactly unit after segment 0, near-unit
            # with camera jitter before it). Dying/over-budget glass
            # lanes get don't-care values like every other dead lane.
            dinv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
            dhx, dhy, dhz = dx * dinv, dy * dinv, dz * dinv
            nex, ney, nez = nx * side, ny * side, nz * side
            cos_i = jnp.clip(
                -(dhx * nex + dhy * ney + dhz * nez), 0.0, 1.0
            )
            eta = jnp.where(
                side > 0.0, 1.0 / jnp.maximum(iorw, 1e-6), iorw
            )
            sin2t = eta * eta * (1.0 - cos_i * cos_i)
            tir = sin2t > 1.0
            if fresnel:
                r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
                p = 1.0 - cos_i
                p2 = p * p
                reflect_p = jnp.where(
                    tir, 1.0, r0 + (1.0 - r0) * (p2 * p2 * p)
                )
                # One extra PCG draw per segment, taken AFTER the
                # scatter pair — statically absent on glass-free
                # scenes, so their streams are untouched.
                rng, u3 = _pcg_uniform(rng)
                do_refl = u3 < reflect_p
            else:
                # Deterministic seam (cross-backend exactness tests):
                # refract unless total internal reflection.
                do_refl = tir
            coef = eta * cos_i - jnp.sqrt(jnp.maximum(1.0 - sin2t, 0.0))
            dnh = dn * dinv
            gx = jnp.where(do_refl, dhx - 2.0 * dnh * nx, eta * dhx + coef * nex)
            gy = jnp.where(do_refl, dhy - 2.0 * dnh * ny, eta * dhy + coef * ney)
            gz = jnp.where(do_refl, dhz - 2.0 * dnh * nz, eta * dhz + coef * nez)
            vx = jnp.where(glass, gx, vx)
            vy = jnp.where(glass, gy, vy)
            vz = jnp.where(glass, gz, vz)
            # Throughput tint by albedo (no emission pickup, no flat
            # mirror tint on glass).
            glass_live = glass & (mh_new < mirror_limit)
            tr = jnp.where(glass_live, tr * cr, tr)
            tg = jnp.where(glass_live, tg * cg, tg)
            tb = jnp.where(glass_live, tb * cb, tb)

        v_inv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)

        ox = ox + dx * t
        oy = oy + dy * t
        oz = oz + dz * t
        dx = vx * v_inv
        dy = vy * v_inv
        dz = vz * v_inv

        dc_new = dc + diffuse.astype(jnp.int32)
        # hit already includes alive; a specular (mirror/glass) lane
        # over budget dies.
        alive = (
            hit & ~(spec & (mh_new >= mirror_limit)) & (dc_new < bounce_limit)
        )
        # Per-segment tile-skip anatomy (config-5 decomposition): tiles
        # tested on the PRIMARY segment, on segments 0-2, and the sum of
        # live lanes entering each segment (lockstep-utilization
        # numerator). Scalar adds — free against the dense passes.
        return (seg + 1, tiles + tested,
                tiles0 + jnp.where(seg == 0, tested, 0),
                tiles3 + jnp.where(seg < 3, tested, 0),
                live_n + jnp.sum(alive_i),
                pltpu.bitcast(rng, jnp.int32),
                ox, oy, oz, dx, dy, dz, tr, tg, tb,
                lr, lg, lb, mh_new, dc_new, alive.astype(jnp.int32))

    def cond(carry):
        seg, alive_i = carry[0], carry[-1]
        return (seg < max_segments) & (jnp.max(alive_i) > 0)


    g0 = g_ref[:]
    init = (
        jnp.int32(0),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
        pltpu.bitcast(rng0, jnp.int32),
        wide(g0[0:1]), wide(g0[1:2]), wide(g0[2:3]),
        wide(g0[4:5]), wide(g0[5:6]), wide(g0[6:7]),
        f1, f1, f1,
        f0, f0, f0,
        jnp.zeros(wshape, jnp.int32),
        jnp.zeros(wshape, jnp.int32),
        jnp.ones(wshape, jnp.int32),
    )
    out = jax.lax.while_loop(cond, segment, init)
    # Rows 0..2: gathered light. Row 3: segments this block executed;
    # row 4: dense plane tiles evaluated across those segments; row 5:
    # tiles on the PRIMARY segment; row 6: tiles on segments 0-2; row 7:
    # sum over segments of live lanes entering each (early-exit /
    # tile-skip / lockstep-utilization diagnostics, surfaced via
    # trace_paths_pallas(return_block_segments=True)).
    def srow(x):
        return jnp.broadcast_to(x.astype(jnp.float32), (1, b))

    out_ref[:] = jnp.concatenate(
        [lane(out[15]), lane(out[16]), lane(out[17]),
         srow(out[0]), srow(out[1]), srow(out[2]), srow(out[3]),
         srow(out[4])],
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_segments", "bounce_limit", "mirror_limit",
        "mirror_tint", "t_min", "sky", "block_rays", "interpret",
        "lane_chunk", "fresnel", "compensated", "slab_precompute",
    ),
)
def _trace_padded(
    tables: tuple,              # pack_intersection_tables() 8-tuple
    g_all: jnp.ndarray,         # [8, R] component-major padded rays
    seed: jnp.ndarray,          # [1] int32
    anchor: jnp.ndarray,        # [3] f32 near-to-far tile-order anchor
    *,
    max_segments: int,
    bounce_limit: int,
    mirror_limit: int,
    mirror_tint: float,
    t_min: float,
    sky: tuple,
    block_rays: int,
    interpret: bool,
    lane_chunk: int,
    fresnel: bool = True,
    compensated: bool = False,
    slab_precompute: bool = False,
):
    r_total = g_all.shape[1]
    n_blocks = r_total // block_rays

    group_meta = []
    args = []
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]          # seed
    total_pw = 0
    for mode, group in enumerate(tables):
        if group is None:
            continue
        w, props_t, aabbs = group
        n_tiles, prows, pt = props_t.shape
        group_meta.append((mode, n_tiles, pt, prows // 2))
        # Near-to-far tile traversal: multi-tile groups are walked in
        # order of tile-AABB-center distance from the anchor (the
        # camera), so near tiles tighten tmin before far tiles reach
        # their slab test — Morton order alone tests tiles long past
        # the nearest hit. Order affects efficiency only (and which of
        # two exactly-tied coplanar planes wins — measure-zero).
        if n_tiles > 1:
            center = (aabbs[:, 0:3] + aabbs[:, 3:6]) * 0.5
            d2 = jnp.sum((center - anchor[None, :]) ** 2, axis=1)
            order = jnp.argsort(d2).astype(jnp.int32)
        else:
            order = jnp.zeros((1,), jnp.int32)
        args += [aabbs, w, props_t, order]
        specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tile AABBs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # propsT (whole)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tile order
        ]
        total_pw += n_tiles * pt

    kernel = functools.partial(
        _tracer_kernel,
        group_meta=tuple(group_meta),
        max_segments=max_segments,
        bounce_limit=bounce_limit,
        mirror_limit=mirror_limit,
        mirror_tint=mirror_tint,
        t_min=t_min,
        sky=sky,
        lane_chunk=lane_chunk,
        exact_rcp=interpret,
        fresnel=fresnel,
        compensated=compensated,
        slab_precompute=slab_precompute,
    )
    ray_spec = pl.BlockSpec(
        (8, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    # ~15 VPU flops per (ray, plane) pair after the MXU matmuls.
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=specs + [ray_spec],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((8, r_total), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=r_total * total_pw * max_segments * (15 + 2 * 6 + 2),
            bytes_accessed=r_total * 4 * 16,
            transcendentals=r_total * max_segments * 3,
        ),
        # On CPU (tests) run under the TPU-semantics interpreter so
        # SMEM refs and TPU layouts keep working.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, *args, g_all)
    return out


def trace_paths_pallas(
    plane_table: jnp.ndarray,
    ori: jnp.ndarray,    # [R, 3]
    dirs: jnp.ndarray,   # [R, 3]
    seed: jnp.ndarray,   # int32 scalar (any shape ()-like)
    cfg: TracerConfig,
    rows_per_block: int = 8,
    interpret: bool | None = None,
    seed_row: jnp.ndarray | None = None,  # [R] float32 in [0,1)
    tables: tuple | None = None,  # precomputed pack_intersection_tables()
    return_block_segments: bool = False,
    anchor: jnp.ndarray | None = None,  # [3] near-to-far tile-order anchor
):
    """Trace a ray wavefront with the fused kernel; returns light [R, 3].

    ``rows_per_block`` sets the rays per pallas program in units of 128
    lanes (B = rows_per_block * 128). Pads R up to a whole number of
    blocks; padded lanes carry zero directions, miss every plane, and
    die on segment one. ``seed_row`` optionally mixes a per-ray value
    (e.g. a noise-texture sample) into the RNG seed. ``tables`` supplies
    the per-kind (W, propsT, aabbs) operand groups precomputed at scene
    upload (DeviceScene.mxu_tables); left None they are derived from the
    plane table here, which requires a CONCRETE (non-traced) table. With
    ``return_block_segments`` the per-block diagnostics (kernel output
    rows 3-7: executed segments; tiles evaluated in total, on the
    primary segment, and on segments 0-2; and the per-segment live-lane
    sum) are returned as a second array
    [5, R // (rows_per_block*128)]. ``anchor`` (e.g. the camera
    position) orders multi-tile groups near-to-far so the slab-test
    skip culls far tiles; None falls back to the world origin.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not interpret and rows_per_block % 8 != 0:
        # The kernel's wide (8, B/8) ray-state layout slices the [1, B]
        # lane rows into 8 lane-ALIGNED chunks, which needs B/8 to be a
        # multiple of the 128-lane vreg width. The TPU-semantics
        # interpreter (tests) has no such constraint.
        raise ValueError(
            "pallas tracer on hardware requires rows_per_block to be a "
            f"multiple of 8 (got {rows_per_block}); use 8/16/32/64/128"
        )
    if tables is None:
        tables = pack_intersection_tables(plane_table)
    n = ori.shape[0]
    block = rows_per_block * LANES
    # dense_nearest chunk width: cfg.lane_chunk, default the whole block
    # (monolithic). Measured at the 1080p operating point: chunking the
    # dot/test/select stage is strictly SLOWER (512: 14.7 ms, 1024:
    # 12.9, 2048: 12.1, monolithic 11.67 — and 4096 falls off a
    # register-pressure cliff to 312 ms), i.e. Mosaic schedules the
    # monolithic [rows, B] stage better than any manual lane split; the
    # knob stays for experiments on other geometries (PERF.md
    # "lane-chunk sweep"). Bitwise-identical at any value.
    lane_chunk = cfg.lane_chunk
    if lane_chunk is None:
        lane_chunk = block
    if lane_chunk < 1:
        # Guard BEFORE the modulo: 0 would raise a bare ZeroDivisionError
        # and a negative value passes Python's divisibility check
        # (4096 % -512 == 0) only to build an empty dense_nearest loop.
        raise ValueError(f"lane_chunk must be >= 1, got {lane_chunk}")
    lane_chunk = min(lane_chunk, block)
    if block % lane_chunk != 0:
        raise ValueError(
            f"lane_chunk {lane_chunk} must divide the ray block "
            f"({rows_per_block} rows_per_block * {LANES} = {block} lanes)"
        )
    n_pad = -n % block
    r_total = n + n_pad

    ot = jnp.pad(ori, ((0, n_pad), (0, 0))).T      # [3, R]
    dt = jnp.pad(dirs, ((0, n_pad), (0, 0))).T     # [3, R]
    ones = jnp.ones((1, r_total), jnp.float32)
    if seed_row is None:
        srow = jnp.zeros((1, r_total), jnp.float32)
    else:
        srow = jnp.pad(seed_row, (0, n_pad)).reshape(1, r_total)
    g_all = jnp.concatenate([ot, ones, dt, srow], axis=0)  # [8, R]

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    if anchor is None:
        anchor = jnp.zeros((3,), jnp.float32)
    out = _trace_padded(
        tables,
        g_all,
        seed_arr,
        jnp.asarray(anchor, jnp.float32).reshape(3),
        max_segments=cfg.max_segments,
        bounce_limit=cfg.bounce_limit,
        mirror_limit=cfg.mirror_limit,
        mirror_tint=cfg.mirror_tint,
        t_min=cfg.t_min,
        sky=tuple(cfg.sky_color) + (cfg.sky_strength, cfg.lighting_factor),
        block_rays=block,
        interpret=interpret,
        lane_chunk=lane_chunk,
        fresnel=cfg.fresnel,
        # Compensated K=24 hit-test dot: auto = hardware only (the
        # interpreter's f32 dot is already exact — the same
        # backend-matched-exactness policy as _rcp; goldens unchanged).
        compensated=(
            cfg.compensated_dot if cfg.compensated_dot is not None
            else not interpret
        ),
        slab_precompute=cfg.slab_precompute,
    )
    light = out[0:3, :n].T
    if return_block_segments:
        return light, out[3:8, ::block]
    return light
