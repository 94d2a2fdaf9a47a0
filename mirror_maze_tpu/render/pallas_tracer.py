"""Pallas wavefront path tracer — the fused TPU megakernel.

This is the TPU-native recast of the reference's Metal compute kernel
(`shaders.metal:245-368`). One pallas program owns a block of rays living
entirely in VMEM; the whole bounce loop (nearest-hit search, shading,
scattering, RNG) runs on-chip, so no [rays x planes] intermediate ever
touches HBM — unlike the XLA brute-force path, whose t/s1/s2 matrices are
HBM-resident and make the tracer bandwidth-bound at 1080p.

Mapping from the reference:
- threadgroup-of-1024-threads per 4x4 chunk  ->  grid program per ray block
  of ROWS x 128 lanes (rays are the vector axis; the VPU replaces SIMD
  threads);
- per-thread BVH stack traversal (`shaders.metal:115-156`)  ->  a
  sequential fori_loop over the (small) plane table broadcast from VMEM
  scratch, every lane testing one plane per step — branchless, fully
  vectorized, and faster than a divergent stack walk below a few thousand
  planes (SURVEY.md section 7 "hard parts" #1);
- the data-dependent `for n < bounce_limit + mirror_hits` loop
  (`shaders.metal:306`)  ->  a while_loop with per-lane liveness masks and
  an all-dead early exit;
- PCG hash + noise texture RNG (`shaders.metal:181-186, 288-300`)  ->  the
  TPU's hardware PRNG (pltpu.prng_*), seeded per program;
- rejection-sampled unit vectors (`shaders.metal:315-318`)  ->  closed-form
  (z, phi) sphere sampling (distribution-equivalent, fixed shape);
- threadgroup tree reduction (`shaders.metal:342-367`)  ->  plain jnp mean
  over the sample axis outside the kernel.

Scene encoding: one [P, 24] float32 table (see PLANE_COLS) built once at
upload; it rides in VMEM scratch (a few KB for maze scenes) and each
fori_loop step broadcasts one row. Scales to roughly 5k planes before a
culling structure is needed (config 5 — future work: maze-grid DDA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TracerConfig

BIG = 1e30
LANES = 128

# Column layout of the plane table.
PLANE_COLS = dict(
    normal=(0, 3), d=3, w1=(4, 7), b1=7, w2=(8, 11), b2=11,
    color=(12, 15), emission=(15, 18),  # premultiplied rgb * strength
    is_mirror=18, valid=19,  # 20..23 padding
)
PLANE_WIDTH = 24


def build_plane_table(der) -> np.ndarray:
    """Pack SceneDerived into the kernel's [P, 24] table."""
    p = der.normal.shape[0]
    t = np.zeros((p, PLANE_WIDTH), np.float32)
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
    return t


def _pcg_init(seed, shape):
    """Per-lane PCG state from a scalar seed + lane linear index — the TPU
    equivalent of the reference's per-thread seed from pixel coords + time
    (`shaders.metal:288-300`). Plain integer ops: works identically under
    the Mosaic compiler and the interpreter (whose pltpu.prng_random_bits
    silently returns zeros), and makes goldens backend-independent."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    state = (
        seed.astype(jnp.uint32)
        + rows * jnp.uint32(9737333)
        + cols * jnp.uint32(15823)
    )
    # one mixing round so nearby lanes decorrelate immediately
    return state * jnp.uint32(747796405) + jnp.uint32(291336453)


def _pcg_uniform(state):
    """Advance the per-lane PCG state; returns (new_state, float32 in
    [0,1)). This is the reference's RNG verbatim (`shaders.metal:181-186`)."""
    state = state * jnp.uint32(747796405) + jnp.uint32(291336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    word = (word >> 22) ^ word
    # Mosaic has no uint32->f32 cast; the top 24 bits fit in a positive
    # int32, so bitcast then convert.
    top24 = pltpu.bitcast(word >> 8, jnp.int32)
    return state, top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _tracer_kernel(
    seed_ref,     # SMEM [1] int32
    planes_ref,   # VMEM [P, PLANE_WIDTH]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,   # VMEM [ROWS, 128]
    lr_ref, lg_ref, lb_ref,                            # VMEM out [ROWS, 128]
    *,
    n_planes: int,
    max_segments: int,
    bounce_limit: int,
    mirror_limit: int,
    mirror_tint: float,
    t_min: float,
):
    pid = pl.program_id(0)
    shape = ox_ref.shape
    rng0 = _pcg_init(
        seed_ref[0].astype(jnp.uint32)
        + pid.astype(jnp.uint32) * jnp.uint32(2654435761),
        shape,
    )
    f0 = jnp.zeros(shape, jnp.float32)
    f1 = jnp.ones(shape, jnp.float32)

    def nearest(ox, oy, oz, dx, dy, dz):
        """Sequential sweep over the plane table; returns the nearest-hit
        distance and the hit plane's properties, selected on the fly (no
        gathers — the index never materializes)."""
        init = (
            jnp.full(shape, BIG, jnp.float32),      # t
            f0, f0, f0,                              # normal
            f0, f0, f0,                              # albedo
            f0, f0, f0,                              # emission (premult)
            f0,                                      # is_mirror
        )

        def body(p, c):
            t, nx, ny, nz, cr, cg, cb, er, eg, eb, mir = c
            row = planes_ref[p, :]
            pnx, pny, pnz, pd = row[0], row[1], row[2], row[3]
            w1x, w1y, w1z, b1 = row[4], row[5], row[6], row[7]
            w2x, w2y, w2z, b2 = row[8], row[9], row[10], row[11]
            denom = dx * pnx + dy * pny + dz * pnz
            tt = (pd - (ox * pnx + oy * pny + oz * pnz)) / denom
            hx = ox + tt * dx
            hy = oy + tt * dy
            hz = oz + tt * dz
            s1 = hx * w1x + hy * w1y + hz * w1z - b1
            s2 = hx * w2x + hy * w2y + hz * w2z - b2
            ok = (
                (denom != 0.0)
                & (tt > t_min) & (tt < t)
                & (s1 >= 0.0) & (s1 <= 1.0)
                & (s2 >= 0.0) & (s2 <= 1.0)
                & (row[19] > 0.0)
            )
            sel = lambda a, b: jnp.where(ok, a, b)
            return (
                sel(tt, t),
                sel(pnx, nx), sel(pny, ny), sel(pnz, nz),
                sel(row[12], cr), sel(row[13], cg), sel(row[14], cb),
                sel(row[15], er), sel(row[16], eg), sel(row[17], eb),
                sel(row[18], mir),
            )

        return jax.lax.fori_loop(0, n_planes, body, init)

    def segment(carry):
        (seg, rng_i, ox, oy, oz, dx, dy, dz, tr, tg, tb, lr, lg, lb,
         mh, dc, alive_i) = carry
        # Mosaic's scf.while cannot carry vector i1/ui32 — masks ride as
        # int32 and the RNG state as a bitcast int32.
        rng = pltpu.bitcast(rng_i, jnp.uint32)
        alive = alive_i != 0

        t, nx, ny, nz, cr, cg, cb, er, eg, eb, mir = nearest(
            ox, oy, oz, dx, dy, dz
        )
        hit = alive & (t < BIG)
        dn = dx * nx + dy * ny + dz * nz
        side = -jnp.sign(dn)

        is_mir = mir > 0.0
        diffuse = hit & ((~is_mir) | (side == -1.0))
        mirror = hit & is_mir & (side != -1.0)
        mh_new = mh + mirror.astype(jnp.int32)
        mirror_live = mirror & (mh_new < mirror_limit)
        advance = diffuse | mirror_live

        # Uniform unit vector via (z, phi) (distribution-equivalent to the
        # reference's rejection sampling, `shaders.metal:315-319`).
        rng, u1 = _pcg_uniform(rng)
        rng, u2 = _pcg_uniform(rng)
        z = u1 * 2.0 - 1.0
        phi = u2 * (2.0 * np.pi)
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        ux = r * jnp.cos(phi)
        uy = r * jnp.sin(phi)
        uz = z

        # Diffuse: emission pickup, albedo attenuation, cosine-ish scatter
        # along normal*side + unit vector (`shaders.metal:311-323`).
        lr = jnp.where(diffuse, lr + er * tr, lr)
        lg = jnp.where(diffuse, lg + eg * tg, lg)
        lb = jnp.where(diffuse, lb + eb * tb, lb)
        tr = jnp.where(diffuse, tr * cr, tr)
        tg = jnp.where(diffuse, tg * cg, tg)
        tb = jnp.where(diffuse, tb * cb, tb)
        sx = ux + nx * side
        sy = uy + ny * side
        sz = uz + nz * side
        s_inv = jax.lax.rsqrt(sx * sx + sy * sy + sz * sz)

        # Mirror: flat tint + reflect (`shaders.metal:324-330`).
        lr = jnp.where(mirror_live, lr + cr * mirror_tint, lr)
        lg = jnp.where(mirror_live, lg + cg * mirror_tint, lg)
        lb = jnp.where(mirror_live, lb + cb * mirror_tint, lb)
        rx = dx - 2.0 * dn * nx
        ry = dy - 2.0 * dn * ny
        rz = dz - 2.0 * dn * nz
        r_inv = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz)

        ox = jnp.where(advance, ox + dx * t, ox)
        oy = jnp.where(advance, oy + dy * t, oy)
        oz = jnp.where(advance, oz + dz * t, oz)
        dx = jnp.where(diffuse, sx * s_inv, jnp.where(mirror_live, rx * r_inv, dx))
        dy = jnp.where(diffuse, sy * s_inv, jnp.where(mirror_live, ry * r_inv, dy))
        dz = jnp.where(diffuse, sz * s_inv, jnp.where(mirror_live, rz * r_inv, dz))

        dc_new = dc + diffuse.astype(jnp.int32)
        alive = (
            alive & hit & ~(mirror & ~mirror_live) & (dc_new < bounce_limit)
        )
        return (seg + 1, pltpu.bitcast(rng, jnp.int32),
                ox, oy, oz, dx, dy, dz, tr, tg, tb,
                lr, lg, lb, mh_new, dc_new, alive.astype(jnp.int32))

    def cond(carry):
        seg, alive_i = carry[0], carry[-1]
        return (seg < max_segments) & (jnp.max(alive_i) > 0)

    init = (
        jnp.int32(0),
        pltpu.bitcast(rng0, jnp.int32),
        ox_ref[:], oy_ref[:], oz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        f1, f1, f1,
        f0, f0, f0,
        jnp.zeros(shape, jnp.int32),
        jnp.zeros(shape, jnp.int32),
        jnp.ones(shape, jnp.int32),
    )
    out = jax.lax.while_loop(cond, segment, init)
    lr_ref[:] = out[11]
    lg_ref[:] = out[12]
    lb_ref[:] = out[13]


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_segments", "bounce_limit", "mirror_limit",
        "mirror_tint", "t_min", "rows_per_block", "interpret",
    ),
)
def _trace_padded(
    plane_table: jnp.ndarray,   # [P, 24]
    comps: tuple,               # 6 arrays [rows, 128]
    seed: jnp.ndarray,          # [1] int32
    *,
    max_segments: int,
    bounce_limit: int,
    mirror_limit: int,
    mirror_tint: float,
    t_min: float,
    rows_per_block: int,
    interpret: bool,
):
    rows = comps[0].shape[0]
    n_blocks = rows // rows_per_block
    n_planes = plane_table.shape[0]

    kernel = functools.partial(
        _tracer_kernel,
        n_planes=n_planes,
        max_segments=max_segments,
        bounce_limit=bounce_limit,
        mirror_limit=mirror_limit,
        mirror_tint=mirror_tint,
        t_min=t_min,
    )
    ray_spec = pl.BlockSpec(
        (rows_per_block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    flops_per_plane = 45
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.VMEM),   # plane table (whole)
        ] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32) for _ in range(3)
        ),
        cost_estimate=pl.CostEstimate(
            flops=rows * LANES * n_planes * max_segments * flops_per_plane,
            bytes_accessed=rows * LANES * 4 * 9,
            transcendentals=rows * LANES * max_segments * 3,
        ),
        # On CPU (tests) run under the TPU-semantics interpreter so
        # pltpu.prng_* and SMEM refs keep working.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, plane_table, *comps)
    return out


def trace_paths_pallas(
    plane_table: jnp.ndarray,
    ori: jnp.ndarray,    # [R, 3]
    dirs: jnp.ndarray,   # [R, 3]
    seed: jnp.ndarray,   # int32 scalar (any shape ()-like)
    cfg: TracerConfig,
    rows_per_block: int = 32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Trace a ray wavefront with the fused kernel; returns light [R, 3].

    Pads R up to a whole number of blocks; padded lanes carry zero
    directions, miss every plane, and die on segment one.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = ori.shape[0]
    block = rows_per_block * LANES
    n_pad = -n % block
    rows = (n + n_pad) // LANES

    def comp(a, i):
        return jnp.pad(a[:, i], (0, n_pad)).reshape(rows, LANES)

    comps = tuple(comp(ori, i) for i in range(3)) + tuple(
        comp(dirs, i) for i in range(3)
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    lr, lg, lb = _trace_padded(
        plane_table,
        comps,
        seed_arr,
        max_segments=cfg.max_segments,
        bounce_limit=cfg.bounce_limit,
        mirror_limit=cfg.mirror_limit,
        mirror_tint=cfg.mirror_tint,
        t_min=cfg.t_min,
        rows_per_block=rows_per_block,
        interpret=interpret,
    )
    light = jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    )
    return light
