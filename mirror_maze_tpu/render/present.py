"""Fused Pallas present kernel: feedback blur + 8-bit quantization in one
pass over the CHUNK-MAJOR screen.

The XLA-composed chunk-major blur (render/accumulate.py feedback_blur_cm)
measures 1.14 ms at 1080p — ~18x above the ~60 us of pure HBM traffic it
needs — because its shifted-slice concats materialize intermediates. This
kernel computes the same cross blur (`shaders.metal:219-222`) + RGBA8
quantization (`main.rs:704` write semantics) in ONE read + ONE write of
the screen.

Layout algebra (the reason this is cheap): view the chunk-major screen
[C, cw*cw*3] as [Cy, L] with L = Cx*cw*cw*3 — one chunk ROW of the
screen per sublane row. A pixel (cy, cx, xo, yo, ch) sits at lane
cx*(3*cw*cw) + xo*(3*cw) + yo*3 + ch. Then:

- x-1 / x+1 neighbors are UNIFORM -+(3*cw)-lane shifts — crossing a
  chunk boundary in x lands on the previous chunk's xo = cw-1 column,
  whose lane offset is exactly the same shift;
- y-1 / y+1 are -+3-lane shifts within the chunk, except the chunk-edge
  pixel rows (yo = 0 / cw-1), which read the ADJACENT SUBLANE ROW at a
  +-3*(cw-1)-lane shift;
- screen edges clamp (the spatial blur's edge pad): global-lane masks
  for x, first/last sublane rows for y.

Grid: LANE strips of the [Cy, L] view, full column height per block —
the sublane dim always equals the full array dim (Mosaic requires block
dims divisible by (8, 128) or full; Cy = 270 at 1080p is not
8-divisible, so row strips are not lowerable, lane strips are). Every
y-neighbor is then block-local; x-neighbors at strip borders come from
two 128-lane halo input blocks at the adjacent lane-block indices
(input block windows may overlap; only the output partitions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _present_kernel(*refs,
                    cw: int, L: int, Lb: int, quantize: bool, recip: bool,
                    halo: bool):
    if halo:
        (lh_ref, center_ref, rh_ref,
         htl_ref, htc_ref, htr_ref,
         hbl_ref, hbc_ref, hbr_ref, out_ref) = refs
    else:
        lh_ref, center_ref, rh_ref, out_ref = refs
    k = pl.program_id(0)
    t = center_ref[...]                    # [Cy, Lb] f32
    px = 3 * cw                            # lanes per x-step of one pixel
    # 2*px-lane extension: the last/first px lanes of the neighboring
    # strips (self at the screen's x edges — masked below anyway).
    ext = jnp.concatenate(
        [lh_ref[...][:, -px:], t, rh_ref[...][:, :px]], axis=1
    )                                      # [Cy, Lb + 2*px]

    def sl(src, lane_delta):
        # ext column j holds global lane k*Lb + j - px: the center lane i
        # shifted by delta lives at ext column i + px + delta.
        return jax.lax.slice_in_dim(src, px + lane_delta,
                                    px + lane_delta + Lb, axis=1)

    ext_m1 = jnp.concatenate([ext[0:1], ext[:-1]], axis=0)   # row above
    ext_p1 = jnp.concatenate([ext[1:], ext[-1:]], axis=0)    # row below

    lane = k * Lb + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    n_rows = t.shape[0]
    yo_first = lane % px < 3               # yo == 0 pixel rows
    yo_last = lane % px >= px - 3          # yo == cw-1 pixel rows

    # x neighbors: uniform +-px-lane shifts, screen-edge clamp by lane.
    l = jnp.where(lane < px, t, sl(ext, -px))
    r = jnp.where(lane >= L - px, t, sl(ext, px))
    # y neighbors: +-3 within the chunk; chunk-edge pixel rows read the
    # adjacent sublane row at the opposite chunk edge (+-3*(cw-1)).
    u = jnp.where(yo_first, sl(ext_m1, px - 3), sl(ext, -3))
    d = jnp.where(yo_last, sl(ext_p1, -(px - 3)), sl(ext, 3))
    if halo:
        # Band mode (sharded screen): the top/bottom chunk rows read
        # HALO rows — the neighbor band's boundary pixel row, embedded
        # at the same chunk-major lane offsets an adjacent sublane row
        # would have (yo=last for the top halo, yo=0 for the bottom), so
        # the very same lane shifts apply. Outermost bands pass their
        # own edge row, reproducing the single-screen clamp exactly.
        ext_ht = jnp.concatenate(
            [htl_ref[...][:, -px:], htc_ref[...], htr_ref[...][:, :px]],
            axis=1,
        )                                  # [1, Lb + 2*px]
        ext_hb = jnp.concatenate(
            [hbl_ref[...][:, -px:], hbc_ref[...], hbr_ref[...][:, :px]],
            axis=1,
        )
        u = jnp.where((row == 0) & yo_first, sl(ext_ht, px - 3), u)
        d = jnp.where((row == n_rows - 1) & yo_last,
                      sl(ext_hb, -(px - 3)), d)
    else:
        # Single screen: global top/bottom pixel rows clamp to the edge.
        u = jnp.where((row == 0) & yo_first, t, u)
        d = jnp.where((row == n_rows - 1) & yo_last, t, d)

    # On hardware, XLA-TPU compiles the blur's /3 and /255 as reciprocal
    # MULTIPLIES (--xla_allow_excess_precision; verified bitwise-equal to
    # * (1/3f) and NOT to rounded division on v5e), while Mosaic lowers
    # true division exactly — a 1-ulp-per-element drift that compounds
    # through quantized feedback. Match each backend's XLA blur: multiply
    # on hardware, divide under the CPU interpreter (XLA-CPU divides).
    s = (t + (l + r) / 2.0 + (u + d) / 2.0)
    out = s * jnp.float32(1.0 / 3.0) if recip else s / 3.0
    if quantize:
        q = jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0)
        out = q * jnp.float32(1.0 / 255.0) if recip else q / 255.0
    out_ref[...] = out


def _pick_lane_strip(cy: int, L: int, budget_bytes: int = 1_000_000) -> int:
    """Largest 128-multiple lane-strip width dividing L whose [Cy, Lb]
    center block fits the VMEM budget (the kernel holds ~10 block-sized
    intermediates and the scoped-vmem limit is 16 MB — measured OOM at a
    2.5 MB center); L itself when L has no 128-aligned divisor (tiny
    screens — single block is always lowerable)."""
    if L % 128 == 0:
        narrowest = 128
        for units in range(L // 128, 0, -1):
            Lb = units * 128
            if L % Lb == 0:
                narrowest = Lb
                if cy * Lb * 4 <= budget_bytes:
                    return Lb
        # Nothing fits the budget (very tall screens: cy alone exceeds
        # it at Lb=128). The narrowest strip is the least-bad block —
        # falling through to the FULL row width here guaranteed a
        # many-MB single block that cannot lower at all.
        return narrowest
    return L


@functools.partial(
    jax.jit, static_argnames=("chunks_x", "chunks_y", "cw", "quantize",
                              "interpret")
)
def present_pallas(
    cm: jnp.ndarray,        # [C, cw*cw*3] chunk-major screen
    *,
    chunks_x: int,
    chunks_y: int,
    cw: int,
    quantize: bool,
    interpret: bool | None = None,
    halo_top: jnp.ndarray | None = None,   # [1, Cx*cw*cw*3], yo=last lanes
    halo_bot: jnp.ndarray | None = None,   # [1, Cx*cw*cw*3], yo=0 lanes
) -> jnp.ndarray:
    """Blur(+quantize) the chunk-major screen; bit-identical to
    accumulate.feedback_blur_cm (+ quantize_8bit) under jit — tested.

    ``halo_top``/``halo_bot`` (both or neither) switch the top/bottom
    edge from clamping to reading a neighbor band's boundary pixel row
    (the sharded screen; parallel/shard.py embeds the ppermute'd rows at
    the matching chunk-major lane offsets)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    use_halo = halo_top is not None
    assert (halo_top is None) == (halo_bot is None)
    L = chunks_x * cw * cw * 3
    Lb = _pick_lane_strip(chunks_y, L)
    n_blocks = L // Lb
    halo = min(128, Lb)
    if 3 * cw > halo:
        # The x-neighbor shifts are +-3*cw lanes; at strip borders they
        # read from the fixed-width halo input blocks. Without this
        # check a too-wide chunk slices past the halo and dies deep in
        # kernel tracing with an opaque out-of-bounds error.
        raise ValueError(
            f"present_pallas needs 3*chunk_width <= {halo} halo lanes "
            f"(chunk_width {cw} -> {3 * cw}); use chunk_width <= "
            f"{halo // 3} or the XLA present path (pallas_present=False)"
        )
    x2d = cm.reshape(chunks_y, L)

    kern = functools.partial(
        _present_kernel, cw=cw, L=L, Lb=Lb, quantize=quantize,
        recip=not interpret, halo=use_halo,
    )
    nh = Lb // halo  # halo-block units per strip
    lh_spec = pl.BlockSpec(
        (chunks_y, halo), lambda k: (0, jnp.maximum(k * nh - 1, 0))
    )
    c_spec = pl.BlockSpec((chunks_y, Lb), lambda k: (0, k))
    rh_spec = pl.BlockSpec(
        (chunks_y, halo),
        lambda k: (0, jnp.minimum((k + 1) * nh, L // halo - 1)),
    )
    in_specs = [lh_spec, c_spec, rh_spec]
    args = [x2d, x2d, x2d]
    if use_halo:
        hl_spec = pl.BlockSpec(
            (1, halo), lambda k: (0, jnp.maximum(k * nh - 1, 0))
        )
        hc_spec = pl.BlockSpec((1, Lb), lambda k: (0, k))
        hr_spec = pl.BlockSpec(
            (1, halo),
            lambda k: (0, jnp.minimum((k + 1) * nh, L // halo - 1)),
        )
        ht = halo_top.reshape(1, L)
        hb = halo_bot.reshape(1, L)
        in_specs += [hl_spec, hc_spec, hr_spec] * 2
        args += [ht, ht, ht, hb, hb, hb]
    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=c_spec,
        out_shape=jax.ShapeDtypeStruct((chunks_y, L), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*args)
    return out.reshape(cm.shape)


def present(cm: jnp.ndarray, screen_cfg, quantize: bool,
            interpret: bool | None = None) -> jnp.ndarray:
    """The engine's present stage on a chunk-major screen."""
    return present_pallas(
        cm,
        chunks_x=screen_cfg.chunks_x,
        chunks_y=screen_cfg.chunks_y,
        cw=screen_cfg.chunk_width,
        quantize=quantize,
        interpret=interpret,
    )
