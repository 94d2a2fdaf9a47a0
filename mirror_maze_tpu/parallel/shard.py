"""Multi-chip rendering via shard_map over a device mesh.

The reference is a single-process, single-GPU app with no distributed
capability (SURVEY.md section 2, "Parallelism & distributed strategies").
This module is the scale-out the TPU build adds (BASELINE.json config 5:
64x64 maze, 4K, batched multi-camera renders on a v5e-8 mesh):

- axis "cam": data parallelism over a batch of cameras (one logical frame
  per camera — multi-view / multi-player rendering);
- axis "tile": spatial parallelism over image row-bands of each frame
  (the renderer analog of sequence parallelism — SURVEY.md section 5);
- the scene is replicated (it is small and read-only, like weights under
  pure DP);
- frame assembly is an all_gather over "tile" riding ICI; a psum over the
  mesh produces the global mean-luminance diagnostic without ever
  materializing frames on one chip.

Everything is expressed with jax.sharding.Mesh + shard_map so XLA inserts
the collectives; no hand-rolled transport (the NCCL/MPI analog simply does
not exist here, by design).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EngineConfig
from ..render.camera import Camera
from ..render.pipeline import render_pixels
from ..render.scenebuf import DeviceScene

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(n_cam: int, n_tile: int, devices=None) -> Mesh:
    """Build a (cam, tile) mesh over the given (or all) devices."""
    import numpy as np

    devs = np.asarray(devices if devices is not None else jax.devices())
    assert devs.size >= n_cam * n_tile, (devs.size, n_cam, n_tile)
    return Mesh(devs[: n_cam * n_tile].reshape(n_cam, n_tile), ("cam", "tile"))


def batch_cameras(cams: list[Camera]) -> Camera:
    """Stack single cameras into a batched Camera pytree (leading axis B)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def make_sharded_renderer(
    cfg: EngineConfig, mesh: Mesh
) -> Callable[[DeviceScene, Camera, jax.Array], tuple[jnp.ndarray, jnp.ndarray]]:
    """Build the jitted sharded batched-frame renderer.

    Returns fn(scene, cams_batched, key) -> (frames [B, H, W, 3] sharded
    P('cam', 'tile'), mean_luminance [] replicated).
    """
    h, w = cfg.screen.height, cfg.screen.width
    n_tile = mesh.shape["tile"]
    n_cam = mesh.shape["cam"]
    assert h % n_tile == 0, (h, n_tile)
    rows_local = h // n_tile

    def build(md: int, ml: int):
        def render_local(scene: DeviceScene, cams: Camera, key: jax.Array):
            # Local shard: [B/n_cam] cameras x [h/n_tile] frame rows.
            # Explicit nearest_fn so the bvh backend is honored (pallas
            # dispatches inside render_pixels; passing a nearest_fn
            # there would override the kernel).
            nearest_fn = (
                None
                if cfg.intersector == "pallas"
                else make_nearest_fn(scene, cfg, md, ml)
            )
            ci = jax.lax.axis_index("cam")
            ti = jax.lax.axis_index("tile")
            row0 = ti * rows_local
            ys = row0 + jnp.arange(rows_local, dtype=jnp.int32)
            xs = jnp.arange(w, dtype=jnp.int32)
            gx = jnp.broadcast_to(xs[None, :], (rows_local, w))
            gy = jnp.broadcast_to(ys[:, None], (rows_local, w))
            pix = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)

            def one(i, cam_i):
                k = jax.random.fold_in(
                    jax.random.fold_in(key, ci * 65536 + i), ti
                )
                cols = render_pixels(scene, cam_i, pix, k, cfg, nearest_fn)
                return cols.reshape(rows_local, w, 3)

            b_local = cams.center.shape[0]
            frames = jax.vmap(one)(jnp.arange(b_local), cams)

            # Global diagnostic via psum over both axes — no gather.
            local_sum = jnp.sum(frames)
            total = jax.lax.psum(jax.lax.psum(local_sum, "tile"), "cam")
            mean_lum = total / (n_cam * b_local * h * w * 3)
            return frames, mean_lum

        return jax.jit(shard_map(
            render_local,
            mesh=mesh,
            in_specs=(P(), P("cam"), P()),
            out_specs=(P("cam", "tile"), P()),
            check_vma=False,
        ))

    # Same lazy traversal-bounds derivation as the engine: exact bounds
    # come from the concrete scene at first call (the generic wrapper
    # threads (scene, arg2, arg3) — here (scene, cams, key)).
    return _make_lazy_bounds_step(cfg, build, None, None)


def gather_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """Fetch assembled frames to host order (XLA reshards as needed)."""
    return jax.device_get(frames)


# --- Sharded interactive engine ----------------------------------------------
#
# The full engine step (progressive chunk refresh + camera sim + feedback
# blur), spatially sharded: the screen lives as row-bands on the 'tile'
# mesh axis, each band runs its own chunk queue over its own rows, camera
# simulation is replicated (identical inputs -> identical arithmetic on
# every shard), and the feedback blur exchanges 1-row halos with band
# neighbors over ICI via lax.ppermute so band seams blur exactly like the
# single-chip screen.

from typing import NamedTuple

from ..config import ScreenConfig
from ..render.accumulate import (
    cm_to_spatial,
    present_stage,
    scatter_chunk_rows,
    to_display,
)
from ..render.pipeline import make_nearest_fn, render_pixels
from ..render.scheduler import (
    chunk_origin_xy,
    chunk_pixels,
    sort_window_morton,
    take_chunks,
)
from ..runtime.state import FrameInputs
from ..runtime import step as step_mod


class ShardedEngineState(NamedTuple):
    """Engine state over a (cam=1, tile=n) mesh. Camera fields are
    replicated; screen/perm/cursor/key are per-band (leading axis sharded
    on 'tile'; cursor/key gain a [n_tile] band axis)."""

    cam_center: jnp.ndarray   # [3] replicated
    quat: jnp.ndarray         # [4] replicated
    half_theta: jnp.ndarray   # [] replicated
    screen: jnp.ndarray       # [C, cw*cw*3] CHUNK-MAJOR, sharded P('tile')
                              # (band-local rows; render/accumulate.py)
    perm: jnp.ndarray         # [C] sharded P('tile') — per-band queues
    cursor: jnp.ndarray       # [n_tile] sharded P('tile')
    key: jnp.ndarray          # [n_tile, 2] sharded P('tile')
    frame: jnp.ndarray        # [] replicated


def _band_screen_cfg(cfg: EngineConfig, n_tile: int) -> ScreenConfig:
    """Per-band ScreenConfig: used ONLY for the band-local chunk grid
    (scheduler addressing); ray generation always uses the GLOBAL screen
    config so pixel coords normalize against the full viewport."""
    import dataclasses

    s = cfg.screen
    assert s.height % n_tile == 0, (s.height, n_tile)
    rows = s.height // n_tile
    assert rows % s.chunk_width == 0, (rows, s.chunk_width)
    return dataclasses.replace(
        cfg.screen,
        height=rows,
        chunks_per_frame=max(1, s.effective_chunks_per_frame // n_tile),
    )


def _blur_with_halo(local: jnp.ndarray, axis: str = "tile") -> jnp.ndarray:
    """The reference's cross blur (`shaders.metal:219-222`) over a
    SPATIAL row-band, with 1-row halos exchanged between neighbor bands
    (ppermute over ICI); outermost bands clamp to the edge like the
    single-chip blur. Kept as the readable reference for
    _blur_with_halo_cm (the hot path)."""
    n = jax.lax.axis_size(axis)
    ti = jax.lax.axis_index(axis)
    down = jax.lax.ppermute(
        local[-1:], axis, [(i, i + 1) for i in range(n - 1)]
    )  # my top halo = upper neighbor's bottom row
    up = jax.lax.ppermute(
        local[:1], axis, [(i + 1, i) for i in range(n - 1)]
    )  # my bottom halo = lower neighbor's top row
    top = jnp.where(ti == 0, local[:1], down)
    bot = jnp.where(ti == n - 1, local[-1:], up)
    p = jnp.concatenate([top, local, bot], axis=0)
    p = jnp.pad(p, ((0, 0), (1, 1), (0, 0)), mode="edge")
    c = p[1:-1, 1:-1]
    l = p[1:-1, :-2]
    r = p[1:-1, 2:]
    u = p[:-2, 1:-1]
    d = p[2:, 1:-1]
    return (c + (l + r) / 2.0 + (u + d) / 2.0) / 3.0


def _exchange_halo_rows(t: jnp.ndarray, last: int, axis: str):
    """Exchange 1-PIXEL-row halos between adjacent bands of a chunk-major
    band screen ``t`` [cy, cx, cw, cw(y_off), 3]: returns (halo_top,
    halo_bot), each [1, cx, cw, 1, 3] — my top halo is the upper band's
    bottom pixel row (global y = (band, cy, yo)), my bottom halo the
    lower band's top row. Outermost bands get their OWN edge row, which
    reproduces the un-sharded screen's edge clamp exactly. Shared by the
    XLA blur (_blur_with_halo_cm) and the fused Pallas present
    (_present_with_halo) so the exchange cannot diverge between them."""
    n = jax.lax.axis_size(axis)
    ti = jax.lax.axis_index(axis)
    down = jax.lax.ppermute(
        t[-1:, :, :, last:], axis, [(i, i + 1) for i in range(n - 1)]
    )
    up = jax.lax.ppermute(
        t[0:1, :, :, 0:1], axis, [(i + 1, i) for i in range(n - 1)]
    )
    halo_top = jnp.where(ti == 0, t[0:1, :, :, 0:1], down)
    halo_bot = jnp.where(ti == n - 1, t[-1:, :, :, last:], up)
    return halo_top, halo_bot


def _blur_with_halo_cm(cm: jnp.ndarray, band: ScreenConfig,
                       axis: str = "tile") -> jnp.ndarray:
    """_blur_with_halo computed directly on the band's CHUNK-MAJOR
    screen (render/accumulate.py feedback_blur_cm, halo-exchanged): the
    exchanged halo is the 1-PIXEL-row slice of the boundary chunk row —
    [1, Cx, cw, 1, 3] — so the ICI traffic is identical to the spatial
    form's 1-row exchange; no 25 MB transposes on the hot path."""
    cw = band.chunk_width
    cy, cx = band.chunks_y, band.chunks_x
    last = cw - 1
    t = cm.reshape(cy, cx, cw, cw, 3)   # (cy, cx, x_off, y_off, c)
    halo_top, halo_bot = _exchange_halo_rows(t, last, axis)

    prev_y = jnp.concatenate([halo_top, t[:-1, :, :, last:]], axis=0)
    u = jnp.concatenate([prev_y, t[:, :, :, : last]], axis=3)
    next_y = jnp.concatenate([t[1:, :, :, 0:1], halo_bot], axis=0)
    d = jnp.concatenate([t[:, :, :, 1:], next_y], axis=3)
    prev_x = jnp.concatenate([t[:, 0:1, 0:1], t[:, :-1, last:]], axis=1)
    l = jnp.concatenate([prev_x, t[:, :, : last]], axis=2)
    next_x = jnp.concatenate([t[:, 1:, 0:1], t[:, -1:, last:]], axis=1)
    r = jnp.concatenate([t[:, :, 1:], next_x], axis=2)
    out = (t + (l + r) / 2.0 + (u + d) / 2.0) / 3.0
    return out.reshape(cy * cx, cw * cw * 3)


def _present_with_halo(cm: jnp.ndarray, band: ScreenConfig, quantize: bool,
                       axis: str = "tile") -> jnp.ndarray:
    """The fused Pallas present kernel (render/present.py) on a band
    screen: blur + quantize in one read+write, with the same 1-pixel-row
    ppermute halo exchange as _blur_with_halo_cm. The exchanged row is
    embedded at the chunk-major lane offsets of an adjacent sublane row
    (yo = cw-1 for the top halo, yo = 0 for the bottom) so the kernel's
    ordinary cross-row lane shifts read it; outermost bands pass their
    own edge row, which reproduces the single-screen clamp exactly
    (tested band-seam-identical to the single-chip present)."""
    from ..render.present import present_pallas

    cw = band.chunk_width
    cy, cx = band.chunks_y, band.chunks_x
    last = cw - 1
    t = cm.reshape(cy, cx, cw, cw, 3)
    halo_top, halo_bot = _exchange_halo_rows(t, last, axis)
    zpad = jnp.zeros((1, cx, cw, last, 3), jnp.float32)
    ht = jnp.concatenate([zpad, halo_top], axis=3).reshape(1, -1)
    hb = jnp.concatenate([halo_bot, zpad], axis=3).reshape(1, -1)
    return present_pallas(
        cm, chunks_x=cx, chunks_y=cy, cw=cw, quantize=quantize,
        halo_top=ht, halo_bot=hb,
    )


def _engine_locals(cfg: EngineConfig, mesh: Mesh):
    """Shard-local init/step functions + state specs + band ScreenConfig
    shared by the per-frame engine (make_sharded_engine) and the
    multi-frame scan engine (make_sharded_scan_engine)."""
    n_tile = mesh.shape["tile"]
    band = _band_screen_cfg(cfg, n_tile)
    n_chunks = band.effective_chunks_per_frame
    rows = band.height

    state_specs = ShardedEngineState(
        cam_center=P(), quat=P(), half_theta=P(),
        screen=P("tile"), perm=P("tile"), cursor=P("tile"),
        key=P("tile"), frame=P(),
    )

    def local_init(seed_arr):
        ti = jax.lax.axis_index("tile")
        key = jax.random.fold_in(jax.random.PRNGKey(seed_arr[0]), ti)
        pkey, key = jax.random.split(key)
        from ..render.camera import make_camera

        cam = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
        from ..ops import quat as quat_ops

        return ShardedEngineState(
            cam_center=cam.center,
            quat=cam.rotation,
            half_theta=quat_ops.half_theta_of(cam.rotation),
            screen=jnp.zeros(
                (band.total_chunks, band.pixels_per_chunk * 3),
                jnp.float32,
            ),
            perm=jax.random.permutation(pkey, band.total_chunks).astype(jnp.int32),
            cursor=jnp.zeros((1,), jnp.int32),
            key=key[None],
            frame=jnp.int32(0),
        )

    def local_step(scene: DeviceScene, state: ShardedEngineState,
                   inputs: FrameInputs, *, md: int, ml: int):
        ti = jax.lax.axis_index("tile")
        frame = state.frame + 1
        cursor = state.cursor[0]
        key = state.key[0]

        # Same backend selection as the single-chip step (runtime/step.py):
        # pallas dispatches inside render_pixels; bvh/brute get an explicit
        # nearest_fn.
        nearest_fn = (
            None
            if cfg.intersector == "pallas"
            else make_nearest_fn(scene, cfg, md, ml)
        )

        # 1. Pop this band's chunk window — Morton-sorted when configured,
        # exactly like the single-chip step (the coherence the tile skip
        # needs; ids are band-local so the BAND chunk grid sorts them).
        ids, cursor_next = take_chunks(state.perm, cursor, n_chunks)
        if cfg.screen.sort_chunk_window:
            ids = sort_window_morton(ids, band)
        perm_in = state.perm
        if cfg.screen.adaptive_refresh:
            # Detail-guided epoch order, per band (each band reorders
            # its own queue from its own screen rows — no collective).
            from ..render.scheduler import adaptive_reorder

            perm_in = adaptive_reorder(
                state.perm, cursor, cursor_next, state.screen
            )

        # 2-3. Camera: movement, collision, rotation — replicated math,
        # reusing the single-chip step's functions verbatim.
        moved = step_mod.integrate_movement(
            cfg, state.cam_center, state.quat, inputs.keys
        )
        center = step_mod.resolve_collision(cfg, scene, moved, state.cam_center)
        quat, half_theta, perm, cursor_out, key = step_mod.rotation_update(
            state.quat, state.half_theta, perm_in, cursor_next, key,
            inputs, cfg,
        )

        # 4. Trace this band's chunks: band-local chunk ids map to global
        # pixel rows by the band offset. Ray generation uses the GLOBAL
        # screen config — pixel coords normalize against the full
        # viewport, making band rays identical to the single-chip ones.
        fkey = jax.random.fold_in(key, frame)
        local_xy = chunk_origin_xy(ids, band)
        gxy = local_xy.at[:, 1].add(ti * rows)
        pixels = chunk_pixels(gxy, band.chunk_width)
        from ..render.camera import make_camera

        cam = make_camera(
            cfg.camera, cfg.screen.width / cfg.screen.height
        )._replace(center=center, rotation=quat)
        colors = render_pixels(scene, cam, pixels, fkey, cfg, nearest_fn)
        # Chunk-major row scatter on the BAND-LOCAL chunk grid (16x fewer
        # indices than per-pixel, render/accumulate.py).
        screen = scatter_chunk_rows(state.screen, ids, colors)

        # 5. Present: halo-exchanged feedback blur + quantization in
        # chunk-major space (bit-identical to the spatial form, no
        # transposes); by default the fused pallas kernel with embedded
        # halo rows (_present_with_halo), else the XLA form. The spatial
        # view is built only for display.
        screen = present_stage(
            screen, band,
            lambda scr, quantize: _present_with_halo(
                scr, band, quantize=quantize
            ),
            lambda scr: _blur_with_halo_cm(scr, band),
        )
        spatial = cm_to_spatial(screen, band)

        new_state = ShardedEngineState(
            cam_center=center, quat=quat, half_theta=half_theta,
            screen=screen, perm=perm, cursor=cursor_out[None],
            key=key[None], frame=frame,
        )
        return new_state, to_display(spatial)

    return state_specs, local_init, local_step, band


def _make_lazy_bounds_step(cfg, build_step, max_depth, max_leaf):
    """Wrap a (md, ml) -> jitted-step builder in lazy traversal-bounds
    derivation: bounds come from the CONCRETE scene at the first call
    (runtime/step.py derive_traversal_bounds) — fixed defaults silently
    drop primitives in large SAH leaves / corrupt the stack. Bounds are
    derived once per scene OBJECT and cached in a SINGLE slot — only the
    most recent scene is retained, so stepping a long-lived engine
    through many scenes never pins dead scenes' device arrays in HBM;
    jitted steps are cached per derived (depth, leaf) pair."""
    bounds_cache: list = []  # single slot: [(scene, bounds)]
    steps: dict = {}

    def step_fn(scene, state, inputs):
        from ..runtime.step import derive_traversal_bounds

        if bounds_cache and bounds_cache[0][0] is scene:
            bounds = bounds_cache[0][1]
        else:
            needs_scene = (
                cfg.intersector == "bvh"
                and (max_depth is None or max_leaf is None)
            )
            if needs_scene and isinstance(
                jax.tree_util.tree_leaves(scene)[0], jax.core.Tracer
            ):
                raise ValueError(
                    "traversal bounds for the 'bvh' intersector must be "
                    "derived from a CONCRETE scene, but this step is "
                    "being traced (e.g. wrapped in an outer jax.jit) "
                    "with the scene as a tracer. Derive bounds eagerly "
                    "(runtime/step.py derive_traversal_bounds) and pass "
                    "max_depth/max_leaf to the engine constructor."
                )
            bounds = derive_traversal_bounds(scene, cfg, max_depth, max_leaf)
            if not isinstance(
                jax.tree_util.tree_leaves(scene)[0], jax.core.Tracer
            ):
                bounds_cache[:] = [(scene, bounds)]
        if bounds not in steps:
            steps[bounds] = build_step(*bounds)
        return steps[bounds](scene, state, inputs)

    return step_fn


# --- Sharded checkpoint/resume ------------------------------------------------
#
# ShardedEngineState and the single-chip EngineState share field names and
# — crucially — the screen layout: band-local chunk id = global chunk id
# - ti*C_band (bands stack in y and chunk-major order is row-major over
# (cy, cx)), so the band-concatenated chunk-major screen IS the
# single-chip screen bit-for-bit. runtime/state.py save_state already
# serializes either state (np.asarray gathers sharded arrays to global
# layout); a checkpoint is sharded iff its cursor has a band axis.


def sharded_to_single(state, cfg: EngineConfig):
    """Convert a (gathered) ShardedEngineState to the single-chip layout.

    Exact fields: camera, yaw, frame counter, and the accumulation screen
    (band concat = identity, see above). The per-band chunk queues are
    INTERLEAVED positionally into one global queue after normalizing each
    band's cursor to 0 (rotating the queue preserves its pop order), so
    the single-chip engine's next windows refresh exactly the union of
    chunk sets the bands would have refreshed — the progressive-repaint
    cadence survives the conversion. The RNG key becomes band 0's key
    (one key cannot equal n band keys; noise realization diverges, image
    statistics do not).
    """
    import numpy as np

    from ..runtime.state import EngineState

    def _host(x):
        # Fully devolve mesh-sharded/replicated arrays: a converted
        # state must not carry the source mesh's shardings into the
        # target engine's jit (which would try to partition over it).
        return jnp.array(np.asarray(x))

    n_tile = int(np.asarray(state.cursor).shape[0])
    c_band = cfg.screen.total_chunks // n_tile
    perm = np.asarray(state.perm).reshape(n_tile, c_band)
    cursor = np.asarray(state.cursor)
    rolled = np.stack(
        [np.roll(perm[t], -int(cursor[t])) for t in range(n_tile)]
    )
    globalized = rolled + (np.arange(n_tile, dtype=rolled.dtype) * c_band)[:, None]
    interleaved = globalized.T.reshape(-1)  # position-major: b0[0], b1[0], ...
    key = np.asarray(state.key)[0]
    return EngineState(
        cam_center=_host(state.cam_center),
        quat=_host(state.quat),
        half_theta=_host(state.half_theta),
        screen=_host(state.screen),
        perm=jnp.array(interleaved.astype(np.int32)),
        cursor=jnp.int32(0),
        key=_host(key),
        frame=_host(state.frame),
    )


def single_to_sharded(state, cfg: EngineConfig, n_tile: int) -> ShardedEngineState:
    """Convert a single-chip EngineState to n_tile band shards.

    Exact fields as in sharded_to_single. The global queue is rotated to
    cursor 0 and FILTERED per band (order preserved): each band's queue
    pops its own chunks in the same relative order the single queue
    would have; the per-frame windows realign to cpf/n_tile per band.
    Band RNG keys derive from the single key by fold_in(band index).
    """
    import numpy as np

    def _host(x):
        return jnp.array(np.asarray(x))

    c_band = cfg.screen.total_chunks // n_tile
    if c_band * n_tile != cfg.screen.total_chunks:
        raise ValueError(
            f"{cfg.screen.total_chunks} chunks do not split into "
            f"{n_tile} bands"
        )
    perm = np.roll(np.asarray(state.perm), -int(np.asarray(state.cursor)))
    bands = [perm[(perm // c_band) == t] - t * c_band for t in range(n_tile)]
    key = _host(state.key)
    band_keys = jnp.stack([jax.random.fold_in(key, t) for t in range(n_tile)])
    return ShardedEngineState(
        cam_center=_host(state.cam_center),
        quat=_host(state.quat),
        half_theta=_host(state.half_theta),
        screen=_host(state.screen),
        perm=jnp.array(np.concatenate(bands).astype(np.int32)),
        cursor=jnp.zeros((n_tile,), jnp.int32),
        key=band_keys,
        frame=_host(state.frame),
    )


def load_sharded_state(path: str, cfg: EngineConfig,
                       n_tile: int) -> ShardedEngineState:
    """Restore any save_state checkpoint as an n_tile-band sharded state.

    Same-band-count sharded checkpoints restore BIT-EXACTLY; single-chip
    checkpoints (or sharded ones with a different band count) convert
    through the single-chip layout (see sharded_to_single /
    single_to_sharded for what is exact vs realigned). The arrays come
    back host-resident in the global layout; the jitted sharded step
    reshards them onto the mesh on first use.
    """
    import numpy as np

    from ..runtime.state import load_state

    with np.load(path) as z:
        missing = [k for k in ShardedEngineState._fields if k not in z]
        if missing:
            raise ValueError(
                f"checkpoint {path!r} lacks field(s) {missing} — not a "
                "save_state checkpoint (or from an incompatible version)"
            )
        fields = {k: jnp.asarray(z[k]) for k in ShardedEngineState._fields}
    if fields["cursor"].ndim == 1:  # sharded checkpoint
        st = ShardedEngineState(**fields)
        saved_bands = st.cursor.shape[0]
        if saved_bands == n_tile:
            _validate_band_shapes(st, cfg, n_tile, path)
            return st
        single = sharded_to_single(st, cfg)
    else:
        single = load_state(path, cfg)
    return single_to_sharded(single, cfg, n_tile)


def _validate_band_shapes(st: ShardedEngineState, cfg: EngineConfig,
                          n_tile: int, path: str) -> None:
    want = (cfg.screen.total_chunks, cfg.screen.pixels_per_chunk * 3)
    if st.screen.shape != want:
        raise ValueError(
            f"checkpoint {path!r} screen shape {st.screen.shape} does not "
            f"match this config's chunk-major {want}; resume with the "
            "resolution/chunking it was saved under"
        )
    if st.perm.shape != (cfg.screen.total_chunks,):
        raise ValueError(
            f"checkpoint {path!r} chunk queue {st.perm.shape} does not "
            f"match this config's {(cfg.screen.total_chunks,)}"
        )
    if st.key.shape != (n_tile, 2):
        raise ValueError(
            f"checkpoint {path!r} key shape {st.key.shape} does not match "
            f"{(n_tile, 2)}"
        )


def make_sharded_engine(cfg: EngineConfig, mesh: Mesh,
                        max_depth: int | None = None,
                        max_leaf: int | None = None):
    """Build (init_fn, step_fn) for the tile-sharded interactive engine.

    init_fn(seed) -> ShardedEngineState; step_fn(scene, state,
    FrameInputs) -> (state, frame [H, W, 3] uint8 sharded P('tile')).
    Camera semantics are identical to the single-chip step
    (runtime/step.py); the progressive refresh runs one independent chunk
    queue per band, and the feedback blur exchanges halos so output has
    no band seams.

    Traversal bounds for the "bvh" intersector default to EXACT values
    derived from the concrete scene at the first step call
    (runtime/step.py derive_traversal_bounds, cached per scene object) —
    fixed bounds silently drop primitives in large SAH leaves / corrupt
    the stack. Passing explicit bounds skips the derivation.
    """
    state_specs, local_init, local_step, band = _engine_locals(cfg, mesh)

    init_sharded = jax.jit(
        shard_map(
            local_init, mesh=mesh, in_specs=(P(),), out_specs=state_specs,
            check_vma=False,
        )
    )

    def build_step(md: int, ml: int):
        return jax.jit(
            shard_map(
                partial(local_step, md=md, ml=ml), mesh=mesh,
                in_specs=(P(), state_specs, P()),
                out_specs=(state_specs, P("tile")),
                check_vma=False,
            ),
            donate_argnums=(1,),
        )

    step_fn = _make_lazy_bounds_step(cfg, build_step, max_depth, max_leaf)

    def init_fn(seed: int = 0) -> ShardedEngineState:
        return init_sharded(jnp.array([seed], jnp.int32))

    return init_fn, step_fn


def make_sharded_scan_engine(cfg: EngineConfig, mesh: Mesh, n_frames: int,
                             max_depth: int | None = None,
                             max_leaf: int | None = None):
    """Multi-frame tile-sharded engine: n_frames steps per device launch
    via lax.scan INSIDE the shard_map (the collectives — halo ppermute —
    run each scanned frame over ICI with no host round trips).

    This is the sharded twin of runtime/step.py make_scan_step: one
    launch per n_frames amortizes dispatch latency, which is what the
    single-chip engine needed for 60 fps over a remote-dispatch link
    (PERF.md) and config 5's batched scale-out claim needs here.

    init_fn(seed) -> ShardedEngineState; scan_fn(scene, state, inputs)
    -> (state, last frame [H, W, 3] uint8 sharded P('tile')), where
    ``inputs`` is a FrameInputs pytree with a leading [n_frames] axis
    (runtime/step.py stack_inputs / repeat_input). Only the final frame
    is materialized.
    """
    state_specs, local_init, local_step, band = _engine_locals(cfg, mesh)

    init_sharded = jax.jit(
        shard_map(
            local_init, mesh=mesh, in_specs=(P(),), out_specs=state_specs,
            check_vma=False,
        )
    )

    def build_step(md: int, ml: int):
        def local_scan(scene: DeviceScene, state: ShardedEngineState,
                       inputs: FrameInputs):
            def body(st, inp):
                new_st, _ = local_step(scene, st, inp, md=md, ml=ml)
                return new_st, None

            final, _ = jax.lax.scan(body, state, inputs)
            return final, to_display(cm_to_spatial(final.screen, band))

        return jax.jit(
            shard_map(
                local_scan, mesh=mesh,
                in_specs=(P(), state_specs, P()),
                out_specs=(state_specs, P("tile")),
                check_vma=False,
            ),
            donate_argnums=(1,),
        )

    scan_fn = _make_lazy_bounds_step(cfg, build_step, max_depth, max_leaf)

    def init_fn(seed: int = 0) -> ShardedEngineState:
        return init_sharded(jnp.array([seed], jnp.int32))

    return init_fn, scan_fn
