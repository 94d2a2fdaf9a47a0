"""Frame rendering pipeline: pixels -> traced colors -> screen.

Ties camera ray generation, the per-sample jitter, the tracer, and the
per-pixel sample reduction together. The reference's threadgroup tree
reduction over 64 samples/pixel (`shaders.metal:342-367`) is a plain mean
over the sample axis here — free on TPU, and without the reference's
mem_none barrier race (SURVEY.md section 5).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..ops.sampling import ray_jitter
from .camera import Camera, ray_directions
from .intersect import nearest_hit_brute, nearest_hit_bvh
from .scenebuf import DeviceScene
from .tracer import tone_map, trace_paths


def make_nearest_fn(
    scene: DeviceScene, cfg: EngineConfig, max_depth: int, max_leaf: int
) -> Callable:
    """Select the intersection backend (EngineConfig.intersector)."""
    if cfg.intersector == "bvh":
        return lambda o, d: nearest_hit_bvh(
            scene, o, d, cfg.tracer.t_min, max_depth, max_leaf
        )
    if cfg.intersector == "exact":
        from .intersect import nearest_hit_exact

        return lambda o, d: nearest_hit_exact(scene, o, d, cfg.tracer.t_min)
    return lambda o, d: nearest_hit_brute(scene, o, d, cfg.tracer.t_min)


def render_pixels(
    scene: DeviceScene,
    cam: Camera,
    pixels_xy: jnp.ndarray,   # [K, 2] int (x, y)
    key: jax.Array,
    cfg: EngineConfig,
    nearest_fn: Callable | None = None,
) -> jnp.ndarray:
    """Trace spp samples for each pixel; returns tone-mapped colors [K, 3].

    Per-sample setup matches the compute kernel (`shaders.metal:281-303`):
    one camera ray per pixel, then each sample adds an unnormalized
    direction jitter of scale 0.001.
    """
    if nearest_fn is None and cfg.intersector in ("bvh", "exact"):
        # Honor the bvh backend even when the caller supplies no
        # nearest_fn (offline render_full_frame, direct calls) — it
        # previously fell through to brute force SILENTLY. Bounds
        # derivation needs the concrete scene, so jitted callers (the
        # engine steps, the sharded renderer) pre-build their
        # nearest_fn; this path runs eagerly.
        from ..runtime.step import derive_traversal_bounds

        nearest_fn = make_nearest_fn(
            scene, cfg, *derive_traversal_bounds(scene, cfg, None, None)
        )
    spp = cfg.screen.samples_per_pixel
    k = pixels_xy.shape[0]
    jkey, tkey = jax.random.split(key)

    base_dir = ray_directions(
        cam, pixels_xy, float(cfg.screen.width), float(cfg.screen.height)
    )                                                        # [K, 3]
    jit = ray_jitter(jkey, (k, spp), cfg.tracer.jitter)      # [K, spp, 3]
    dirs = (base_dir[:, None, :] + jit).reshape(k * spp, 3)
    ori = jnp.broadcast_to(cam.center, (k * spp, 3))

    if cfg.camera.aperture > 0.0:
        # Thin-lens depth of field (CameraConfig.aperture/focus_dist):
        # each sample's origin moves on a camera-plane lens disk and its
        # direction re-aims at the ray's focal point, so geometry at
        # focus_dist stays sharp and everything else blurs. Statically
        # absent at aperture 0 (the reference's pinhole, bit-unchanged).
        from ..ops.quat import rotate as quat_rotate

        lkey = jax.random.fold_in(jkey, 1)
        u1, u2 = jax.random.uniform(lkey, (2, k * spp))
        r = jnp.sqrt(u1) * cfg.camera.aperture
        phi = u2 * (2.0 * jnp.pi)
        off_cam = jnp.stack(
            [r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r)],
            axis=-1,
        )
        off = quat_rotate(
            off_cam,
            jnp.broadcast_to(cam.rotation, off_cam.shape[:-1] + (4,)),
        )
        focus_p = ori + dirs * cfg.camera.focus_dist
        ori = ori + off
        # Normalized: t (and t_min acceptance) is measured in |d| units.
        from ..ops.vecmath import normalize

        dirs = normalize(focus_p - ori)

    seed_row = None
    if cfg.tracer.noise_rng:
        from ..utils.noise import sample_noise

        # Reference seeding: per-pixel noise sample, shared by the
        # pixel's spp samples (`shaders.metal:288-300`). Honored by
        # EVERY backend (the jnp tracer folds it into its per-ray keys)
        # so noise_rng is never silently ignored off the pallas path.
        seed_row = jnp.repeat(sample_noise(scene.noise, pixels_xy), spp)

    if cfg.intersector == "pallas" and nearest_fn is None:
        from .pallas_tracer import trace_paths_pallas

        seed = jax.random.randint(tkey, (), 0, jnp.iinfo(jnp.int32).max)
        light = trace_paths_pallas(
            scene.plane_table, ori, dirs, seed, cfg.tracer,
            rows_per_block=cfg.tracer.block_rows,
            seed_row=seed_row,
            tables=scene.mxu_tables,
            anchor=cam.center,
        )
    else:
        light = trace_paths(scene, ori, dirs, tkey, cfg.tracer, nearest_fn,
                            seed_row=seed_row)
    samples = tone_map(light).reshape(k, spp, 3)
    return jnp.mean(samples, axis=1)


def render_full_frame(
    scene: DeviceScene,
    cam: Camera,
    key: jax.Array,
    cfg: EngineConfig,
    nearest_fn: Callable | None = None,
    rows_per_batch: int = 64,
) -> jnp.ndarray:
    """Offline full-frame render [H, W, 3] (float, tone-mapped, un-blurred).

    Batches over row blocks with lax.map so the [rays x planes] brute-force
    intermediates stay within memory at large resolutions.
    """
    h, w = cfg.screen.height, cfg.screen.width
    while h % rows_per_batch != 0:  # largest divisor of h <= requested
        rows_per_batch -= 1
    ys = jnp.arange(h, dtype=jnp.int32).reshape(-1, rows_per_batch)
    xs = jnp.arange(w, dtype=jnp.int32)

    def render_rows(args):
        y_block, bkey = args
        gy = jnp.broadcast_to(y_block[:, None], (rows_per_batch, w))
        gx = jnp.broadcast_to(xs[None, :], (rows_per_batch, w))
        pix = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
        cols = render_pixels(scene, cam, pix, bkey, cfg, nearest_fn)
        return cols.reshape(rows_per_batch, w, 3)

    keys = jax.random.split(key, ys.shape[0])
    blocks = jax.lax.map(render_rows, (ys, keys))
    return blocks.reshape(h, w, 3)
