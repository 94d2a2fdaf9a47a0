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

    def render_local(scene: DeviceScene, cams: Camera, key: jax.Array):
        # Local shard: [B/n_cam] cameras x [h/n_tile] rows of each frame.
        ci = jax.lax.axis_index("cam")
        ti = jax.lax.axis_index("tile")
        row0 = ti * rows_local
        ys = row0 + jnp.arange(rows_local, dtype=jnp.int32)
        xs = jnp.arange(w, dtype=jnp.int32)
        gx = jnp.broadcast_to(xs[None, :], (rows_local, w))
        gy = jnp.broadcast_to(ys[:, None], (rows_local, w))
        pix = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)

        def one(i, cam_i):
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 65536 + i), ti)
            cols = render_pixels(scene, cam_i, pix, k, cfg)
            return cols.reshape(rows_local, w, 3)

        b_local = cams.center.shape[0]
        frames = jax.vmap(one)(jnp.arange(b_local), cams)  # [Bl, rows, W, 3]

        # Global diagnostic via psum over both axes — no gather needed.
        local_sum = jnp.sum(frames)
        total = jax.lax.psum(jax.lax.psum(local_sum, "tile"), "cam")
        mean_lum = total / (n_cam * b_local * h * w * 3)
        return frames, mean_lum

    fn = shard_map(
        render_local,
        mesh=mesh,
        in_specs=(P(), P("cam"), P()),
        out_specs=(P("cam", "tile"), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def gather_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """Fetch assembled frames to host order (XLA reshards as needed)."""
    return jax.device_get(frames)
