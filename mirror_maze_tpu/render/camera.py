"""Pinhole camera: state pytree and batched primary-ray generation.

Reference: the Camera struct (`main.rs:32-39`) and the kernel's ray setup
(`shaders.metal:281-284`): viewport height 2.0, width 2*W/H, focal length
1.0 (`main.rs:732-741`); the un-rotated ray direction is built from the
viewport corner and the ray is then rotated by the camera quaternion using
the (q^-1 v q) convention. Pixel centers are NOT half-pixel offset — the
shader uses raw pixel.x/width (`shaders.metal:281`), replicated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import CameraConfig
from ..ops import quat as quat_ops
from ..ops.vecmath import normalize


class Camera(NamedTuple):
    center: jnp.ndarray    # [3]
    rotation: jnp.ndarray  # [4] quaternion (x, y, z, w)
    focal: jnp.ndarray     # [] scalar
    viewport: jnp.ndarray  # [2] (width, height)


def make_camera(cfg: CameraConfig, aspect: float) -> Camera:
    """Initial camera from config (`main.rs:732-747`)."""
    look = jnp.asarray(cfg.look_dir, dtype=jnp.float32)
    vh = cfg.viewport_height
    return Camera(
        center=jnp.asarray(cfg.spawn, dtype=jnp.float32),
        rotation=quat_ops.from_look_dir(look),
        focal=jnp.float32(cfg.focal_length),
        viewport=jnp.array([vh * aspect, vh], dtype=jnp.float32),
    )


def ray_directions(
    cam: Camera, pixels_xy: jnp.ndarray, width: float, height: float
) -> jnp.ndarray:
    """Primary ray directions for pixel coordinates [..., 2] (x, y).

    Matches `shaders.metal:281-284`:
      corner = C - (vw/2, vh/2, -focal)
      dir    = normalize(corner + (px/W * vw, py/H * vh, 0) - C)
      dir    = quat_rotate(dir, rotation)
    The camera-center terms cancel; kept in factored form.
    """
    p = pixels_xy.astype(jnp.float32)
    vw, vh = cam.viewport[0], cam.viewport[1]
    x = p[..., 0] / width * vw - vw / 2.0
    y = p[..., 1] / height * vh - vh / 2.0
    z = jnp.broadcast_to(cam.focal, x.shape)
    d = normalize(jnp.stack([x, y, z], axis=-1))
    return quat_ops.rotate(d, jnp.broadcast_to(cam.rotation, d.shape[:-1] + (4,)))
