"""Thin-lens depth of field (CameraConfig.aperture/focus_dist).

Beyond the reference's pinhole camera (`main.rs:732-741`): aperture > 0
jitters each sample's origin on a lens disk and re-aims it at the ray's
focal point, entirely in ray GENERATION (render/pipeline.py) — no
kernel change, so it works identically on every backend. aperture 0 is
statically absent and bit-preserves the pinhole images.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import (
    CameraConfig,
    EngineConfig,
    ScreenConfig,
    TracerConfig,
)
from mirror_maze_tpu.render import make_camera, upload_scene
from mirror_maze_tpu.render.pipeline import render_pixels
from mirror_maze_tpu.scene.builder import Scene

KEY = jax.random.PRNGKey(3)


def _emissive_patch_scene(z, half=0.35):
    """A small emissive patch at depth z (facing the camera at the
    origin), plus a big black backdrop far behind it."""
    big = 200.0
    return Scene(
        origin=np.array(
            [[-half, -half, z], [-big / 2, -big / 2, 60.0]], np.float32
        ),
        v=np.array([[0, 2 * half, 0], [0, big, 0]], np.float32),
        u=np.array([[2 * half, 0, 0], [big, 0, 0]], np.float32),
        color=np.zeros((2, 3), np.float32),
        is_mirror=np.zeros(2, bool),
        emission=np.array([[1, 1, 1, 5], [0, 0, 0, 0]], np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )


def _cfg(aperture, focus_dist=10.0, spp=64):
    return EngineConfig(
        camera=CameraConfig(spawn=(0.0, 0.0, 0.0), look_dir=(0, 0, 1),
                            aperture=aperture, focus_dist=focus_dist),
        screen=ScreenConfig(width=64, height=64, samples_per_pixel=spp),
        tracer=TracerConfig(bounce_limit=1, mirror_limit=1, jitter=0.0),
        intersector="brute",
    )


def _center_pixel_samples(scene, cfg):
    """Per-sample light of the CENTER pixel (mean undone: spp=K rays of
    one pixel, un-averaged via spp=1 trick — instead render the pixel
    and also return the sample spread via two different keys)."""
    dev = upload_scene(scene)
    cam = make_camera(cfg.camera, 1.0)
    pix = jnp.array([[32, 32]], dtype=jnp.int32)
    return np.asarray(render_pixels(dev, cam, pix, KEY, cfg))[0]


def test_aperture_zero_is_bitwise_pinhole():
    scene = _emissive_patch_scene(z=10.0)
    base = _center_pixel_samples(scene, _cfg(0.0))
    # A no-op replace keeps every traced constant identical.
    again = _center_pixel_samples(
        scene, dataclasses.replace(_cfg(0.0)))
    np.testing.assert_array_equal(base, again)
    # focus_dist is inert at aperture 0.
    other = _center_pixel_samples(scene, _cfg(0.0, focus_dist=3.0))
    np.testing.assert_array_equal(base, other)


def test_focal_plane_stays_sharp_and_defocus_blurs():
    """A small patch AT the focal distance is hit by every lens sample
    (center-pixel value equals the pinhole value); the same patch far
    off-focus is missed by many samples (value drops)."""
    cfg_dof = _cfg(aperture=0.4, focus_dist=10.0)
    in_focus = _emissive_patch_scene(z=10.0)
    sharp = _center_pixel_samples(in_focus, cfg_dof)
    pinhole = _center_pixel_samples(in_focus, _cfg(0.0))
    np.testing.assert_allclose(sharp, pinhole, rtol=1e-5)

    # Off-focus: patch at z=3 while focused at 10. A lens offset L
    # displaces the ray by L * (1 - 3/10) = 0.7 L at z=3, so aperture
    # 1.2 pushes the outer samples (up to 0.84) past the patch half-
    # extent (0.35) — a real circle of confusion, some samples miss.
    off_focus = _emissive_patch_scene(z=3.0)
    cfg_near = _cfg(aperture=1.2, focus_dist=10.0)
    blurred = _center_pixel_samples(off_focus, cfg_near)
    pin_near = _center_pixel_samples(off_focus, _cfg(0.0))
    assert blurred[0] < 0.9 * pin_near[0], (blurred, pin_near)
    assert blurred[0] > 0.0


@pytest.mark.slow
def test_dof_matches_across_backends_statistically():
    """The lens sampling lives in raygen, so pallas sees the same ray
    set as brute: identical pixel values for the deterministic
    single-segment scene."""
    scene = _emissive_patch_scene(z=10.0)
    dev = upload_scene(scene)
    cfg = dataclasses.replace(_cfg(0.35, 10.0), intersector="pallas")
    cam = make_camera(cfg.camera, 1.0)
    pix = jnp.array([[32, 32], [20, 40]], dtype=jnp.int32)
    lb = np.asarray(render_pixels(
        dev, cam, pix, KEY, dataclasses.replace(cfg, intersector="brute")
    ))
    lp = np.asarray(render_pixels(dev, cam, pix, KEY, cfg))
    np.testing.assert_allclose(lp, lb, rtol=1e-4, atol=1e-6)


def test_cli_render_accepts_aperture(tmp_path):
    from mirror_maze_tpu.__main__ import main

    out = str(tmp_path / "dof.png")
    main(["render", "--config", "v0", "--width", "48", "--height", "36",
          "--spp", "4", "--frames", "2", "--aperture", "0.2",
          "--focus-dist", "8", "--out", out])
    import os

    assert os.path.exists(out)
