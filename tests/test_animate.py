"""Camera-path animation (render/campath.py), the exact aim() look-at
quaternion, and the GIF writer (utils/imageio.py write_gif + builtin
GIF89a encoder)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- aim()


def test_aim_rotates_forward_to_look_every_direction(rng):
    """rotate((0,0,1), aim(v)) == normalize(v) for directions in all
    octants — including BEHIND the default forward, where the reference's
    from_look_dir asin fold-back quirk breaks (maths.rs:139-156)."""
    from mirror_maze_tpu.ops.quat import aim, rotate
    from mirror_maze_tpu.ops.vecmath import normalize

    v = rng.normal(size=(256, 3)).astype(np.float32)
    v = np.concatenate([v, np.array([[0, 0, -1], [0, 1, 0], [0, -1, 0],
                                     [-1, 0, 0], [1e-3, 1, 1e-3]],
                                    np.float32)])
    look = np.asarray(normalize(jnp.asarray(v)))
    fwd = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), look.shape)
    got = np.asarray(rotate(fwd, aim(jnp.asarray(look))))
    np.testing.assert_allclose(got, look, rtol=0, atol=1e-4)


def test_aim_is_roll_free(rng):
    """The camera right axis stays horizontal (world-y component 0) for
    every look direction — pitch-then-yaw composition, no roll."""
    from mirror_maze_tpu.ops.quat import aim, rotate

    v = rng.normal(size=(128, 3)).astype(np.float32)
    right = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape)
    got = np.asarray(rotate(right, aim(jnp.asarray(v))))
    np.testing.assert_allclose(got[:, 1], 0.0, atol=2e-6)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=2e-6)


def test_aim_zero_look_is_identity():
    """A zero look vector (duplicate consecutive waypoints = hold
    position) must yield the identity quaternion, not NaN."""
    from mirror_maze_tpu.ops.quat import aim

    q = np.asarray(aim(jnp.zeros((2, 3))))
    np.testing.assert_allclose(q, np.tile([0.0, 0.0, 0.0, 1.0], (2, 1)),
                               atol=0)


def test_aim_is_unit_quaternion(rng):
    from mirror_maze_tpu.ops.quat import aim

    q = np.asarray(aim(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)))
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=2e-6)


# ------------------------------------------------------------- paths


def _base_cam():
    from mirror_maze_tpu.config import CameraConfig
    from mirror_maze_tpu.render import make_camera

    return make_camera(CameraConfig(), 4.0 / 3.0)


def _fwd_of(rot):
    from mirror_maze_tpu.ops.quat import rotate

    fwd = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), rot.shape[:-1] + (3,))
    return np.asarray(rotate(fwd, rot))


def test_spin_path_full_turn_loops_seamlessly():
    from mirror_maze_tpu.render.campath import spin_cameras

    base = _base_cam()
    cams = spin_cameras(base, (0.1, 0.0, 1.0), 8, turns=1.0)
    assert cams.center.shape == (8, 3)
    np.testing.assert_allclose(
        np.asarray(cams.center),
        np.tile(np.asarray(base.center), (8, 1)), atol=0)
    looks = _fwd_of(cams.rotation)
    # Frame 0 look == the (normalized) base look; endpoint exclusive, so
    # the next frame after the last would be frame 0 again.
    l0 = np.asarray(jnp.array([0.1, 0.0, 1.0]) / jnp.linalg.norm(
        jnp.array([0.1, 0.0, 1.0])))
    np.testing.assert_allclose(looks[0], l0, atol=1e-6)
    # Successive azimuth steps are uniform (2*pi/8) — frame 4 looks
    # opposite frame 0.
    np.testing.assert_allclose(looks[4], -looks[0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(looks, axis=-1), 1.0,
                               atol=1e-6)


def test_orbit_path_aims_at_center():
    from mirror_maze_tpu.render.campath import orbit_cameras

    base = _base_cam()
    center = (3.0, 1.0, -2.0)
    cams = orbit_cameras(base, center, radius=5.0, height=2.0, n=12)
    pos = np.asarray(cams.center)
    # On the circle: xz distance == radius, height offset constant.
    d = pos - np.asarray(center)
    np.testing.assert_allclose(np.hypot(d[:, 0], d[:, 2]), 5.0, atol=1e-5)
    np.testing.assert_allclose(d[:, 1], 2.0, atol=1e-6)
    looks = _fwd_of(cams.rotation)
    want = np.asarray(center) - pos
    want /= np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(looks, want, atol=2e-6)


def test_waypoint_path_endpoints_and_target():
    from mirror_maze_tpu.render.campath import waypoint_cameras

    base = _base_cam()
    pts = [(0.0, 0.0, 0.0), (10.0, 0.0, 0.0), (10.0, 0.0, 10.0)]
    cams = waypoint_cameras(base, pts, 9, target=(5.0, 0.0, 5.0))
    pos = np.asarray(cams.center)
    np.testing.assert_allclose(pos[0], pts[0], atol=1e-6)
    np.testing.assert_allclose(pos[-1], pts[-1], atol=1e-5)
    np.testing.assert_allclose(pos[4], pts[1], atol=1e-5)  # mid waypoint
    looks = _fwd_of(cams.rotation)
    want = np.asarray((5.0, 0.0, 5.0)) - pos
    want /= np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(looks, want, atol=2e-6)


def test_waypoint_path_looks_along_travel():
    from mirror_maze_tpu.render.campath import waypoint_cameras

    base = _base_cam()
    cams = waypoint_cameras(
        base, [(0.0, 0.0, 0.0), (0.0, 0.0, 4.0)], 4)
    looks = _fwd_of(cams.rotation)
    np.testing.assert_allclose(looks, np.tile([0.0, 0.0, 1.0], (4, 1)),
                               atol=1e-6)


def test_render_path_one_launch(tiny_cfg, tiny_device_scene):
    """End-to-end: a 3-frame spin path renders [N,H,W,3] uint8 frames
    that are non-black and frame-distinct (the camera moved)."""
    from mirror_maze_tpu.render import make_camera
    from mirror_maze_tpu.render.campath import render_path, spin_cameras

    cam = make_camera(tiny_cfg.camera,
                      tiny_cfg.screen.width / tiny_cfg.screen.height)
    cams = spin_cameras(cam, tiny_cfg.camera.look_dir, 3)
    frames = np.asarray(render_path(
        tiny_device_scene, cams, jax.random.PRNGKey(0), tiny_cfg))
    assert frames.shape == (3, 32, 32, 3) and frames.dtype == np.uint8
    assert frames.mean() > 1.0
    assert not np.array_equal(frames[0], frames[1])


# ---------------------------------------------------------------- GIF


def test_builtin_gif_roundtrips_exactly_through_pil(tmp_path, rng):
    """The builtin GIF89a encoder (median-cut palette + LZW) must decode
    bit-exactly to its own palette mapping. High-entropy frames force the
    LZW dictionary through every code width up to the 12-bit clear/reset."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image, ImageSequence

    from mirror_maze_tpu.utils.imageio import (_median_cut_palette,
                                               _write_gif_builtin)

    frames = rng.integers(0, 256, (3, 60, 80, 3)).astype(np.uint8)
    frames[1, 10:30, 10:40] = (255, 0, 0)  # flat run: LZW repeats
    path = str(tmp_path / "t.gif")
    _write_gif_builtin(path, frames, duration_ms=50, loop=0)

    pal = _median_cut_palette(frames)
    g = np.arange(32, dtype=np.int32) * 8 + 4
    cube = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    d = ((cube[:, None, :] - pal[None].astype(np.int32)) ** 2).sum(-1)
    lut = d.argmin(1).astype(np.uint8).reshape(32, 32, 32)

    im = Image.open(path)
    assert im.n_frames == 3
    for i, fr in enumerate(ImageSequence.Iterator(im)):
        dec = np.asarray(fr.convert("RGB"))
        exp = pal[lut[frames[i][..., 0] >> 3, frames[i][..., 1] >> 3,
                      frames[i][..., 2] >> 3]]
        np.testing.assert_array_equal(dec, exp)


def test_write_gif_quantization_stays_close(tmp_path):
    """write_gif (whichever encoder) keeps a smooth gradient within a
    reasonable palette-quantization error."""
    pytest.importorskip("PIL")
    from PIL import Image

    from mirror_maze_tpu.utils.imageio import write_gif

    x = np.linspace(0, 255, 64, dtype=np.float32)
    img = np.stack(np.broadcast_arrays(
        x[None, :], x[:, None], 0 * x[None, :] + 128), -1).astype(np.uint8)
    frames = np.stack([img, img[::-1]])
    path = str(tmp_path / "g.gif")
    write_gif(path, frames, fps=10)
    im = Image.open(path)
    dec = np.asarray(im.convert("RGB")).astype(np.int32)
    assert np.abs(dec - frames[0].astype(np.int32)).max() <= 32


def test_animate_cli_writes_gif(tmp_path):
    from mirror_maze_tpu.__main__ import main

    out = str(tmp_path / "a.gif")
    rc = main(["animate", "--config", "v0", "--width", "32", "--height",
               "32", "--spp", "1", "--anim-frames", "3", "--out", out])
    assert rc == 0
    with open(out, "rb") as f:
        assert f.read(6) == b"GIF89a"


@pytest.mark.slow
def test_demo_cli_gif_option(tmp_path):
    """demo --gif assembles every Nth engine frame into a GIF alongside
    the phase PNGs (exercises the full engine step -> write_gif path)."""
    pytest.importorskip("PIL")
    from PIL import Image

    from mirror_maze_tpu import __main__ as cli

    out_dir = str(tmp_path / "demo")
    gif = str(tmp_path / "d.gif")
    rc = cli.main(["demo", "--config", "v0", "--width", "32", "--height",
                   "32", "--spp", "1", "--out", out_dir, "--gif", gif,
                   "--gif-every", "64"])
    assert rc == 0
    im = Image.open(gif)
    assert im.size == (32, 32) and im.n_frames >= 8


def test_animate_cli_sharded_over_device_mesh(tmp_path):
    """--sharded renders the frame batch through the multicam sharded
    renderer: 4 frames over the virtual 8-device mesh factor to
    (cam=4, tile=2) with every frame present in the GIF."""
    pytest.importorskip("PIL")
    from PIL import Image

    from mirror_maze_tpu.__main__ import main

    out = str(tmp_path / "s.gif")
    rc = main(["animate", "--config", "v0", "--width", "32", "--height",
               "32", "--spp", "1", "--anim-frames", "4", "--sharded",
               "--anim", "orbit", "--orbit-radius", "4", "--out", out])
    assert rc == 0
    im = Image.open(out)
    assert im.n_frames == 4 and im.size == (32, 32)
