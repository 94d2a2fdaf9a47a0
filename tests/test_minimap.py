"""Top-down minimap (utils/minimap.py): deterministic rasterization of
the Scene arrays with material classification and camera marker."""

import numpy as np

from mirror_maze_tpu.config import MazeConfig
from mirror_maze_tpu.scene import build_scene
from mirror_maze_tpu.utils.minimap import (
    BG,
    CAMERA,
    LIGHT,
    MIRROR,
    WALL,
    render_minimap,
)


def _count(img, color):
    return int((img == np.array(color, np.uint8)).all(-1).sum())


def test_minimap_renders_walls_lights_and_is_deterministic():
    s = build_scene(MazeConfig(rng="reference"))
    a = render_minimap(s, size=256)
    b = render_minimap(s, size=256)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (256, 256, 3) and a.dtype == np.uint8
    # Walls, mirrors (seed-0 reference world has 4), and lights all draw.
    assert _count(a, WALL) > 200
    assert _count(a, MIRROR) > 10
    assert _count(a, LIGHT) > 30
    assert _count(a, BG) > 256 * 256 // 2  # mostly background


def test_minimap_camera_marker_moves():
    s = build_scene(MazeConfig(width=4, height=4))
    at_a = render_minimap(s, size=128,
                          camera_center=np.array([-5.0, 0.0, -15.0]))
    at_b = render_minimap(s, size=128,
                          camera_center=np.array([5.0, 0.0, 5.0]))
    assert _count(at_a, CAMERA) > 0 and _count(at_b, CAMERA) > 0
    assert not np.array_equal(at_a, at_b)
    ys, xs = np.nonzero((at_a == np.array(CAMERA, np.uint8)).all(-1))
    ys2, xs2 = np.nonzero((at_b == np.array(CAMERA, np.uint8)).all(-1))
    assert xs.mean() < xs2.mean() and ys.mean() < ys2.mean()


def test_minimap_floor_and_ceiling_do_not_flood_the_map():
    # Horizontal quads (floor/ceiling) must be skipped, not drawn as
    # diagonal lines across the map.
    s = build_scene(MazeConfig(width=4, height=4))
    img = render_minimap(s, size=128)
    center = img[60:68, 60:68]
    # An open cell interior stays background.
    assert (center == np.array(BG, np.uint8)).all(-1).any()


def test_minimap_marks_spheres():
    import dataclasses

    from mirror_maze_tpu.utils.minimap import SPHERE

    s = build_scene(MazeConfig(width=4, height=4))
    s2 = dataclasses.replace(
        s,
        sph_center=np.array([[0.0, 0.0, 0.0]], np.float32),
        sph_radius=np.array([3.0], np.float32),
        sph_color=np.array([[0.5, 0.5, 0.5]], np.float32),
        sph_is_mirror=np.array([False]),
        sph_emission=np.zeros((1, 4), np.float32),
        sph_ior=np.zeros(1, np.float32),
        sph_tex_kind=np.zeros(1, np.uint8),
        sph_tex_scale=np.ones(1, np.float32),
        sph_tex_color2=np.zeros((1, 3), np.float32),
    )
    img = render_minimap(s2, size=128)
    assert _count(img, SPHERE) > 10
