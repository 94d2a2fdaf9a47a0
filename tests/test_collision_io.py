"""Collision predicate tests (`main.rs:237-291`) and image IO round-trip."""

import jax.numpy as jnp
import numpy as np

from mirror_maze_tpu.scene import collides


def test_collides_basic():
    leaf_min = jnp.array([[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]])
    leaf_max = jnp.array([[1.0, 1.0, 1.0], [11.0, 11.0, 11.0]])
    inside = collides(leaf_min, leaf_max,
                      jnp.array([0.5, 0.5, 0.5]) - 0.1,
                      jnp.array([0.5, 0.5, 0.5]) + 0.1)
    outside = collides(leaf_min, leaf_max,
                       jnp.array([5.0, 5.0, 5.0]) - 0.1,
                       jnp.array([5.0, 5.0, 5.0]) + 0.1)
    assert bool(inside) and not bool(outside)


def test_collides_touching_counts():
    """Closed-interval overlap (`main.rs:237-244`: <= / >=)."""
    leaf_min = jnp.array([[0.0, 0.0, 0.0]])
    leaf_max = jnp.array([[1.0, 1.0, 1.0]])
    touching = collides(leaf_min, leaf_max,
                        jnp.array([1.0, 0.5, 0.5]),
                        jnp.array([2.0, 0.6, 0.6]))
    assert bool(touching)


def test_collides_batched():
    leaf_min = jnp.array([[0.0, 0.0, 0.0]])
    leaf_max = jnp.array([[1.0, 1.0, 1.0]])
    centers = jnp.array([[0.5, 0.5, 0.5], [3.0, 3.0, 3.0]])
    hit = collides(leaf_min, leaf_max, centers - 0.1, centers + 0.1)
    assert np.asarray(hit).tolist() == [True, False]


def test_png_roundtrip(tmp_path):
    from mirror_maze_tpu.utils.imageio import read_png, write_png

    img = (np.arange(4 * 6 * 3, dtype=np.uint8) % 251).reshape(4, 6, 3)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    assert np.array_equal(back[..., :3], img)


def test_png_builtin_writer(tmp_path):
    from mirror_maze_tpu.utils.imageio import png_bytes, read_png

    img = np.random.default_rng(0).integers(0, 255, (8, 5, 3), dtype=np.uint8)
    p = str(tmp_path / "b.png")
    with open(p, "wb") as f:
        f.write(png_bytes(img))
    assert np.array_equal(read_png(p)[..., :3], img)


def test_ansi_frame_shape_and_colors():
    from mirror_maze_tpu.utils.imageio import ansi_frame

    img = np.zeros((8, 12, 3), np.uint8)
    img[0] = (255, 0, 0)
    art = ansi_frame(img, max_cols=12)
    lines = art.split("\n")
    assert len(lines) == 4  # 8 pixel rows -> 4 half-block rows
    assert "38;2;255;0;0" in lines[0]
    assert lines[0].endswith("\x1b[0m")
    # downsampling fits max_cols
    wide = np.zeros((4, 200, 3), np.uint8)
    art2 = ansi_frame(wide, max_cols=50)
    assert art2.split("\n")[0].count("▀") <= 50
