"""BVH builder invariants (reference: `main.rs:74-263`): coverage, bounds
containment, layout, and SAH quality (SURVEY.md section 4 test strategy)."""

import numpy as np
import pytest

from mirror_maze_tpu.config import MazeConfig
from mirror_maze_tpu.scene import build_bvh, build_scene


@pytest.fixture(scope="module", params=[4, 10])
def scene_bvh(request):
    s = build_scene(MazeConfig(width=request.param, height=request.param))
    return s, build_bvh(s.origin, s.u, s.v)


def test_prim_coverage(scene_bvh):
    s, bvh = scene_bvh
    seen = []
    for i in range(bvh.num_nodes):
        if bvh.count[i] >= 1:
            lo = bvh.left_first[i]
            seen.extend(bvh.prim_index[lo:lo + bvh.count[i]].tolist())
    assert sorted(seen) == list(range(s.num_planes))


def test_leaf_bounds_contain_prims(scene_bvh):
    """Node AABBs must contain ALL FOUR corners of their prims. (The
    reference grows over only three, `main.rs:91-101` — fine for its
    axis-aligned quads, wrong for rotated ones; see scene/bvh.py.)"""
    s, bvh = scene_bvh
    pts = np.stack([s.origin, s.origin + s.u, s.origin + s.v,
                    s.origin + s.u + s.v], axis=1)
    for i in range(bvh.num_nodes):
        if bvh.count[i] >= 1:
            lo = bvh.left_first[i]
            prims = bvh.prim_index[lo:lo + bvh.count[i]]
            p = pts[prims].reshape(-1, 3)
            assert np.all(p >= bvh.aabb_min[i] - 1e-4)
            assert np.all(p <= bvh.aabb_max[i] + 1e-4)


def test_children_within_parent(scene_bvh):
    _, bvh = scene_bvh
    for i in range(bvh.num_nodes):
        if bvh.count[i] == 0:
            lf = bvh.left_first[i]
            for c in (lf, lf + 1):
                assert np.all(bvh.aabb_min[c] >= bvh.aabb_min[i] - 1e-4)
                assert np.all(bvh.aabb_max[c] <= bvh.aabb_max[i] + 1e-4)


def test_layout_children_adjacent_and_after_parent(scene_bvh):
    _, bvh = scene_bvh
    for i in range(bvh.num_nodes):
        if bvh.count[i] == 0:
            assert bvh.left_first[i] > i  # children allocated after parent
    assert bvh.count[0] == 0 or bvh.num_nodes == 1
    assert bvh.num_nodes <= 2 * len(bvh.prim_index) - 1


def test_depth_reasonable(scene_bvh):
    s, bvh = scene_bvh
    assert bvh.depth() <= 2 * int(np.ceil(np.log2(max(s.num_planes, 2)))) + 8


def test_sah_splits_separate_space():
    """For clearly separable geometry the root must split into two
    non-overlapping halves."""
    origin = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [100.0, 0.0, 0.0], [101.0, 0.0, 0.0]],
        np.float32,
    )
    u = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (4, 1))
    v = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    bvh = build_bvh(origin, u, v)
    assert bvh.count[0] == 0
    lf = bvh.left_first[0]
    # children separate along x
    assert (
        bvh.aabb_max[lf][0] <= bvh.aabb_min[lf + 1][0]
        or bvh.aabb_max[lf + 1][0] <= bvh.aabb_min[lf][0]
    )


def test_single_prim_is_root_leaf():
    bvh = build_bvh(
        np.zeros((1, 3), np.float32),
        np.array([[1.0, 0, 0]], np.float32),
        np.array([[0, 1.0, 0]], np.float32),
    )
    assert bvh.num_nodes == 1
    assert bvh.count[0] == 1


def test_leaf_boxes_for_collision(scene_bvh):
    _, bvh = scene_bvh
    lmin, lmax = bvh.leaf_boxes()
    assert lmin.shape == lmax.shape
    assert np.all(lmin <= lmax + 1e-6)


def test_rotated_quads_far_corner_is_inside_the_tree():
    """Regression for the reference's 3-corner AABB growth
    (`main.rs:95-97`): a quad rotated in the xz-plane has its far corner
    origin+u+v OUTSIDE the AABB of the other three, so the traversal
    and host collision would skip hits in that triangle. Four-corner
    growth must contain it, and the vectorized traversal must equal
    brute force on rays aimed straight at the far-corner region
    (found by the Cornell-box example's rotated blocks)."""
    import jax.numpy as jnp

    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.render.intersect import (
        nearest_hit_brute, nearest_hit_bvh,
    )
    from mirror_maze_tpu.scene import build_bvh
    from mirror_maze_tpu.scene.builder import Scene

    r = np.random.default_rng(7)
    n = 24
    th = r.uniform(0.2, 1.3, n)
    # Rotated-in-xz parallelograms at random stations.
    u = np.stack([4 * np.cos(th), np.zeros(n), 4 * np.sin(th)], -1)
    v = np.stack([-2 * np.sin(th), r.uniform(-1, 1, n), 2 * np.cos(th)], -1)
    o = r.uniform(-20, 20, (n, 3))
    scene = Scene(
        origin=o.astype(np.float32), v=v.astype(np.float32),
        u=u.astype(np.float32),
        color=np.full((n, 3), 0.5, np.float32),
        is_mirror=np.zeros(n, bool),
        emission=np.zeros((n, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    tree = build_bvh(scene.origin, scene.u, scene.v, backend="numpy")
    corners = np.stack([o, o + u, o + v, o + u + v], 1)
    for i in range(tree.num_nodes):
        if tree.count[i] >= 1:
            lo = tree.left_first[i]
            p = corners[tree.prim_index[lo:lo + tree.count[i]]].reshape(-1, 3)
            assert np.all(p >= tree.aabb_min[i] - 1e-4)
            assert np.all(p <= tree.aabb_max[i] + 1e-4)

    # Rays aimed at each quad's far-corner triangle from a random origin.
    dev = upload_scene(scene)
    target = o + 0.85 * u + 0.85 * v
    eye = r.uniform(-30, 30, (n, 3))
    d = target - eye
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tb, ib = nearest_hit_brute(
        dev, jnp.asarray(eye, jnp.float32), jnp.asarray(d, jnp.float32), 0.1
    )
    tv, iv = nearest_hit_bvh(
        dev, jnp.asarray(eye, jnp.float32), jnp.asarray(d, jnp.float32),
        0.1, 16, int(tree.count.max()),
    )
    assert (np.asarray(tb) < 1e30).any()  # the aim actually hits things
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tv))
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(iv))
