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
    """Node AABBs must contain the three growth corners of their prims
    (`main.rs:91-101`)."""
    s, bvh = scene_bvh
    pts = np.stack([s.origin, s.origin + s.u, s.origin + s.v], axis=1)
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
