"""Native (C++) BVH builder equivalence tests: the ctypes-built library
must produce EXACTLY the arrays of the pure-NumPy builder (same split
semantics by construction)."""

import numpy as np
import pytest

from mirror_maze_tpu.config import MazeConfig
from mirror_maze_tpu.native.bindings import build_bvh_native, native_available
from mirror_maze_tpu.scene import build_scene
from mirror_maze_tpu.scene.bvh import build_bvh

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native builder"
)


@pytest.mark.parametrize("size,seed", [(4, 0), (10, 0), (10, 3), (16, 1)])
def test_native_matches_numpy_exactly(size, seed):
    s = build_scene(MazeConfig(width=size, height=size, seed=seed))
    a = build_bvh(s.origin, s.u, s.v, backend="numpy")
    b = build_bvh_native(s.origin, s.u, s.v)
    assert b is not None
    assert a.num_nodes == b.num_nodes
    np.testing.assert_array_equal(a.left_first, b.left_first)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.prim_index, b.prim_index)
    np.testing.assert_array_equal(a.aabb_min, b.aabb_min)
    np.testing.assert_array_equal(a.aabb_max, b.aabb_max)


def test_auto_backend_prefers_native():
    s = build_scene(MazeConfig(width=4, height=4))
    bvh = build_bvh(s.origin, s.u, s.v, backend="auto")
    ref = build_bvh(s.origin, s.u, s.v, backend="numpy")
    np.testing.assert_array_equal(bvh.left_first, ref.left_first)
    np.testing.assert_array_equal(bvh.prim_index, ref.prim_index)


def test_native_large_scene_fast():
    """64x64 maze (config-5 scale): the native build must finish quickly
    and satisfy the BVH invariants."""
    import time

    s = build_scene(MazeConfig(width=64, height=64))
    t0 = time.time()
    bvh = build_bvh_native(s.origin, s.u, s.v)
    dt = time.time() - t0
    assert bvh is not None
    assert dt < 5.0, f"native BVH build too slow: {dt:.2f}s"
    # invariants
    seen = []
    for i in range(bvh.num_nodes):
        if bvh.count[i] >= 1:
            lo = bvh.left_first[i]
            seen.extend(bvh.prim_index[lo:lo + bvh.count[i]].tolist())
    assert sorted(seen) == list(range(s.num_planes))
