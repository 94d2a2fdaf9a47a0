"""Maze generator and wall-run merger tests (reference: `main.rs:328-438`)."""

import numpy as np
import pytest

from mirror_maze_tpu.scene.maze import (
    UnionFind,
    generate_maze,
    merge_horizontal_walls,
    merge_vertical_walls,
)


def test_union_find_semantics():
    uf = UnionFind(4)
    assert not uf.connected(0, 1)
    uf.connect(0, 1)
    assert uf.connected(0, 1)
    uf.connect(2, 3)
    assert uf.connected(2, 3) and not uf.connected(0, 3)
    uf.connect(1, 3)
    assert uf.connected(0, 2)


@pytest.mark.parametrize("w,h,seed", [(4, 4, 0), (10, 10, 0), (10, 10, 7), (16, 8, 3)])
def test_maze_is_spanning_tree(w, h, seed):
    """Kruskal must open exactly cells-1 passages and connect every cell."""
    grid = generate_maze(w, h, np.random.default_rng(seed))
    # passages: each open up-edge sets bit1 on one cell, bit2 on the other.
    ups = int((grid & 1 > 0).sum())
    lefts = int((grid & 4 > 0).sum())
    assert ups + lefts == w * h - 1
    # bitmask symmetry
    for y in range(h):
        for x in range(w):
            if grid[y, x] & 1:
                assert y > 0 and grid[y - 1, x] & 2
            if grid[y, x] & 4:
                assert x > 0 and grid[y, x - 1] & 8
    # connectivity via BFS over open passages
    seen = {(0, 0)}
    frontier = [(0, 0)]
    while frontier:
        x, y = frontier.pop()
        moves = []
        if grid[y, x] & 1:
            moves.append((x, y - 1))
        if grid[y, x] & 2:
            moves.append((x, y + 1))
        if grid[y, x] & 4:
            moves.append((x - 1, y))
        if grid[y, x] & 8:
            moves.append((x + 1, y))
        for m in moves:
            if m not in seen:
                seen.add(m)
                frontier.append(m)
    assert len(seen) == w * h


def test_maze_deterministic_by_seed():
    a = generate_maze(10, 10, np.random.default_rng(0))
    b = generate_maze(10, 10, np.random.default_rng(0))
    c = generate_maze(10, 10, np.random.default_rng(1))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_vertical_merge_covers_closed_boundaries():
    """Wall runs must cover exactly the closed vertical cell boundaries."""
    h = w = 10
    grid = generate_maze(w, h, np.random.default_rng(0))
    runs = merge_vertical_walls(grid)
    covered = set()
    for x, start, length in runs:
        assert length >= 0
        for y in range(int(start), int(start + length)):
            covered.add((int(x), y))
    expected = set()
    for x in range(w):
        for y in range(h):
            if x == 0 or ((grid[y, x] & 4) == 0 and (grid[y, x - 1] & 8) == 0):
                expected.add((x, y))
    assert covered == expected


def test_horizontal_merge_covers_closed_boundaries():
    h = w = 10
    grid = generate_maze(w, h, np.random.default_rng(0))
    runs = merge_horizontal_walls(grid)
    covered = set()
    for y, start, length in runs:
        for x in range(int(start), int(start + length)):
            covered.add((y, x))
    expected = set()
    for y in range(h):
        for x in range(w):
            if y == 0 or ((grid[y, x] & 1) == 0 and (grid[y - 1, x] & 2) == 0):
                expected.add((y, x))
    assert covered == expected


def test_trailing_zero_runs_replicated():
    """The reference pushes the trailing run unconditionally
    (`main.rs:416`), emitting zero-length runs — a quirk the scene builder
    relies on for RNG-stream and floating-light parity."""
    # A 2x2 maze always opens some boundary, producing at least one
    # zero-length trailing run across seeds.
    found_zero = False
    for seed in range(10):
        grid = generate_maze(2, 2, np.random.default_rng(seed))
        runs = merge_vertical_walls(grid) + merge_horizontal_walls(grid)
        found_zero |= any(r[2] == 0 for r in runs)
    assert found_zero
