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


def test_ansi_presenter_matches_python_exactly():
    """The C++ half-block presenter (term_present.cpp) must emit the
    exact byte sequence of the Python cell loop in utils/imageio.py."""
    from mirror_maze_tpu.native.bindings import ansi_halfblocks_native

    rng = np.random.default_rng(7)
    for rows, cols in [(1, 1), (3, 5), (24, 100)]:
        top = rng.integers(0, 256, (rows, cols, 3), dtype=np.uint8)
        bot = rng.integers(0, 256, (rows, cols, 3), dtype=np.uint8)
        native = ansi_halfblocks_native(top, bot)
        assert native is not None
        py_rows = []
        for tr, br in zip(top, bot):
            cells = [
                f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
                for t, b in zip(tr, br)
            ]
            py_rows.append("".join(cells) + "\x1b[0m")
        assert native == "\n".join(py_rows)


def test_ansi_frame_uses_native_and_agrees():
    """ansi_frame (the public presenter entry) must give identical output
    whether or not the native library is loaded."""
    import mirror_maze_tpu.native.bindings as nb
    from mirror_maze_tpu.utils.imageio import ansi_frame

    img = np.random.default_rng(3).integers(
        0, 256, (32, 40, 3), dtype=np.uint8
    )
    with_native = ansi_frame(img, max_cols=20)
    saved = nb._lib, nb._tried
    try:
        nb._lib, nb._tried = None, True  # force the Python fallback
        pure_py = ansi_frame(img, max_cols=20)
    finally:
        nb._lib, nb._tried = saved
    assert with_native == pure_py


def test_term_poll_drains_pipe():
    """mmx_term_poll must drain exactly the pending bytes, nonblocking."""
    import os

    from mirror_maze_tpu.native.bindings import term_poll_native

    r, w = os.pipe()
    try:
        assert term_poll_native(r) == b""       # nothing pending: no block
        os.write(w, b"wasdjlq")
        assert term_poll_native(r) == b"wasdjlq"
        assert term_poll_native(r) == b""
    finally:
        os.close(r)
        os.close(w)


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


def test_mouse_look_sgr_frames_through_pump_and_parser():
    """Continuous mouse-look (`main.rs:922-928` MouseMoved -> DX):
    synthetic SGR-1006 escape frames fed through the native pump must
    integrate into mouse_dx at MOUSE_PX_PER_CELL per cell, never leak
    into WASD keys, and carry truncated sequences to the next poll."""
    import os

    from mirror_maze_tpu.native.bindings import term_poll_native
    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    loop = InteractiveLoop.__new__(InteractiveLoop)  # parser-only instance
    loop._last_mouse_x = None
    loop._carry = b""

    r, w = os.pipe()
    try:
        # Anchor at x=10, then move to x=14: dx = 4 cells * px/cell.
        os.write(w, b"w\x1b[<35;10;5M\x1b[<35;14;5M")
        inp = loop._parse_input(term_poll_native(r))
        assert bool(inp.keys[3])                      # w held
        assert not (bool(inp.keys[0]) or bool(inp.keys[1]) or bool(inp.keys[2]))
        assert float(inp.mouse_dx) == 4 * InteractiveLoop.MOUSE_PX_PER_CELL

        # Leftward motion integrates negative; drag (btn 32) counts too.
        os.write(w, b"\x1b[<32;11;5M")
        inp = loop._parse_input(term_poll_native(r))
        assert float(inp.mouse_dx) == -3 * InteractiveLoop.MOUSE_PX_PER_CELL

        # Truncated frame carries across polls.
        os.write(w, b"\x1b[<35;2")
        inp = loop._parse_input(term_poll_native(r))
        assert float(inp.mouse_dx) == 0.0
        os.write(w, b"0;5M")
        inp = loop._parse_input(term_poll_native(r))
        assert float(inp.mouse_dx) == 9 * InteractiveLoop.MOUSE_PX_PER_CELL

        # Arrow keys act as discrete yaw; release frames ('m') update the
        # anchor without keying anything.
        os.write(w, b"\x1b[D\x1b[<35;20;5m")
        inp = loop._parse_input(term_poll_native(r))
        assert float(inp.mouse_dx) == -InteractiveLoop.YAW_STEP
        assert not any(bool(k) for k in inp.keys)
    finally:
        os.close(r)
        os.close(w)


def test_mouse_x10_fallback_frames_never_inject_keys():
    """A terminal honoring ?1003 but not ?1006 sends X10-encoded mouse
    frames: ESC [ M Cb Cx Cy with three RAW payload bytes after the
    final 'M'. Regression: those bytes once fell through to the key
    parser — the column byte is col+32, so column 81 injected 'q' and
    QUIT the session, 87 injected 'w'. The payload must be consumed (and
    may drive mouse-look), and truncated payloads must carry."""
    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    loop = InteractiveLoop.__new__(InteractiveLoop)  # parser-only instance
    loop._last_mouse_x = None
    loop._carry = b""

    # Motion at column 81: payload byte 'q'. Must neither quit nor key.
    inp = loop._parse_input(b"\x1b[M" + bytes([67, 32 + 81, 37]))
    assert float(inp.mouse_dx) == 0.0          # first event only anchors
    assert not any(bool(k) for k in inp.keys)

    # Column 85 -> 4-cell delta integrates like an SGR frame.
    inp = loop._parse_input(b"\x1b[M" + bytes([67, 32 + 85, 37]))
    assert float(inp.mouse_dx) == 4 * InteractiveLoop.MOUSE_PX_PER_CELL

    # Column 87: payload byte 'w' — must not walk.
    inp = loop._parse_input(b"\x1b[M" + bytes([67, 32 + 87, 37]))
    assert not any(bool(k) for k in inp.keys)
    assert float(inp.mouse_dx) == 2 * InteractiveLoop.MOUSE_PX_PER_CELL

    # Truncated payload carries to the next poll.
    inp = loop._parse_input(b"\x1b[M" + bytes([67]))
    assert float(inp.mouse_dx) == 0.0
    assert not any(bool(k) for k in inp.keys)
    inp = loop._parse_input(bytes([32 + 89, 37]))
    assert float(inp.mouse_dx) == 2 * InteractiveLoop.MOUSE_PX_PER_CELL


def test_bare_esc_tap_does_not_eat_the_next_keypress():
    """Regression: a bare ESC tap is carried to the next poll (it may be
    a truncated escape sequence); the Alt-chord arm then consumed ESC
    PLUS the next byte, so the user's following real keystroke — arriving
    a frame later — was silently eaten ('w' didn't walk, 'q' didn't
    quit). A carried ESC followed by a fresh key must drop only the ESC;
    a true Alt chord (ESC+char in ONE drain) stays consumed; a bare ESC
    followed by silence must not sit in the carry forever."""
    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    loop = InteractiveLoop.__new__(InteractiveLoop)  # parser-only instance
    loop._last_mouse_x = None
    loop._carry = b""

    # True Alt chord: ESC+'w' atomically in one drain — consumed, no walk.
    inp = loop._parse_input(b"\x1bw")
    assert not any(bool(k) for k in inp.keys)
    assert loop._carry == b""

    # Bare ESC tap: carried once...
    inp = loop._parse_input(b"\x1b")
    assert loop._carry == b"\x1b"
    assert not any(bool(k) for k in inp.keys)
    # ...then the NEXT poll's real keypress must land.
    inp = loop._parse_input(b"w")
    assert bool(inp.keys[3])
    assert loop._carry == b""

    # Bare ESC followed by an empty poll drains instead of sticking.
    loop._parse_input(b"\x1b")
    loop._parse_input(b"")
    assert loop._carry == b""

    # A split CSI sequence still reassembles across the carry.
    loop._parse_input(b"\x1b[<35;10;5M")     # anchor at x=10
    loop._parse_input(b"\x1b[<35;1")
    inp = loop._parse_input(b"4;5M")
    assert float(inp.mouse_dx) == 4 * InteractiveLoop.MOUSE_PX_PER_CELL


def test_mouse_reentry_reanchors_instead_of_spinning():
    """Terminal mouse reports are ABSOLUTE positions; events stop at the
    window edge. Regression: pointer re-entry far from the exit column
    integrated the whole gap as one delta — a full camera spin in one
    frame. Oversized jumps must only re-anchor (the reference integrates
    true per-event deltas, main.rs:922-928)."""
    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    loop = InteractiveLoop.__new__(InteractiveLoop)
    loop._last_mouse_x = None
    loop._carry = b""

    loop._parse_input(b"\x1b[<35;10;5M")                 # anchor at 10
    inp = loop._parse_input(b"\x1b[<35;200;5M")          # re-entry jump
    assert float(inp.mouse_dx) == 0.0
    inp = loop._parse_input(b"\x1b[<35;198;5M")          # normal motion
    assert float(inp.mouse_dx) == -2 * InteractiveLoop.MOUSE_PX_PER_CELL


def test_alt_chords_and_ss3_arrows():
    """Alt chords arrive as ESC+char: both bytes must be consumed (a
    skipped-ESC-only parser made Alt+Q quit and Alt+W walk). SS3
    application-cursor arrows (ESC O C/D) must act like CSI arrows."""
    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    loop = InteractiveLoop.__new__(InteractiveLoop)
    loop._last_mouse_x = None
    loop._carry = b""

    inp = loop._parse_input(b"\x1bq\x1bw\x1ba")   # Alt+Q / Alt+W / Alt+A
    assert not any(bool(k) for k in inp.keys)
    assert float(inp.mouse_dx) == 0.0

    inp = loop._parse_input(b"\x1bOC")            # SS3 right arrow
    assert float(inp.mouse_dx) == InteractiveLoop.YAW_STEP
    inp = loop._parse_input(b"\x1bOD")            # SS3 left arrow
    assert float(inp.mouse_dx) == -InteractiveLoop.YAW_STEP
    # Truncated SS3 carries to the next poll.
    inp = loop._parse_input(b"\x1bO")
    assert float(inp.mouse_dx) == 0.0
    inp = loop._parse_input(b"C")
    assert float(inp.mouse_dx) == InteractiveLoop.YAW_STEP


def test_native_matches_numpy_on_rotated_quads():
    """The twins must stay bit-identical on NON-axis-aligned geometry
    too (both grow node bounds over all four quad corners — the
    reference's 3-corner growth is a documented fixed bug,
    scene/bvh.py)."""
    r = np.random.default_rng(11)
    n = 200
    th = r.uniform(0, np.pi, n)
    u = np.stack([3 * np.cos(th), r.uniform(-1, 1, n), 3 * np.sin(th)], -1)
    v = np.stack([-2 * np.sin(th), r.uniform(1, 3, n), 2 * np.cos(th)], -1)
    o = r.uniform(-50, 50, (n, 3)).astype(np.float32)
    u = u.astype(np.float32)
    v = v.astype(np.float32)
    a = build_bvh(o, u, v, backend="numpy")
    b = build_bvh_native(o, u, v)
    assert b is not None
    np.testing.assert_array_equal(a.left_first, b.left_first)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.prim_index, b.prim_index)
    np.testing.assert_array_equal(a.aabb_min, b.aabb_min)
    np.testing.assert_array_equal(a.aabb_max, b.aabb_max)
