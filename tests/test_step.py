"""End-to-end engine step tests (`runtime/step.py` vs `main.rs:767-894`):
movement, collision revert, rotation + queue reset, determinism, and the
progressive repaint."""

import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.render import upload_scene
from mirror_maze_tpu.runtime.state import FrameInputs, init_state
from mirror_maze_tpu.runtime.step import make_step
from mirror_maze_tpu.scene import build_scene


def test_step_runs_and_is_deterministic(tiny_cfg, tiny_device_scene):
    step = make_step(tiny_device_scene, tiny_cfg)

    def run():
        st = init_state(tiny_cfg, seed=7)
        frames = []
        for i in range(4):
            st, f = step(st, FrameInputs.make(w=(i % 2 == 0)))
            frames.append(np.asarray(f))
        return st, frames

    st1, f1 = run()
    st2, f2 = run()
    for a, b in zip(f1, f2):
        assert np.array_equal(a, b)
    assert int(st1.frame) == 4
    assert np.array_equal(np.asarray(st1.cam_center), np.asarray(st2.cam_center))


def test_movement_matches_reference_integration(tiny_cfg, tiny_device_scene):
    """W moves along quat-rotated +z at speed/fps (`main.rs:807-812`)."""
    from mirror_maze_tpu.ops import quat as q

    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=0)
    c0 = np.asarray(st.cam_center)
    st, _ = step(st, FrameInputs.make(w=True))
    c1 = np.asarray(st.cam_center)
    speed = tiny_cfg.camera.move_speed / tiny_cfg.screen.fps
    expected = c0 + np.asarray(
        q.rotate(jnp.array([0.0, 0.0, speed], jnp.float32), st.quat)
    )
    np.testing.assert_allclose(c1, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_collision_blocks_walking_into_wall(tiny_cfg, tiny_scene, tiny_device_scene):
    """Walking forward forever must be stopped by maze geometry
    (`main.rs:817-826`), never escaping the outer boundary."""
    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=0)
    for _ in range(600):  # 10 seconds of walking at 60 fps
        st, _ = step(st, FrameInputs.make(w=True))
    c = np.asarray(st.cam_center)
    half = tiny_cfg.maze.world_half_extent
    assert np.abs(c[0]) < half and np.abs(c[2]) < half


@pytest.mark.slow
def test_rotation_updates_quat_and_resets_queue(tiny_cfg, tiny_device_scene):
    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=3)
    perm0 = np.asarray(st.perm)
    st, _ = step(st, FrameInputs.idle())
    assert int(st.cursor) == tiny_cfg.screen.effective_chunks_per_frame
    q_before = np.asarray(st.quat)
    ht_before = float(st.half_theta)
    st, _ = step(st, FrameInputs.make(mouse_dx=32.0))
    assert not np.allclose(np.asarray(st.quat), q_before)
    expected_ht = (ht_before - 32.0 * tiny_cfg.camera.mouse_sensitivity) % np.pi
    assert float(st.half_theta) == np.float32(expected_ht)
    # queue regenerated + cursor reset (`main.rs:836-841`)
    assert int(st.cursor) == 0
    assert not np.array_equal(np.asarray(st.perm), perm0)


@pytest.mark.slow
def test_idle_keeps_camera_fixed(tiny_cfg, tiny_device_scene):
    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=0)
    c0, q0 = np.asarray(st.cam_center), np.asarray(st.quat)
    for _ in range(3):
        st, _ = step(st, FrameInputs.idle())
    assert np.array_equal(np.asarray(st.cam_center), c0)
    assert np.array_equal(np.asarray(st.quat), q0)


def test_progressive_repaint_covers_screen(tiny_cfg, tiny_device_scene):
    """After total_chunks/chunks_per_frame frames every pixel has been
    traced at least once (the 64-frame full repaint, `main.rs:293-326`)."""
    cfg = tiny_cfg.replace(
        screen=tiny_cfg.screen.__class__(
            width=32, height=32, samples_per_pixel=1, chunks_per_frame=16,
            quantize_8bit=False, feedback_blur=False,
        )
    )
    dev = tiny_device_scene
    step = make_step(dev, cfg)
    st = init_state(cfg, seed=1)
    from mirror_maze_tpu.render.accumulate import cm_to_spatial

    n_frames = cfg.screen.total_chunks // cfg.screen.effective_chunks_per_frame
    touched = np.zeros((32, 32), bool)
    prev = np.asarray(cm_to_spatial(st.screen, cfg.screen)).copy()
    for _ in range(n_frames):
        st, _ = step(st, FrameInputs.idle())
        cur = np.asarray(cm_to_spatial(st.screen, cfg.screen))
        touched |= np.any(cur != prev, axis=-1)
        prev = cur.copy()
    # all chunks were scheduled; some pixels may coincidentally write 0.0
    # over 0.0, so check scheduling coverage via the cursor instead plus a
    # loose pixel-coverage bound.
    assert int(st.cursor) == 0
    assert touched.mean() > 0.5


def test_run_scripted(tiny_cfg):
    from mirror_maze_tpu.runtime.loop import run_scripted

    scene = build_scene(tiny_cfg.maze)
    dev = upload_scene(scene)
    st, frame = run_scripted(dev, tiny_cfg, n_frames=3, seed=0)
    assert frame.shape == (tiny_cfg.screen.height, tiny_cfg.screen.width, 3)
    assert frame.dtype == np.uint8
    assert int(st.frame) == 3


@pytest.mark.slow
def test_spin_walk_never_escapes_or_blows_up(tiny_cfg, tiny_device_scene):
    """Regression: repeated small yaw updates must never produce a
    non-finite quaternion. The reference formula sin(theta)/sin(acos(w))
    emits INF once cos(theta) rounds to 1.0 in float32 (theta < ~3.4e-4),
    slipping past a NaN-only guard and catapulting the camera out of the
    world (found by runtime probing; see ops/quat.py update_angle)."""
    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=0)
    # drive half_theta through many wraps incl. the tiny-angle regime
    for i in range(400):
        st, _ = step(st, FrameInputs.make(w=True, mouse_dx=7.0))
    assert bool(jnp.all(jnp.isfinite(st.quat)))
    assert bool(jnp.all(jnp.isfinite(st.cam_center)))
    c = np.asarray(st.cam_center)
    half = tiny_cfg.maze.world_half_extent
    assert abs(c[0]) < half and abs(c[2]) < half


def test_exact_zero_half_theta_keeps_engine_alive(tiny_cfg, tiny_device_scene):
    """Driving half_theta to exactly 0 degenerates the quat axis; the
    finite-guard must keep the previous orientation and the engine must
    keep running (the reference would print "Help!" forever,
    `main.rs:828-844`)."""
    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=0)
    dx = float(st.half_theta) / tiny_cfg.camera.mouse_sensitivity
    st, _ = step(st, FrameInputs.make(mouse_dx=dx))
    for _ in range(3):
        st, f = step(st, FrameInputs.make(w=True, mouse_dx=5.0))
    assert bool(jnp.all(jnp.isfinite(st.quat)))
    assert bool(jnp.all(jnp.isfinite(st.cam_center)))


def test_scan_step_matches_sequential_steps(tiny_cfg, tiny_device_scene):
    """The device-resident multi-frame scan (one launch for n frames) must
    produce bitwise the same state/frame as n sequential step calls."""
    from mirror_maze_tpu.runtime.step import (
        make_scan_step,
        make_step,
        stack_inputs,
    )

    script = [
        FrameInputs.make(w=True),
        FrameInputs.make(mouse_dx=8.0),
        FrameInputs.make(d=True),
        FrameInputs.idle(),
    ]
    step = make_step(tiny_device_scene, tiny_cfg)
    st_seq = init_state(tiny_cfg, seed=3)
    for inp in script:
        st_seq, frame_seq = step(st_seq, inp)

    scan = make_scan_step(tiny_device_scene, tiny_cfg, len(script))
    st_scan, frame_scan = scan(init_state(tiny_cfg, seed=3), stack_inputs(script))

    assert np.array_equal(np.asarray(frame_seq), np.asarray(frame_scan))
    for a, b in zip(st_seq, st_scan):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_interactive_batch_frames_matches_sequential(
    tiny_cfg, tiny_device_scene
):
    """InteractiveLoop(batch_frames=k).step must equal k sequential
    steps: the polled input on frame 1, idle for the rest (the batched
    play mode for remote-dispatch links)."""
    from mirror_maze_tpu.runtime.loop import InteractiveLoop
    from mirror_maze_tpu.runtime.step import make_step

    loop = InteractiveLoop(tiny_device_scene, tiny_cfg, seed=5,
                           batch_frames=3)
    inp = FrameInputs.make(w=True, mouse_dx=4.0)
    st_batch, frame_batch = loop.step(init_state(tiny_cfg, seed=5), inp)

    step = make_step(tiny_device_scene, tiny_cfg)
    st = init_state(tiny_cfg, seed=5)
    for i, one in enumerate([inp, FrameInputs.idle(), FrameInputs.idle()]):
        st, frame = step(st, one)

    assert np.array_equal(np.asarray(frame), np.asarray(frame_batch))
    for a, b in zip(st, st_batch):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_repeat_input_shapes(tiny_cfg):
    from mirror_maze_tpu.runtime.step import repeat_input

    r = repeat_input(FrameInputs.make(w=True, mouse_dx=2.0), 5)
    assert r.keys.shape == (5, 4)
    assert r.mouse_dx.shape == (5,)
    assert r.rot_updated.shape == (5,)


@pytest.mark.slow
def test_adaptive_batch_frames_single_steps_on_input(
    tiny_cfg, tiny_device_scene
):
    """Adaptive play batching: with batch_frames > 1, input (and ~1 s
    after it) must be served by PER-FRAME steps (key latency 1 frame,
    not batch_frames), while a fully idle session stays batched."""
    import os
    import pty
    import sys

    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    def run_with(stdin_bytes, max_frames):
        loop = InteractiveLoop(tiny_device_scene, tiny_cfg, seed=1,
                               batch_frames=4)
        calls = {"one": 0, "batch": 0}
        real_one, real_batch = loop.step_one, loop.step

        def one(s, i):
            calls["one"] += 1
            return real_one(s, i)

        def batch(s, i):
            calls["batch"] += 1
            return real_batch(s, i)

        loop.step_one, loop.step = one, batch
        master, slave = pty.openpty()
        old_stdin = sys.stdin
        try:
            import tty as tty_mod

            # Pre-set cbreak so bytes written before run() takes the
            # terminal out of canonical mode aren't held in the line
            # discipline's buffer waiting for a newline.
            tty_mod.setcbreak(slave)
            sys.stdin = os.fdopen(slave, "r", closefd=False)
            if stdin_bytes:
                os.write(master, stdin_bytes)
            loop.run(max_frames=max_frames, display=None,
                     watchdog_interval=None)
        finally:
            sys.stdin = old_stdin
            os.close(master)
            os.close(slave)
        return calls

    hot = run_with(b"w", max_frames=3)
    assert hot["one"] == 3 and hot["batch"] == 0

    idle = run_with(b"", max_frames=8)
    assert idle["batch"] == 2 and idle["one"] == 0


@pytest.mark.slow
def test_interactive_ansi_display_smoke(tiny_cfg, tiny_device_scene):
    """run(display='ansi') must emit mouse-tracking enable/disable, the
    clear-screen + half-block frame art, and the status line — the
    headless stand-in for the reference's window present."""
    import io
    import os
    import pty
    import sys

    from mirror_maze_tpu.runtime.loop import InteractiveLoop

    loop = InteractiveLoop(tiny_device_scene, tiny_cfg, seed=2)
    master, slave = pty.openpty()
    old_stdin, old_stdout = sys.stdin, sys.stdout
    buf = io.StringIO()
    try:
        import tty as tty_mod

        tty_mod.setcbreak(slave)
        sys.stdin = os.fdopen(slave, "r", closefd=False)
        sys.stdout = buf
        loop.run(max_frames=8, display="ansi", display_every=2,
                 display_cols=16, watchdog_interval=None)
    finally:
        sys.stdin, sys.stdout = old_stdin, old_stdout
        os.close(master)
        os.close(slave)
    out = buf.getvalue()
    assert InteractiveLoop.MOUSE_ON in out and InteractiveLoop.MOUSE_OFF in out
    assert "\x1b[H\x1b[2J" in out          # clear + home per repaint
    assert "\x1b[38;2;" in out             # 24-bit foreground color runs
    assert "▀" in out                 # half-block glyph
    assert "frame 8" in out or "frame 6" in out  # status line painted


@pytest.mark.slow
def test_interactive_loop_from_engine(tiny_cfg, tiny_device_scene):
    """from_engine wraps an externally built step (the multiplayer
    driver's path) in the terminal loop: per-frame stepping, pacing,
    and the watchdog all run without building the standard engine."""
    from mirror_maze_tpu.runtime.loop import InteractiveLoop
    from mirror_maze_tpu.runtime.state import init_state
    from mirror_maze_tpu.runtime.step import make_step

    calls = []
    base = make_step(tiny_device_scene, tiny_cfg)

    def step_fn(state, inputs):
        calls.append(1)
        return base(state, inputs)

    loop = InteractiveLoop.from_engine(
        tiny_cfg, step_fn, init_state(tiny_cfg, seed=0)
    )
    assert loop.step_one is None and loop.batch_frames == 1
    loop.run(max_frames=4, display=None)
    assert len(calls) == 4
    assert int(loop.state.frame) == 4
    assert np.isfinite(np.asarray(loop.frame, np.float32)).all()
