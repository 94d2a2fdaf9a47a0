"""Frame-loop drivers: headless scripted runs and interactive play.

The reference's loop (`main.rs:767-939`) is an AppKit event pump + 60 fps
frame-deadline gate around one compute+render dispatch. Here the device work
is a single donated jitted step (runtime/step.py); these drivers supply the
host side: input, pacing, and (optional) display.

- ``run_scripted``: feed a deterministic input script (for tests, goldens,
  demos); returns the final state and last frame.
- ``InteractiveLoop``: terminal interactive driver — reads WASD + arrow keys
  from stdin (raw mode) as the closest headless analog of the reference's
  KeyDown/KeyUp/MouseMoved pump (`main.rs:896-937`), paces to fps, and
  writes frames to a PNG (or an optional sixel/kitty terminal display).
"""

from __future__ import annotations

import time
from typing import Iterable, Sequence

import numpy as np

from ..config import EngineConfig
from ..render.scenebuf import DeviceScene
from .state import EngineState, FrameInputs, init_state
from .step import make_step


def run_scripted(
    scene: DeviceScene,
    cfg: EngineConfig,
    inputs: Iterable[FrameInputs] | None = None,
    n_frames: int = 64,
    seed: int = 0,
    state: EngineState | None = None,
):
    """Run n_frames with the given per-frame inputs (idle if None).

    Returns (final_state, last_frame_u8). The whole run is device-resident;
    only the final frame is fetched.
    """
    step = make_step(scene, cfg)
    st = state if state is not None else init_state(cfg, seed)
    frame = None
    script: Sequence[FrameInputs]
    if inputs is None:
        script = [FrameInputs.idle()] * n_frames
    else:
        script = list(inputs)
    for inp in script:
        st, frame = step(st, inp)
    if frame is not None:
        frame = np.asarray(frame)
    return st, frame


class FramePacer:
    """Frame-deadline gate shared by every interactive driver.

    The reference gates on an NSDate deadline compare (`main.rs:775-776`).
    This is the host twin: advance the deadline by frames*spf, sleep the
    remainder, and RESET (not accumulate) when behind so a slow stretch
    doesn't turn into a permanent sprint. ``sleep`` is injectable so the
    HTTP server can pace with its stop-event's interruptible wait.
    """

    def __init__(self, fps: float):
        self.spf = 1.0 / float(fps)
        self.deadline = time.monotonic()

    def wait(self, stepped: int, sleep=time.sleep) -> None:
        self.deadline += self.spf * stepped
        delay = self.deadline - time.monotonic()
        if delay > 0:
            sleep(delay)
        else:
            self.deadline = time.monotonic()


def _lead_first_frame(k: int, inp: FrameInputs):
    """[k]-leading input pytree: frame 0 = the polled input, idle tail.
    Built IN-JIT (broadcast + where) — eager per-leaf stacking would pay
    several device dispatches per launch on a latency-bound remote link,
    defeating the batching (PERF.md rule 2/4)."""
    import jax
    import jax.numpy as jnp

    first = jnp.arange(k) == 0

    def lead(x):
        rep = jnp.broadcast_to(x, (k,) + jnp.shape(x))
        mask = first.reshape((k,) + (1,) * jnp.ndim(x))
        return jnp.where(mask, rep, jnp.zeros_like(rep))

    return jax.tree.map(lead, inp)


class InteractiveLoop:
    """Interactive terminal driver with the reference's control scheme:
    WASD to move (`main.rs:786-815`), continuous mouse-x yaw via SGR 1006
    terminal mouse reporting (`main.rs:922-925`: half_theta -= DX/512),
    'j'/'l' or arrow keys as discrete yaw fallback, 'q' to quit. Frame
    pacing matches the reference's deadline gate (`main.rs:775-776`)."""

    YAW_STEP = 16.0  # pixels of synthetic mouse delta per keypress
    # Terminals report mouse position in character CELLS; the reference's
    # sensitivity (DX/512, `main.rs:923`) is in pixels. A text cell is
    # ~8 px wide in common fonts, so one cell of motion maps to 8 px.
    MOUSE_PX_PER_CELL = 8.0
    # A per-event cell jump beyond this is a pointer re-entry (events
    # stop at the window edge) or a dropped-event gap, not motion: the
    # reference integrates true per-event deltas (`main.rs:922-928`),
    # while terminal reports are ABSOLUTE positions — integrating a
    # re-entry difference would whip the camera a full spin in one
    # frame. Such events only re-anchor.
    MOUSE_REANCHOR_CELLS = 32
    # Enable/disable any-motion mouse tracking + SGR-1006 encoding.
    MOUSE_ON = "\x1b[?1003h\x1b[?1006h"
    MOUSE_OFF = "\x1b[?1003l\x1b[?1006l"

    def __init__(
        self,
        scene: DeviceScene,
        cfg: EngineConfig,
        seed: int = 0,
        batch_frames: int = 1,
        adaptive: bool = True,
        sharded_bands: int | None = None,
    ):
        """``batch_frames`` > 1 runs that many engine frames per device
        launch (one lax.scan dispatch, runtime/step.py make_scan_step),
        amortizing dispatch latency — essential over remote-dispatch
        links where each launch costs tens of ms (PERF.md rule 2/4). The
        pending keys are applied on the batch's FIRST frame and held
        released for the rest, so input latency grows to batch_frames
        frame-times; 1 keeps the reference's per-frame input sampling.

        ``adaptive`` (default on, only meaningful with batch_frames > 1)
        drops to PER-FRAME stepping while input is active (and for ~1 s
        after), re-batching when idle: keys apply on the very next frame
        instead of the next batch boundary, while idle throughput keeps
        the batched launch amortization. Worst case latency is one
        in-flight batch (a launch cannot be interrupted).

        ``sharded_bands`` runs the TILE-SHARDED engine
        (parallel/shard.py make_sharded_engine) over a (1, n) device
        mesh instead of the single-chip step: the screen splits into n
        horizontal bands with per-band chunk queues, the camera sim is
        replicated (bit-identical trajectories), and the present stage
        exchanges ppermute halos so band seams are invisible. Needs n
        devices (real chips, or the virtual CPU mesh —
        XLA_FLAGS=--xla_force_host_platform_device_count)."""
        import jax

        self.cfg = cfg
        self.batch_frames = max(1, int(batch_frames))
        self.adaptive = adaptive and self.batch_frames > 1
        self._active_until = 0   # frame index until which input is "hot"
        self._had_input = False
        if sharded_bands:
            from ..parallel.shard import (
                make_mesh,
                make_sharded_engine,
                make_sharded_scan_engine,
            )

            from .step import derive_traversal_bounds

            mesh = make_mesh(1, sharded_bands)
            # Traversal bounds MUST be derived here, from the concrete
            # scene: the batched path below wraps the engine in an outer
            # jit, under which the lazy per-scene derivation would see
            # tracer arrays (np.asarray on a tracer raises).
            bounds = derive_traversal_bounds(scene, cfg, None, None)
            init1, step1 = make_sharded_engine(cfg, mesh, *bounds)
            if self.batch_frames > 1:
                k = self.batch_frames
                initn, scann = make_sharded_scan_engine(
                    cfg, mesh, k, *bounds
                )

                # First frame = the polled input, idle tail — same batch
                # semantics as the single-chip scan path, with the lead
                # pytree built inside the jit like that path.
                def batched_sh(scene_, state, inp):
                    return scann(scene_, state, _lead_first_frame(k, inp))

                scan_sh = jax.jit(batched_sh, donate_argnums=(1,))
                self.step = lambda st, inp: scan_sh(scene, st, inp)
                self.step_one = (
                    (lambda st, inp: step1(scene, st, inp))
                    if self.adaptive else None
                )
                init_fn = initn
            else:
                self.step = lambda st, inp: step1(scene, st, inp)
                self.step_one = None
                init_fn = init1
            self.state = init_fn(seed=seed)
            self.frame = None
            if self.step_one is not None:
                self.step_one(init_fn(seed=seed), FrameInputs.idle())
            self._finish_init(jax)
            return
        if self.batch_frames > 1:
            from .step import derive_traversal_bounds, make_scan_step_fn

            scan_fn = make_scan_step_fn(
                cfg, self.batch_frames,
                *derive_traversal_bounds(scene, cfg, None, None),
            )
            k = self.batch_frames

            # The [k]-leading input pytree is built INSIDE the jitted
            # program (_lead_first_frame): one launch per batch, no
            # eager per-leaf device ops on the latency-bound loop.
            def batched(scene_, state, inp):
                return scan_fn(scene_, state, _lead_first_frame(k, inp))

            scan = jax.jit(batched, donate_argnums=(1,))
            self.step = lambda state, inp: scan(scene, state, inp)
            # Per-frame twin for the adaptive input path.
            self.step_one = make_step(scene, cfg) if self.adaptive else None
        else:
            self.step = make_step(scene, cfg)
            self.step_one = None
        self.state = init_state(cfg, seed)
        self.frame = None
        if self.step_one is not None:
            # Pay the per-frame twin's jit compile NOW: left lazy, it
            # would compile on the first hot keypress — a multi-minute
            # 1080p Pallas stall mid-session over a remote link, exactly
            # when low-latency response was requested. One throwaway
            # frame on a scratch state populates the jit cache without
            # touching self.state.
            self.step_one(init_state(cfg, seed), FrameInputs.idle())
        self._finish_init(jax)

    @classmethod
    def from_engine(cls, cfg: EngineConfig, step_fn, state) -> "InteractiveLoop":
        """Wrap an EXTERNALLY built engine (e.g. the multiplayer step,
        parallel/multiplayer.py make_multiplayer_engine) in the terminal
        driver — input pump, display, pacing, watchdog — without
        building (and compiling) the standard single-chip step.
        ``step_fn(state, inputs) -> (state, frame)``; per-frame stepping
        only (a multiplayer exchange must run every frame)."""
        import jax

        self = cls.__new__(cls)
        self.cfg = cfg
        self.batch_frames = 1
        self.adaptive = False
        self._active_until = 0
        self._had_input = False
        self.step = step_fn
        self.step_one = None
        self.state = state
        self.frame = None
        self._finish_init(jax)
        return self

    def choose_step(self, n: int, active: bool):
        """THE adaptive per-frame-vs-batch policy, shared by the terminal
        loop and the HTTP server (runtime/server.py) so the two drivers
        cannot drift: while input is active (and for ~1 s after — the hot
        window), step PER-FRAME so keys land next frame; otherwise run the
        scan batch for launch amortization. Returns (step_fn, stepped)."""
        if self.adaptive and active:
            self._active_until = n + int(self.cfg.screen.fps)
        if (
            self.adaptive
            and self.step_one is not None
            and (active or n < self._active_until)
        ):
            return self.step_one, 1
        return self.step, self.batch_frames

    def _finish_init(self, jax):
        # Device-side thumbnail for the terminal display: fetching the
        # full frame over a remote-dispatch tunnel costs seconds per
        # transfer (PERF.md rule 4 territory); the terminal needs only
        # ~display_cols x rows pixels, so stride-sample ON DEVICE and
        # fetch the ~100x smaller array instead.
        import functools

        @functools.partial(jax.jit, static_argnums=1)
        def thumb(frame, step_px: int):
            return frame[::step_px, ::step_px]

        self._thumb = thumb
        self._last_mouse_x: int | None = None
        self._carry = b""  # escape sequence split across polls

    def _mouse_cell(self, x: int) -> float:
        """Turn one absolute mouse-cell column into a pixel delta against
        the running anchor; oversized jumps (pointer re-entry, dropped
        events) only re-anchor — see MOUSE_REANCHOR_CELLS."""
        dx = 0.0
        if self._last_mouse_x is not None:
            dcell = x - self._last_mouse_x
            if abs(dcell) <= self.MOUSE_REANCHOR_CELLS:
                dx = dcell * self.MOUSE_PX_PER_CELL
        self._last_mouse_x = x
        return dx

    def _poll_keys(self) -> FrameInputs:
        import select
        import sys

        if sys.stdin is None or not sys.stdin.isatty():
            # Headless invocation (piped stdin, or fd 0 closed at
            # startup — CPython then sets sys.stdin to None): no raw
            # mode, no key pump — the loop runs idle frames. Reading
            # here would spin on EOF (select reports readable, read
            # returns ''). Idle frames are NOT input: clear the flag so
            # a stale hot window from a previous run() cannot re-arm
            # itself forever and pin adaptive play at per-frame stepping.
            self._had_input = False
            return FrameInputs.idle()

        # Native event pump (native/term_present.cpp mmx_term_poll): one
        # call drains every pending byte, like the reference's
        # drain-until-None loop (`main.rs:896-904`); Python select loop
        # as fallback.
        from ..native.bindings import term_poll_native

        pending = term_poll_native(sys.stdin.fileno())
        if pending is None:
            chars = []
            while select.select([sys.stdin], [], [], 0.0)[0]:
                chars.append(sys.stdin.read(1))
            pending = "".join(chars).encode()
        return self._parse_input(pending)

    def _parse_input(self, pending: bytes) -> FrameInputs:
        """Decode one poll's byte drain: WASD keys, SGR-1006 mouse frames
        (``ESC [ < b ; x ; y M|m``) integrated into a pixel mouse_dx like
        the reference's MouseMoved arm (`main.rs:922-928`), arrow keys as
        discrete yaw. Truncated escape sequences carry to the next poll."""
        carried = len(self._carry)
        data = self._carry + pending
        self._carry = b""
        a = s = d = w = False
        dx = 0.0
        i, n = 0, len(data)
        while i < n:
            b = data[i]
            if b == 0x1B:
                if i + 1 >= n:
                    # Trailing ESC: either a truncated escape sequence
                    # (continuation bytes land next poll) or a bare ESC
                    # keypress. Carry it ONCE; if it was already carried
                    # and nothing followed within a whole frame's poll
                    # interval, it is a bare ESC — drop it rather than
                    # letting it sit in _carry forever.
                    if i >= carried:
                        self._carry = data[i:]
                    break
                if data[i + 1] != ord("["):
                    if data[i + 1] == ord("O"):
                        # SS3 (application cursor mode): ESC O C/D are
                        # the arrow keys — honor them like CSI arrows.
                        if i + 2 >= n:
                            self._carry = data[i:]
                            break
                        if data[i + 2] == ord("C"):
                            dx += self.YAW_STEP
                        elif data[i + 2] == ord("D"):
                            dx -= self.YAW_STEP
                        i += 3
                        continue
                    # Alt chord: terminals send ESC + char atomically,
                    # i.e. within ONE poll's drain. Consume BOTH bytes —
                    # skipping only the ESC made Alt+Q quit the session
                    # and Alt+W walk. But if the ESC was CARRIED from a
                    # previous poll, the following char arrived a frame
                    # later and is a real keypress after a bare ESC tap:
                    # drop only the ESC so the key is not eaten.
                    if i < carried:
                        i += 1
                    else:
                        i += 2
                    continue
                j = i + 2
                while j < n and not 0x40 <= data[j] <= 0x7E:
                    j += 1
                if j >= n:
                    self._carry = data[i:]
                    break
                fin, body = data[j], data[i + 2: j]
                if fin == ord("M") and not body:
                    # X10-encoded mouse report — the terminal honored
                    # ?1003 but not ?1006: ESC [ M Cb Cx Cy carries
                    # three RAW payload bytes AFTER the final 'M'. They
                    # MUST be consumed here; falling through would parse
                    # them as literal keypresses (the column byte is
                    # col+32, so column 81 injects 'q' and quits).
                    if j + 3 >= n:
                        self._carry = data[i:]
                        break
                    dx += self._mouse_cell(data[j + 2] - 32)
                    i = j + 4
                    continue
                if fin in (ord("M"), ord("m")) and body.startswith(b"<"):
                    parts = body[1:].split(b";")
                    if len(parts) == 3:
                        try:
                            x = int(parts[1])
                        except ValueError:
                            x = None
                        if x is not None:
                            dx += self._mouse_cell(x)
                elif fin == ord("C"):   # right arrow = 'l'
                    dx += self.YAW_STEP
                elif fin == ord("D"):   # left arrow = 'j'
                    dx -= self.YAW_STEP
                i = j + 1
                continue
            ch = chr(b)
            if ch == "q":
                raise KeyboardInterrupt
            a |= ch == "a"
            s |= ch == "s"
            d |= ch == "d"
            w |= ch == "w"
            if ch == "j":
                dx -= self.YAW_STEP
            if ch == "l":
                dx += self.YAW_STEP
            i += 1
        self._had_input = a or s or d or w or dx != 0.0
        return FrameInputs.make(a=a, s=s, d=d, w=w, mouse_dx=dx)

    def run(
        self,
        max_frames: int | None = None,
        out_png: str | None = None,
        display: str | None = "ansi",
        display_every: int = 6,
        display_cols: int = 100,
        watchdog_interval: int | None = 128,
    ):
        """Run the interactive loop.

        display="ansi" paints the view into the terminal as 24-bit
        half-block art every display_every frames (the headless stand-in
        for the reference's CAMetalLayer window); "kitty" uses the kitty
        graphics protocol for a full-resolution in-terminal image
        (kitty/ghostty/wezterm); None disables display.
        With batch_frames > 1, ``max_frames`` rounds UP to whole batches
        (each launch is a fixed-length compiled scan).
        ``watchdog_interval`` enables runtime/watchdog.py periodic state
        validation with rollback to the last good snapshot (None
        disables; the reference's whole failure story is a "Help!"
        print, `main.rs:828-844`).
        """
        import sys
        import termios

        from .watchdog import Watchdog

        wd = Watchdog(watchdog_interval) if watchdog_interval else None
        # Fresh input-decoder state per run: a stale mouse anchor from a
        # previous run() would turn the first event into a spurious yaw,
        # and a stale adaptive hot window (keys held when the previous
        # run ended) would force per-frame stepping for up to a second.
        self._last_mouse_x = None
        self._carry = b""
        self._had_input = False
        self._active_until = 0
        # Headless stdin (pipe, /dev/null, CI): skip raw mode and the
        # mouse pump entirely — _poll_keys returns idle frames — instead
        # of dying on tcgetattr(Inappropriate ioctl for device).
        tty_in = sys.stdin is not None and sys.stdin.isatty()
        fd = sys.stdin.fileno() if tty_in else -1
        old = termios.tcgetattr(fd) if tty_in else None
        pacer = FramePacer(self.cfg.screen.fps)
        try:
            if tty_in:
                # cbreak with TCSADRAIN, not tty.setcbreak's TCSAFLUSH:
                # the flush variant DISCARDS input typed before the loop
                # starts.
                mode = termios.tcgetattr(fd)
                mode[3] &= ~(termios.ECHO | termios.ICANON)
                mode[6][termios.VMIN] = 1
                mode[6][termios.VTIME] = 0
                termios.tcsetattr(fd, termios.TCSADRAIN, mode)
                # Continuous mouse-look: any-motion tracking, SGR
                # encoding (parsed in _parse_input). Terminals without
                # support ignore the sequences; j/l and arrows remain
                # as fallback.
                sys.stdout.write(self.MOUSE_ON)
                sys.stdout.flush()
            n = 0
            shown = 0
            t_start = time.monotonic()
            while max_frames is None or n < max_frames:
                inp = self._poll_keys()
                step_fn, stepped = self.choose_step(n, self._had_input)
                self.state, self.frame = step_fn(self.state, inp)
                if wd is not None:
                    self.state = wd.check(self.state, n=stepped)
                n += stepped
                if display is not None and n >= shown + display_every:
                    shown = n
                    if display == "kitty":
                        from ..utils.imageio import kitty_frame

                        art = kitty_frame(np.asarray(self.frame))
                    else:
                        from ..utils.imageio import ansi_frame

                        step_px = max(
                            1, -(-self.cfg.screen.width // display_cols)
                        )
                        small = np.asarray(self._thumb(self.frame, step_px))
                        art = ansi_frame(small, display_cols)
                    wall = time.monotonic() - t_start
                    c = np.asarray(self.state.cam_center)
                    status = (
                        f"\nframe {n}  ({c[0]:+.1f}, {c[2]:+.1f})  "
                        f"{n / wall:.1f} fps  [wasd move, j/l turn, q quit]"
                    )
                    sys.stdout.write("\x1b[H\x1b[2J" + art + status + "\n")
                    sys.stdout.flush()
                pacer.wait(stepped)
        except KeyboardInterrupt:
            pass
        finally:
            if tty_in:
                sys.stdout.write(self.MOUSE_OFF)
                sys.stdout.flush()
                termios.tcsetattr(fd, termios.TCSADRAIN, old)
        if out_png and self.frame is not None:
            from ..utils.imageio import write_png

            write_png(out_png, np.asarray(self.frame))
