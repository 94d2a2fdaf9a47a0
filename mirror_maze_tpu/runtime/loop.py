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


class InteractiveLoop:
    """Interactive terminal driver with the reference's control scheme:
    WASD to move (`main.rs:786-815`), 'j'/'l' (or arrow keys) as mouse-x
    yaw (`main.rs:922-925`), 'q' to quit. Frame pacing matches the
    reference's deadline gate (`main.rs:775-776`)."""

    YAW_STEP = 16.0  # pixels of synthetic mouse delta per keypress

    def __init__(
        self,
        scene: DeviceScene,
        cfg: EngineConfig,
        seed: int = 0,
        batch_frames: int = 1,
    ):
        """``batch_frames`` > 1 runs that many engine frames per device
        launch (one lax.scan dispatch, runtime/step.py make_scan_step),
        amortizing dispatch latency — essential over remote-dispatch
        links where each launch costs tens of ms (PERF.md rule 2/4). The
        pending keys are applied on the batch's FIRST frame and held
        released for the rest, so input latency grows to batch_frames
        frame-times; 1 keeps the reference's per-frame input sampling."""
        import jax

        self.cfg = cfg
        self.batch_frames = max(1, int(batch_frames))
        if self.batch_frames > 1:
            from .step import derive_traversal_bounds, make_scan_step_fn

            scan_fn = make_scan_step_fn(
                cfg, self.batch_frames,
                *derive_traversal_bounds(scene, cfg, None, None),
            )
            k = self.batch_frames

            # The [k]-leading input pytree is built INSIDE the jitted
            # program (first frame = the polled input, idle tail = the
            # broadcast zeroed after frame 0): one launch per batch, no
            # eager per-leaf device ops on the latency-bound loop.
            def batched(scene_, state, inp):
                import jax.numpy as jnp

                first = jnp.arange(k) == 0

                def lead(x):
                    rep = jnp.broadcast_to(x, (k,) + jnp.shape(x))
                    mask = first.reshape((k,) + (1,) * jnp.ndim(x))
                    return jnp.where(mask, rep, jnp.zeros_like(rep))

                return scan_fn(scene_, state, jax.tree.map(lead, inp))

            scan = jax.jit(batched, donate_argnums=(1,))
            self.step = lambda state, inp: scan(scene, state, inp)
        else:
            self.step = make_step(scene, cfg)
        self.state = init_state(cfg, seed)
        self.frame = None

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

    def _poll_keys(self) -> FrameInputs:
        import select
        import sys

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

        a = s = d = w = False
        dx = 0.0
        for ch in pending.decode(errors="ignore"):
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
        import tty

        from .watchdog import Watchdog

        wd = Watchdog(watchdog_interval) if watchdog_interval else None
        fd = sys.stdin.fileno()
        old = termios.tcgetattr(fd)
        spf = 1.0 / self.cfg.screen.fps
        try:
            tty.setcbreak(fd)
            n = 0
            shown = 0
            t_start = time.monotonic()
            deadline = time.monotonic()
            while max_frames is None or n < max_frames:
                inp = self._poll_keys()
                self.state, self.frame = self.step(self.state, inp)
                if wd is not None:
                    self.state = wd.check(self.state, n=self.batch_frames)
                n += self.batch_frames
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
                deadline += spf * self.batch_frames
                delay = deadline - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
                else:
                    deadline = time.monotonic()
        except KeyboardInterrupt:
            pass
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old)
        if out_png and self.frame is not None:
            from ..utils.imageio import write_png

            write_png(out_png, np.asarray(self.frame))
