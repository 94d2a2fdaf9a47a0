"""Failure detection + recovery for long engine runs.

The reference's only failure handling is a NaN check on the camera
quaternion that prints "Help!" and otherwise keeps running broken
(`main.rs:828-844`); everything else is expect/unwrap panics (SURVEY.md
section 5). This module is the real version: cheap periodic validation of
the engine state plus in-memory snapshots, so a long scripted render or
interactive session survives a numerically-poisoned state by rolling back
to the last good snapshot instead of propagating garbage frames.

Device-side guards already prevent the known failure modes (the
finite-guarded quaternion update, ops/quat.py); the watchdog is the
defense-in-depth layer for everything unforeseen.
"""

from __future__ import annotations

import numpy as np

from .state import EngineState


def state_is_finite(state: EngineState) -> bool:
    """Validate the simulation-critical fields (camera pose, yaw).

    Fetches only a dozen scalars — cheap even over a remote-dispatch
    link; the screen buffer is intentionally not scanned every call
    (a non-finite screen can only arise from non-finite camera state
    upstream, which this catches).
    """
    cam = np.asarray(state.cam_center)
    quat = np.asarray(state.quat)
    half = np.asarray(state.half_theta)
    return bool(
        np.isfinite(cam).all() and np.isfinite(quat).all() and np.isfinite(half)
    )


class Watchdog:
    """Periodic state validation with rollback-to-last-good-snapshot.

    >>> wd = Watchdog(interval=32)
    >>> state = wd.check(state)   # every frame; validates every `interval`
    """

    def __init__(self, interval: int = 32):
        self.interval = interval
        self._snapshot: EngineState | None = None
        self._since = 0
        self.rollbacks = 0

    def check(self, state: EngineState, n: int = 1) -> EngineState:
        """Return `state`, or the last good snapshot if `state` went
        non-finite. Validates (and snapshots) every `interval` frames.

        ``n`` is how many engine frames this call advances — batched
        drivers (lax.scan multi-frame steps) pass their batch size so the
        validation cadence stays frame-periodic, not launch-periodic."""
        self._since += n
        if self._since < self.interval and self._snapshot is not None:
            return state
        self._since = 0
        if state_is_finite(state):
            # DEEP copy: the engine step donates its state argument
            # (donate_argnums), so aliasing the live state would leave the
            # snapshot pointing at deleted device buffers after the very
            # next step. jnp.copy allocates fresh buffers the donation
            # can't reclaim.
            import jax
            import jax.numpy as jnp

            self._snapshot = jax.tree.map(jnp.copy, state)
            return state
        self.rollbacks += 1
        if self._snapshot is None:
            raise FloatingPointError(
                "engine state non-finite and no snapshot to roll back to"
            )
        # Hand out a COPY and keep our own: the caller feeds the returned
        # state into the donated step, which deletes its buffers — if the
        # state goes non-finite again before the next good snapshot (the
        # persistent-corruption case), the retained snapshot must still
        # be alive to roll back to a second time.
        import jax
        import jax.numpy as jnp

        return jax.tree.map(jnp.copy, self._snapshot)
