"""Engine state and per-frame inputs.

Everything the reference keeps as host mutable state across frames —
camera position/quaternion/half_theta (`main.rs:735-741`), the frame
counter (`main.rs:761`), the shuffled pixel queue (`main.rs:713-720`), and
the GPU-side screen texture — lives here as ONE device-resident pytree,
threaded through a single donated jitted step so the whole simulate->render
loop stays in HBM (the north-star requirement).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..ops import quat as quat_ops
from ..render.camera import Camera, make_camera
from ..render.scheduler import init_permutation


class EngineState(NamedTuple):
    cam_center: jnp.ndarray   # [3] float32
    quat: jnp.ndarray         # [4] float32 (x, y, z, w)
    half_theta: jnp.ndarray   # [] float32 — yaw half-angle (`main.rs:741`)
    screen: jnp.ndarray       # [C, cw*cw*3] float32 CHUNK-MAJOR accumulation
                              # buffer (render/accumulate.py: row c = chunk c
                              # in chunk_pixels order; 16x cheaper refresh
                              # scatter than a spatial [H, W, 3] layout)
    perm: jnp.ndarray         # [C] int32 shuffled chunk ids
    cursor: jnp.ndarray       # [] int32
    key: jnp.ndarray          # PRNG key
    frame: jnp.ndarray        # [] int32 frame counter ("time" uniform)

    def camera(self, cfg: EngineConfig) -> Camera:
        vh = cfg.camera.viewport_height
        aspect = cfg.screen.width / cfg.screen.height
        return Camera(
            center=self.cam_center,
            rotation=self.quat,
            focal=jnp.float32(cfg.camera.focal_length),
            viewport=jnp.array([vh * aspect, vh], dtype=jnp.float32),
        )


class FrameInputs(NamedTuple):
    """Per-frame user input, the only host->device traffic per frame.

    keys: [4] bool for (A, S, D, W) — the reference's keycodes 0/1/2/13
    (`main.rs:786-815`). mouse_dx: accumulated mouse delta-x this frame.
    rot_updated: whether the mouse moved (`main.rs:922-928`).
    """

    keys: jnp.ndarray         # [4] bool: A, S, D, W
    mouse_dx: jnp.ndarray     # [] float32
    rot_updated: jnp.ndarray  # [] bool

    @staticmethod
    def idle() -> "FrameInputs":
        return FrameInputs(
            keys=jnp.zeros((4,), dtype=bool),
            mouse_dx=jnp.float32(0.0),
            rot_updated=jnp.asarray(False),
        )

    @staticmethod
    def make(a=False, s=False, d=False, w=False, mouse_dx=0.0) -> "FrameInputs":
        return FrameInputs(
            keys=jnp.array([a, s, d, w], dtype=bool),
            mouse_dx=jnp.float32(mouse_dx),
            rot_updated=jnp.asarray(mouse_dx != 0.0),
        )


def save_state(path: str, state: EngineState) -> None:
    """Checkpoint the engine state to an .npz file.

    The reference has NO checkpoint/resume — all run state is ephemeral
    and seed-0 determinism is its only resume story (SURVEY.md section 5).
    Here the complete simulation+render state (camera, yaw, accumulation
    screen, chunk queue, RNG key, frame counter) round-trips losslessly,
    so a session — or a long offline render — can stop and resume
    bit-exactly on any host.
    """
    import numpy as np

    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in state._asdict().items()}
    )


def load_state(path: str, cfg: EngineConfig | None = None) -> EngineState:
    """Restore a checkpoint written by save_state (bit-exact).

    With ``cfg``, the screen/queue shapes are validated against the
    config the state will drive: a mismatched checkpoint (different
    resolution/chunking, or the pre-chunk-major spatial [H, W, 3] screen
    layout) would otherwise surface as an opaque scatter shape error
    deep inside the first jitted step.
    """
    import numpy as np

    with np.load(path) as z:
        missing = [k for k in EngineState._fields if k not in z]
        if missing:
            raise ValueError(
                f"checkpoint {path!r} lacks field(s) {missing} — not a "
                "save_state checkpoint (or from an incompatible version)"
            )
        st = EngineState(
            **{k: jnp.asarray(z[k]) for k in EngineState._fields}
        )
    if st.cursor.ndim == 1:
        # A SHARDED checkpoint (parallel/shard.py ShardedEngineState:
        # cursor/key carry a band axis): convert to the single-chip
        # layout — camera/screen/frame exact, per-band queues
        # interleaved (see parallel.shard.sharded_to_single).
        if cfg is None:
            raise ValueError(
                f"checkpoint {path!r} is tile-sharded "
                f"({st.cursor.shape[0]} bands); pass cfg so it can be "
                "converted to the single-chip layout"
            )
        from ..parallel.shard import ShardedEngineState, sharded_to_single

        st = sharded_to_single(ShardedEngineState(**st._asdict()), cfg)
    if cfg is not None:
        want = (cfg.screen.total_chunks, cfg.screen.pixels_per_chunk * 3)
        if st.screen.shape != want:
            hint = (
                " (spatial [H, W, 3] layout: checkpoint predates the "
                "chunk-major screen and cannot be resumed)"
                if st.screen.ndim == 3 else ""
            )
            raise ValueError(
                f"checkpoint {path!r} screen shape {st.screen.shape} does "
                f"not match this config's chunk-major {want}{hint}; "
                "resume with the resolution/chunking it was saved under"
            )
        if st.perm.shape != (cfg.screen.total_chunks,):
            raise ValueError(
                f"checkpoint {path!r} chunk queue {st.perm.shape} does not "
                f"match this config's {(cfg.screen.total_chunks,)}"
            )
    return st


def init_state(cfg: EngineConfig, seed: int = 0) -> EngineState:
    key = jax.random.PRNGKey(seed)
    pkey, key = jax.random.split(key)
    cam = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    return EngineState(
        cam_center=cam.center,
        quat=cam.rotation,
        half_theta=quat_ops.half_theta_of(cam.rotation),
        screen=jnp.zeros(
            (cfg.screen.total_chunks, cfg.screen.pixels_per_chunk * 3),
            dtype=jnp.float32,
        ),
        perm=init_permutation(pkey, cfg.screen),
        cursor=jnp.int32(0),
        key=key,
        frame=jnp.int32(0),
    )
