"""Shared golden-image helpers: deterministic tiny renders at seed 0.

SURVEY.md section 4: the reference's only correctness affordance is its
deterministic seed-0 world; these goldens exploit it properly — fixed
seed, camera, and spp on the CPU backend produce bit-stable images that
are committed and diffed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mirror_maze_tpu.config import (
    CameraConfig,
    EngineConfig,
    MazeConfig,
    ScreenConfig,
    TracerConfig,
)
from mirror_maze_tpu.render import make_camera, render_full_frame, upload_scene
from mirror_maze_tpu.runtime.loop import run_scripted
from mirror_maze_tpu.runtime.state import FrameInputs
from mirror_maze_tpu.scene import build_scene


def golden_cfg(intersector: str) -> EngineConfig:
    return EngineConfig(
        maze=MazeConfig(width=4, height=4, seed=0),
        tracer=TracerConfig(bounce_limit=3, mirror_limit=3),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=64, height=48, samples_per_pixel=8),
        intersector=intersector,
    )


def render_golden_frame(intersector: str) -> np.ndarray:
    cfg = golden_cfg(intersector)
    dev = upload_scene(build_scene(cfg.maze))
    cam = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
    img = render_full_frame(dev, cam, jax.random.PRNGKey(0), cfg)
    return np.asarray(jnp.clip(img, 0.0, 1.0))


def run_golden_script(intersector: str) -> np.ndarray:
    cfg = golden_cfg(intersector)
    dev = upload_scene(build_scene(cfg.maze))
    script = (
        [FrameInputs.idle()] * 8
        + [FrameInputs.make(w=True)] * 8
        + [FrameInputs.make(mouse_dx=16.0)] * 4
        + [FrameInputs.idle()] * 8
    )
    _, frame = run_scripted(dev, cfg, inputs=script)
    return frame
