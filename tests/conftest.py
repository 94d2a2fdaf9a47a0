"""Test harness: force the CPU backend with 8 virtual devices.

Per SURVEY.md section 4, the whole engine is pure-functional given a seed,
so every layer is testable on CPU-backend JAX — no TPU needed in CI — and
multi-chip sharding is validated on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count).

NOTE: this image's sitecustomize force-registers the axon TPU plugin and
overrides JAX_PLATFORMS from the environment, so we must also win via
jax.config.update after import — env vars alone are not enough.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from mirror_maze_tpu.config import (  # noqa: E402
    CameraConfig,
    EngineConfig,
    MazeConfig,
    ScreenConfig,
    TracerConfig,
)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8


@pytest.fixture(scope="session")
def tiny_cfg() -> EngineConfig:
    """Small config keeping CI compile times low."""
    return EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=3, mirror_limit=4),
        screen=ScreenConfig(
            width=32, height=32, samples_per_pixel=2, chunks_per_frame=8
        ),
        intersector="brute",
    )


@pytest.fixture(scope="session")
def tiny_scene(tiny_cfg):
    from mirror_maze_tpu.scene import build_scene

    return build_scene(tiny_cfg.maze)


@pytest.fixture(scope="session")
def tiny_device_scene(tiny_scene):
    from mirror_maze_tpu.render import upload_scene

    return upload_scene(tiny_scene)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
