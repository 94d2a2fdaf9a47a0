"""mirror-maze-tpu: a TPU-native simulation/rendering engine (JAX/XLA/Pallas)
with the capabilities of the Rust/Metal renderer thebasilisk/mirror-maze."""

from .config import (  # noqa: F401
    CameraConfig,
    EngineConfig,
    MazeConfig,
    NAMED_CONFIGS,
    ScreenConfig,
    TracerConfig,
)

__version__ = "0.1.0"
