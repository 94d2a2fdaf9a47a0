"""Noise texture: the reference's RNG seed source, as a loadable array.

The reference embeds a 512x512 RGBA noise PNG (`textures/noiseTexture-2.png`,
`main.rs:354, 667-695`) and seeds each GPU thread's PCG state from a texture
sample plus a pixel-coordinate hash and the frame counter
(`shaders.metal:288-300`). The TPU engine's counter-based seeding is already
well-decorrelated without any texture, so this is OFF by default
(TracerConfig.noise_rng); turning it on reproduces the reference's
spatially-correlated grain pattern for visual parity studies.

The texture itself is either loaded from a PNG (e.g. the reference's own
texture) or procedurally generated — a deterministic integer-hash white
noise image, which is what the reference's texture is for all practical
purposes.
"""

from __future__ import annotations

import numpy as np

NOISE_SIZE = 512


def generate_noise(size: int = NOISE_SIZE, seed: int = 0) -> np.ndarray:
    """Deterministic white-noise texture [size, size] float32 in [0, 1).

    PCG-style integer hash of the pixel index (the same mixing constants
    as the device RNG, `shaders.metal:181-186`), so the texture is
    reproducible across hosts with no RNG library dependence.
    """
    idx = np.arange(size * size, dtype=np.uint64) + np.uint64(seed) * np.uint64(
        0x9E3779B9
    )
    state = (idx.astype(np.uint32) * np.uint32(747796405)) + np.uint32(291336453)
    word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) * np.uint32(
        277803737
    )
    word = (word >> np.uint32(22)) ^ word
    return (word >> np.uint32(8)).astype(np.float32).reshape(size, size) / float(
        1 << 24
    )


def load_noise_png(path: str) -> np.ndarray:
    """Load a noise PNG (e.g. the reference's textures/noiseTexture-2.png)
    as [H, W] float32 in [0, 1) — the red channel, matching the reference's
    single-component sample (`shaders.metal:289`)."""
    from .imageio import read_png

    img = read_png(path)
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.float32) / 255.0


def sample_noise(tex, pixels_xy):
    """Per-pixel noise values [K] for pixel coords [K, 2] (wrap-around
    addressing, as texture sampling with repeat mode would)."""
    import jax.numpy as jnp

    h, w = tex.shape
    x = pixels_xy[:, 0] % w
    y = pixels_xy[:, 1] % h
    return jnp.asarray(tex)[y, x]
