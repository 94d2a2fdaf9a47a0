"""Random sampling primitives for the tracer.

The reference uses a PCG-style integer-hash RNG per GPU thread
(`shaders.metal:181-186`) seeded from a noise texture + pixel coords + frame
counter (`shaders.metal:288-300`), and draws unit vectors by rejection
sampling the cube (`shaders.metal:315-318`) — an unbounded loop that cannot
be expressed as a fixed-shape TPU program. We substitute the
distribution-equivalent closed form (normalized Gaussians are uniform on the
sphere), driven by JAX's counter-based threefry so every (pixel, sample,
frame) gets an independent, reproducible stream with no texture round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unit_sphere(key: jax.Array, shape: tuple) -> jnp.ndarray:
    """Uniform random unit vectors, shape [*shape, 3].

    Distribution-equivalent to the reference's rejection-sampled cube points
    normalized to the sphere (`shaders.metal:315-319`).
    """
    g = jax.random.normal(key, shape + (3,), dtype=jnp.float32)
    n = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    # Gaussian triples are never exactly zero in practice, but guard anyway.
    return g / jnp.maximum(n, 1e-12)


def ray_jitter(key: jax.Array, shape: tuple, scale: float) -> jnp.ndarray:
    """Anti-aliasing direction jitter: uniform in [-1, 1)^2 x {0}, scaled
    (`shaders.metal:303`: ((rand-0.5)*2, (rand-0.5)*2, 0) * 0.001)."""
    u = jax.random.uniform(
        key, shape + (2,), dtype=jnp.float32, minval=-1.0, maxval=1.0
    )
    z = jnp.zeros(shape + (1,), dtype=jnp.float32)
    return jnp.concatenate([u, z], axis=-1) * scale
