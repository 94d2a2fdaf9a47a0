"""Vector math over trailing-axis-3 arrays.

TPU-native replacement for the reference's scalar CPU vector library
(`maths.rs:1-136`: Float2/3/4 tuples with float3_add/subtract, scale3, dot3,
cross_product, magnitude, normalized, fminf/fmaxf). Here every op is a pure
jnp transform over arrays of shape [..., 3], so it vmaps/shards freely and
fuses on the VPU instead of looping on the host.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis (`maths.rs:105-107`)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3-vector cross product (`maths.rs:130-136`)."""
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def norm(a: jnp.ndarray) -> jnp.ndarray:
    """Euclidean magnitude over the trailing axis (`maths.rs:21-23`)."""
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Unit vector (`maths.rs:24-26`). With eps=0 this matches the reference,
    which happily divides by zero for degenerate inputs."""
    n = norm(a)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return a / n


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Metal `reflect(d, n)` = d - 2*dot(d, n)*n (used at `shaders.metal:329`)."""
    return d - 2.0 * dot(d, n)[..., None] * n
