"""Player-vs-world collision query.

The reference recursively walks the BVH testing the player's AABB against
node AABBs, returning on the first overlapping leaf (`main.rs:265-291`), and
the frame loop reverts the camera position on any hit (`main.rs:817-826`).

A recursive host walk is the wrong shape for a jitted step function. The
exact same predicate — "does the player box overlap any leaf-node AABB?" —
is a branchless any() over the (small) precomputed leaf-box set: if the box
overlaps a leaf it necessarily overlaps every ancestor, so tree pruning
changes cost, not the answer. (We intentionally do not replicate the
reference's latent bug of treating only count==1 nodes as leaves, which
mis-traverses multi-primitive leaves produced by SAH aborts.)
"""

from __future__ import annotations

import jax.numpy as jnp


def collides(
    leaf_min: jnp.ndarray,   # [L, 3]
    leaf_max: jnp.ndarray,   # [L, 3]
    box_min: jnp.ndarray,    # [..., 3]
    box_max: jnp.ndarray,    # [..., 3]
) -> jnp.ndarray:
    """True where the query box overlaps any leaf AABB.

    Overlap test matches `aabb::intersect` (`main.rs:237-244`): closed
    intervals on all three axes. Batched over leading query dims.
    """
    bmin = box_min[..., None, :]
    bmax = box_max[..., None, :]
    overlap = jnp.all((bmin <= leaf_max) & (bmax >= leaf_min), axis=-1)
    return jnp.any(overlap, axis=-1)
