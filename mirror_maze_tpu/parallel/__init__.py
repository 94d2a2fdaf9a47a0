"""Multi-chip / multi-host parallelism.

`shard.py` holds the single-process mesh machinery (batched multi-camera
renderer and the tile-sharded interactive engine over ICI). This package
entry adds the multi-host story: one `jax.distributed` call per process,
after which `jax.devices()` spans every host's chips and the same
`make_mesh`/`shard_map` code shards over DCN + ICI with no further
changes — the mesh axes are laid out so the fine-grained collectives
(the blur's 1-row `ppermute` halos, frame `all_gather`) ride ICI within
a host and only band-boundary halos cross DCN.
"""

from __future__ import annotations


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Join this process to a multi-host JAX cluster (DCN).

    Thin wrapper over `jax.distributed.initialize`: on TPU pods the
    arguments are auto-detected from the environment, so a bare
    `initialize_multihost()` on every host is enough. Returns the number
    of processes. Single-process callers may skip this entirely —
    nothing in `shard.py` requires it.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


from .shard import (  # noqa: E402
    batch_cameras,
    gather_frames,
    make_mesh,
    make_sharded_engine,
    make_sharded_renderer,
    make_sharded_scan_engine,
)

__all__ = [
    "batch_cameras",
    "gather_frames",
    "initialize_multihost",
    "make_mesh",
    "make_sharded_engine",
    "make_sharded_renderer",
    "make_sharded_scan_engine",
]
