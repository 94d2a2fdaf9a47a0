"""Profiling and observability harness.

The reference has none (SURVEY.md section 5: commented-out frame timers at
`main.rs:769-770`, debug printlns only). This module provides the real
thing the north-star metric demands:

- FrameStats: rolling frame-time / fps / Mrays accounting for the engine
  loop (host-side, cheap, no device syncs except where asked);
- trace(): context manager around jax.profiler for on-demand XLA traces;
- summarize(): one-line JSON-able dict, the shape bench.py emits.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class FrameStats:
    """Rolling window of frame timings + ray throughput."""

    rays_per_frame: int
    window: int = 120
    _times: deque = field(default_factory=lambda: deque(maxlen=121))
    _frames: int = 0

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        self._frames += 1

    @property
    def frames(self) -> int:
        return self._frames

    @property
    def fps(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0

    @property
    def frame_ms(self) -> float:
        f = self.fps
        return 1000.0 / f if f > 0 else 0.0

    @property
    def mrays_per_s(self) -> float:
        return self.rays_per_frame * self.fps / 1e6

    def summarize(self) -> dict:
        return {
            "frames": self.frames,
            "fps": round(self.fps, 2),
            "frame_ms": round(self.frame_ms, 3),
            "mrays_per_s": round(self.mrays_per_s, 2),
            "rays_per_frame": self.rays_per_frame,
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mmx_trace"):
    """Capture a jax.profiler trace of the enclosed block (view with
    tensorboard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def tracer_segment_histogram(
    scene, cfg, ori, dirs, seed: int = 7, rows_per_block: int = 8,
    anchor=None,
) -> dict:
    """Per-block executed-segment statistics for the pallas tracer — the
    early-exit diagnostic behind PERF.md's block-utilization numbers.

    Returns {"mean", "max_segments", "histogram"} where histogram[k] =
    number of ray blocks that ran exactly k bounce-loop segments before
    their all-dead early exit.
    """
    import jax.numpy as jnp
    import numpy as np

    from ..render.pallas_tracer import trace_paths_pallas

    _, diag = trace_paths_pallas(
        scene.plane_table, ori, dirs, jnp.int32(seed), cfg.tracer,
        rows_per_block=rows_per_block, return_block_segments=True,
        tables=scene.mxu_tables, anchor=anchor,
    )
    diag = np.asarray(diag).astype(int)
    segs, tiles = diag[0], diag[1]
    tiles0, tiles3, live = diag[2], diag[3], diag[4]
    lanes = rows_per_block * 128
    return {
        "mean": float(segs.mean()),
        "max_segments": cfg.tracer.max_segments,
        "histogram": np.bincount(
            segs, minlength=cfg.tracer.max_segments + 1
        ).tolist(),
        # Dense plane tiles evaluated per block over its whole bounce
        # loop vs the no-skip worst case (segments x total tiles).
        "mean_tiles": float(tiles.mean()),
        "tiles_per_segment": float(tiles.sum() / max(segs.sum(), 1)),
        # Per-segment split of the tile skip (config-5 anatomy): the
        # PRIMARY segment is screen-coherent; bounce segments scatter.
        "tiles_seg0": float(tiles0.mean()),
        "tiles_per_segment_seg1_2": float(
            (tiles3 - tiles0).sum() / max(np.minimum(segs - 1, 2).sum(), 1)
        ),
        "tiles_per_segment_seg3plus": float(
            (tiles - tiles3).sum() / max((segs - 3).clip(0).sum(), 1)
        ),
        # Lockstep utilization: live lanes entering each executed
        # segment / (block lanes x segments).
        "live_lane_frac": float(live.sum() / max(segs.sum() * lanes, 1)),
    }


def device_memory_stats() -> dict:
    """Best-effort live/peak HBM numbers for the default device."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keep if k in stats}
