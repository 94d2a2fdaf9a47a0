"""Pre-compile the engine's headline programs into the caches.

Cold-start anatomy on the axon remote-dispatch tunnel (PERF.md "cold
compile root cause"): first-run cost is split between the CLIENT XLA
compile (~40 s per 1080p program; skipped when the persistent
compilation cache at /tmp/mmx_jax_cache hits — it DOES hit across
processes for unchanged code) and a SERVER-side kernel compile that
happens lazily at FIRST EXECUTION. The server half is shared between
programs embedding the same Mosaic kernel WITHIN one process, but is
PER-PROCESS and highly variable (measured 120 s and 1093 s for
identical runs minutes apart) — it cannot be pre-paid cross-process.

So this tool's value is: (a) it seeds the persistent CLIENT cache for
every later process (saves the ~40-80 s client compiles), and (b) it
front-loads the server compile for work done IN THIS PROCESS — import
it and keep going:

    from tools.warm_cache import main  # or run the CLI first in a REPL

CLI:

    python tools/warm_cache.py            # bench point + play step
    python tools/warm_cache.py --frames 60 --width 1920 --height 1080

A later separate `python bench.py` still pays its own server
first-execution compile; budget minutes for it (PERF.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--mirror-limit", type=int, default=8)
    p.add_argument("--bounce-limit", type=int, default=5)
    p.add_argument("--maze", type=int, default=10)
    p.add_argument("--frames", type=int, default=60,
                   help="scan length to warm (must match bench --frames)")
    p.add_argument("--glass-prob", type=float, default=0.0, dest="glass_prob")
    p.add_argument("--preset", type=str, default=None)
    p.add_argument("--intersector", type=str, default=None)
    p.add_argument("--block-rows", type=int, default=None)
    p.add_argument("--lane-chunk", type=int, default=None)
    p.add_argument("--sort-window", type=int, default=None)
    p.add_argument("--skip-step", action="store_true",
                   help="warm only the scan program (skip the 1-frame "
                        "interactive step)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmx_jax_cache")

    from bench import build_bench_setup
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import (
        make_scan_step,
        make_step,
        repeat_input,
    )

    stats = {}
    t0 = time.time()
    cfg, scene, dev_scene = build_bench_setup(args)
    stats["setup_s"] = round(time.time() - t0, 1)

    # Bench program: the identical make_scan_step jit bench.py runs.
    t0 = time.time()
    step_n = make_scan_step(dev_scene, cfg, args.frames)
    state = init_state(cfg, seed=0)
    state, frame = step_n(state, repeat_input(FrameInputs.idle(), args.frames))
    float(frame.sum())  # forced: the server compiles at first execution
    stats["scan_warm_s"] = round(time.time() - t0, 1)

    if not args.skip_step:
        # Interactive play's per-frame step at the same config.
        t0 = time.time()
        step1 = make_step(dev_scene, cfg)
        st = init_state(cfg, seed=1)
        st, frame = step1(st, FrameInputs.idle())
        float(frame.sum())
        stats["step_warm_s"] = round(time.time() - t0, 1)

    stats["backend"] = jax.default_backend()
    stats["frames"] = args.frames
    print(json.dumps({"warmed": True, **stats}))


if __name__ == "__main__":
    main()
