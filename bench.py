"""Benchmark harness: steady-state frame rate + ray throughput on the
real device, at the north-star operating point (BASELINE.md: 1080p,
8 mirror bounces, >=4 spp progressive refresh, vs the reference's implied
47.2 M primary rays/s at its 1024x768/60fps operating point).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def build_bench_setup(args):
    """Config + scene + device scene for the bench operating point.

    Shared by main() and tools/warm_cache.py so the warmed program is
    the IDENTICAL jit program bench will run (same HLO -> same
    persistent-cache key). ``args`` is the parsed bench namespace (or
    any object with the same attributes).
    """
    import dataclasses

    from mirror_maze_tpu.config import (
        EngineConfig,
        MazeConfig,
        ScreenConfig,
        TracerConfig,
    )
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.scene import build_scene

    if args.preset:
        from mirror_maze_tpu.config import NAMED_CONFIGS

        cfg = NAMED_CONFIGS[args.preset]()
    else:
        from mirror_maze_tpu.config import CameraConfig

        # Keep the spawn INSIDE the world: the default (-5, 0, -45)
        # fits mazes >= 10x10 but sits OUTSIDE smaller worlds, where it
        # benches black frames whose rays mostly die after one segment
        # (measured: the bvh backend "ran" 8x faster on that
        # nothing-workload). Move it only when outside, to the same
        # half-cell-inset position the 10x10 default has; mazes >= 10
        # (incl. config 5) keep the exact recorded camera.
        maze = MazeConfig(width=args.maze, height=args.maze,
                          glass_prob=args.glass_prob)
        cam = CameraConfig()
        if abs(cam.spawn[2]) >= maze.world_half_extent:
            spawn_z = -(maze.world_half_extent - maze.cell_size / 2.0)
            cam = CameraConfig(spawn=(-5.0, 0.0, spawn_z))
        cfg = EngineConfig(
            maze=maze,
            camera=cam,
            tracer=TracerConfig(
                bounce_limit=args.bounce_limit, mirror_limit=args.mirror_limit,
            ),
            screen=ScreenConfig(
                width=args.width, height=args.height,
                samples_per_pixel=args.spp,
                # Coherent ray blocks: multi-tile AABB skip on large
                # scenes, earlier all-dead exit on small ones (PERF.md).
                sort_chunk_window=True,
            ),
        )
    if args.intersector:
        cfg = cfg.replace(intersector=args.intersector)
    if args.block_rows:
        cfg = cfg.replace(
            tracer=dataclasses.replace(cfg.tracer, block_rows=args.block_rows)
        )
    if args.lane_chunk:
        cfg = cfg.replace(
            tracer=dataclasses.replace(cfg.tracer, lane_chunk=args.lane_chunk)
        )
    if args.sort_window is not None:
        cfg = cfg.replace(
            screen=dataclasses.replace(
                cfg.screen, sort_chunk_window=bool(args.sort_window)
            )
        )

    scene = build_scene(cfg.maze)
    dev_scene = upload_scene(scene)
    if args.block_rows is None and args.preset is None:
        # Measured-optimal block size by the PACKED tile-group shape
        # (PERF.md): every group single-tile -> 96 (the K=24
        # compensated-dot optimum, round 5: 96 -> 185.6 Mrays/s vs
        # 128 -> 183.4, 64 -> 181.7, 192 -> 180.4 at the 1080p
        # headline); a few tiles -> 32 (config 3 measured 66.8 at 32
        # vs 61.9 at 16); many tiles -> 24 (config 5 under the K=24 dot:
        # 24 -> 545.5 ms, 32 -> 547.9, 16 -> 562.6).
        n_tiles = max(
            g[2].shape[0] for g in dev_scene.mxu_tables if g is not None
        )
        rows = 96 if n_tiles == 1 else (32 if n_tiles <= 4 else 24)
        cfg = cfg.replace(
            tracer=dataclasses.replace(cfg.tracer, block_rows=rows)
        )
    return cfg, scene, dev_scene


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--spp", type=int, default=64,
                   help="samples per refreshed pixel (reference: 64)")
    p.add_argument("--mirror-limit", type=int, default=8)
    p.add_argument("--bounce-limit", type=int, default=5)
    p.add_argument("--maze", type=int, default=10)
    p.add_argument("--frames", type=int, default=60,
                   help="frames per device launch (lax.scan)")
    p.add_argument("--launches", type=int, default=3,
                   help="timed launches of --frames each")
    p.add_argument("--intersector", type=str, default=None,
                   help="override backend: brute | bvh | exact | pallas")
    p.add_argument("--lane-chunk", type=int, default=None,
                   help="dense_nearest lane-chunk width (bitwise-neutral "
                        "scheduling knob; default = measured-best policy)")
    p.add_argument("--block-rows", type=int, default=None,
                   help="override TracerConfig.block_rows (128-lane rows "
                        "per pallas program)")
    p.add_argument("--glass-prob", type=float, default=0.0,
                    dest="glass_prob",
                    help="fraction of mirror walls converted to GLASS "
                         "panes (measures the dielectric stage's cost; "
                         "0 = reference parity)")
    p.add_argument("--sort-window", type=int, default=None, choices=(0, 1),
                   help="override ScreenConfig.sort_chunk_window "
                        "(default: on)")
    p.add_argument("--preset", type=str, default=None,
                   help="named config (v0|bvh|fuzzy|interactive|scale|"
                        "reference); overrides the geometry flags")
    p.add_argument("--sharded-bands", type=int, default=None,
                   help="run the TILE-SHARDED engine over a (1, n) mesh "
                        "(parallel/shard.py make_sharded_scan_engine) "
                        "instead of the single-chip step; needs n devices "
                        "(virtual CPU mesh: JAX_PLATFORMS=cpu + "
                        "XLA_FLAGS=--xla_force_host_platform_device_count)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="wrap the timed launches in a jax.profiler trace "
                        "written to DIR (utils/profiling.trace); view with "
                        "tensorboard or xprof")
    p.add_argument("--validate", action="store_true",
                   help="instead of timing, run the deterministic "
                        "cross-backend agreement check (pallas/bvh/exact vs "
                        "brute) ON THE CURRENT BACKEND and print its JSON. "
                        "CPU tests prove the kernel exact under the "
                        "TPU-semantics interpreter; this is the HARDWARE "
                        "counterpart, where pl.reciprocal(approx) and MXU "
                        "input truncation make the comparison tolerance-"
                        "based (CLAUDE.md / PERF.md).")
    args = p.parse_args()

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmx_jax_cache")
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # This image's sitecustomize force-registers the TPU plugin and
        # overrides JAX_PLATFORMS; honoring the env needs the config
        # update after import (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")

    from mirror_maze_tpu.config import (
        EngineConfig,
        MazeConfig,
        ScreenConfig,
        TracerConfig,
    )
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_scan_step, repeat_input
    from mirror_maze_tpu.scene import build_scene

    if args.validate:
        # The check runs ONE fixed configuration; combining it with
        # geometry/preset/profile flags would silently ignore them and
        # mislead ("--validate --preset scale" does NOT validate scale).
        # Ask the parser for each flag's default rather than keeping a
        # parallel hardcoded copy: default drift would otherwise break
        # this guard silently, and a newly added flag is covered
        # automatically.
        ignored = [
            name for name, val in sorted(vars(args).items())
            if name != "validate" and val != p.get_default(name)
        ]
        if ignored:
            p.error(
                f"--validate runs a fixed configuration; remove {ignored}"
            )
        return _validate(jax)

    cfg, scene, dev_scene = build_bench_setup(args)
    # The whole --frames loop runs device-resident in ONE launch
    # (lax.scan), like the engine's scripted mode: per-launch dispatch
    # latency (tens of ms over a remote-dispatch tunnel) is amortized
    # and what's measured is real device throughput.
    if args.sharded_bands:
        from mirror_maze_tpu.parallel.shard import (
            make_mesh,
            make_sharded_scan_engine,
        )

        n_bands = args.sharded_bands
        mesh = make_mesh(1, n_bands)
        init_fn, scan_fn = make_sharded_scan_engine(cfg, mesh, args.frames)
        sharded_state = init_fn(seed=0)
        step_n = lambda st, inp: scan_fn(dev_scene, st, inp)  # noqa: E731
        state = sharded_state
        # Each band pops its own window: total refreshed chunks per frame
        # is the per-band window times the band count (shard.py
        # _band_screen_cfg).
        chunks_per_frame = n_bands * max(
            1, cfg.screen.effective_chunks_per_frame // n_bands
        )
    else:
        step_n = make_scan_step(dev_scene, cfg, args.frames)
        state = init_state(cfg, seed=0)
        chunks_per_frame = cfg.screen.effective_chunks_per_frame
    idle_n = repeat_input(FrameInputs.idle(), args.frames)

    # CAUTION: on the axon TPU tunnel, Array.block_until_ready() can return
    # before remote execution finishes, inflating throughput ~1000x. The
    # only trustworthy sync is a device->host fetch of a value derived from
    # the final frame: it provably forces the whole donated-state chain.
    def force(frame_arr) -> float:
        return float(frame_arr.sum())

    # Compile + warmup launch (forced).
    t0 = time.time()
    state, frame = step_n(state, idle_n)
    force(frame)
    compile_s = time.time() - t0

    # Timed steady state: --launches scans of --frames each, one forced
    # scalar fetch at the end draining the donated-state chain.
    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from mirror_maze_tpu.utils.profiling import trace

        profile_ctx = trace(args.profile)
    t0 = time.time()
    with profile_ctx:
        for _ in range(args.launches):
            state, frame = step_n(state, idle_n)
        checksum = force(frame)
    dt = time.time() - t0

    n_total = args.frames * args.launches
    fps = n_total / dt
    frame_ms = 1000.0 * dt / n_total
    rays_per_frame = (
        chunks_per_frame
        * cfg.screen.pixels_per_chunk
        * cfg.screen.samples_per_pixel
    )
    mrays = rays_per_frame * fps / 1e6

    # Reference implied operating point: 786,432 primary rays/frame at
    # 60 fps = 47.2 Mrays/s (BASELINE.md, derived from main.rs:646-650,760).
    baseline_mrays = 47.2

    result = {
        "metric": "primary Mrays/s, progressive mirror-maze path tracing "
                  f"({cfg.screen.width}x{cfg.screen.height}, "
                  f"{cfg.tracer.mirror_limit} mirror bounces, "
                  f"{cfg.screen.samples_per_pixel} spp/refresh)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 3),
        "frame_ms": round(frame_ms, 3),
        "fps": round(fps, 2),
        "rays_per_frame": rays_per_frame,
        "compile_s": round(compile_s, 1),
        "frame_checksum": round(checksum, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "intersector": cfg.intersector,
        "sharded_bands": args.sharded_bands,
        "planes": scene.num_planes,
        # what the pallas kernel actually sweeps (degenerate rows filtered)
        "kernel_planes": int(dev_scene.plane_table.shape[0]),
    }
    print(json.dumps(result))
    if compile_s > 120:
        import sys

        print(
            f"note: compile_s {compile_s:.0f}s is the per-process "
            "SERVER-side Mosaic kernel compile (PERF.md 'cold compile "
            "root cause'; measured variance 2-18 min, and shipping a "
            "serialized AOT executable does NOT bypass it — PERF.md "
            "'AOT executable serialization'). Batch work into one "
            "process; tools/warm_cache.py front-loads it.",
            file=sys.stderr,
        )


def _validate(jax) -> None:
    """Deterministic cross-backend agreement on the CURRENT backend.

    With jitter=0 and single-segment shading (bounce_limit=1, mirror
    chains allowed — reflection is deterministic), every backend computes
    the SAME light field, so the comparison needs no RNG-stream parity.
    On CPU the pallas kernel runs under the exact TPU-semantics
    interpreter: every pixel must match brute EXACTLY except the
    documented measure-zero nearest-t ties, where the kernel's one-hot
    select SUMS the tied planes' properties while the jnp tracer picks
    one (config.py "Known-accepted limitation") — so the CPU gate is
    "nonzero-diff pixels are vanishingly rare", enforced bitwise
    elsewhere. On hardware the kernel's approximations
    (pl.reciprocal(approx=True) ~2^-16 relative, MXU f32 inputs
    truncated below full precision — PERF.md) make it tolerance-based:
    near-exact everywhere, with the same measure-zero tie allowance.
    Exercises the multi-tile AABB-skip path (16x16 maze -> several
    128-plane tiles)."""
    import numpy as np

    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
        TracerConfig,
    )
    from mirror_maze_tpu.render import make_camera, render_full_frame, upload_scene
    from mirror_maze_tpu.scene import build_scene

    base = EngineConfig(
        maze=MazeConfig(width=16, height=16),
        tracer=TracerConfig(bounce_limit=1, mirror_limit=6, jitter=0.0,
                            block_rows=16),
        camera=CameraConfig(spawn=(-5.0, 0.0, -75.0)),
        screen=ScreenConfig(width=128, height=96, samples_per_pixel=1),
    )
    scene = build_scene(base.maze)
    dev = upload_scene(scene)
    cam = make_camera(base.camera, base.screen.width / base.screen.height)
    key = jax.random.PRNGKey(0)

    frames = {}
    for backend in ("brute", "pallas", "bvh", "exact"):
        cfg = base.replace(intersector=backend)
        frames[backend] = np.asarray(
            render_full_frame(dev, cam, key, cfg)
        )

    ref = frames["brute"]
    assert np.isfinite(ref).all() and ref.max() > 0.0, "brute frame is degenerate"
    result = {
        "metric": "cross-backend max |pallas - brute| (deterministic light)",
        "unit": "tone-mapped radiance (ref in [0, ~1])",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "pixels": int(ref.shape[0] * ref.shape[1]),
        "ok": True,
    }
    on_cpu = jax.default_backend() == "cpu"
    for backend in ("pallas", "bvh", "exact"):
        d = np.abs(frames[backend] - ref)
        stats = {
            "max": float(d.max()),
            "mean": float(d.mean()),
            "p999": float(np.quantile(d, 0.999)),
            "frac_gt_0.05": float((d > 0.05).mean()),
            "frac_nonzero": float((d > 0.0).mean()),
        }
        # Gates. On CPU all three backends are exact arithmetic: bvh
        # must match brute bitwise, pallas (exact interpreter) except
        # measure-zero tie pixels (one-hot SUM vs pick-one — docstring).
        # On HARDWARE the backends approximate differently: brute's
        # [R,3]x[3,P] hit tests ride the XLA-TPU matmul whose f32
        # inputs are truncated to bf16, while bvh's gathered per-ray
        # FMAs are exact f32 — near an edge/tie margin the two
        # legitimately pick different hits (measured: 8 of 12,288
        # pixels flip a faint-ceiling hit, each a full 0.14 jump), so
        # bvh gates on flip FRACTION, not max. pallas on hardware is
        # near-exact since the split-precision one-hot select
        # (pallas_tracer._pack_group): measured max 1.2e-7 — one f32
        # ulp — vs ~8e-5 before, so its gate is tight, with the same
        # measure-zero flip allowance.
        if backend in ("bvh", "exact"):
            # "exact" carries the same full-f32 exactness class as the
            # traversal (explicit FMA contractions, no MXU truncation):
            # bitwise-equal to brute on CPU, and on hardware the same
            # measure-zero edge-flip allowance vs brute's truncated
            # matmul hits.
            ok = (
                stats["max"] == 0.0
                if on_cpu
                else stats["frac_nonzero"] < 1e-3 and stats["mean"] < 1e-3
            )
        elif on_cpu:
            ok = stats["frac_nonzero"] < 1e-3 and stats["mean"] < 1e-3
        else:
            ok = (
                stats["mean"] < 1e-4
                and stats["p999"] < 1e-3
                and stats["frac_gt_0.05"] < 1e-3
            )
        result[backend] = stats
        result["ok"] = result["ok"] and ok
        if backend == "pallas":
            result["value"] = round(stats["max"], 9)
    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
