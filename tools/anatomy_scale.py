"""Config-5 (scale preset) frame anatomy on real hardware.

VERDICT r4 task 1: decompose the scale preset's frame time with the same
rigor as the 1080p MXU-pass and bvh floor analyses. One process (the
server-side Mosaic compile is per-process — CLAUDE.md), stages selected
by flags so the expensive kernel compile is paid once and every
measurement reuses it:

  --structure   group/tile layout of the scale scene (host-side, instant)
  --headline    scan-slope full-step frame time (K1 vs K2 in-scan frames)
  --diag        per-block segment/tile/live-lane diagnostics over N windows
  --poses       walk/turn to M in-maze poses; (frame_ms, diag) per pose —
                the zero-extra-compile regression data (same program,
                different tile-skip behavior per pose)
  --kernel      standalone kernel scan-slope at the current pose (the
                non-kernel residual = headline - kernel)

Every measurement prints one JSON line (stage-tagged) to stdout.
Timing follows PERF.md's rules: many frames per launch, ended by a
scalar device->host fetch; never trust block_until_ready.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(stage, **kv):
    print(json.dumps({"stage": stage, **kv}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--structure", action="store_true")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--diag", action="store_true")
    ap.add_argument("--poses", action="store_true")
    ap.add_argument("--kernel", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--width", type=int, default=0,
                    help="override screen width (default: the preset's 4K)")
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--maze", type=int, default=0,
                    help="override maze size (CPU smoke tests)")
    ap.add_argument("--spp", type=int, default=0)
    ap.add_argument("--block-rows", type=int, default=0,
                    help="override TracerConfig.block_rows (new kernel "
                         "compile per value — budget minutes)")
    ap.add_argument("--ablate", default="",
                    choices=("", "noskip", "nodot"),
                    help="kernel stage-stub variant (pallas_tracer "
                         "_ABLATE); each variant is a fresh Mosaic "
                         "compile — run one per process")
    ap.add_argument("--slab-pre", action="store_true", dest="slab_pre",
                    help="TracerConfig.slab_precompute=True (new kernel "
                         "compile)")
    ap.add_argument("--k1", type=int, default=6)
    ap.add_argument("--k2", type=int, default=30)
    ap.add_argument("--launches", type=int, default=3)
    ap.add_argument("--windows", type=int, default=12,
                    help="diag: refresh windows sampled")
    args = ap.parse_args()
    if args.all:
        args.structure = args.headline = args.diag = True
        args.poses = args.kernel = True

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmx_jax_cache")
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The image's sitecustomize force-registers the TPU plugin and
        # overrides the env var; honoring it needs the config update
        # after import (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from mirror_maze_tpu.config import NAMED_CONFIGS
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import (
        make_scan_step,
        make_step,
        repeat_input,
    )
    from mirror_maze_tpu.scene import build_scene

    cfg = NAMED_CONFIGS["scale"]()
    if args.maze:
        cfg = cfg.replace(maze=dataclasses.replace(
            cfg.maze, width=args.maze, height=args.maze
        ))
    if args.spp:
        cfg = cfg.replace(screen=dataclasses.replace(
            cfg.screen, samples_per_pixel=args.spp
        ))
    if args.width:
        cfg = cfg.replace(
            screen=dataclasses.replace(cfg.screen, width=args.width)
        )
    if args.height:
        cfg = cfg.replace(
            screen=dataclasses.replace(cfg.screen, height=args.height)
        )
    if args.block_rows:
        cfg = cfg.replace(tracer=dataclasses.replace(
            cfg.tracer, block_rows=args.block_rows
        ))
    if args.slab_pre:
        cfg = cfg.replace(tracer=dataclasses.replace(
            cfg.tracer, slab_precompute=True
        ))
    dev_name = str(jax.devices()[0])
    log(f"device: {dev_name}; screen {cfg.screen.width}x{cfg.screen.height}"
        f"; block_rows {cfg.tracer.block_rows}")

    if args.ablate:
        from mirror_maze_tpu.render import pallas_tracer

        pallas_tracer._ABLATE = args.ablate
        log(f"kernel ablation: {args.ablate}")

    scene = build_scene(cfg.maze)
    dev = upload_scene(scene)

    if args.structure:
        groups = []
        total_rows = 0
        for mode, grp in enumerate(dev.mxu_tables):
            if grp is None:
                continue
            w, props_t, aabbs = grp
            n_tiles, rows, pt = props_t.shape
            groups.append({
                "mode": mode, "tiles": int(n_tiles), "pt": int(pt),
                "w_rows": int(w.shape[1]),
            })
            total_rows += n_tiles * pt
        emit("structure", planes=int(scene.num_planes),
             kernel_plane_slots=total_rows, groups=groups,
             rays_per_frame=int(
                 cfg.screen.effective_chunks_per_frame
                 * cfg.screen.pixels_per_chunk
                 * cfg.screen.samples_per_pixel),
             max_segments=cfg.tracer.max_segments,
             block_rows=cfg.tracer.block_rows)

    # Prove the tunnel channel early with a cheap forced fetch
    # (CLAUDE.md: a wedged channel shows as zero-CPU silence).
    t0 = time.time()
    _ = float(jnp.sum(jnp.arange(8.0)))
    log(f"channel ok ({time.time() - t0:.1f}s)")

    state = init_state(cfg, seed=0)

    # Scan-slope machinery over the full engine step.
    scan1 = make_scan_step(dev, cfg, args.k1)
    scan2 = make_scan_step(dev, cfg, args.k2)

    def force(st):
        return float(jnp.sum(st.cam_center) + jnp.float32(st.frame))

    def slope_ms(st):
        """Per-frame ms by in-scan frame-count slope; returns
        (ms_per_frame, advanced state)."""
        idle1 = repeat_input(FrameInputs.idle(), args.k1)
        idle2 = repeat_input(FrameInputs.idle(), args.k2)
        st, _ = scan1(st, idle1)     # warm (also forces kernel compile)
        force(st)
        t1 = []
        for _ in range(args.launches):
            t0 = time.time()
            st, _ = scan1(st, idle1)
            force(st)
            t1.append(time.time() - t0)
        t2 = []
        for _ in range(args.launches):
            t0 = time.time()
            st, _ = scan2(st, idle2)
            force(st)
            t2.append(time.time() - t0)
        ms = 1000.0 * (min(t2) - min(t1)) / (args.k2 - args.k1)
        return ms, st

    # Jitted diagnostic trace of the CURRENT refresh window: the same
    # ray population the step traces, with the kernel's diag rows out.
    from mirror_maze_tpu.ops.sampling import ray_jitter
    from mirror_maze_tpu.render.camera import ray_directions
    from mirror_maze_tpu.render.pallas_tracer import trace_paths_pallas
    from mirror_maze_tpu.render.scheduler import (
        chunk_origin_xy,
        chunk_pixels,
        sort_window_morton,
        take_chunks,
    )

    n_chunks = cfg.screen.effective_chunks_per_frame
    spp = cfg.screen.samples_per_pixel

    def diag_fn(scene_, st):
        ids, _ = take_chunks(st.perm, st.cursor, n_chunks)
        if cfg.screen.sort_chunk_window:
            ids = sort_window_morton(ids, cfg.screen)
        pixels = chunk_pixels(
            chunk_origin_xy(ids, cfg.screen), cfg.screen.chunk_width
        )
        cam = st.camera(cfg)
        k = pixels.shape[0]
        jkey, tkey = jax.random.split(jax.random.fold_in(st.key, st.frame))
        base_dir = ray_directions(
            cam, pixels, float(cfg.screen.width), float(cfg.screen.height)
        )
        jit = ray_jitter(jkey, (k, spp), cfg.tracer.jitter)
        dirs = (base_dir[:, None, :] + jit).reshape(k * spp, 3)
        ori = jnp.broadcast_to(cam.center, (k * spp, 3))
        seed = jax.random.randint(tkey, (), 0, jnp.iinfo(jnp.int32).max)
        _, diag = trace_paths_pallas(
            scene_.plane_table, ori, dirs, seed, cfg.tracer,
            rows_per_block=cfg.tracer.block_rows,
            tables=scene_.mxu_tables, anchor=cam.center,
            return_block_segments=True,
        )
        return diag

    diag_jit = jax.jit(diag_fn)

    def run_diag(st, windows):
        """Aggregate per-block diagnostics over `windows` refresh
        windows (cursor advanced between calls, camera fixed)."""
        rows = []
        for i in range(windows):
            st_i = st._replace(
                cursor=(st.cursor + i * n_chunks)
                % jnp.int32(cfg.screen.total_chunks),
                frame=st.frame + i,
            )
            rows.append(np.asarray(diag_jit(dev, st_i)))
        d = np.concatenate(rows, axis=1)
        segs, tiles = d[0], d[1]
        tiles0, tiles3, live = d[2], d[3], d[4]
        lanes = cfg.tracer.block_rows * 128
        segsum = max(float(segs.sum()), 1.0)
        return {
            "blocks": int(d.shape[1]),
            "segs_mean": float(segs.mean()),
            "segs_hist": np.bincount(
                segs.astype(int),
                minlength=cfg.tracer.max_segments + 1).tolist(),
            "tiles_per_block_seg": float(tiles.sum() / segsum),
            "tiles_seg0": float(tiles0.mean()),
            "tiles_per_seg_12": float(
                (tiles3 - tiles0).sum()
                / max(np.minimum(segs - 1, 2).clip(0).sum(), 1)),
            "tiles_per_seg_3plus": float(
                (tiles - tiles3).sum() / max((segs - 3).clip(0).sum(), 1)),
            "live_lane_frac": float(live.sum() / (segsum * lanes)),
        }

    if args.headline:
        ms, state = slope_ms(state)
        rays = (cfg.screen.effective_chunks_per_frame
                * cfg.screen.pixels_per_chunk * spp)
        emit("headline", frame_ms=round(ms, 2),
             mrays_s=round(rays / ms / 1e3, 2), rays_per_frame=rays,
             pose="spawn", cam=[round(float(c), 2)
                                for c in np.asarray(state.cam_center)])

    if args.diag:
        emit("diag", pose="spawn", **run_diag(state, args.windows))

    if args.poses:
        # Walk/turn a trajectory through the 64x64 maze; at each pose,
        # slope-time the SAME compiled program and re-run diagnostics.
        # Tile-skip behavior (tiles tested) varies with pose; the
        # regression frame_ms ~ a*block_segs + b*block_tiles + c across
        # poses separates per-segment fixed cost from per-tile cost
        # with ZERO extra kernel compiles.
        walk = repeat_input(FrameInputs.make(w=True), args.k2)
        turn = repeat_input(
            FrameInputs.make(w=True, mouse_dx=-6.0), args.k2
        )
        for pose_i in range(4):
            state, _ = scan2(state, walk)
            state, _ = scan2(state, turn)
            state, _ = scan2(state, walk)
            ms, state = slope_ms(state)
            d = run_diag(state, args.windows)
            emit("pose", pose=pose_i,
                 cam=[round(float(c), 2)
                      for c in np.asarray(state.cam_center)],
                 frame_ms=round(ms, 2), **d)

    if args.kernel:
        # Standalone kernel scan-slope at the current pose: trace the
        # current window's rays K times inside one launch; slope out
        # the per-call cost. Same kernel program as the step (shapes,
        # statics identical) -> no extra server compile.
        def trace_k(scene_, st, k):
            ids, _ = take_chunks(st.perm, st.cursor, n_chunks)
            if cfg.screen.sort_chunk_window:
                ids = sort_window_morton(ids, cfg.screen)
            pixels = chunk_pixels(
                chunk_origin_xy(ids, cfg.screen), cfg.screen.chunk_width
            )
            cam = st.camera(cfg)
            kk = pixels.shape[0]
            jkey, tkey = jax.random.split(
                jax.random.fold_in(st.key, st.frame))
            base_dir = ray_directions(
                cam, pixels, float(cfg.screen.width),
                float(cfg.screen.height))
            jit = ray_jitter(jkey, (kk, spp), cfg.tracer.jitter)
            dirs = (base_dir[:, None, :] + jit).reshape(kk * spp, 3)
            ori = jnp.broadcast_to(cam.center, (kk * spp, 3))
            seed = jax.random.randint(
                tkey, (), 0, jnp.iinfo(jnp.int32).max)

            def body(acc, i):
                light = trace_paths_pallas(
                    scene_.plane_table, ori, dirs, seed + i, cfg.tracer,
                    rows_per_block=cfg.tracer.block_rows,
                    tables=scene_.mxu_tables, anchor=cam.center,
                )
                return acc + jnp.sum(light), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(k))
            return acc

        t_at = {}
        for k in (1, 5):
            f = jax.jit(lambda s, st, k=k: trace_k(s, st, k))
            float(f(dev, state))  # warm
            ts = []
            for _ in range(args.launches):
                t0 = time.time()
                float(f(dev, state))
                ts.append(time.time() - t0)
            t_at[k] = min(ts)
        kms = 1000.0 * (t_at[5] - t_at[1]) / 4
        emit("kernel", kernel_ms=round(kms, 2),
             t1_s=round(t_at[1], 3), t5_s=round(t_at[5], 3))

    log("anatomy done")


if __name__ == "__main__":
    main()
