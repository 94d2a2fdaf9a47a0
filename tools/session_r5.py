"""Round-5 measurement session (one TPU process, PERF.md timing rules).

  --mp1080     single-launch multiplayer step vs the round-4 two-launch
               form at the 1080p bench point (1 avatar, in-jit repack,
               per-frame stepping, forced fetch per frame)
  --stream     raw device->host fetch ceiling at stream sizes + a live
               EngineServer delivered-fps measurement against it
  --scale-int  interactive-at-scale: per-frame and batch-8 stepping fps
               at config 5 (4K) and its 720p-screen variant

One JSON line per measurement.
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
    ap.add_argument("--mp1080", action="store_true")
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--scale-int", action="store_true", dest="scale_int")
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmx_jax_cache")
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from mirror_maze_tpu.config import NAMED_CONFIGS
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.scene import build_scene

    log(f"device: {jax.devices()[0]}")
    t0 = time.time()
    _ = float(jnp.sum(jnp.arange(8.0)))
    log(f"channel ok ({time.time() - t0:.1f}s)")

    if args.mp1080:
        from jax.sharding import Mesh

        from mirror_maze_tpu.parallel.multiplayer import (
            avatar_scene,
            make_position_exchange,
            update_avatars,
        )
        from mirror_maze_tpu.render.scenebuf import make_sphere_refresh
        from mirror_maze_tpu.runtime.step import (
            derive_traversal_bounds,
            make_step_fn,
        )

        cfg = NAMED_CONFIGS["interactive"]()
        host, slots = avatar_scene(build_scene(cfg.maze), n_players=2,
                                   me=0)
        dev = upload_scene(host)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("player",))
        md, ml = derive_traversal_bounds(dev, cfg, None, None)
        base_step = make_step_fn(cfg, md, ml)
        refresh = make_sphere_refresh(dev)
        sel = np.asarray([0], np.int32)  # 1-chip stand-in for `others`

        # Round-4 form: separate exchange launch + fused local step.
        exchange = make_position_exchange(mesh)

        def fused_local(scene_, positions, state, inputs):
            scene_ = update_avatars(scene_, slots, positions[sel])
            scene_ = refresh(scene_)
            return base_step(scene_, state, inputs)

        step_two = jax.jit(fused_local, donate_argnums=(2,))

        # Round-5 form: ONE launch — all_gather inside the jitted step.
        try:
            shard_map = jax.shard_map
        except AttributeError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        def body(scene_, state, inputs):
            positions = jax.lax.all_gather(state.cam_center, "player")
            scene_ = update_avatars(scene_, slots, positions[sel])
            scene_ = refresh(scene_)
            return base_step(scene_, state, inputs)

        step_one = jax.jit(
            shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                      out_specs=(P(), P()), check_vma=False),
            donate_argnums=(1,),
        )
        repl = NamedSharding(mesh, P())
        my_dev = jax.local_devices()[0]

        def to_g(tree):
            return jax.tree.map(
                lambda x: jax.make_array_from_single_device_arrays(
                    jnp.shape(x), repl,
                    [jax.device_put(jnp.asarray(x), my_dev)]), tree)

        def to_l(tree):
            return jax.tree.map(
                lambda x: x.addressable_shards[0].data, tree)

        inp = FrameInputs.make(w=True)

        def force(st):
            return float(jnp.sum(st.cam_center))

        def time_two():
            st = init_state(cfg, seed=0)
            pos = exchange(st.cam_center)
            st, _ = step_two(dev, pos, st, inp)   # warm (kernel compile)
            force(st)
            t0 = time.time()
            for _ in range(args.frames):
                pos = exchange(st.cam_center)
                st, _ = step_two(dev, pos, st, inp)
                force(st)
            return 1000.0 * (time.time() - t0) / args.frames

        def time_one():
            st = init_state(cfg, seed=0)
            gst = to_g(st)
            gst, _ = step_one(to_g(dev), gst, to_g(inp))
            force(to_l(gst))
            gdev, ginp = to_g(dev), to_g(inp)
            t0 = time.time()
            for _ in range(args.frames):
                gst, _ = step_one(gdev, gst, ginp)
                force(to_l(gst))
            return 1000.0 * (time.time() - t0) / args.frames

        two = time_two()
        one = time_one()
        two2 = time_two()   # re-measure to bound drift
        one2 = time_one()
        emit("mp1080", two_launch_ms=round(min(two, two2), 2),
             one_launch_ms=round(min(one, one2), 2),
             runs={"two": [round(two, 2), round(two2, 2)],
                   "one": [round(one, 2), round(one2, 2)]},
             frames=args.frames)

    if args.stream:
        from mirror_maze_tpu.runtime.server import EngineServer

        cfg = NAMED_CONFIGS["interactive"]()
        dev = upload_scene(build_scene(cfg.maze))

        # Raw fetch ceiling: time device->host of the u8 frame at
        # stream scales 1 and 2 (fresh value each fetch to defeat any
        # caching: add the loop index on device).
        st = init_state(cfg, seed=0)
        frame_dev = jnp.zeros(
            (cfg.screen.height, cfg.screen.width, 3), jnp.uint8)

        @jax.jit
        def mk(i):
            return (frame_dev + i.astype(jnp.uint8),
                    frame_dev[::2, ::2] + i.astype(jnp.uint8))

        for scale_idx, scale in enumerate((1, 2)):
            ts = []
            for i in range(6):
                f1, f2 = mk(jnp.int32(i))
                pick = f1 if scale == 1 else f2
                t0 = time.time()
                arr = np.asarray(pick)
                ts.append(time.time() - t0)
            ts = sorted(ts)[1:-1]
            per = sum(ts) / len(ts)
            emit("fetch_ceiling", stream_scale=scale,
                 bytes=int(arr.nbytes), fetch_ms=round(1000 * per, 1),
                 mb_s=round(arr.nbytes / per / 1e6, 1),
                 implied_fps=round(1.0 / per, 2))

        # Live serve measurement: delivered fps over /stream for 20 s
        # at the recommended point (stream_every=2, scale 2), with the
        # round-5 fetch/encode split pipeline.
        import socket

        srv = EngineServer(dev, cfg, seed=0, port=0, batch_frames=8,
                           stream_every=2, stream_scale=2)
        srv.start()
        try:
            # Wait for the engine to compile + produce frames.
            t0 = time.time()
            while srv._frames_stepped < 8 and time.time() - t0 < 1800:
                time.sleep(2)
            sk = socket.create_connection(("127.0.0.1", srv.port), 10)
            sk.settimeout(30.0)
            sk.sendall(b"GET /stream HTTP/1.1\r\nHost: localhost\r\n\r\n")
            parts = 0
            t0 = time.time()
            buf = b""
            while time.time() - t0 < 20:
                try:
                    chunk = sk.recv(1 << 20)
                except TimeoutError:
                    break
                if not chunk:
                    break
                buf += chunk
                if len(buf) > 1 << 22:
                    parts += buf.count(b"--mmxframe")
                    buf = buf[-64:]
            parts += buf.count(b"--mmxframe")
            dt = time.time() - t0
            sk.close()
            s = srv.stats()
            emit("serve_stream", delivered_fps=round(parts / dt, 2),
                 seconds=round(dt, 1), parts=parts,
                 engine_fps=round(s["fps"], 1),
                 fetch_ms=s["fetch_ms"], encode_ms=s["encode_ms"])
        finally:
            srv.stop()

    if args.scale_int:
        from mirror_maze_tpu.runtime.step import make_scan_step, make_step
        from mirror_maze_tpu.runtime.step import repeat_input

        for label, w, h in (("4k", 0, 0), ("720p", 1280, 720)):
            cfg = NAMED_CONFIGS["scale"]()
            if w:
                cfg = cfg.replace(screen=dataclasses.replace(
                    cfg.screen, width=w, height=h))
            dev = upload_scene(build_scene(cfg.maze))
            st = init_state(cfg, seed=0)
            step1 = make_step(dev, cfg)
            inp = FrameInputs.make(w=True)
            st, f = step1(st, inp)          # warm: pays the kernel compile
            _ = float(jnp.sum(st.cam_center))
            # Honest play protocol: per-frame launches each synced by a
            # scalar fetch (the round trip play pays for input), display
            # thumbnail (~100 cols, play's default) every 6th frame.
            n = 12
            t0 = time.time()
            for i in range(n):
                st, f = step1(st, inp)
                if i % 6 == 0:
                    _ = np.asarray(f[::32, ::32])
                else:
                    _ = float(jnp.sum(st.cam_center))
            per_frame = (time.time() - t0) / n
            k = 8
            scank = make_scan_step(dev, cfg, k)
            inpk = repeat_input(inp, k)
            st, f = scank(st, inpk)
            _ = float(jnp.sum(st.cam_center))
            t0 = time.time()
            m = 4
            for _ in range(m):
                st, f = scank(st, inpk)
                _ = np.asarray(f[::32, ::32])   # display after each batch
            per_batch = (time.time() - t0) / m
            emit("scale_interactive", screen=label,
                 per_frame_fps=round(1.0 / per_frame, 2),
                 batch8_fps=round(k / per_batch, 2),
                 per_frame_ms=round(1000 * per_frame, 1),
                 batch8_launch_ms=round(1000 * per_batch, 1),
                 cam=[round(float(c), 1) for c in np.asarray(st.cam_center)])

    log("session done")


if __name__ == "__main__":
    main()
