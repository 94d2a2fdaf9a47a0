"""N-player multiplayer demo (parallel/multiplayer.py).

Launches ``--players`` `jax.distributed` processes — the TPU-native
realization of the reference's planned-but-never-built multiplayer (its
`Cargo.toml` ships an unused `local-ip-address` dependency) — in the
LITERAL seed-0 reference world. Players 1..N-1 stroll down the spawn
corridor (each with its own gait and a slight heading of its own);
player 0 stands at the reference spawn and watches their colored sphere
avatars, saving its view as a GIF.

    python examples/multiplayer_demo.py [--players 3] [--out mp.gif]
                                        [--frames 96]

Each player steps its own single-chip engine; the only wire traffic is
one [P, 3] position all_gather per frame. For a hands-on session use
the CLI instead: one terminal per player, e.g.

    python -m mirror_maze_tpu play --players 2 --player-id 0 &
    python -m mirror_maze_tpu play --players 2 --player-id 1
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); port = sys.argv[2]
out = sys.argv[3]; n_frames = int(sys.argv[4]); n_players = int(sys.argv[5])

from mirror_maze_tpu.parallel import initialize_multihost

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=n_players,
    process_id=pid,
)

import numpy as np
from jax.sharding import Mesh

from mirror_maze_tpu.config import (
    CameraConfig, EngineConfig, MazeConfig, ScreenConfig, TracerConfig,
)
from mirror_maze_tpu.parallel.multiplayer import make_multiplayer_engine
from mirror_maze_tpu.runtime.state import FrameInputs

# Walkers start staggered down the corridor AND offset laterally so the
# nearer avatar does not occlude the farther one from the spectator.
spawn = ((-5.0, 0.0, -45.0) if pid == 0
         else (-5.0 + 1.8 * (pid - 1.5), 0.0, -45.0 + 5.0 * pid))
cfg = EngineConfig(
    maze=MazeConfig(rng="reference"),
    camera=CameraConfig(spawn=spawn, look_dir=(0.1, 0.0, 1.0)),
    tracer=TracerConfig(bounce_limit=4, mirror_limit=6),
    screen=ScreenConfig(width=192, height=144, samples_per_pixel=4,
                        chunks_per_frame=432),   # 1/4 screen per frame
    intersector="brute",
)
mesh = Mesh(np.array(jax.devices()), ("player",))
dev, init_fn, step_fn = make_multiplayer_engine(cfg, mesh, me=pid,
                                                radius=1.2)
st = init_fn(seed=0)
frames = []
for i in range(n_frames):
    # Players 1..N-1 stroll down the corridor, each with its own gait
    # (phase-shifted pauses) and a tiny heading of its own so avatars
    # separate laterally; player 0 spectates.
    inp = FrameInputs.make(
        w=(pid > 0 and (i + pid) % 3 != 2),
        mouse_dx=(12.0 * (pid - 1.5) if pid > 0 and i < 4 else 0.0),
    )
    st, frame = step_fn(st, inp)
    if pid == 0 and i % 4 == 3:
        frames.append(np.asarray(frame))
if pid == 0:
    from mirror_maze_tpu.utils.imageio import write_gif

    write_gif(out, np.stack(frames), fps=8)
    print(f"wrote {out} ({len(frames)} frames)", flush=True)
print(f"player {pid} done at z={float(np.asarray(st.cam_center)[2]):.2f}",
      flush=True)
"""


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="multiplayer.gif")
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--players", type=int, default=2)
    p.add_argument("--port", type=int, default=None)
    args = p.parse_args()
    port = args.port or 15200 + os.getpid() % 2000
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), str(port),
             args.out, str(args.frames), str(args.players)],
            env=env, cwd=repo,
        )
        for i in range(args.players)
    ]
    rc = 0
    for p_ in procs:
        rc |= p_.wait()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
