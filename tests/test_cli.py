"""CLI surface tests (__main__.py): config override semantics and the
offline entry points, on tiny CPU configs."""

import numpy as np
import pytest


def _args(**kw):
    import argparse

    defaults = dict(
        config="interactive", width=0, height=0, spp=0, seed=None,
        intersector=None, frames=None, batch_frames=1, cameras=4,
        save_state=None, load_state=None, out=None,
    )
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_overrides_preserve_named_config_fields():
    """--width/--spp/--seed must REPLACE single fields: config_interactive
    sets sort_chunk_window=True and block_rows=96, which a from-scratch
    ScreenConfig/MazeConfig rebuild silently reset (past bug)."""
    from mirror_maze_tpu.__main__ import _build

    cfg, scene, dev = _build(
        _args(width=64, height=48, spp=2, seed=3)
    )
    assert cfg.screen.width == 64 and cfg.screen.height == 48
    assert cfg.screen.samples_per_pixel == 2
    assert cfg.screen.sort_chunk_window is True      # preserved
    assert cfg.tracer.block_rows == 96               # preserved
    assert cfg.maze.seed == 3
    assert cfg.maze.width == 10                      # preserved


def test_render_cli_writes_png(tmp_path):
    from mirror_maze_tpu.__main__ import main
    from mirror_maze_tpu.utils.imageio import read_png

    out = str(tmp_path / "f.png")
    rc = main(["render", "--config", "v0", "--width", "64", "--height",
               "48", "--spp", "1", "--out", out])
    assert rc == 0
    img = np.asarray(read_png(out))
    assert img.shape[:2] == (48, 64)


def test_multicam_cli_grid(tmp_path):
    from mirror_maze_tpu.__main__ import main
    from mirror_maze_tpu.utils.imageio import read_png

    out = str(tmp_path / "mc.png")
    rc = main(["multicam", "--config", "v0", "--cameras", "3", "--width",
               "64", "--height", "48", "--spp", "1", "--out", out])
    assert rc == 0
    img = np.asarray(read_png(out))
    # 3 cameras -> 2x2 grid of 48x64 views (one slot black).
    assert img.shape[:2] == (96, 128)


def test_kitty_frame_roundtrip():
    """The kitty graphics escape must carry the exact RGB payload,
    chunked at 4096 base64 chars with correct continuation flags."""
    import base64
    import re

    from mirror_maze_tpu.utils.imageio import kitty_frame

    img = np.random.default_rng(0).integers(
        0, 256, (40, 50, 3), dtype=np.uint8
    )
    s = kitty_frame(img)
    chunks = re.findall(r"\x1b_G([^;]*);([^\x1b]*)\x1b\\\\?", s)
    assert chunks[0][0].startswith("a=T,f=24,s=50,v=40,")
    assert all(c[0] == "m=1" for c in chunks[1:-1])
    assert chunks[-1][0] in ("m=0", "a=T,f=24,s=50,v=40,m=0")
    payload = "".join(c[1] for c in chunks)
    raw = base64.standard_b64decode(payload)
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.uint8).reshape(40, 50, 3), img
    )


def test_frame_stats_math():
    import time

    from mirror_maze_tpu.utils.profiling import FrameStats

    st = FrameStats(rays_per_frame=1000)
    st.tick()
    time.sleep(0.01)
    st.tick()
    assert st.frames == 2
    assert 1.0 < st.fps < 1000.0
    assert st.mrays_per_s == pytest.approx(st.fps * 1000 / 1e6)


@pytest.mark.slow
def test_bench_validate_cross_backend_agreement():
    """bench.py --validate is the hardware cross-backend agreement
    check (pallas + bvh vs brute on deterministic light). On CPU the
    kernel runs under the exact TPU-semantics interpreter, so the same
    invocation must pass here — and its tolerance structure (bounded
    tie-flip fraction, approximation-scale mean) is what the real-TPU
    run relies on."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "bench.py", "--validate"], env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] is True
    assert result["bvh"]["max"] == 0.0           # same arithmetic -> exact
    # CPU interpreter: exact except the documented measure-zero
    # nearest-t tie pixels (one-hot SUM vs pick-one), so nonzero diffs
    # must be vanishingly rare — a spread of small diffs is a real bug.
    assert result["pallas"]["frac_nonzero"] < 1e-3
    assert result["pallas"]["mean"] < 1e-3


@pytest.mark.slow
def test_bench_flag_config_spawns_inside_small_maze():
    """Regression: flag-built bench configs kept the 10x10 default
    spawn z=-45, which is OUTSIDE a small maze's world — the benchmark
    silently timed black frames whose rays mostly die after one segment
    (PERF.md measurement erratum). The inset spawn must render a
    nonzero frame; mazes >= 10x10 keep the recorded default camera."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "bench.py", "--maze", "4", "--width", "64",
         "--height", "48", "--spp", "1", "--frames", "4", "--launches",
         "1", "--intersector", "brute"],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["frame_checksum"] > 0.0


@pytest.mark.slow
def test_play_headless_stdin_degrades_gracefully(tmp_path):
    """Regression: `play` with a piped/closed stdin (CI, scripts) died
    on tcgetattr(Inappropriate ioctl for device). It must run idle
    frames headlessly and still write the final view."""
    import os
    import subprocess
    import sys

    out = os.path.join(tmp_path, "p.png")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "mirror_maze_tpu", "play", "--config", "v0",
         "--frames", "3", "--display", "none", "--out", out],
        env=env, cwd="/root/repo", stdin=subprocess.DEVNULL,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert os.path.exists(out)


def test_render_cli_custom_scene_with_camera_overrides(tmp_path):
    """--scene renders a saved quad soup instead of the generated maze;
    --spawn/--look point the camera at it (a custom world almost never
    matches the maze's default spawn)."""
    from mirror_maze_tpu.__main__ import main
    from mirror_maze_tpu.scene import save_scene
    from mirror_maze_tpu.scene.builder import Scene
    from mirror_maze_tpu.utils.imageio import read_png

    # One warm light panel 5 units down +z, nothing else: any lit pixel
    # proves the loaded soup (not a maze) is what rendered.
    scene = Scene(
        origin=np.float32([[-4.0, -3.0, 5.0]]),
        v=np.float32([[8.0, 0.0, 0.0]]),
        u=np.float32([[0.0, 6.0, 0.0]]),
        color=np.float32([[0.0, 0.0, 0.0]]),
        is_mirror=np.array([False]),
        emission=np.float32([[1.0, 0.8, 0.3, 2.0]]),
        grid=np.zeros((1, 1), np.uint8),
    )
    path = str(tmp_path / "panel.npz")
    save_scene(path, scene)
    out = str(tmp_path / "panel.png")
    rc = main(["render", "--config", "v0", "--scene", path,
               "--spawn", "0,0,0", "--look", "0,0,1",
               "--width", "48", "--height", "32", "--spp", "2",
               "--out", out])
    assert rc == 0
    img = np.asarray(read_png(out))
    assert img.shape == (32, 48, 3)
    # The panel spans most of the view frustum at z=5; its warm light
    # must dominate the frame against the black miss background.
    assert img[:, :, 0].mean() > 40
