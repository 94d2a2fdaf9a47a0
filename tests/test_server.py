"""HTTP serving (runtime/server.py): endpoints, input, streaming.

The server wraps the same jitted step as the terminal loop; these tests
drive it end-to-end over real sockets on a tiny CPU config — page,
stats, single-frame fetch, the multipart stream, and the input bus
actually moving/turning the camera."""

import json
import socket
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from mirror_maze_tpu.runtime.server import EngineServer, FrameHub, InputBus


def _get(port, path, timeout=10.0):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout
    ) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _post(port, path, obj, timeout=10.0):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status


def _wait_stats(port, pred, timeout=30.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        _, _, body = _get(port, "/stats")
        s = json.loads(body)
        if pred(s):
            return s
        time.sleep(0.05)
    raise AssertionError(f"stats predicate not met within {timeout}s: {s}")


@pytest.fixture(scope="module")
def server(tiny_cfg, tiny_scene, tiny_device_scene):
    # 30 fps pacing keeps the CPU engine thread honest but fast enough
    # for the movement assertions below.
    cfg = tiny_cfg.replace(screen=tiny_cfg.screen.__class__(
        width=32, height=32, samples_per_pixel=2, chunks_per_frame=8,
        fps=30,
    ))
    srv = EngineServer(
        tiny_device_scene, cfg, seed=0, port=0, stream_every=1,
        host_scene=tiny_scene, map_size=96,
    )
    srv.start()
    yield srv
    srv.stop()


def test_page_and_stats(server):
    status, ctype, body = _get(server.port, "/")
    assert status == 200 and "text/html" in ctype
    assert b"/stream" in body and b"/input" in body
    s = _wait_stats(server.port, lambda s: s["frame"] > 0)
    assert s["width"] == 32 and s["height"] == 32
    assert len(s["cam"]) == 3 and all(np.isfinite(s["cam"]))


def test_single_frame_endpoint(server):
    status, ctype, body = _get(server.port, "/frame")
    assert status == 200
    if ctype == "image/png":
        assert body.startswith(b"\x89PNG\r\n\x1a\n")
    else:
        assert ctype == "image/jpeg" and body[:2] == b"\xff\xd8"
    # Decodable and the right shape either way.
    if ctype == "image/png":
        img = read_png_bytes(body)
    else:
        import io

        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(body)))
    assert img.shape[0] == 32 and img.shape[1] == 32


def read_png_bytes(buf):
    import io

    try:
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(buf)))
    except ImportError:
        import tempfile

        from mirror_maze_tpu.utils.imageio import read_png

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            f.write(buf)
            f.flush()
            return read_png(f.name)


def test_input_moves_and_turns_camera(server):
    s0 = _wait_stats(server.port, lambda s: s["frame"] > 0)
    # Hold W (forward) — the engine must advance the camera along +z
    # from the spawn corridor (reference hold model, main.rs:786-815).
    assert _post(server.port, "/input", {"w": True}) == 200
    s1 = _wait_stats(
        server.port,
        lambda s: abs(s["cam"][2] - s0["cam"][2]) > 0.5,
    )
    assert _post(server.port, "/input", {"w": False}) == 200
    # Released: position settles (drain in-flight frames first).
    s2 = _wait_stats(
        server.port, lambda s: s["frame"] > s1["frame"] + 10
    )
    s3 = _wait_stats(
        server.port, lambda s: s["frame"] > s2["frame"] + 10
    )
    assert abs(s3["cam"][2] - s2["cam"][2]) < 0.2
    # Mouse delta turns: half_theta integrates -dx/512 (main.rs:922-925).
    ht0 = s3["half_theta"]
    assert _post(server.port, "/input", {"dx": 256.0}) == 200
    s4 = _wait_stats(
        server.port,
        lambda s: abs(s["half_theta"] - ht0) > 0.1,
    )
    assert np.isfinite(s4["half_theta"])


def test_stream_delivers_multipart_frames(server):
    # Raw socket: urllib would block for the infinite body.
    with socket.create_connection(("127.0.0.1", server.port), 10) as sk:
        sk.settimeout(20.0)
        sk.sendall(
            b"GET /stream HTTP/1.1\r\nHost: t\r\n\r\n"
        )
        buf = b""
        # Expect headers + at least two frame parts.
        while buf.count(b"--mmxframe") < 3:
            chunk = sk.recv(65536)
            assert chunk, "stream closed early"
            buf += chunk
    head, _, rest = buf.partition(b"\r\n\r\n")
    assert b"200" in head.split(b"\r\n")[0]
    assert b"multipart/x-mixed-replace" in head
    part = rest.split(b"--mmxframe")[1]
    assert b"Content-Type: image/" in part
    payload = part.partition(b"\r\n\r\n")[2]
    assert payload.startswith(b"\x89PNG") or payload[:2] == b"\xff\xd8"


def test_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server.port, "/nope")
    assert e.value.code == 404
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/input",
        data=b"not json", method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_frame_endpoint_is_fresh(server):
    """/frame with NO stream client attached must serve a current frame,
    not the first-ever banked one (advisor r3 medium): each request asks
    the engine for a fresh encode via FrameHub.request_encode."""
    _wait_stats(server.port, lambda s: s["frame"] > 0)
    _, _, body1 = _get(server.port, "/frame")
    # Turn the camera hard: the pixel queue resets and the view changes,
    # so a FRESH frame cannot be byte-identical to the old one.
    assert _post(server.port, "/input", {"dx": 512.0}) == 200
    s = _wait_stats(server.port, lambda s: s["frame"] > 0)
    _wait_stats(server.port, lambda t: t["frame"] > s["frame"] + 8)
    _, _, body2 = _get(server.port, "/frame")
    assert body2 != body1


def test_input_rejects_cross_origin(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/input",
        data=json.dumps({"w": True}).encode(),
        headers={"Origin": "http://evil.example:8000"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 403
    # Same-origin posts (Origin matching Host) pass.
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/input",
        data=json.dumps({"w": False}).encode(),
        headers={"Origin": f"http://127.0.0.1:{server.port}"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
    # Origin: null (sandboxed iframe / data: page) is rejected, not
    # skipped.
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/input",
        data=json.dumps({"w": True}).encode(),
        headers={"Origin": "null"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 403
    # DNS rebinding: Origin and Host AGREE but name a non-loopback host
    # while the server is bound to loopback — rejected by the Host
    # check even though the Origin check passes.
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/input",
        data=json.dumps({"w": True}).encode(),
        headers={"Origin": "http://evil.example:80",
                 "Host": "evil.example:80"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 403


def _open_stream(port):
    sk = socket.create_connection(("127.0.0.1", port), 10)
    sk.settimeout(20.0)
    sk.sendall(b"GET /stream HTTP/1.1\r\nHost: t\r\n\r\n")
    return sk


def _read_parts(sk, want, buf=b""):
    while buf.count(b"--mmxframe") < want:
        chunk = sk.recv(65536)
        assert chunk, "stream closed early"
        buf += chunk
    return buf


def test_stream_multiple_clients(server):
    """Two concurrent stream clients both receive frames; one going slow
    (not reading) or closing must not stall the other — handlers run in
    their own threads and the hub only ever hands out the newest frame."""
    a = _open_stream(server.port)
    b = _open_stream(server.port)
    try:
        buf_a = _read_parts(a, 2)
        buf_b = _read_parts(b, 2)
        assert b"multipart/x-mixed-replace" in buf_a
        assert b"multipart/x-mixed-replace" in buf_b
        # b goes silent (stops reading) then drops; a keeps streaming.
        b.close()
        _read_parts(a, 5, buf_a)
    finally:
        a.close()
    # The hub's client count settles back (detach under the lock) —
    # closed sockets surface to their handler on the next write.
    t0 = time.monotonic()
    while server.hub.clients > 0 and time.monotonic() - t0 < 10:
        time.sleep(0.05)
    assert server.hub.clients == 0


def test_frame_hub_clients_and_requests():
    hub = FrameHub()
    assert hub.clients == 0
    hub.attach()
    hub.attach()
    assert hub.clients == 2
    hub.detach()
    assert hub.clients == 1
    hub.detach()
    assert hub.clients == 0
    # One-shot encode request: set, taken once, then clear.
    assert not hub.take_encode_request()
    hub.request_encode()
    assert hub.take_encode_request()
    assert not hub.take_encode_request()


def test_live_map_endpoint(server):
    """/map serves a top-down minimap PNG with the live camera marker;
    without a host scene it 404s (the DeviceScene lacks raw geometry)."""
    status, ctype, body = _get(server.port, "/map")
    assert status == 200 and ctype == "image/png"
    img = read_png_bytes(body)
    assert img.shape == (96, 96, 3)
    # The camera marker is drawn (CAMERA red dominates its pixel).
    assert (img[..., 0].astype(int) - img[..., 2].astype(int) > 100).any()
    # The page embeds the overlay.
    _, _, page = _get(server.port, "/")
    assert b'id="map"' in page and b"/map?t=" in page
    # No host scene -> 404 (cheaper than building a second server:
    # clear the scene on the live one and restore).
    saved = server.host_scene
    server.host_scene = None
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server.port, "/map")
        assert e.value.code == 404
    finally:
        server.host_scene = saved


def test_input_bus_hold_and_drain():
    bus = InputBus()
    bus.push({"w": True, "dx": 3.0})
    bus.push({"dx": 4.0})
    inp, active = bus.poll()
    assert active
    assert bool(inp.keys[3]) and float(inp.mouse_dx) == 7.0
    # dx drains; held keys persist (hold model).
    inp2, active2 = bus.poll()
    assert active2  # w still held
    assert bool(inp2.keys[3]) and float(inp2.mouse_dx) == 0.0
    bus.push({"w": False})
    inp3, active3 = bus.poll()
    assert not bool(inp3.keys[3])
    inp4, active4 = bus.poll()
    assert not active4


def test_frame_hub_latest_wins():
    hub = FrameHub()
    hub.publish(b"a", "image/png")
    hub.publish(b"b", "image/png")
    seq, buf, _ = hub.wait_next(0, timeout=0.1)
    assert buf == b"b" and seq == 2
    # No newer frame: times out with None.
    seq2, buf2, _ = hub.wait_next(seq, timeout=0.05)
    assert buf2 is None and seq2 == seq


# -- round-5 surfaces: watchdog, sharded serve, checkpoints ----------------


def _tiny_serve_cfg(tiny_cfg, n_bands=1):
    # pallas_present=False: these tests run their OWN server while the
    # module fixture's server keeps stepping — TWO concurrent
    # INTERPRETED pallas calls collide on the interpreter's
    # process-global shared-memory state (_initialize_shared_memory
    # num_cores assert, observed in full-suite runs). The XLA present
    # twin is bit-identical (tests/test_present.py) and
    # concurrency-safe.
    return tiny_cfg.replace(screen=tiny_cfg.screen.__class__(
        width=32, height=16 * max(2, n_bands) if n_bands > 1 else 32,
        samples_per_pixel=2, chunks_per_frame=4 * max(1, n_bands) * 2,
        fps=30, pallas_present=False,
    ))


def test_serve_watchdog_rolls_back_poisoned_state(tiny_cfg, tiny_device_scene):
    """VERDICT r4 weak #2: a poisoned engine state in a LIVE EngineServer
    session must roll back (watchdog wired into _engine_loop) and the
    rollback must be visible in /stats — instead of streaming garbage
    forever behind a healthy-looking fps."""
    import jax.numpy as jnp  # noqa: F401

    cfg = _tiny_serve_cfg(tiny_cfg)
    srv = EngineServer(
        tiny_device_scene, cfg, seed=0, port=0, watchdog_interval=4,
    )
    # Poison the state INSIDE the engine thread (deterministic — no race
    # against the donated step): once the watchdog has a good snapshot,
    # every step's camera goes NaN until a rollback is observed.
    orig_choose = srv.engine.choose_step

    def poisoned_choose(n, active):
        step_fn, stepped = orig_choose(n, active)
        if n >= 8 and srv._rollbacks == 0:
            def bad(st, inp):
                st2, f = step_fn(st, inp)
                return st2._replace(
                    cam_center=st2.cam_center * np.float32("nan")
                ), f
            return bad, stepped
        return step_fn, stepped

    srv.engine.choose_step = poisoned_choose
    srv.start()
    try:
        s = _wait_stats(srv.port, lambda s: (s["rollbacks"] or 0) >= 1,
                        timeout=120)
        assert s["error"] is None
        # The session RECOVERED: camera finite, frames keep advancing.
        s2 = _wait_stats(srv.port, lambda t: t["frame"] > s["frame"] + 8,
                         timeout=120)
        assert all(np.isfinite(s2["cam"]))
        assert s2["error"] is None
    finally:
        srv.stop()


def test_serve_sharded_bands_session(tiny_scene):
    """The one driver x engine cell with no prior coverage (VERDICT r4
    weak #4): EngineServer driving the tile-sharded engine. Frames
    stream, input moves the camera, watchdog stats are live."""
    from mirror_maze_tpu.config import (
        CameraConfig, EngineConfig, MazeConfig, ScreenConfig, TracerConfig,
    )
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.scene import build_scene

    n = 2
    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        # pallas_present=False: see _tiny_serve_cfg (concurrent
        # interpreted pallas with the module fixture's live server).
        screen=ScreenConfig(width=32, height=16 * n, samples_per_pixel=2,
                            chunks_per_frame=4 * n, fps=30,
                            pallas_present=False),
        intersector="brute",
    )
    dev = upload_scene(build_scene(cfg.maze))
    import tempfile

    ckpt = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
    ckpt.close()
    srv = EngineServer(dev, cfg, seed=0, port=0, sharded_bands=n,
                       stream_every=1, ckpt_path=ckpt.name)
    srv.start()
    try:
        s0 = _wait_stats(srv.port, lambda s: s["frame"] > 0, timeout=120)
        assert s0["rollbacks"] == 0 and s0["error"] is None
        status, ctype, body = _get(srv.port, "/frame")
        assert status == 200
        img = read_png_bytes(body) if ctype == "image/png" else None
        if img is not None:
            assert img.shape[0] == 16 * n and img.shape[1] == 32
        assert _post(srv.port, "/input", {"w": True}) == 200
        _wait_stats(
            srv.port,
            lambda s: abs(s["cam"][2] - (-15.0)) > 0.5, timeout=120,
        )
        # Live checkpoint of the SHARDED state over HTTP: the saved
        # .npz restores through the sharded loader (band count kept).
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/ckpt", data=b"", method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            info = json.loads(r.read())
        assert info["path"] == ckpt.name and info["frame"] > 0
        from mirror_maze_tpu.parallel.shard import load_sharded_state

        st = load_sharded_state(ckpt.name, cfg, n)
        assert int(np.asarray(st.frame).reshape(-1)[0]) == info["frame"]
    finally:
        srv.stop()
        import os

        os.unlink(ckpt.name)


def test_serve_checkpoint_endpoint_and_resume(tiny_cfg, tiny_device_scene,
                                              tmp_path):
    """POST /ckpt saves the live session to the server's FIXED path
    (bit-exact .npz), stop() saves again, and a new server resumes from
    the checkpoint (serve --load-state semantics)."""
    from mirror_maze_tpu.runtime.state import load_state

    cfg = _tiny_serve_cfg(tiny_cfg)
    path = str(tmp_path / "serve_ckpt.npz")
    srv = EngineServer(
        tiny_device_scene, cfg, seed=0, port=0, ckpt_path=path,
    )
    srv.start()
    try:
        _wait_stats(srv.port, lambda s: s["frame"] > 2)
        status = None
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/ckpt", data=b"", method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            status = r.status
            info = json.loads(r.read())
        assert status == 200
        assert info["path"] == path and info["frame"] > 0
        st = load_state(path, cfg)
        assert int(st.frame) == info["frame"]
        assert st.screen.shape == (cfg.screen.total_chunks,
                                   cfg.screen.pixels_per_chunk * 3)
    finally:
        srv.stop()
    # stop() saved the final state on top (>= the endpoint's frame).
    st2 = load_state(path, cfg)
    assert int(st2.frame) >= info["frame"]
    # Resume: a fresh server continues from the checkpoint.
    srv2 = EngineServer(
        tiny_device_scene, cfg, seed=0, port=0,
    )
    srv2.engine.state = st2
    srv2.start()
    try:
        s = _wait_stats(srv2.port, lambda s: s["frame"] > 0)
        assert s["error"] is None
    finally:
        srv2.stop()


def test_serve_ckpt_unconfigured_409(server):
    """POST /ckpt without a configured path answers 409, not a write."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/ckpt", data=b"", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 409


def test_input_allowed_ipv6_and_proxy_hosts(server):
    """Advisor r4: a bracketed IPv6 loopback Host ('[::1]' with or
    without a port) must pass the loopback gate (the old rsplit parse
    turned '[::1]' into '[:'), and non-loopback hosts still fail."""
    class H(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    assert server._input_allowed(H({"Host": "[::1]"}))
    assert server._input_allowed(H({"Host": "[::1]:8000"}))
    assert server._input_allowed(H({"Host": "127.0.0.1:99"}))
    assert server._input_allowed(H({"Host": "Localhost:8000"}))
    assert not server._input_allowed(H({"Host": "evil.example"}))
    assert not server._input_allowed(H({"Host": ""}))
