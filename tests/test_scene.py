"""Scene builder tests (reference: `main.rs:443-588`)."""

import numpy as np
import pytest

from mirror_maze_tpu.config import MazeConfig
from mirror_maze_tpu.scene import build_scene


def test_scene_structure_default():
    s = build_scene(MazeConfig())
    n = s.num_planes
    assert s.origin.shape == (n, 3)
    assert s.v.shape == (n, 3)
    assert s.u.shape == (n, 3)
    assert s.color.shape == (n, 3)
    assert s.is_mirror.shape == (n,)
    assert s.emission.shape == (n, 4)
    # Fixed trailing planes: 4 boundaries + floor + fixed light + ceiling.
    assert n >= 7


def test_fixed_planes_match_reference_values():
    """Boundary/floor/light/ceiling geometry for the default 10x10 world
    must match `main.rs:517-585` — except the boundary planes, which sit
    1e-3 OUTSIDE the reference position by design (backstop inset: the
    maze's border walls lie exactly on the world edge, and coplanar
    wall/boundary pairs would tie in the nearest-hit select)."""
    s = build_scene(MazeConfig())
    eps = 1e-3
    # Last 7 planes in order.
    b1, b2, b3, b4, floor, light, ceil = range(s.num_planes - 7, s.num_planes)
    np.testing.assert_allclose(s.origin[b1], [-50.0, 2.0, -50.0 - eps])
    np.testing.assert_allclose(s.v[b1], [0.0, -20.0, 0.0])
    np.testing.assert_allclose(s.u[b1], [100.0, 0.0, 0.0])
    np.testing.assert_allclose(s.origin[b4], [50.0 + eps, 2.0, -50.0])
    np.testing.assert_allclose(s.origin[floor], [-50.0, 2.0, 50.0])
    np.testing.assert_allclose(s.color[floor], [0.4, 0.45, 0.3])
    np.testing.assert_allclose(s.origin[light], [-5.0, 2.0, -49.9])
    np.testing.assert_allclose(s.v[light], [10.0, 0.0, 0.0])
    np.testing.assert_allclose(s.u[light], [0.0, -6.0, 0.0])
    np.testing.assert_allclose(s.emission[light], [1.0, 0.8, 0.3, 2.0])
    np.testing.assert_allclose(s.origin[ceil], [-50.0, -8.0, 50.0])
    np.testing.assert_allclose(s.emission[ceil], [1.0, 0.8, 0.3, 0.02], rtol=1e-6)
    assert not s.is_mirror[[b1, b2, b3, b4, floor, light, ceil]].any()


def test_wall_geometry_and_materials():
    s = build_scene(MazeConfig())
    walls = slice(0, s.num_planes - 7)
    # All maze walls have the wall color or are light panels.
    wall_color = np.array([0.3, 0.35, 0.4], np.float32)
    assert np.allclose(s.color[walls], wall_color)
    # Light panels are diffuse with emission strength 2.
    lights = s.emission[:, 3] == 2.0
    assert not s.is_mirror[lights].any()
    # Wall v vectors are axis-aligned in x or z; u straight down (-y).
    v = s.v[walls]
    assert np.all((v[:, 1] == 0) | (np.abs(v[:, 1]) > 0))  # sanity
    # Emission colors of plain maze walls are (1,0,0,0) per `main.rs:465`.
    plain = (s.emission[walls, 3] == 0.0) & (s.emission[walls, 1] == 0.0)
    assert plain.any()


def test_determinism_and_seed_variation():
    a = build_scene(MazeConfig(seed=0))
    b = build_scene(MazeConfig(seed=0))
    c = build_scene(MazeConfig(seed=5))
    assert np.array_equal(a.origin, b.origin)
    assert np.array_equal(a.is_mirror, b.is_mirror)
    assert a.origin.shape != c.origin.shape or not np.array_equal(a.origin, c.origin)


def test_derived_constants():
    s = build_scene(MazeConfig())
    d = s.derived()
    val = d.valid
    # Unit normals for valid planes.
    np.testing.assert_allclose(
        np.linalg.norm(d.normal[val], axis=-1), 1.0, rtol=1e-5
    )
    # Degenerate planes are zeroed, not NaN.
    assert np.isfinite(d.normal).all()
    assert np.isfinite(d.w1).all() and np.isfinite(d.w2).all()
    # Edge projections: s1 at origin = 0, at origin+v = 1.
    s1_origin = np.sum(s.origin * d.w1, -1) - d.b1
    s1_far = np.sum((s.origin + s.v) * d.w1, -1) - d.b1
    np.testing.assert_allclose(s1_origin[val], 0.0, atol=1e-4)
    np.testing.assert_allclose(s1_far[val], 1.0, rtol=1e-4)


def test_world_scales_with_maze_size():
    s = build_scene(MazeConfig(width=4, height=4))
    # World half extent 20: boundaries at +-(20 + backstop inset).
    assert np.isclose(np.abs(s.origin[:, 0]).max(), 20.001)
    assert np.isclose(np.abs(s.origin[:, 2]).max(), 20.001)


def test_screen_must_tile_exactly():
    """Regression: non-multiple width/height floored the chunk grid, so
    edge pixel columns/rows silently NEVER refreshed."""
    import pytest

    from mirror_maze_tpu.config import ScreenConfig

    with pytest.raises(ValueError, match="multiples of chunk_width"):
        ScreenConfig(width=30, height=16)
    with pytest.raises(ValueError, match="multiples of chunk_width"):
        ScreenConfig(width=32, height=18)
    ScreenConfig(width=32, height=16)  # exact tiling passes


def test_pallas_present_chunk_width_guard():
    """The fused present kernel's x-neighbor shifts are +-3*chunk_width
    lanes within a 128-lane strip halo. A wider chunk must be a clean
    config error naming the knob (it previously surfaced as an opaque
    out-of-bounds slice deep in kernel tracing), and the XLA present
    path must still accept the same geometry."""
    import pytest

    from mirror_maze_tpu.config import ScreenConfig

    with pytest.raises(ValueError, match="pallas_present"):
        ScreenConfig(width=960, height=480, chunk_width=48)
    # Same geometry on the XLA present path: accepted.
    ScreenConfig(width=960, height=480, chunk_width=48, pallas_present=False)
    # Widest fused-path chunk (3*42 = 126 <= 128): accepted.
    ScreenConfig(width=840, height=420, chunk_width=42)


@pytest.mark.slow
def test_random_config_space_steps_finite_or_raises_cleanly(rng):
    """Config-space fuzz: any randomly drawn (validated) engine config
    must build, step, and stay finite; invalid geometry must be a clean
    ValueError at CONSTRUCTION, never a downstream shape error."""
    import dataclasses

    import jax.numpy as jnp

    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
        TracerConfig,
    )
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step
    from mirror_maze_tpu.scene import build_scene

    built = 0
    for trial in range(12):
        w = int(rng.integers(2, 16)) * 4
        h = int(rng.integers(2, 16)) * 4
        spp = int(rng.integers(1, 5))
        cw = 4
        total = (w // cw) * (h // cw)
        cpf = int(rng.integers(1, total + 1))
        try:
            cfg = EngineConfig(
                maze=MazeConfig(width=int(rng.integers(2, 5)),
                                height=int(rng.integers(2, 5))),
                tracer=TracerConfig(bounce_limit=int(rng.integers(1, 4)),
                                    mirror_limit=int(rng.integers(1, 4)),
                                    jitter=float(rng.uniform(0, 0.002))),
                camera=CameraConfig(spawn=(-5.0, 0.0, -12.0)),
                screen=ScreenConfig(
                    width=w, height=h, samples_per_pixel=spp,
                    chunks_per_frame=cpf,
                    sort_chunk_window=bool(rng.integers(0, 2)),
                    feedback_blur=bool(rng.integers(0, 2)),
                    quantize_8bit=bool(rng.integers(0, 2)),
                ),
                intersector=["brute", "bvh"][int(rng.integers(0, 2))],
            )
        except ValueError:
            continue  # clean rejection is acceptable
        scene = upload_scene(build_scene(cfg.maze))
        step = make_step(scene, cfg)
        st = init_state(cfg, seed=trial)
        for inp in (FrameInputs.make(w=True, mouse_dx=3.0),
                    FrameInputs.idle()):
            st, frame = step(st, inp)
        import numpy as np

        assert np.isfinite(np.asarray(st.screen)).all(), cfg
        assert frame.shape == (h, w, 3)
        built += 1
    assert built >= 8  # the space isn't degenerate


@pytest.mark.slow
def test_random_config_space_pallas_backend(rng):
    """Config-space fuzz on the PALLAS backend (TPU-semantics
    interpreter): random small geometries must build, step, and stay
    finite — catches config-dependent kernel packing/layout breakage
    that fixed-size tests miss."""
    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
        TracerConfig,
    )
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step
    from mirror_maze_tpu.scene import build_scene

    import numpy as np

    for trial in range(3):
        w = int(rng.integers(2, 8)) * 4
        h = int(rng.integers(2, 8)) * 4
        cfg = EngineConfig(
            maze=MazeConfig(width=int(rng.integers(2, 5)),
                            height=int(rng.integers(2, 5))),
            tracer=TracerConfig(bounce_limit=int(rng.integers(1, 3)),
                                mirror_limit=int(rng.integers(1, 3)),
                                block_rows=[1, 2, 4][int(rng.integers(0, 3))]),
            camera=CameraConfig(spawn=(-5.0, 0.0, -12.0)),
            screen=ScreenConfig(
                width=w, height=h, samples_per_pixel=int(rng.integers(1, 3)),
                chunks_per_frame=int(rng.integers(1, (w // 4) * (h // 4) + 1)),
                sort_chunk_window=bool(rng.integers(0, 2)),
            ),
            intersector="pallas",
        )
        scene = upload_scene(build_scene(cfg.maze))
        step = make_step(scene, cfg)
        st = init_state(cfg, seed=trial)
        st, frame = step(st, FrameInputs.make(w=True, mouse_dx=2.0))
        assert np.isfinite(np.asarray(st.screen)).all(), cfg
        assert frame.shape == (h, w, 3)


@pytest.mark.slow
def test_custom_scene_drives_the_full_engine():
    """Scene is a public surface, not just the maze builder's output: a
    hand-built quad-soup world (the documented API.md "custom scenes"
    example shape — closed box, colored walls, one mirror, one warm
    light) must drive the FULL engine end-to-end on every backend:
    upload (BVH + packed MXU tables), the donated step, progressive
    refresh, present, and BVH collision keeping the camera inside the
    box. Scene.kind defaults to all-zero = unspecialized full tests —
    always correct for arbitrary quads."""
    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        ScreenConfig,
        TracerConfig,
    )
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step
    from mirror_maze_tpu.scene.builder import Scene

    def quad(o, v, u, color, mirror=False, em=(0, 0, 0, 0)):
        return (np.float32(o), np.float32(v), np.float32(u),
                np.float32(color), mirror, np.float32(em))

    s = 10.0
    quads = [
        quad((-s, 2, -s), (0, 0, 2 * s), (2 * s, 0, 0), (0.4, 0.45, 0.3)),
        quad((-s, -8, -s), (2 * s, 0, 0), (0, 0, 2 * s), (0.1, 0.1, 0.1)),
        quad((-s, -8, -s), (0, 10, 0), (2 * s, 0, 0), (0.3, 0.35, 0.4)),
        quad((-s, -8, s), (2 * s, 0, 0), (0, 10, 0), (0.3, 0.35, 0.4)),
        quad((-s, -8, -s), (0, 0, 2 * s), (0, 10, 0), (0.8, 0.2, 0.2)),
        quad((s, -8, -s), (0, 10, 0), (0, 0, 2 * s), (0.2, 0.8, 0.2),
             mirror=True),
        quad((-4, -7.9, -9.9), (8, 0, 0), (0, 6, 0), (0, 0, 0),
             em=(1.0, 0.8, 0.3, 2.0)),
    ]
    scene = Scene(
        origin=np.stack([q[0] for q in quads]),
        v=np.stack([q[1] for q in quads]),
        u=np.stack([q[2] for q in quads]),
        color=np.stack([q[3] for q in quads]),
        is_mirror=np.array([q[4] for q in quads]),
        emission=np.stack([q[5] for q in quads]),
        grid=np.zeros((1, 1), np.uint8),
    )
    dev = upload_scene(scene)
    for inter in ("pallas", "brute", "bvh"):
        cfg = EngineConfig(
            camera=CameraConfig(spawn=(0.0, 0.0, 0.0),
                                look_dir=(0.1, 0.0, 1.0)),
            tracer=TracerConfig(bounce_limit=3, mirror_limit=4),
            screen=ScreenConfig(width=64, height=48, samples_per_pixel=4,
                                chunks_per_frame=192),
            intersector=inter,
        )
        step = make_step(dev, cfg)
        st = init_state(cfg, seed=0)
        frame = None
        for _ in range(40):  # walk into the far wall; collision must stop us
            st, frame = step(st, FrameInputs.make(w=True))
        f = np.asarray(frame)
        assert f.shape == (48, 64, 3) and f.dtype == np.uint8
        assert np.isfinite(np.asarray(st.screen)).all()
        assert f.mean() > 0.5, inter            # the light panel renders
        c = np.asarray(st.cam_center)
        assert np.all(np.abs(c) < s), c         # still inside the box
        # 40 frames at 5 u/s would travel 3.3u unobstructed; the wall at
        # z=10 minus the 0.5 player half-extent caps z below 9.5 anyway,
        # and forward progress must have happened.
        assert c[2] > 0.5, c


def test_scene_npz_roundtrip_bit_exact(tmp_path):
    """save_scene/load_scene must round-trip every field bit-exactly —
    the scene analog of the engine-state checkpoint guarantee."""
    from mirror_maze_tpu.config import MazeConfig
    from mirror_maze_tpu.scene import build_scene, load_scene, save_scene

    scene = build_scene(MazeConfig(width=6, height=6, seed=11))
    path = str(tmp_path / "world.npz")
    save_scene(path, scene)
    back = load_scene(path)
    for name in ("origin", "v", "u", "color", "is_mirror", "emission",
                 "grid", "kind"):
        a, b = getattr(scene, name), getattr(back, name)
        assert a.dtype == b.dtype, name
        assert np.array_equal(a, b), name


def test_scene_npz_optional_and_invalid_fields(tmp_path):
    """Archives of just the six plane arrays load (kind/grid default);
    missing required fields and wrong shapes fail with named errors, not
    opaque upload-time shape errors."""
    import pytest

    from mirror_maze_tpu.scene import load_scene

    n = 3
    fields = dict(
        origin=np.zeros((n, 3), np.float32),
        v=np.tile(np.float32([1, 0, 0]), (n, 1)),
        u=np.tile(np.float32([0, 1, 0]), (n, 1)),
        color=np.full((n, 3), 0.5, np.float32),
        is_mirror=np.zeros(n, bool),
        emission=np.zeros((n, 4), np.float32),
    )
    bare = str(tmp_path / "bare.npz")
    np.savez(bare, **fields)
    s = load_scene(bare)
    assert s.num_planes == n
    assert np.array_equal(s.kind, np.zeros(n, np.uint8))
    assert s.grid.shape == (1, 1)

    missing = str(tmp_path / "missing.npz")
    np.savez(missing, **{k: v for k, v in fields.items() if k != "color"})
    with pytest.raises(ValueError, match="color"):
        load_scene(missing)

    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **{**fields, "emission": np.zeros((n, 3), np.float32)})
    with pytest.raises(ValueError, match="emission"):
        load_scene(bad)
