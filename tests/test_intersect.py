"""Intersection tests: closed-form ray-rect cases, slab-vs-bruteforce
property tests, and brute-vs-BVH backend agreement on the real scene
(reference intersectors: `shaders.metal:51-95, 115-156`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import MazeConfig
from mirror_maze_tpu.render.intersect import (
    BIG,
    nearest_hit_brute,
    nearest_hit_bvh,
    ray_aabb,
)
from mirror_maze_tpu.render.scenebuf import upload_scene
from mirror_maze_tpu.scene import build_bvh, build_scene
from mirror_maze_tpu.scene.builder import Scene


def _single_plane_scene(origin, v, u):
    s = Scene(
        origin=np.array([origin], np.float32),
        v=np.array([v], np.float32),
        u=np.array([u], np.float32),
        color=np.ones((1, 3), np.float32),
        is_mirror=np.zeros(1, bool),
        emission=np.zeros((1, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    return upload_scene(s)


def test_ray_rect_closed_form():
    # Unit rect at z=5 spanning x,y in [0,1]; ray from origin straight +z.
    dev = _single_plane_scene([0, 0, 5], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, idx = nearest_hit_brute(dev, o, d, 0.1)
    assert float(t[0]) == pytest.approx(5.0, rel=1e-6)
    assert int(idx[0]) == 0


def test_ray_rect_miss_outside():
    dev = _single_plane_scene([0, 0, 5], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[2.0, 0.5, 0.0], [0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])  # outside / behind
    t, _ = nearest_hit_brute(dev, o, d, 0.1)
    assert float(t[0]) >= 1e29 and float(t[1]) >= 1e29


def test_ray_rect_edges_inclusive():
    """Reference accepts 0 <= d1 <= |v| inclusive (`shaders.metal:63`)."""
    dev = _single_plane_scene([0, 0, 5], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, _ = nearest_hit_brute(dev, o, d, 0.1)
    assert float(t[0]) == pytest.approx(5.0)
    assert float(t[1]) == pytest.approx(5.0)


def test_t_min_exclusion():
    """Hits closer than t_min=0.1 are rejected (`shaders.metal:63`: a > 0.1)."""
    dev = _single_plane_scene([0, 0, 0.05], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, _ = nearest_hit_brute(dev, o, d, 0.1)
    assert float(t[0]) >= 1e29


def test_parallel_ray_no_hit():
    dev = _single_plane_scene([0, 0, 5], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])  # parallel to plane
    t, _ = nearest_hit_brute(dev, o, d, 0.1)
    assert float(t[0]) >= 1e29


def test_slab_against_bruteforce(rng):
    """Property test: slab ray-AABB vs a dense numerical check."""
    n = 256
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bmin = np.full((n, 3), -1.0, np.float32)
    bmax = np.full((n, 3), 1.0, np.float32)
    t = np.asarray(ray_aabb(jnp.asarray(o), jnp.asarray(d),
                            jnp.full((n,), BIG), jnp.asarray(bmin),
                            jnp.asarray(bmax)))
    # numerical reference: sample points along the ray
    ts = np.linspace(0.0, 10.0, 4001)[None, :, None]
    pts = o[:, None, :] + ts * d[:, None, :]
    inside = np.all((pts >= -1.0 - 1e-6) & (pts <= 1.0 + 1e-6), axis=-1)
    hit_num = inside.any(axis=1)
    hit_slab = t < BIG
    # starting-inside rays: slab returns negative tmin but tmax>0 counts as hit
    agree = hit_slab == hit_num
    assert agree.mean() > 0.99  # allow grazing-edge disagreement


def test_bvh_traversal_exact_on_giant_leaf(rng):
    """Coincident centroids force the SAH builder into one big leaf
    (every split is one-sided -> abort): the traversal must still test
    every primitive. Guards the derive-bounds path — a fixed max_leaf=4
    silently dropped primitives 5..n here (rays passed through)."""
    from mirror_maze_tpu.scene.builder import Scene
    from mirror_maze_tpu.scene.bvh import traversal_bounds

    n = 7
    # Parallel unit quads stacked along z, all sharing one centroid x/y
    # and z-extent midpoint arrangement that degenerates the partition:
    # same centroid for every quad -> single leaf of 7.
    origin = np.tile(np.array([[-0.5, -0.5, 0.0]], np.float32), (n, 1))
    origin[:, 2] = np.arange(n, dtype=np.float32) * 0.0  # all at z=0 plane
    v = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    u = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1))
    scene = Scene(
        origin=origin, v=v, u=u,
        color=np.ones((n, 3), np.float32),
        is_mirror=np.zeros(n, bool),
        emission=np.zeros((n, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    bvh = build_bvh(scene.origin, scene.u, scene.v, backend="numpy")
    assert int(bvh.count.max()) == n  # the degenerate single leaf
    dev = upload_scene(scene, bvh)
    d, l = traversal_bounds(bvh.left_first, bvh.count)
    o = jnp.asarray([[0.0, 0.0, -3.0]], dtype=jnp.float32)
    dr = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    t_v, _ = nearest_hit_bvh(dev, o, dr, 0.1, max_depth=d, max_leaf=l)
    assert float(t_v[0]) < BIG  # the ray must NOT pass through
    t_b, _ = nearest_hit_brute(dev, o, dr, 0.1)
    np.testing.assert_allclose(np.asarray(t_v), np.asarray(t_b), rtol=1e-5)


def test_brute_matches_bvh_on_real_scene(rng):
    cfg = MazeConfig(width=6, height=6)
    scene = build_scene(cfg)
    bvh = build_bvh(scene.origin, scene.u, scene.v)
    dev = upload_scene(scene, bvh)
    n = 512
    o = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(-7, 1, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t_b, i_b = nearest_hit_brute(dev, jnp.asarray(o), jnp.asarray(d), 0.1)
    t_v, i_v = nearest_hit_bvh(
        dev, jnp.asarray(o), jnp.asarray(d), 0.1,
        max_depth=bvh.depth() + 2, max_leaf=int(bvh.count.max()),
    )
    t_b, t_v = np.asarray(t_b), np.asarray(t_v)
    np.testing.assert_allclose(t_b, t_v, rtol=1e-4)
    # Indices may differ only where two planes are coincident; distances equal.
    same = np.asarray(i_b) == np.asarray(i_v)
    assert same.mean() > 0.95


def test_bvh_backend_honored_without_explicit_nearest_fn(monkeypatch):
    """Regression: render_pixels/render_full_frame with
    intersector='bvh' and no nearest_fn silently fell through to brute
    force — the CLI's offline render never exercised the traversal."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
        TracerConfig,
    )
    from mirror_maze_tpu.render import make_camera, upload_scene
    from mirror_maze_tpu.render import intersect as intersect_mod
    from mirror_maze_tpu.render import pipeline as pipeline_mod
    from mirror_maze_tpu.scene import build_scene

    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=16, height=8, samples_per_pixel=2),
        intersector="bvh",
    )
    dev = upload_scene(build_scene(cfg.maze))
    cam = make_camera(cfg.camera, 2.0)
    pix = jnp.stack(
        jnp.meshgrid(jnp.arange(8), jnp.arange(8), indexing="xy"), -1
    ).reshape(-1, 2)

    calls = {"bvh": 0}
    real = intersect_mod.nearest_hit_bvh

    def spy(*a, **k):
        calls["bvh"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pipeline_mod, "nearest_hit_bvh", spy)
    out_bvh = np.asarray(
        pipeline_mod.render_pixels(dev, cam, pix, jax.random.PRNGKey(0), cfg)
    )
    assert calls["bvh"] > 0, "bvh intersector silently fell through"

    brute = cfg.replace(intersector="brute")
    out_brute = np.asarray(
        pipeline_mod.render_pixels(dev, cam, pix, jax.random.PRNGKey(0), brute)
    )
    np.testing.assert_array_equal(out_bvh, out_brute)  # exactness holds


def test_exact_backend_matches_brute_bitwise(rng):
    """nearest_hit_exact: the same dense test with explicit-FMA
    contractions. On CPU every backend is exact f32, so exact == brute
    BITWISE; on hardware exact keeps full f32 where brute's MXU inputs
    truncate to bf16 (gated by bench.py --validate)."""
    from mirror_maze_tpu.config import MazeConfig
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.render.intersect import (
        nearest_hit_brute,
        nearest_hit_exact,
    )
    from mirror_maze_tpu.scene import build_scene

    dev = upload_scene(build_scene(MazeConfig(width=6, height=6)))
    o = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32) * 3.0)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tb, ib = nearest_hit_brute(dev, o, d, 0.1)
    te, ie = nearest_hit_exact(dev, o, d, 0.1)
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(te))
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(ie))


@pytest.mark.slow
def test_exact_backend_drives_the_engine(rng):
    """intersector='exact' is honored end-to-end (engine step + offline
    render) and matches the brute engine bitwise on CPU."""
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

    base = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=32, height=32, samples_per_pixel=2,
                            chunks_per_frame=16),
    )
    dev = upload_scene(build_scene(base.maze))
    frames = {}
    for backend in ("brute", "exact"):
        cfg = base.replace(intersector=backend)
        st = init_state(cfg, seed=0)
        step = make_step(dev, cfg)
        for _ in range(4):
            st, frame = step(st, FrameInputs.make(w=True))
        frames[backend] = np.asarray(frame)
    np.testing.assert_array_equal(frames["brute"], frames["exact"])


def test_unknown_intersector_rejected():
    import pytest

    from mirror_maze_tpu.config import EngineConfig

    with pytest.raises(ValueError, match="intersector"):
        EngineConfig(intersector="octree")
