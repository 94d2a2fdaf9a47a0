"""Sphere primitives across every backend.

The reference carries a ray-sphere intersector as DEAD code
(`shaders.metal:69-85` — never dispatched, and with a sign bug in its
half-chord). Here spheres are first-class: the jnp brute/bvh backends
fold them in after the plane test (render/intersect.py sphere_ts), and
the Pallas kernel runs them as its mode-3 MXU group
(render/pallas_tracer.py _pack_sphere_group). These tests pin the
analytic geometry, cross-backend exactness, the multi-tile sphere path,
scene IO, and the collision fold.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import MazeConfig, TracerConfig
from mirror_maze_tpu.render.intersect import (
    nearest_hit_brute,
    nearest_hit_bvh,
    sphere_ts,
)
from mirror_maze_tpu.render.pallas_tracer import trace_paths_pallas
from mirror_maze_tpu.render.scenebuf import upload_scene
from mirror_maze_tpu.render.tracer import trace_paths
from mirror_maze_tpu.scene import build_scene
from mirror_maze_tpu.scene.builder import Scene
from mirror_maze_tpu.scene.collision import collides

KEY = jax.random.PRNGKey(0)


def _open_scene(r, n_quads=6, **sph):
    """A few free-floating quads plus spheres — open world, so sphere
    hits are not drowned out by closed-world walls."""
    return Scene(
        origin=r.uniform(-8, 8, (n_quads, 3)).astype(np.float32),
        v=(r.normal(size=(n_quads, 3)) * 4).astype(np.float32),
        u=(r.normal(size=(n_quads, 3)) * 4).astype(np.float32),
        color=r.uniform(0, 1, (n_quads, 3)).astype(np.float32),
        is_mirror=np.zeros(n_quads, bool),
        emission=np.zeros((n_quads, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
        **sph,
    )


def _sphere_kwargs(r, s):
    return dict(
        sph_center=r.uniform(-6, 6, (s, 3)).astype(np.float32),
        sph_radius=r.uniform(0.4, 1.5, s).astype(np.float32),
        sph_color=r.uniform(0, 1, (s, 3)).astype(np.float32),
        sph_is_mirror=r.random(s) < 0.4,
        sph_emission=np.concatenate(
            [r.uniform(0, 1, (s, 3)),
             (r.random((s, 1)) < 0.5) * r.uniform(0, 2, (s, 1))], axis=1
        ).astype(np.float32),
    )


def _rays_at_spheres(r, centers, n, spread=0.08):
    """Rays from random origins aimed (with jitter) at random sphere
    centers, so a large fraction actually hit spheres."""
    o = r.uniform(-10, 10, (n, 3)).astype(np.float32)
    tgt = centers[r.integers(0, len(centers), n)]
    d = tgt - o + r.normal(size=(n, 3)).astype(np.float32) * spread
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_sphere_ts_analytic():
    """Head-on hit at t = dist - r; tangent-exterior miss; a ray
    starting INSIDE passes through (near-root-only convention, matching
    the reference's dead intersector `shaders.metal:69-85`)."""
    scene = upload_scene(_open_scene(
        np.random.default_rng(0),
        sph_center=np.array([[0.0, 0.0, 5.0]], np.float32),
        sph_radius=np.array([1.0], np.float32),
    ))
    o = jnp.asarray([
        [0.0, 0.0, 0.0],    # head-on: t = 4
        [0.0, 2.0, 0.0],    # passes 2 above center: miss
        [0.0, 0.0, 5.0],    # starts at the center: inside -> pass
    ])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    ts = np.asarray(sphere_ts(scene, o, d, 1e-3))[:, 0]
    assert ts[0] == pytest.approx(4.0, abs=1e-5)
    assert ts[1] > 1e29
    assert ts[2] > 1e29  # near root is behind the origin -> rejected


def _bvh_bounds(dev):
    from mirror_maze_tpu.scene.bvh import traversal_bounds

    return traversal_bounds(
        np.asarray(dev.bvh_left_first), np.asarray(dev.bvh_count)
    )


def test_brute_and_bvh_agree_with_spheres():
    r = np.random.default_rng(1)
    scene = upload_scene(_open_scene(r, **_sphere_kwargs(r, 7)))
    o, d = _rays_at_spheres(r, np.asarray(scene.sph_center), 256)
    md, ml = _bvh_bounds(scene)
    # Both under jit, like every real caller: eager-vs-jit differs in
    # the last ulp (XLA fuses the sphere quadratic's mul+add into FMAs).
    tb, ib = jax.jit(
        lambda o, d: nearest_hit_brute(scene, o, d, 1e-3)
    )(o, d)
    tv, iv = nearest_hit_bvh(scene, o, d, 1e-3, max_depth=md, max_leaf=ml)
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(iv))
    np.testing.assert_allclose(np.asarray(tb), np.asarray(tv),
                               rtol=1e-5, atol=0)
    # Spheres actually won on a meaningful fraction of rays.
    assert (np.asarray(ib) >= scene.num_planes).mean() > 0.3


@pytest.mark.slow
def test_pallas_matches_jnp_on_sphere_scene():
    """Deterministic segment (emission pickup, mirror-sphere reflection
    with the position-dependent normal) must match the jnp tracer
    exactly under the interpreter."""
    r = np.random.default_rng(2)
    scene = _open_scene(r, **_sphere_kwargs(r, 5))
    dev = upload_scene(scene)
    o, d = _rays_at_spheres(r, scene.sph_center, 259)  # odd: padding
    for limit in (1, 3):
        cfg = TracerConfig(bounce_limit=1, mirror_limit=limit)
        lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
        lp = np.asarray(trace_paths_pallas(
            dev.plane_table, o, d, jnp.int32(7), cfg, rows_per_block=2,
            tables=dev.mxu_tables,
        ))
        np.testing.assert_allclose(lj, lp, rtol=1e-5, atol=1e-7)


def test_mirror_sphere_head_on_reflects_back():
    """A head-on ray into a mirror sphere reflects straight back: the
    reconstructed normal at the hit is -d, so d' = d - 2(d.n)n = -d.
    Checked through the full tracer: the reflected ray must re-hit an
    emissive wall BEHIND the camera."""
    scene = Scene(
        # One emissive quad at z = -2 spanning x,y in [-5, 5].
        origin=np.array([[-5.0, -5.0, -2.0]], np.float32),
        u=np.array([[10.0, 0.0, 0.0]], np.float32),
        v=np.array([[0.0, 10.0, 0.0]], np.float32),
        color=np.ones((1, 3), np.float32) * 0.5,
        is_mirror=np.zeros(1, bool),
        emission=np.array([[1.0, 0.25, 0.0, 4.0]], np.float32),
        grid=np.zeros((1, 1), np.uint8),
        sph_center=np.array([[0.3, -0.2, 6.0]], np.float32),
        sph_radius=np.array([1.0], np.float32),
        sph_color=np.array([[0.0, 0.0, 0.0]], np.float32),  # no tint
        sph_is_mirror=np.array([True]),
    )
    dev = upload_scene(scene)
    # Through the center: the hit normal is exactly -d, so the
    # reflection retraces the ray back through the origin onto the quad.
    o = jnp.asarray([[0.3, -0.2, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    cfg = TracerConfig(bounce_limit=1, mirror_limit=4, mirror_tint=0.0)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))[0]
    # emission * strength picked up with full throughput
    np.testing.assert_allclose(lj, [4.0, 1.0, 0.0], rtol=1e-4)
    lp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(1), cfg, rows_per_block=1,
        tables=dev.mxu_tables,
    ))[0]
    np.testing.assert_allclose(lp, lj, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_multitile_sphere_group_matches_jnp():
    """> PLANE_TILE spheres: the mode-3 group spans >= 2 tiles, so the
    per-tile AABB slab skip and cross-tile strict-< merge run over
    sphere tiles. Same grazing-edge slack as the multi-tile plane test
    (a hit within a float ulp of tangency can flip between backends)."""
    r = np.random.default_rng(3)
    s = 150
    scene = _open_scene(
        r,
        sph_center=r.uniform(-20, 20, (s, 3)).astype(np.float32),
        sph_radius=r.uniform(0.3, 1.0, s).astype(np.float32),
        sph_color=r.uniform(0, 1, (s, 3)).astype(np.float32),
        sph_is_mirror=r.random(s) < 0.2,
        sph_emission=np.concatenate(
            [r.uniform(0, 1, (s, 3)),
             (r.random((s, 1)) < 0.4) * r.uniform(0, 2, (s, 1))], axis=1
        ).astype(np.float32),
    )
    dev = upload_scene(scene)
    assert dev.mxu_tables[3] is not None
    assert dev.mxu_tables[3][2].shape[0] >= 2  # sphere tiles
    o, d = _rays_at_spheres(r, scene.sph_center, 256, spread=0.3)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=2)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(9), cfg, rows_per_block=2,
        tables=dev.mxu_tables, anchor=jnp.asarray([1.0, -2.0, 3.0]),
    ))
    per_ray = np.abs(lj - lp).max(axis=1)
    agree = per_ray < 1e-4
    assert agree.mean() >= 0.99, np.where(~agree)[0]
    np.testing.assert_allclose(lj[agree], lp[agree], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.slow
def test_multibounce_sphere_scatter_statistics():
    """Diffuse scatter off position-dependent sphere normals: the two
    backends use different RNG streams, so multi-bounce light agrees
    only in distribution — compare scene-mean gathered light."""
    r = np.random.default_rng(4)
    sph = _sphere_kwargs(r, 6)
    sph["sph_is_mirror"][:] = False
    scene = _open_scene(r, **sph)
    dev = upload_scene(scene)
    o, d = _rays_at_spheres(r, scene.sph_center, 2048, spread=0.4)
    cfg = TracerConfig(bounce_limit=4, mirror_limit=4)
    mj = np.asarray(trace_paths(dev, o, d, KEY, cfg)).mean(axis=0)
    mp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(13), cfg, rows_per_block=2,
        tables=dev.mxu_tables,
    )).mean(axis=0)
    np.testing.assert_allclose(mj, mp, rtol=0.08, atol=0.01)


def test_scene_io_roundtrip_with_spheres(tmp_path):
    from mirror_maze_tpu.scene.io import load_scene, save_scene

    r = np.random.default_rng(5)
    scene = _open_scene(r, **_sphere_kwargs(r, 4))
    p = str(tmp_path / "s.npz")
    save_scene(p, scene)
    back = load_scene(p)
    for f in ("sph_center", "sph_radius", "sph_color", "sph_is_mirror",
              "sph_emission"):
        np.testing.assert_array_equal(getattr(back, f), getattr(scene, f))
    # Sphere-free scenes round-trip to zero spheres (and the archive
    # carries no sphere arrays at all — both directions compatible).
    p2 = str(tmp_path / "maze.npz")
    save_scene(p2, build_scene(MazeConfig(width=3, height=3)))
    assert load_scene(p2).num_spheres == 0


def test_collision_sees_sphere_boxes():
    r = np.random.default_rng(6)
    scene = _open_scene(
        r,
        sph_center=np.array([[40.0, 40.0, 40.0]], np.float32),
        sph_radius=np.array([2.0], np.float32),
    )
    dev = upload_scene(scene)
    inside = jnp.asarray([39.5, 40.0, 40.5])
    far = jnp.asarray([60.0, 60.0, 60.0])
    half = jnp.asarray([0.3, 0.3, 0.3])
    assert bool(collides(dev.leaf_min, dev.leaf_max,
                         inside - half, inside + half))
    assert not bool(collides(dev.leaf_min, dev.leaf_max,
                             far - half, far + half))


def test_nonpositive_radius_rejected():
    with pytest.raises(ValueError, match="radii"):
        _open_scene(
            np.random.default_rng(7),
            sph_center=np.zeros((1, 3), np.float32),
            sph_radius=np.array([0.0], np.float32),
        )


def test_sphere_free_scene_unchanged():
    """A generated maze has no spheres: its mxu_tables sphere entry is
    None and the (unchanged) kernel renders it identically to before
    the sphere feature (guarded by the golden suite; here just pin the
    static structure)."""
    dev = upload_scene(build_scene(MazeConfig(width=4, height=4)))
    assert dev.num_spheres == 0
    assert dev.mxu_tables[3] is None      # no spheres
    assert dev.mxu_tables[4] is None      # no triangles
    assert all(dev.mxu_tables[m] is None for m in (5, 6, 7))  # no glass
    assert len(dev.mxu_tables) == 8


@pytest.mark.slow
@pytest.mark.slow
def test_maze_with_spheres_renders_on_all_backends():
    """Spheres dropped into a generated maze: closed world, so every
    backend's light stays finite and the deterministic segment matches
    between pallas and jnp-brute."""
    base = build_scene(MazeConfig(width=4, height=4))
    scene = dataclasses.replace(
        base,
        sph_center=np.array(
            [[3.0, -3.0, 3.0], [6.0, -2.0, 5.0]], np.float32),
        sph_radius=np.array([1.2, 0.8], np.float32),
        sph_color=np.array(
            [[0.9, 0.2, 0.2], [0.2, 0.9, 0.2]], np.float32),
        sph_is_mirror=np.array([False, True]),
        sph_emission=np.array(
            [[1.0, 0.5, 0.2, 2.0], [0, 0, 0, 0]], np.float32),
        sph_ior=np.zeros(2, np.float32),
    )
    dev = upload_scene(scene)
    r = np.random.default_rng(8)
    o, d = _rays_at_spheres(r, scene.sph_center, 128, spread=0.2)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=2)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    md, ml = _bvh_bounds(dev)
    lb = np.asarray(trace_paths(
        dev, o, d, KEY, cfg,
        nearest_fn=lambda oo, dd: nearest_hit_bvh(
            dev, oo, dd, cfg.t_min, max_depth=md, max_leaf=ml
        ),
    ))
    lp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(3), cfg, rows_per_block=1,
        tables=dev.mxu_tables,
    ))
    np.testing.assert_allclose(lj, lp, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(lj, lb, rtol=1e-5, atol=1e-7)
    assert np.isfinite(lj).all() and lj.max() > 0


def test_replace_growing_spheres_still_raises_on_core_fields():
    """Re-defaulting across sphere counts applies only to the
    NEUTRAL-DEFAULT fields (ior/tex_*); forgetting a load-bearing field
    like sph_radius when growing a sphere-free scene must still raise
    (a silent radius-1 default would invent visible geometry)."""
    base = build_scene(MazeConfig(width=4, height=4))
    with pytest.raises(ValueError, match="sph_radius"):
        dataclasses.replace(
            base, sph_center=np.array([[0, 0, 5]], np.float32)
        )
    # With every load-bearing field given, the neutral fields
    # (sph_ior, sph_tex_*) re-default silently.
    ok = dataclasses.replace(
        base,
        sph_center=np.array([[0, 0, 5]], np.float32),
        sph_radius=np.ones(1, np.float32),
        sph_color=np.full((1, 3), 0.5, np.float32),
        sph_is_mirror=np.zeros(1, bool),
        sph_emission=np.zeros((1, 4), np.float32),
    )
    assert ok.sph_ior.shape == (1,) and np.all(ok.sph_ior == 0)
    assert ok.sph_tex_kind.shape == (1,)
