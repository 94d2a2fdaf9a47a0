"""Procedural checker textures across every backend.

Beyond the reference (one flat albedo per quad, `main.rs:443-445`):
Scene.tex_kind 1 is a UV checker in the primitive's own (s1, s2) edge
coordinates, kind 2 a world-space checker (any primitive, including
spheres); odd cells swap albedo for tex_color2. The Pallas kernel rides
a doubled split-precision property block through the SAME one-hot
select (still one MXU M-tile — zero extra passes), statically absent on
untextured scenes. These tests pin the cell pattern quantitatively,
cross-backend agreement, texture x material interactions, and IO.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import MazeConfig, TracerConfig
from mirror_maze_tpu.render.intersect import nearest_hit_bvh
from mirror_maze_tpu.render.pallas_tracer import trace_paths_pallas
from mirror_maze_tpu.render.scenebuf import upload_scene
from mirror_maze_tpu.render.tracer import trace_paths
from mirror_maze_tpu.scene import build_scene
from mirror_maze_tpu.scene.builder import Scene
from mirror_maze_tpu.scene.io import load_scene, save_scene
from mirror_maze_tpu.scene.mesh import merge_scenes

KEY = jax.random.PRNGKey(0)
BIGQ = 16.0


def _checker_floor_scene(tex_kind=1, tex_scale=4.0,
                         c1=(1.0, 0.2, 0.2), c2=(0.2, 0.2, 1.0)):
    """A checkered diffuse floor (y = +2) under an emissive ceiling
    (y = -8): a straight-down ray picks up ceiling light attenuated by
    the floor cell's albedo, so the checker is directly readable in the
    output."""
    # Floor edge order (v = x, u = z) makes cross(v, u) = -y: the
    # normal FACES the downward-travelling rays, so a mirror floor
    # reflects (front face) rather than diffusing (back face).
    return Scene(
        origin=np.array(
            [[-BIGQ / 2, 2.0, -BIGQ / 2], [-BIGQ / 2, -8.0, -BIGQ / 2]],
            np.float32,
        ),
        v=np.array([[BIGQ, 0, 0], [BIGQ, 0, 0]], np.float32),
        u=np.array([[0, 0, BIGQ], [0, 0, BIGQ]], np.float32),
        color=np.array([c1, [0, 0, 0]], np.float32),
        is_mirror=np.zeros(2, bool),
        emission=np.array([[0, 0, 0, 0], [1, 1, 1, 2]], np.float32),
        grid=np.zeros((1, 1), np.uint8),
        tex_kind=np.array([tex_kind, 0], np.uint8),
        tex_scale=np.array([tex_scale, 1.0], np.float32),
        tex_color2=np.array([c2, [0, 0, 0]], np.float32),
    )


def _down_rays(points_xz, y=-5.0):
    pts = np.array([[x, y, z] for x, z in points_xz], np.float32)
    d = np.tile([[0.0, 1.0, 0.0]], (len(pts), 1)).astype(np.float32)
    return jnp.asarray(pts), jnp.asarray(d)


def _first_bounce_light(dev, o, d, cfg=None, backend="brute"):
    cfg = cfg or TracerConfig(bounce_limit=2, mirror_limit=1,
                              jitter=0.0)
    if backend == "pallas":
        return np.asarray(
            trace_paths_pallas(dev.plane_table, o, d, jnp.int32(3), cfg,
                               rows_per_block=1, tables=dev.mxu_tables)
        )
    if backend == "bvh":
        nf = lambda oo, dd: nearest_hit_bvh(dev, oo, dd, cfg.t_min, 4, 4)
        return np.asarray(trace_paths(dev, o, d, KEY, cfg, nearest_fn=nf))
    return np.asarray(trace_paths(dev, o, d, KEY, cfg))


def _mirror_checker_floor():
    """The checkered floor flipped to MIRROR with no emitters: the flat
    mirror tint (0.005 * textured albedo) is a fully DETERMINISTIC
    readout of the cell pattern — the reflected ray climbs into the
    void and dies, so every backend's whole path is RNG-free."""
    sc = _checker_floor_scene()
    return dataclasses.replace(
        sc, is_mirror=np.array([True, False]),
        emission=np.zeros((2, 4), np.float32),
    )


def test_uv_checker_cell_pattern():
    """tex_scale 4 on a 16-unit floor = 4x4 cells of 4 units. Rays down
    at cell centers read the cell's albedo through the mirror tint, and
    the analytic parity of every probed cell must match."""
    dev = upload_scene(_mirror_checker_floor())
    # Floor origin is (-8, 2, -8); s1 runs along v = +z, s2 along
    # u = +x. Cell centers at -6, -2, 2, 6 in both axes.
    centers = [-6.0, -2.0, 2.0, 6.0]
    pts = [(x, z) for x in centers for z in centers]
    o, d = _down_rays(pts)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=3, jitter=0.0)
    lj = _first_bounce_light(dev, o, d, cfg)
    c1 = 0.005 * np.array([1.0, 0.2, 0.2])
    c2 = 0.005 * np.array([0.2, 0.2, 1.0])
    for i, (x, z) in enumerate(pts):
        s1 = (z + 8.0) / 16.0          # along v (z)
        s2 = (x + 8.0) / 16.0          # along u (x)
        parity = (int(np.floor(s1 * 4)) + int(np.floor(s2 * 4))) % 2
        expect = c2 if parity else c1
        np.testing.assert_allclose(lj[i], expect, rtol=1e-4,
                                   err_msg=f"cell ({x}, {z})")
    # Both albedos appear (the pattern actually alternates).
    assert len(np.unique(lj.round(6), axis=0)) == 2


def test_backends_agree_on_checker():
    dev = upload_scene(_mirror_checker_floor())
    r = np.random.default_rng(5)
    pts = [(x, z) for x, z in r.uniform(-7.9, 7.9, (64, 2))]
    o, d = _down_rays(pts)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=3, jitter=0.0)
    lj = _first_bounce_light(dev, o, d, cfg)
    lp = _first_bounce_light(dev, o, d, cfg, backend="pallas")
    lb = _first_bounce_light(dev, o, d, cfg, backend="bvh")
    np.testing.assert_allclose(lp, lj, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(lb, lj)
    # The random probes land in both cell colors.
    assert len(np.unique(lj.round(6), axis=0)) == 2


def test_world_checker_on_sphere():
    """kind 2 on a MIRROR sphere: the tint reads the world-space cell
    of the hit point; rays a unit apart in x land in adjacent cells and
    read different albedos. Mirror paths are deterministic, so pallas
    must agree."""
    # One distant inert quad (scene upload needs >= 1 plane for the BVH).
    sc = Scene(
        origin=np.array([[500.0, 500.0, 500.0]], np.float32),
        v=np.array([[1, 0, 0]], np.float32),
        u=np.array([[0, 1, 0]], np.float32),
        color=np.zeros((1, 3), np.float32),
        is_mirror=np.zeros(1, bool),
        emission=np.zeros((1, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
        sph_center=np.array([[0, 0, 0]], np.float32),
        sph_radius=np.array([2.0], np.float32),
        sph_color=np.array([[1, 1, 0]], np.float32),
        sph_is_mirror=np.array([True]),
        sph_tex_kind=np.array([2], np.uint8),
        sph_tex_scale=np.array([1.0], np.float32),
        sph_tex_color2=np.array([[0, 1, 1]], np.float32),
    )
    dev = upload_scene(sc)
    assert dev.tex is not None and dev.sph_tex is not None
    # Rays travelling -y from y = 5 hit the sphere's +y side. Hit
    # points: (0.5, +1.936, 0.25) and (1.5, +1.299, 0.25) — world cells
    # floor(x)+floor(y)+floor(z) = 0+1+0 (odd) vs 1+1+0 (even).
    pts = np.array([[0.5, 5.0, 0.25], [1.5, 5.0, 0.25]], np.float32)
    o = jnp.asarray(pts)
    d = jnp.asarray(np.tile([[0.0, -1.0, 0.0]], (2, 1)).astype(np.float32))
    cfg = TracerConfig(bounce_limit=1, mirror_limit=3, jitter=0.0)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    np.testing.assert_allclose(lj[0], 0.005 * np.array([0, 1, 1]),
                               rtol=1e-3)
    np.testing.assert_allclose(lj[1], 0.005 * np.array([1, 1, 0]),
                               rtol=1e-3)
    lp = np.asarray(
        trace_paths_pallas(dev.plane_table, o, d, jnp.int32(3), cfg,
                           rows_per_block=1, tables=dev.mxu_tables)
    )
    np.testing.assert_allclose(lp, lj, rtol=1e-4, atol=1e-6)


def test_checker_modulates_mirror_tint_and_glass():
    """The textured albedo feeds the mirror tint and the glass tint,
    not just diffuse attenuation."""
    # Mirror checkered floor: tint = albedo * mirror_tint on reflect.
    sc = _checker_floor_scene()
    sc = dataclasses.replace(
        sc, is_mirror=np.array([True, False]),
        emission=np.zeros((2, 4), np.float32),
    )
    dev = upload_scene(sc)
    o, d = _down_rays([(-6.0, -6.0), (-2.0, -6.0)])  # adjacent cells
    cfg = TracerConfig(bounce_limit=1, mirror_limit=3, jitter=0.0)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    np.testing.assert_allclose(lj[0], 0.005 * np.array([1.0, 0.2, 0.2]),
                               rtol=1e-4)
    np.testing.assert_allclose(lj[1], 0.005 * np.array([0.2, 0.2, 1.0]),
                               rtol=1e-4)
    lp = np.asarray(
        trace_paths_pallas(dev.plane_table, o, d, jnp.int32(1), cfg,
                           rows_per_block=1, tables=dev.mxu_tables)
    )
    np.testing.assert_allclose(lp, lj, rtol=1e-4, atol=1e-6)

    # Glass checkered pane in front of a white emissive wall: the
    # transmitted tint alternates with the cell.
    big = 40.0
    sc2 = Scene(
        origin=np.array(
            [[-big / 2, -big / 2, 5.0], [-big / 2, -big / 2, 10.0]],
            np.float32,
        ),
        v=np.array([[0, big, 0], [big, 0, 0]], np.float32),
        u=np.array([[big, 0, 0], [0, big, 0]], np.float32),
        color=np.array([[1.0, 0.2, 0.2], [1, 1, 1]], np.float32),
        is_mirror=np.zeros(2, bool),
        emission=np.array([[0, 0, 0, 0], [1, 1, 1, 2]], np.float32),
        grid=np.zeros((1, 1), np.uint8),
        ior=np.array([1.5, 0.0], np.float32),
        tex_kind=np.array([2, 0], np.uint8),      # world checker
        tex_scale=np.array([1.0, 1.0], np.float32),
        tex_color2=np.array([[0.2, 0.2, 1.0], [0, 0, 0]], np.float32),
    )
    dv2 = upload_scene(sc2)
    o2 = jnp.asarray(np.array([[0.5, 0.5, 0.0], [1.5, 0.5, 0.0]],
                              np.float32))
    d2 = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (2, 1)).astype(np.float32))
    # bounce_limit 1: the ray dies at its wall pickup, keeping the
    # glass path deterministic for the cross-backend comparison.
    cfg2 = TracerConfig(bounce_limit=1, mirror_limit=3, fresnel=False,
                        jitter=0.0)
    lg = np.asarray(trace_paths(dv2, o2, d2, KEY, cfg2))
    # Hit points (0.5, 0.5, 5) / (1.5, 0.5, 5): parities 5 vs 6.
    np.testing.assert_allclose(lg[0], 2.0 * np.array([0.2, 0.2, 1.0]),
                               rtol=1e-4)
    np.testing.assert_allclose(lg[1], 2.0 * np.array([1.0, 0.2, 0.2]),
                               rtol=1e-4)
    lp2 = np.asarray(
        trace_paths_pallas(dv2.plane_table, o2, d2, jnp.int32(1), cfg2,
                           rows_per_block=1, tables=dv2.mxu_tables)
    )
    np.testing.assert_allclose(lp2, lg, rtol=1e-4, atol=1e-6)


def test_untextured_scenes_stay_static():
    """Generated mazes: DeviceScene.tex is None, props blocks stay 32
    rows, and the traced image is bit-identical to pre-texture."""
    dev = upload_scene(build_scene(MazeConfig(width=4, height=4)))
    assert dev.tex is None and dev.sph_tex is None
    for g in dev.mxu_tables:
        if g is not None:
            assert g[1].shape[1] == 32


def test_texture_io_and_merge_roundtrip(tmp_path):
    sc = _checker_floor_scene()
    p = str(tmp_path / "checker.npz")
    save_scene(p, sc)
    back = load_scene(p)
    np.testing.assert_array_equal(back.tex_kind, sc.tex_kind)
    np.testing.assert_array_equal(back.tex_scale, sc.tex_scale)
    np.testing.assert_array_equal(back.tex_color2, sc.tex_color2)
    merged = merge_scenes(sc, build_scene(MazeConfig(width=4, height=4)))
    assert np.count_nonzero(merged.tex_kind) == 1
    # Pre-texture archives load untextured.
    with np.load(p) as z:
        stripped = {k: z[k] for k in z.files if not k.startswith("tex")}
    np.savez_compressed(p, **stripped)
    assert np.all(load_scene(p).tex_kind == 0)


def test_texture_validation():
    base = dict(
        origin=np.zeros((1, 3), np.float32),
        v=np.array([[1, 0, 0]], np.float32),
        u=np.array([[0, 1, 0]], np.float32),
        color=np.ones((1, 3), np.float32),
        is_mirror=np.zeros(1, bool),
        emission=np.zeros((1, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    with pytest.raises(ValueError, match="tex_kind"):
        Scene(**base, tex_kind=np.array([3], np.uint8))
    with pytest.raises(ValueError, match="tex_scale"):
        Scene(**base, tex_kind=np.array([1], np.uint8),
              tex_scale=np.array([0.0], np.float32))
    with pytest.raises(ValueError, match="sph_tex_kind"):
        Scene(**base,
              sph_center=np.zeros((1, 3), np.float32),
              sph_radius=np.ones(1, np.float32),
              sph_tex_kind=np.array([1], np.uint8))
