"""Triangle primitives and meshes across every backend.

The reference's only primitive is the quad (`shaders.metal:51-67`);
triangles (Scene.kind == 3) are this framework's extension making
arbitrary meshes first-class: the jnp brute/BVH intersectors switch to
the barycentric acceptance per primitive, the Pallas kernel runs
kind-3 rows as its mode-4 MXU group, and scene/mesh.py builds Scenes
from vertex/face arrays, a procedural icosphere, and OBJ files. These
tests pin the acceptance geometry (against an independent
Möller–Trumbore oracle), cross-backend exactness, the multi-tile
triangle path, IO round-trips, and the mesh builders.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mirror_maze_tpu.config import TracerConfig
from mirror_maze_tpu.render.intersect import (
    nearest_hit_brute,
    nearest_hit_bvh,
)
from mirror_maze_tpu.render.pallas_tracer import trace_paths_pallas
from mirror_maze_tpu.render.scenebuf import upload_scene
from mirror_maze_tpu.render.tracer import trace_paths
from mirror_maze_tpu.scene.builder import Scene
from mirror_maze_tpu.scene.mesh import (
    icosphere,
    load_obj,
    merge_scenes,
    mesh_scene,
    save_obj,
    transform_vertices,
)

KEY = jax.random.PRNGKey(0)


def _tri_scene(r, n_tris, span=8.0, edge=4.0, mirror_frac=0.0,
               emissive_frac=0.5, kind=3):
    """Random free-floating triangle soup (open world)."""
    n = n_tris
    em = np.concatenate(
        [r.uniform(0, 1, (n, 3)),
         (r.random((n, 1)) < emissive_frac) * r.uniform(0, 2, (n, 1))],
        axis=1,
    ).astype(np.float32)
    return Scene(
        origin=r.uniform(-span, span, (n, 3)).astype(np.float32),
        v=(r.normal(size=(n, 3)) * edge).astype(np.float32),
        u=(r.normal(size=(n, 3)) * edge).astype(np.float32),
        color=r.uniform(0, 1, (n, 3)).astype(np.float32),
        is_mirror=r.random(n) < mirror_frac,
        emission=em,
        grid=np.zeros((1, 1), np.uint8),
        kind=np.full(n, kind, np.uint8),
    )


def _rays_at_bary(r, scene, n, lo=0.05, hi=0.9):
    """Rays from random origins through random interior barycentric
    points of random triangles (margin >= lo from every edge)."""
    k = scene.num_planes
    pick = r.integers(0, k, n)
    a = r.uniform(lo, hi, n)
    b = r.uniform(lo, 1.0, n) * (hi - a)
    b = np.maximum(b, lo)
    tgt = (scene.origin[pick]
           + a[:, None] * scene.v[pick]
           + b[:, None] * scene.u[pick])
    o = r.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def _moller_trumbore_nearest(o, d, v0, e1, e2, t_min=0.1):
    """Independent float64 oracle: nearest triangle hit per ray."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    best_t = np.full(o.shape[0], np.inf)
    best_i = np.full(o.shape[0], -1)
    margin = np.full(o.shape[0], np.inf)
    for i in range(v0.shape[0]):
        h = np.cross(d, e2[i])
        a = np.einsum("j,rj->r", e1[i], h)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 1.0 / a
            s = o - v0[i]
            u = f * np.einsum("rj,rj->r", s, h)
            q = np.cross(s, e1[i])
            v = f * np.einsum("rj,rj->r", d, q)
            t = f * np.einsum("j,rj->r", e2[i], q)
        ok = (
            (a != 0.0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
        )
        m = np.where(ok, np.minimum(np.minimum(u, v), 1 - u - v), np.inf)
        closer = ok & (t < best_t)
        # Track the winning hit's distance-to-edge margin and how close
        # the runner-up t is, to filter numerically fragile rays.
        margin = np.where(closer, m, margin)
        best_i = np.where(closer, i, best_i)
        best_t = np.where(closer, t, best_t)
    return best_t, best_i, margin


def test_triangle_cuts_quad_along_diagonal():
    """The same (origin, u, v) as kind 0 accepts the full parallelogram;
    as kind 3 only the s1 + s2 <= 1 half."""
    base = dict(
        origin=np.array([[-1.0, -1.0, 5.0]], np.float32),
        v=np.array([[2.0, 0.0, 0.0]], np.float32),
        u=np.array([[0.0, 2.0, 0.0]], np.float32),
        color=np.full((1, 3), 0.5, np.float32),
        is_mirror=np.zeros(1, bool),
        emission=np.zeros((1, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
    )
    tri = upload_scene(Scene(kind=np.array([3], np.uint8), **base))
    quad = upload_scene(Scene(**base))
    # (s1, s2) targets: both-low (in tri), both-high (in quad only).
    o = jnp.asarray([[-0.4, -0.4, 0.0], [0.4, 0.4, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    tt, _ = nearest_hit_brute(tri, o, d, 0.1)
    tq, _ = nearest_hit_brute(quad, o, d, 0.1)
    assert float(tt[0]) == pytest.approx(5.0) and float(tt[1]) > 1e29
    assert float(tq[0]) == pytest.approx(5.0)
    assert float(tq[1]) == pytest.approx(5.0)


def test_brute_matches_moller_trumbore_oracle():
    r = np.random.default_rng(10)
    scene = _tri_scene(r, 40)
    dev = upload_scene(scene)
    o, d = _rays_at_bary(r, scene, 512)
    t32, i32 = jax.jit(lambda o, d: nearest_hit_brute(dev, o, d, 0.1))(o, d)
    t64, i64, margin = _moller_trumbore_nearest(
        o, d, scene.origin, scene.v, scene.u
    )
    # Filter rays whose winning hit sits near an edge (f32-vs-f64
    # decisions may legitimately differ there).
    solid = (margin > 1e-3) & np.isfinite(t64)
    assert solid.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(i32)[solid], i64[solid])
    np.testing.assert_allclose(
        np.asarray(t32)[solid], t64[solid], rtol=1e-4
    )
    # And misses agree: rays the oracle misses, brute must miss.
    none = ~np.isfinite(t64) & (margin > 1e-3)
    assert np.all(np.asarray(t32)[none] > 1e29)


def test_bvh_matches_brute_on_mesh():
    from mirror_maze_tpu.scene.bvh import traversal_bounds

    verts, faces = icosphere(subdivisions=1, radius=2.0,
                             center=(0.0, 0.0, 6.0))
    scene = mesh_scene(verts, faces, color=(0.6, 0.4, 0.2))
    dev = upload_scene(scene)
    r = np.random.default_rng(11)
    o = jnp.asarray(r.uniform(-10, 10, (256, 3)).astype(np.float32))
    tgt = r.uniform(-2, 2, (256, 3)) + np.array([0, 0, 6.0])
    d = tgt - np.asarray(o)
    d = jnp.asarray((d / np.linalg.norm(d, axis=-1, keepdims=True))
                    .astype(np.float32))
    md, ml = traversal_bounds(
        np.asarray(dev.bvh_left_first), np.asarray(dev.bvh_count)
    )
    tb, ib = jax.jit(lambda o, d: nearest_hit_brute(dev, o, d, 0.1))(o, d)
    tv, iv = nearest_hit_bvh(dev, o, d, 0.1, max_depth=md, max_leaf=ml)
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(iv))
    np.testing.assert_allclose(np.asarray(tb), np.asarray(tv),
                               rtol=1e-5, atol=0)
    assert (np.asarray(tb) < 1e29).mean() > 0.5  # rays actually hit


@pytest.mark.slow
def test_pallas_matches_jnp_on_triangles():
    """Deterministic segment over a mixed mirror/diffuse triangle soup:
    the mode-4 group must match the jnp tracer under the interpreter."""
    r = np.random.default_rng(12)
    scene = _tri_scene(r, 30, mirror_frac=0.4)
    dev = upload_scene(scene)
    assert dev.mxu_tables[4] is not None
    assert all(dev.mxu_tables[m] is None for m in (0, 1, 2, 3))
    o, d = _rays_at_bary(r, scene, 259)  # odd: exercises padding
    for limit in (1, 3):
        cfg = TracerConfig(bounce_limit=1, mirror_limit=limit)
        lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
        lp = np.asarray(trace_paths_pallas(
            dev.plane_table, o, d, jnp.int32(7), cfg, rows_per_block=2,
            tables=dev.mxu_tables,
        ))
        np.testing.assert_allclose(lj, lp, rtol=1e-5, atol=1e-7)


def test_multitile_triangle_group_matches_jnp():
    """> PLANE_TILE triangles: the mode-4 group spans >= 2 tiles, so
    the per-tile AABB skip (with the tighter 3-corner triangle boxes)
    and cross-tile merge run over triangle tiles."""
    r = np.random.default_rng(13)
    scene = _tri_scene(r, 150, span=20.0, edge=2.0)
    dev = upload_scene(scene)
    assert dev.mxu_tables[4] is not None
    assert dev.mxu_tables[4][2].shape[0] >= 2
    o, d = _rays_at_bary(r, scene, 256)
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


def test_quads_triangles_spheres_mix():
    """merge_scenes: one scene carrying all three primitive classes
    traces consistently — the merged brute nearest equals the min over
    the parts' own nearests."""
    r = np.random.default_rng(14)
    quads = _tri_scene(r, 8, kind=0)
    tris = _tri_scene(r, 8, kind=3)
    spheres = Scene(
        origin=np.zeros((0, 3), np.float32),
        v=np.zeros((0, 3), np.float32),
        u=np.zeros((0, 3), np.float32),
        color=np.zeros((0, 3), np.float32),
        is_mirror=np.zeros(0, bool),
        emission=np.zeros((0, 4), np.float32),
        grid=np.zeros((1, 1), np.uint8),
        sph_center=r.uniform(-6, 6, (5, 3)).astype(np.float32),
        sph_radius=r.uniform(0.5, 1.5, 5).astype(np.float32),
        sph_color=r.uniform(0, 1, (5, 3)).astype(np.float32),
        sph_is_mirror=np.zeros(5, bool),
        sph_emission=np.zeros((5, 4), np.float32),
    )
    merged = merge_scenes(quads, tris, spheres)
    assert merged.num_planes == 16 and merged.num_spheres == 5
    dev = upload_scene(merged)
    o = jnp.asarray(r.uniform(-10, 10, (128, 3)).astype(np.float32))
    d = r.normal(size=(128, 3))
    d = jnp.asarray((d / np.linalg.norm(d, axis=-1, keepdims=True))
                    .astype(np.float32))
    tm, _ = jax.jit(lambda o, d: nearest_hit_brute(dev, o, d, 0.1))(o, d)
    from mirror_maze_tpu.render.intersect import sphere_ts

    parts = [upload_scene(s) for s in (quads, tris)]
    per_part = [
        jax.jit(lambda o, d, s=s: nearest_hit_brute(s, o, d, 0.1))(o, d)[0]
        for s in parts
    ] + [jax.jit(lambda o, d: sphere_ts(dev, o, d, 0.1).min(-1))(o, d)]
    tp = jnp.stack(per_part).min(axis=0)
    # Merged-vs-parts graphs fuse FMAs differently (ulp-level t drift).
    np.testing.assert_allclose(np.asarray(tm), np.asarray(tp),
                               rtol=1e-5, atol=0)
    # The pallas table carries both a quad and a triangle group.
    assert dev.mxu_tables[0] is not None and dev.mxu_tables[4] is not None


def test_icosphere_geometry():
    for sub in (0, 1, 2):
        verts, faces = icosphere(sub, radius=3.0, center=(1.0, -2.0, 5.0))
        assert faces.shape == (20 * 4 ** sub, 3)
        assert verts.shape == (10 * 4 ** sub + 2, 3)
        rad = np.linalg.norm(verts - np.array([1.0, -2.0, 5.0]), axis=1)
        np.testing.assert_allclose(rad, 3.0, rtol=1e-5)
        # Outward counterclockwise winding: every face normal
        # cross(v1-v0, v2-v0) points away from the center.
        v0, v1, v2 = (verts[faces[:, k]] for k in range(3))
        n = np.cross(v1 - v0, v2 - v0)
        centroid = (v0 + v1 + v2) / 3 - np.array([1.0, -2.0, 5.0])
        assert np.all(np.einsum("ij,ij->i", n, centroid) > 0)
        # And the engine normal (cross(v, u) in Scene terms) agrees.
        s = mesh_scene(verts, faces)
        eng_n = np.cross(s.v, s.u)
        assert np.all(np.einsum("ij,ij->i", eng_n, centroid) > 0)


def test_obj_roundtrip_and_polygon_fan(tmp_path):
    verts, faces = icosphere(1, radius=1.5)
    p = str(tmp_path / "ico.obj")
    save_obj(p, verts, faces)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, verts, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)

    # Hand-written file: quads fan-triangulated, v/vt/vn tokens and
    # negative indices parsed, y negated with winding preserved.
    p3 = str(tmp_path / "quad.obj")
    with open(p3, "w") as fh:
        fh.write("# comment\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                 "vn 0 0 1\nf 1/1/1 2/2/1 3/3/1 4/4/1\n"
                 "f -4 -2 -3\n")
    v3, f3 = load_obj(p3, y_down=False)
    assert v3.shape == (4, 3)
    np.testing.assert_array_equal(
        f3, [[0, 1, 2], [0, 2, 3], [0, 2, 1]]
    )
    # y_down: same mesh, mirrored y, swapped winding — outward normals
    # (here +z for the ccw quad) stay outward.
    v4, f4 = load_obj(p3)
    s4 = mesh_scene(v4, f4[:2])
    n4 = np.cross(s4.v, s4.u)
    assert np.all(n4[:, 2] > 0)


def test_mesh_scene_io_roundtrip(tmp_path):
    from mirror_maze_tpu.scene.io import load_scene, save_scene

    verts, faces = icosphere(1)
    scene = mesh_scene(verts, faces, color=(0.2, 0.3, 0.4),
                       is_mirror=True, emission=(1, 1, 1, 0.5))
    p = str(tmp_path / "mesh.npz")
    save_scene(p, scene)
    back = load_scene(p)
    np.testing.assert_array_equal(back.kind, scene.kind)
    assert np.all(back.kind == 3)
    np.testing.assert_array_equal(back.origin, scene.origin)
    np.testing.assert_array_equal(back.is_mirror, scene.is_mirror)


def test_mesh_scene_validation_and_transform():
    verts, faces = icosphere(0)
    with pytest.raises(ValueError):
        mesh_scene(verts, np.array([[0, 1, 99]]))
    with pytest.raises(ValueError):
        mesh_scene(verts.reshape(-1), faces)
    # Per-face materials broadcast.
    s = mesh_scene(verts, faces,
                   color=np.tile([[1.0, 0.0, 0.0]], (20, 1)),
                   is_mirror=np.arange(20) % 2 == 0)
    assert s.color.shape == (20, 3) and s.is_mirror.sum() == 10
    # transform: scale then yaw then translate, winding preserved.
    v2 = transform_vertices(verts, scale=2.0, rotate_y_deg=90.0,
                            translate=(5.0, 0.0, 0.0))
    np.testing.assert_allclose(
        np.linalg.norm(v2 - np.array([5.0, 0.0, 0.0]), axis=1),
        2.0, rtol=1e-6,
    )


def test_degenerate_triangles_are_ignored():
    """Zero-area faces (repeated vertices) are marked invalid and hit
    nothing, on brute and pallas alike."""
    verts = np.array([[0, 0, 5], [2, 0, 5], [0, 2, 5]], np.float32)
    faces = np.array([[0, 1, 2], [0, 0, 1], [2, 2, 2]])
    dev = upload_scene(mesh_scene(verts, faces))
    o = jnp.asarray([[0.4, 0.4, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, i = nearest_hit_brute(dev, o, d, 0.1)
    assert float(t[0]) == pytest.approx(5.0) and int(i[0]) == 0
    cfg = TracerConfig(bounce_limit=1, mirror_limit=1)
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(3), cfg, rows_per_block=1,
        tables=dev.mxu_tables,
    ))
    np.testing.assert_allclose(lj, lp, rtol=1e-5, atol=1e-7)
