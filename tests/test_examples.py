"""examples/ must stay runnable — they are the documented custom-scene
entry point (docs/API.md "Custom scenes", README examples section).

The Cornell box is also a numerics fixture: its albedos and rotated-block
normals are not bf16-exact, unlike the generated maze's axis-aligned
geometry, so it exercises value paths the maze goldens cannot
(PERF.md "hardware numerics on arbitrary scenes").
"""

import importlib.util
import os

import jax
import numpy as np
import pytest

from mirror_maze_tpu.config import CameraConfig, EngineConfig, ScreenConfig


def _load_example(name):
    path = os.path.join(
        os.path.dirname(__file__), os.pardir, "examples", name
    )
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _render(scene, intersector, spp=16, size=48):
    from mirror_maze_tpu.render import (
        make_camera, render_full_frame, upload_scene,
    )

    cfg = EngineConfig(
        camera=CameraConfig(spawn=(0.0, -3.0, -10.0), look_dir=(0, 0, 1)),
        screen=ScreenConfig(width=size, height=size, samples_per_pixel=spp),
        intersector=intersector,
    )
    cam = make_camera(cfg.camera, 1.0)
    return np.asarray(
        render_full_frame(upload_scene(scene), cam, jax.random.PRNGKey(0),
                          cfg, rows_per_batch=size)
    )


@pytest.fixture(scope="module")
def cornell():
    return _load_example("cornell_box.py")


@pytest.fixture(scope="module")
def cornell_scene(cornell):
    return cornell.build_cornell_box()


def test_cornell_box_is_a_valid_closed_scene(cornell_scene, tmp_path):
    s = cornell_scene
    assert s.num_planes == 17
    assert s.derived().valid.all()
    assert bool(s.is_mirror.any()) and not bool(s.is_mirror.all())
    assert float(s.emission[:, 3].max()) > 0  # has a light
    # The example's --save-scene path round-trips bit-exactly.
    from mirror_maze_tpu.scene import load_scene, save_scene

    p = str(tmp_path / "cornell.npz")
    save_scene(p, s)
    s2 = load_scene(p)
    for f in ("origin", "v", "u", "color", "is_mirror", "emission", "kind"):
        np.testing.assert_array_equal(getattr(s, f), getattr(s2, f))


@pytest.mark.slow
@pytest.mark.slow
def test_cornell_box_renders_on_every_backend(cornell_scene):
    """Closed room -> every primary ray hits; red wall left, green wall
    right; bvh must equal brute bitwise (same tracer, same keys) and the
    pallas kernel (own RNG) must agree in global statistics."""
    brute = _render(cornell_scene, "brute")
    assert np.isfinite(brute).all()
    # Closed, lit room: nearly everywhere non-black (a path tracer at
    # 16 spp still leaves a few pixels where no sample found the light).
    assert (brute.sum(-1) > 0).mean() > 0.9
    left, right = brute[12:40, :10], brute[12:40, -10:]
    assert left[..., 0].mean() > 1.5 * left[..., 1].mean()    # red wall
    # Green's Cornell albedo (0.45) is dimmer than red's (0.63) and the
    # sqrt tone map compresses ratios; 1.3 is a solid margin (meas 1.42).
    assert right[..., 1].mean() > 1.3 * right[..., 0].mean()  # green wall

    bvh = _render(cornell_scene, "bvh")
    np.testing.assert_array_equal(brute, bvh)

    pallas = _render(cornell_scene, "pallas")
    assert abs(pallas.mean() - brute.mean()) < 0.15 * brute.mean()
    pl, pr = pallas[12:40, :10], pallas[12:40, -10:]
    assert pl[..., 0].mean() > 1.5 * pl[..., 1].mean()
    assert pr[..., 1].mean() > 1.3 * pr[..., 0].mean()


def test_cornell_mirror_block_actually_reflects(cornell, cornell_scene):
    """The tall block is the showcase mirror: flipping its material to
    diffuse (same geometry, same RNG keys) must change the rendered
    image most where the block stands."""
    import dataclasses

    matte = dataclasses.replace(
        cornell_scene,
        is_mirror=np.zeros_like(cornell_scene.is_mirror),
        kind=cornell_scene.kind,
    )
    a = _render(cornell_scene, "brute")
    b = _render(matte, "brute")
    diff = np.abs(a - b).mean(-1)
    # Block region (camera at (0,-3,-10), block at x=-2 back-left) vs a
    # far control strip: the material flip moves the block's own pixels
    # much more than the indirect-light/noise floor elsewhere.
    assert diff[12:40, 8:22].mean() > 2.5 * diff[:8, 28:].mean() + 0.01


@pytest.mark.slow
def test_cornell_sphere_variant_renders_on_every_backend(cornell):
    """The two-sphere Cornell variant: a mirror sphere and a diffuse
    sphere resting on the floor. Closed room, so every backend's light
    is finite; the spheres must visibly occupy the image (their pixels
    differ from the sphere-free room), and bvh equals brute bitwise."""
    room = cornell.build_cornell_box()          # for geometry reuse only
    spheres = cornell.build_cornell_box("spheres")
    assert spheres.num_spheres == 2
    assert spheres.num_planes == room.num_planes - 10  # blocks removed

    # More spp than the blocks test: the sphere variant has more
    # shadowed floor (the mirror sphere occludes the light panel over a
    # bigger solid angle than the tall block) so low-spp pixels are
    # often all-miss; measured 66% non-black at 16 spp, ~85% at 64.
    brute = _render(spheres, "brute", spp=64)
    assert np.isfinite(brute).all()
    assert (brute.sum(-1) > 0).mean() > 0.75
    bvh = _render(spheres, "bvh", spp=64)
    np.testing.assert_array_equal(brute, bvh)
    pallas = _render(spheres, "pallas", spp=64)
    assert abs(pallas.mean() - brute.mean()) < 0.15 * brute.mean()

    # Spheres actually change the image where they stand (vs the empty
    # room = same shell, no blocks, no spheres).
    import dataclasses

    empty = dataclasses.replace(
        spheres,
        sph_center=np.zeros((0, 3), np.float32),
        sph_radius=np.zeros(0, np.float32),
        sph_color=np.zeros((0, 3), np.float32),
        sph_is_mirror=np.zeros(0, bool),
        sph_emission=np.zeros((0, 4), np.float32),
        sph_ior=np.zeros(0, np.float32),
    )
    diff = np.abs(brute - _render(empty, "brute", spp=64)).mean(-1)
    # Sphere footprints (camera at (0,-3,-10)): mirror sphere back-left,
    # diffuse sphere front-front-right. Control is the GLOBAL mean diff:
    # removing the spheres shifts indirect light (and therefore Monte
    # Carlo noise) everywhere, so a fixed far-region control is itself
    # noisy; the footprints must stand out above the scene-wide change
    # (measured: mirror 0.083 / diffuse 0.068 vs global 0.042).
    assert diff[20:44, 6:24].mean() > 1.5 * diff.mean()
    assert diff[26:47, 26:44].mean() > 1.25 * diff.mean()
