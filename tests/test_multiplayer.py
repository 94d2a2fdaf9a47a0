"""Multiplayer building blocks (parallel/multiplayer.py), single-process:
avatar scene surgery, dynamic sphere updates through the jitted step, and
avatar visibility. The full 2-process DCN exchange is driven by
tests/test_multihost.py::test_two_player_multiplayer.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import (
    CameraConfig,
    EngineConfig,
    MazeConfig,
    ScreenConfig,
    TracerConfig,
)
from mirror_maze_tpu.parallel.multiplayer import (
    PARK,
    avatar_scene,
    make_multiplayer_engine,
    update_avatars,
)
from mirror_maze_tpu.render import upload_scene
from mirror_maze_tpu.runtime.state import FrameInputs, init_state
from mirror_maze_tpu.runtime.step import make_step_fn
from mirror_maze_tpu.scene import build_scene


def _cfg(intersector="brute"):
    return EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        tracer=TracerConfig(bounce_limit=2, mirror_limit=2),
        screen=ScreenConfig(width=48, height=48, samples_per_pixel=2,
                            chunks_per_frame=144),  # full repaint each frame
        intersector=intersector,
    )


def test_avatar_scene_appends_parked_spheres_with_player_colors():
    s = build_scene(MazeConfig(width=4, height=4))
    s2, slots = avatar_scene(s, n_players=3, me=1)
    assert slots == [s.num_spheres, s.num_spheres + 1]
    assert s2.num_spheres == s.num_spheres + 2
    assert np.all(np.asarray(s2.sph_center)[slots] == PARK)
    # me=1 is skipped: avatars carry player 0's and player 2's colors.
    from mirror_maze_tpu.parallel.multiplayer import PLAYER_COLORS

    np.testing.assert_allclose(np.asarray(s2.sph_color)[slots[0]],
                               PLAYER_COLORS[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.sph_color)[slots[1]],
                               PLAYER_COLORS[2], atol=1e-6)


def test_update_avatars_moves_centers_and_c2r2():
    s = build_scene(MazeConfig(width=4, height=4))
    s2, slots = avatar_scene(s, n_players=2, me=0, radius=1.5)
    dev = upload_scene(s2)
    target = jnp.asarray([[1.0, 0.0, -2.0]], jnp.float32)
    dev2 = update_avatars(dev, slots, target)
    np.testing.assert_array_equal(np.asarray(dev2.sph_center)[slots[0]],
                                  np.asarray(target)[0])
    want = float(1.0 + 4.0 - 1.5 ** 2)
    assert abs(float(np.asarray(dev2.sph_c2r2)[slots[0]]) - want) < 1e-5
    # Non-avatar fields untouched.
    np.testing.assert_array_equal(np.asarray(dev2.sph_radius),
                                  np.asarray(dev.sph_radius))


def test_avatar_becomes_visible_through_the_jitted_step():
    """Moving an avatar in front of the camera changes the rendered
    frame through the SAME jitted step (scene is an argument — no
    recompile), and parking it restores the avatar-free image."""
    import jax

    cfg = _cfg()
    s, slots = avatar_scene(build_scene(cfg.maze), n_players=2, me=0)
    dev = upload_scene(s)
    step = jax.jit(make_step_fn(cfg, 32, 4))

    def frame_with(centers):
        dev2 = update_avatars(dev, slots, jnp.asarray(centers, jnp.float32))
        st = init_state(cfg, seed=0)
        st, f = step(dev2, st, FrameInputs.idle())
        return np.asarray(f)

    parked = frame_with([[PARK, PARK, PARK]])
    # Spawn (-5, 0, -15) looks along ~+z: park vs in-view must differ.
    visible = frame_with([[-5.0, 0.0, -10.0]])
    assert not np.array_equal(parked, visible)
    again = frame_with([[PARK, PARK, PARK]])
    np.testing.assert_array_equal(parked, again)


def test_bf16_round_trip_matches_ml_dtypes_bitwise():
    """The traced bf16 rounding is integer bit ops (XLA folds a plain
    astype up-down chain to the IDENTITY on TPU — measured, round 4);
    it must equal ml_dtypes RNE bitwise on every finite input class."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from mirror_maze_tpu.render.pallas_tracer import _bf16_round_trip

    r = np.random.default_rng(0)
    with np.errstate(over="ignore"):  # the 1e38 class is MEANT to test
        x = np.concatenate([       # rounding at the overflow boundary
            r.standard_normal(1 << 16).astype(np.float32),
            (r.standard_normal(4096) * 1e-40).astype(np.float32),
            (r.standard_normal(4096) * 1e38).astype(np.float32),
            # Exact ties around the 16-bit cut.
            np.float32(1.0)
            + np.arange(256, dtype=np.float32) * np.float32(2 ** -8),
            np.array([0.0, -0.0, 1e6, -1e6, 0.2, 0.3, 2.0 / 3],
                     np.float32),
        ])
    with np.errstate(over="ignore"):  # 1e38 class overflows to inf
        host = _bf16_round_trip(np, x)
        np.testing.assert_array_equal(
            host, x.astype(ml_dtypes.bfloat16).astype(np.float32)
        )
    dev = np.asarray(jax.jit(lambda v: _bf16_round_trip(jnp, v))(x))
    np.testing.assert_array_equal(host, dev)


@pytest.mark.parametrize("textured", [False, True])
@pytest.mark.parametrize("s", [1, 3, 9])
def test_pack_sphere_group_jnp_matches_host_bitwise(s, textured):
    """The in-jit sphere-group packer must produce BITWISE the operands
    the host packer built at upload — that identity is what lets the
    refresh path slot into a compiled program without changing any
    golden (shared _sphere_group_ops implementation)."""
    import jax

    from mirror_maze_tpu.render.pallas_tracer import (
        SPHERE_WIDTH,
        _pack_sphere_group,
        pack_sphere_group_jnp,
    )

    rng = np.random.default_rng(s * 7 + textured)
    t = rng.standard_normal((s, SPHERE_WIDTH)).astype(np.float32)
    t[:, 3] = np.abs(t[:, 3]) + 0.5          # inv_r > 0
    t[:, 13] = rng.integers(0, 3, s)          # tex kinds
    host = _pack_sphere_group(t, textured=textured)
    twin = jax.jit(
        lambda x: pack_sphere_group_jnp(x, textured=textured)
    )(jnp.asarray(t))
    for h, j, name in zip(host, twin, ("W", "propsT", "aabbs")):
        np.testing.assert_array_equal(
            np.asarray(h), np.asarray(j), err_msg=name
        )


def test_sphere_refresh_is_identity_on_unmoved_scene():
    """make_sphere_refresh on an untouched uploaded scene reproduces the
    uploaded mxu_tables exactly (opaque AND glass groups)."""
    import dataclasses as dc

    import jax

    from mirror_maze_tpu.render.scenebuf import make_sphere_refresh

    s, slots = avatar_scene(build_scene(MazeConfig(width=4, height=4)),
                            n_players=3, me=0)
    # Make one avatar glass so the mode-5 group exists too.
    ior = np.asarray(s.sph_ior).copy()
    ior[slots[1]] = 1.5
    s = dc.replace(s, sph_ior=ior)
    dev = upload_scene(s)
    refresh = make_sphere_refresh(dev)
    out = jax.jit(refresh)(dev)
    for mode in (3, 5):
        assert dev.mxu_tables[mode] is not None
        for h, j, name in zip(dev.mxu_tables[mode], out.mxu_tables[mode],
                              ("W", "propsT", "aabbs")):
            np.testing.assert_array_equal(
                np.asarray(h), np.asarray(j), err_msg=f"mode{mode}:{name}"
            )


def test_avatar_becomes_visible_through_the_pallas_kernel():
    """The flagship path: avatar centers flow through the in-jit sphere
    repack into the pallas kernel (interpret on CPU) — moving the
    avatar changes the frame on the SAME jitted step, parking restores
    the avatar-free image bit-exactly."""
    import jax

    from mirror_maze_tpu.render.scenebuf import make_sphere_refresh

    cfg = _cfg(intersector="pallas")
    s, slots = avatar_scene(build_scene(cfg.maze), n_players=2, me=0)
    dev = upload_scene(s)
    refresh = make_sphere_refresh(dev)
    base = make_step_fn(cfg, 32, 4)
    step = jax.jit(lambda d, st, inp: base(refresh(d), st, inp))

    def frame_with(centers):
        dev2 = update_avatars(dev, slots, jnp.asarray(centers, jnp.float32))
        st = init_state(cfg, seed=0)
        st, f = step(dev2, st, FrameInputs.idle())
        return np.asarray(f)

    parked = frame_with([[PARK, PARK, PARK]])
    visible = frame_with([[-5.0, 0.0, -10.0]])
    assert not np.array_equal(parked, visible)
    again = frame_with([[PARK, PARK, PARK]])
    np.testing.assert_array_equal(parked, again)


def test_multiplayer_engine_accepts_pallas():
    """mesh of one player, flagship backend: the engine builds and runs
    (refresh is skipped with no avatars — sphere-free scene)."""
    import jax
    from jax.sharding import Mesh

    cfg = _cfg(intersector="pallas")
    mesh = Mesh(np.array(jax.devices()[:1]), ("player",))
    dev, init_fn, step_fn = make_multiplayer_engine(cfg, mesh, me=0)
    st = init_fn(seed=0)
    st, frame = step_fn(st, FrameInputs.make(w=True))
    assert np.isfinite(np.asarray(frame, np.float32)).all()


def test_multiplayer_engine_takes_noise_texture():
    """--noise-png must reach the multiplayer upload (it was silently
    dropped when the CLI pre-uploaded and discarded the scene)."""
    import jax
    from jax.sharding import Mesh

    from mirror_maze_tpu.parallel.multiplayer import make_multiplayer_engine

    cfg = _cfg()
    noise = np.random.default_rng(3).random((64, 64)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("player",))
    dev, _, _ = make_multiplayer_engine(cfg, mesh, me=0, noise=noise)
    np.testing.assert_array_equal(np.asarray(dev.noise), noise)


def test_single_player_engine_runs():
    """mesh of one player: no avatars, the engine is the plain step."""
    import jax
    from jax.sharding import Mesh

    cfg = _cfg()
    mesh = Mesh(np.array(jax.devices()[:1]), ("player",))
    dev, init_fn, step_fn = make_multiplayer_engine(cfg, mesh, me=0)
    st = init_fn(seed=0)
    for _ in range(2):
        st, frame = step_fn(st, FrameInputs.make(w=True))
    assert np.isfinite(np.asarray(frame, np.float32)).all()
    assert np.asarray(st.cam_center)[2] > -15.0  # walked forward
