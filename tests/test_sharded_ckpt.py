"""Sharded checkpoint/resume (parallel/shard.py): bit-exact same-layout
round-trips plus conversions between the tile-sharded and single-chip
state layouts.

The reference has no checkpointing at all (SURVEY.md section 5); the
single-chip .npz round-trip is covered in tests/test_noise_ckpt.py. Here:
a sharded session must save/resume bit-exactly on the same mesh, a
sharded checkpoint must resume single-chip (band-concat screen is the
identity, queues interleave), and a single-chip checkpoint must resume
sharded (queues re-split per band).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import (
    CameraConfig,
    EngineConfig,
    MazeConfig,
    ScreenConfig,
)
from mirror_maze_tpu.parallel.shard import (
    ShardedEngineState,
    load_sharded_state,
    make_mesh,
    make_sharded_engine,
    sharded_to_single,
    single_to_sharded,
)
from mirror_maze_tpu.render import upload_scene
from mirror_maze_tpu.runtime.state import (
    FrameInputs,
    init_state,
    load_state,
    save_state,
)
from mirror_maze_tpu.runtime.step import make_step
from mirror_maze_tpu.scene import build_scene

N_TILE = 4


@pytest.fixture(scope="module")
def cfg() -> EngineConfig:
    return EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=32, height=16 * N_TILE,
                            samples_per_pixel=2,
                            chunks_per_frame=4 * N_TILE),
        intersector="brute",
    )


@pytest.fixture(scope="module")
def scene(cfg):
    return upload_scene(build_scene(cfg.maze))


@pytest.fixture(scope="module")
def engine(cfg):
    mesh = make_mesh(1, N_TILE)
    return make_sharded_engine(cfg, mesh)


def _walk(step_fn, scene, st, n, turn_at=None):
    for i in range(n):
        inp = (FrameInputs.make(mouse_dx=7.0) if i == turn_at
               else FrameInputs.make(w=True))
        st, frame = step_fn(scene, st, inp)
    return st, frame


def _assert_states_equal(a, b):
    for f, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=f)


@pytest.mark.slow
def test_sharded_roundtrip_bit_exact_and_resumes(cfg, scene, engine, tmp_path):
    init_fn, step_fn = engine
    st, _ = _walk(step_fn, scene, init_fn(seed=0), 6, turn_at=3)

    path = str(tmp_path / "sharded.npz")
    save_state(path, st)
    st2 = load_sharded_state(path, cfg, N_TILE)
    _assert_states_equal(st, st2)

    # Resuming must continue the run bit-exactly: K more frames from the
    # live state and from the reloaded one agree everywhere.
    cont_a, frame_a = _walk(step_fn, scene, st, 5)
    cont_b, frame_b = _walk(step_fn, scene, st2, 5)
    _assert_states_equal(cont_a, cont_b)
    np.testing.assert_array_equal(np.asarray(frame_a), np.asarray(frame_b))


@pytest.mark.slow
def test_sharded_to_single_preserves_screen_camera_and_popsets(cfg, scene, engine):
    init_fn, step_fn = engine
    st, _ = _walk(step_fn, scene, init_fn(seed=0), 7, turn_at=2)

    single = sharded_to_single(st, cfg)
    # Exact fields.
    np.testing.assert_array_equal(np.asarray(single.screen), np.asarray(st.screen))
    np.testing.assert_array_equal(np.asarray(single.cam_center), np.asarray(st.cam_center))
    np.testing.assert_array_equal(np.asarray(single.quat), np.asarray(st.quat))
    assert int(single.frame) == int(st.frame)
    # The global queue is a permutation of all chunk ids.
    assert sorted(np.asarray(single.perm).tolist()) == list(
        range(cfg.screen.total_chunks)
    )
    # The next single-chip window (cpf ids from cursor 0) refreshes
    # exactly the union of the bands' next windows.
    c_band = cfg.screen.total_chunks // N_TILE
    k = cfg.screen.effective_chunks_per_frame // N_TILE
    perm = np.asarray(st.perm).reshape(N_TILE, c_band)
    cursor = np.asarray(st.cursor)
    band_next = set()
    for t in range(N_TILE):
        rolled = np.roll(perm[t], -int(cursor[t]))
        band_next |= {t * c_band + int(i) for i in rolled[:k]}
    single_next = set(
        np.asarray(single.perm)[: cfg.screen.effective_chunks_per_frame].tolist()
    )
    assert single_next == band_next
    # And the converted state drives the single-chip engine.
    step1 = make_step(scene, cfg)
    nxt, frame = step1(single, FrameInputs.idle())
    assert np.asarray(frame).shape == (cfg.screen.height, cfg.screen.width, 3)
    assert int(nxt.frame) == int(st.frame) + 1


@pytest.mark.slow
def test_single_to_sharded_preserves_screen_and_band_queues(cfg, scene, engine):
    st = init_state(cfg, seed=3)
    step1 = make_step(scene, cfg)
    for i in range(5):
        st, _ = step1(st, FrameInputs.make(w=True))

    sh = single_to_sharded(st, cfg, N_TILE)
    np.testing.assert_array_equal(np.asarray(sh.screen), np.asarray(st.screen))
    np.testing.assert_array_equal(np.asarray(sh.cam_center), np.asarray(st.cam_center))
    c_band = cfg.screen.total_chunks // N_TILE
    perm = np.asarray(sh.perm).reshape(N_TILE, c_band)
    for t in range(N_TILE):
        assert sorted(perm[t].tolist()) == list(range(c_band))
    # Band keys are distinct streams.
    keys = np.asarray(sh.key)
    assert len({tuple(k) for k in keys}) == N_TILE
    # The sharded engine steps from the converted state.
    init_fn, step_fn = engine
    nxt, frame = step_fn(scene, sh, FrameInputs.idle())
    assert np.asarray(frame).shape == (cfg.screen.height, cfg.screen.width, 3)
    assert int(nxt.frame) == int(st.frame) + 1


@pytest.mark.slow
def test_cross_layout_checkpoint_loading(cfg, scene, engine, tmp_path):
    init_fn, step_fn = engine
    st, _ = _walk(step_fn, scene, init_fn(seed=0), 4)
    sharded_path = str(tmp_path / "from_sharded.npz")
    save_state(sharded_path, st)

    # Sharded checkpoint -> single-chip load_state converts.
    single = load_state(sharded_path, cfg)
    np.testing.assert_array_equal(np.asarray(single.screen), np.asarray(st.screen))
    assert single.cursor.ndim == 0 and single.key.shape == (2,)

    # Single checkpoint -> sharded load converts.
    single_path = str(tmp_path / "from_single.npz")
    save_state(single_path, init_state(cfg, seed=1))
    sh = load_sharded_state(single_path, cfg, N_TILE)
    assert sh.cursor.shape == (N_TILE,) and sh.key.shape == (N_TILE, 2)

    # Sharded checkpoint at a DIFFERENT band count converts through the
    # single-chip layout (n=2 divides this config's chunk rows).
    sh2 = load_sharded_state(sharded_path, cfg, 2)
    assert sh2.cursor.shape == (2,)
    np.testing.assert_array_equal(np.asarray(sh2.screen), np.asarray(st.screen))


def test_sharded_checkpoint_without_cfg_raises(cfg, engine, scene, tmp_path):
    init_fn, _ = engine
    st = init_fn(seed=0)
    path = str(tmp_path / "s.npz")
    save_state(path, st)
    with pytest.raises(ValueError, match="tile-sharded"):
        load_state(path)


def test_sharded_checkpoint_shape_validation(cfg, engine, tmp_path):
    init_fn, _ = engine
    st = init_fn(seed=0)
    path = str(tmp_path / "s.npz")
    save_state(path, st)
    import dataclasses

    bad = dataclasses.replace(
        cfg, screen=dataclasses.replace(cfg.screen, width=64)
    )
    with pytest.raises(ValueError, match="screen shape"):
        load_sharded_state(path, bad, N_TILE)
