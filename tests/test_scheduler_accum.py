"""Chunk scheduler (`main.rs:293-326`) and screen accumulation/blur
(`shaders.metal:214-225`) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import ScreenConfig
from mirror_maze_tpu.render.accumulate import (
    feedback_blur,
    quantize_8bit,
    scatter_chunks,
    to_display,
)
from mirror_maze_tpu.render.scheduler import (
    chunk_origin_xy,
    chunk_pixels,
    init_permutation,
    sort_window_morton,
    take_chunks,
)

CFG = ScreenConfig(width=32, height=16, chunk_width=4, chunks_per_frame=8)


def test_permutation_covers_all_chunks():
    perm = init_permutation(jax.random.PRNGKey(0), CFG)
    assert perm.shape == (CFG.total_chunks,)
    assert sorted(np.asarray(perm).tolist()) == list(range(CFG.total_chunks))


def test_take_chunks_walks_and_wraps():
    perm = jnp.arange(CFG.total_chunks, dtype=jnp.int32)
    cursor = jnp.int32(0)
    seen = []
    for _ in range(CFG.total_chunks // 8):
        ids, cursor = take_chunks(perm, cursor, 8)
        seen.extend(np.asarray(ids).tolist())
    assert sorted(seen) == list(range(CFG.total_chunks))
    assert int(cursor) == 0  # wrapped exactly
    # epoch 2 repeats the same order (the reference refills from the same
    # shuffled master list, `main.rs:319-323`)
    ids2, cursor = take_chunks(perm, cursor, 8)
    assert np.array_equal(np.asarray(ids2), np.arange(8))


def test_take_chunks_straddles_epoch():
    perm = jnp.arange(10, dtype=jnp.int32)
    ids, cursor = take_chunks(perm, jnp.int32(7), 6)
    assert np.asarray(ids).tolist() == [7, 8, 9, 0, 1, 2]
    assert int(cursor) == 3


def test_chunk_decode_and_pixel_expansion():
    ids = jnp.array([0, 1, CFG.chunks_x], jnp.int32)
    org = np.asarray(chunk_origin_xy(ids, CFG))
    assert org.tolist() == [[0, 0], [4, 0], [0, 4]]
    pix = np.asarray(chunk_pixels(chunk_origin_xy(ids[:1], CFG), 4))
    assert pix.shape == (16, 2)
    # reference order: pixel_number/chunk -> x offset, %chunk -> y offset
    assert pix[0].tolist() == [0, 0]
    assert pix[1].tolist() == [0, 1]
    assert pix[4].tolist() == [1, 0]
    assert sorted(map(tuple, pix.tolist())) == [
        (x, y) for x in range(4) for y in range(4)
    ]


def test_sort_window_morton_preserves_set_and_coheres():
    big = ScreenConfig(width=512, height=512, chunk_width=4)
    perm = init_permutation(jax.random.PRNGKey(3), big)
    ids, _ = take_chunks(perm, jnp.int32(0), 256)
    out = sort_window_morton(ids, big)
    # Same chunk set — only the order changes.
    assert sorted(np.asarray(out).tolist()) == sorted(np.asarray(ids).tolist())

    def mean_adjacent_dist(v):
        xy = np.asarray(chunk_origin_xy(v, big), np.float64)
        return np.abs(np.diff(xy, axis=0)).sum(axis=1).mean()

    # Morton order makes consecutive window entries near-neighbors on
    # screen (what keeps wide tracer blocks coherent for the tile skip).
    assert mean_adjacent_dist(out) < 0.25 * mean_adjacent_dist(ids)


def test_sort_window_morton_exact_zorder():
    # On a full 4x4 chunk grid the Morton order is the textbook Z curve.
    grid = ScreenConfig(width=16, height=16, chunk_width=4)
    ids = jnp.arange(16, dtype=jnp.int32)  # row-major chunk ids
    out = np.asarray(sort_window_morton(ids, grid)).tolist()
    assert out == [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15]


def test_scatter_chunks_writes_pixels():
    screen = jnp.zeros((16, 32, 3))
    pix = jnp.array([[0, 0], [31, 15], [5, 7]], jnp.int32)
    cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    out = np.asarray(scatter_chunks(screen, pix, cols))
    assert out[0, 0].tolist() == [1, 0, 0]
    assert out[15, 31].tolist() == [0, 1, 0]
    assert out[7, 5].tolist() == [0, 0, 1]
    assert out.sum() == 3.0


def test_feedback_blur_closed_form():
    """out = (c + (l+r)/2 + (u+d)/2) / 3 with edge clamp."""
    img = np.zeros((5, 5, 3), np.float32)
    img[2, 2] = 3.0
    out = np.asarray(feedback_blur(jnp.asarray(img)))
    assert out[2, 2, 0] == np.float32(1.0)          # 3/3
    assert out[2, 1, 0] == np.float32(0.5)          # (0 + 3/2 + 0)/3
    assert out[1, 2, 0] == np.float32(0.5)
    assert out[1, 1, 0] == 0.0
    # total mass is conserved in the interior (kernel sums to 1)
    assert abs(out.sum() - img.sum()) < 1e-5


def test_feedback_blur_uniform_fixed_point():
    img = jnp.full((8, 8, 3), 0.25)
    out = np.asarray(feedback_blur(img))
    np.testing.assert_allclose(out, 0.25, rtol=1e-6)


def test_quantize_and_display():
    img = jnp.array([[[0.5, -0.2, 1.7]]])
    q = np.asarray(quantize_8bit(img))
    np.testing.assert_allclose(q, [[[128 / 255, 0.0, 1.0]]], rtol=1e-6)
    d = np.asarray(to_display(img))
    assert d.dtype == np.uint8
    assert d.tolist() == [[[128, 0, 255]]]


def test_oversized_chunk_window_rejected():
    """chunks_per_frame > total_chunks would make the doubled-permutation
    window repeat chunks, invalidating the scatter's unique_indices
    declaration (undefined results) — ScreenConfig must refuse it."""
    import pytest

    from mirror_maze_tpu.config import ScreenConfig

    ScreenConfig(width=32, height=32, chunks_per_frame=64)  # == total: ok
    with pytest.raises(ValueError):
        ScreenConfig(width=32, height=32, chunks_per_frame=65)


def test_chunk_major_scatter_equals_spatial_scatter():
    """The chunk-major screen (scatter_chunk_rows + cm_to_spatial) must be
    a pure RELAYOUT of the spatial pixel scatter: same pixels, same
    values, bit-exact — the 16x cheaper refresh path cannot be
    image-affecting."""
    from mirror_maze_tpu.render.accumulate import (
        cm_to_spatial,
        scatter_chunk_rows,
        spatial_to_cm,
    )

    cfg = ScreenConfig(width=32, height=16, chunk_width=4)
    rng = np.random.default_rng(3)
    k = 5
    ids = jnp.asarray(rng.permutation(cfg.total_chunks)[:k].astype(np.int32))
    pix = chunk_pixels(chunk_origin_xy(ids, cfg), cfg.chunk_width)
    cols = jnp.asarray(rng.random((k * 16, 3), np.float32))

    base_sp = jnp.asarray(rng.random((16, 32, 3), np.float32))
    spatial = np.asarray(scatter_chunks(base_sp, pix, cols))

    base_cm = spatial_to_cm(base_sp, cfg)
    cm = scatter_chunk_rows(base_cm, ids, cols)
    np.testing.assert_array_equal(np.asarray(cm_to_spatial(cm, cfg)), spatial)

    # The layout pair is a bijection.
    np.testing.assert_array_equal(
        np.asarray(cm_to_spatial(spatial_to_cm(base_sp, cfg), cfg)),
        np.asarray(base_sp),
    )


# --- adaptive epoch reorder (ScreenConfig.adaptive_refresh) -----------------


def test_adaptive_reorder_noop_mid_epoch():
    from mirror_maze_tpu.render.scheduler import adaptive_reorder

    perm = jnp.asarray(np.random.default_rng(0).permutation(64).astype(np.int32))
    rows = jnp.asarray(np.random.default_rng(1).random((64, 48)).astype(np.float32))
    out = adaptive_reorder(perm, jnp.int32(8), jnp.int32(16), rows)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(perm))


def test_adaptive_reorder_puts_highest_variance_first_at_wrap():
    from mirror_maze_tpu.render.scheduler import adaptive_reorder

    c = 64
    perm = jnp.asarray(np.random.default_rng(0).permutation(c).astype(np.int32))
    rows = np.zeros((c, 48), np.float32)
    rows[17] = np.tile([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], 8)  # max-variance luma
    rows[3] = 0.3                                           # flat: zero variance
    cursor, cursor_next = jnp.int32(60), jnp.int32(4)       # wrapped
    out = np.asarray(adaptive_reorder(perm, cursor, cursor_next,
                                      jnp.asarray(rows)))
    assert sorted(out.tolist()) == list(range(c))           # still a permutation
    # Highest-variance chunk sits AT the cursor (rolled), so the new
    # epoch's first window refreshes it first.
    assert out[4] == 17


@pytest.mark.slow
def test_adaptive_engine_preserves_epoch_coverage():
    """With adaptive_refresh on, every epoch still refreshes every chunk
    exactly once (the 64-frame-repaint guarantee survives; only the
    order adapts)."""
    from mirror_maze_tpu.config import (
        CameraConfig,
        EngineConfig,
        MazeConfig,
        ScreenConfig,
    )
    from mirror_maze_tpu.render import upload_scene
    from mirror_maze_tpu.runtime.state import FrameInputs, init_state
    from mirror_maze_tpu.runtime.step import make_step
    from mirror_maze_tpu.scene import build_scene

    cfg = EngineConfig(
        maze=MazeConfig(width=4, height=4),
        camera=CameraConfig(spawn=(-5.0, 0.0, -15.0)),
        screen=ScreenConfig(width=32, height=32, samples_per_pixel=1,
                            chunks_per_frame=16, adaptive_refresh=True),
        intersector="brute",
    )
    dev = upload_scene(build_scene(cfg.maze))
    step = make_step(dev, cfg)
    st = init_state(cfg, seed=0)
    total = cfg.screen.total_chunks  # 64 chunks, 4 per epoch-frame... 16/frame
    frames_per_epoch = total // 16
    # Warm two epochs so the adaptive order is active, then check the
    # third epoch's coverage.
    for _ in range(2 * frames_per_epoch):
        st, _ = step(st, FrameInputs.idle())
    seen = []
    for _ in range(frames_per_epoch):
        perm = np.asarray(st.perm)
        cursor = int(st.cursor)
        seen.extend(perm[np.arange(cursor, cursor + 16) % total].tolist())
        st, _ = step(st, FrameInputs.idle())
    assert sorted(seen) == list(range(total))


def test_adaptive_flag_off_is_default_and_harmless():
    from mirror_maze_tpu.config import ScreenConfig

    assert ScreenConfig().adaptive_refresh is False
