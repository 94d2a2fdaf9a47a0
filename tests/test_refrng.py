"""Validation of the rand-0.8-compatible RNG (utils/refrng.py) and the
literal seed-0 world parity it enables (MazeConfig.rng="reference").

The stream layers are pinned by PUBLISHED vectors, innermost out:
  1. the RFC 8439 quarter-round test vector;
  2. the classic ChaCha20 zero-key/zero-nonce keystream (djb + RFC 8439
     agree on block 0);
  3. draft-strombergson-chacha-test-vectors TC1 for ChaCha12 (all-zero
     256-bit key) — the exact core rand 0.8's StdRng runs;
  4. rand's own StdRng value-stability target (rand/src/rngs/std.rs
     test_stdrng_construction) — pins from_seed layout, word order, and
     next_u64 composition end-to-end against the Rust crate itself.

On top of that, draw-semantics tests (gen::<f32> scaling, Lemire
rejection zones, Fisher-Yates order) and a golden of the seed-0 world
the reference app builds (`/root/reference/src/main.rs:356-588`).
"""

import hashlib

import numpy as np
import pytest

from mirror_maze_tpu.config import MazeConfig
from mirror_maze_tpu.scene import build_scene
from mirror_maze_tpu.utils.refrng import (
    ChaChaRng,
    StdRng08,
    _SIGMA,
    _quarter_round,
    chacha_block,
    seed_from_u64,
)


def test_rfc8439_quarter_round():
    s = [0] * 16
    s[0], s[1], s[2], s[3] = 0x11111111, 0x01020304, 0x9B8D6F43, 0x01234567
    _quarter_round(s, 0, 1, 2, 3)
    assert s[:4] == [0xEA2A92F4, 0xCB1CF8CE, 0x4581472E, 0x5881C4BB]


def _keystream_hex(rounds: int, blocks: int = 1) -> str:
    out = b""
    for ctr in range(blocks):
        state = [*_SIGMA] + [0] * 8 + [ctr, 0, 0, 0]
        out += b"".join(w.to_bytes(4, "little")
                        for w in chacha_block(state, rounds))
    return out.hex()


def test_chacha20_zero_key_keystream():
    # The canonical ChaCha20 zero-key/zero-nonce block-0 keystream.
    assert _keystream_hex(20).startswith(
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7"
    )


def test_chacha12_zero_key_keystream():
    # draft-strombergson-chacha-test-vectors TC1, 12 rounds, 256-bit key.
    assert _keystream_hex(12).startswith(
        "9bf49a6a0755f953811fce125f2683d5"
    )


def test_rand_stdrng_value_stability():
    # rand 0.8's own test_stdrng_construction target: StdRng::from_seed
    # with this seed yields next_u64() == 10719222850664546238.
    seed = bytes([1, 0, 0, 0, 23, 0, 0, 0, 200, 1, 0, 0, 210, 30, 0, 0]
                 + [0] * 16)
    assert StdRng08(seed).next_u64() == 10719222850664546238


def test_keystream_continues_across_blocks():
    # Words 16.. come from counter-1 blocks; the serial walk must match
    # rand_chacha's buffered-4-blocks-emitted-sequentially stream.
    rng = ChaChaRng(bytes(32), rounds=12)
    ks = b"".join(rng.next_u32().to_bytes(4, "little") for _ in range(32))
    assert ks.hex() == _keystream_hex(12, blocks=2)


def test_seed_from_u64_expansion_properties():
    # PCG expansion: deterministic, seed-sensitive, not the raw input.
    a, b = seed_from_u64(0), seed_from_u64(1)
    assert len(a) == 32 and a != b and a != bytes(32)
    assert seed_from_u64(0) == a
    # Wrapping: u64 arithmetic, so 2^64 == 0.
    assert seed_from_u64(1 << 64) == a


def test_gen_f32_is_top_24_bits():
    rng = StdRng08.seed_from_u64(0)
    peek = StdRng08.seed_from_u64(0)
    for _ in range(100):
        u = peek.next_u32()
        f = rng.gen_f32()
        assert f == (u >> 8) / 16777216.0
        assert 0.0 <= f < 1.0
        # Exact in f32 (24-bit numerator, power-of-two denominator).
        assert float(np.float32(f)) == f


def test_gen_range_bounds_and_determinism():
    rng = StdRng08.seed_from_u64(7)
    vals = [rng.gen_range_u32(n) for n in range(1, 200)]
    assert all(0 <= v < n for v, n in zip(vals, range(1, 200)))
    rng2 = StdRng08.seed_from_u64(7)
    assert vals == [rng2.gen_range_u32(n) for n in range(1, 200)]


def test_gen_range_lemire_zone_rejection():
    # For ubound = 3, zone = (3 << 30) - 1; a draw v is rejected iff
    # (v * 3) & 0xffffffff > zone. Replay the raw stream and check the
    # accept/reject walk matches gen_range's consumption exactly.
    raw = StdRng08.seed_from_u64(3)
    rng = StdRng08.seed_from_u64(3)
    zone = ((3 << 30) - 1) & 0xFFFFFFFF
    for _ in range(50):
        want = rng.gen_range_u32(3)
        while True:
            v = raw.next_u32()
            m = v * 3
            if (m & 0xFFFFFFFF) <= zone:
                assert m >> 32 == want
                break


def test_shuffle_is_fisher_yates_from_the_back():
    # Replay the index draws and apply the documented swap order by hand.
    n = 20
    rng = StdRng08.seed_from_u64(11)
    xs = list(range(n))
    rng.shuffle(xs)
    replay = StdRng08.seed_from_u64(11)
    ys = list(range(n))
    for i in range(n - 1, 0, -1):
        j = replay.gen_range_u32(i + 1)
        ys[i], ys[j] = ys[j], ys[i]
    assert xs == ys
    assert sorted(xs) == list(range(n))


# ---------------------------------------------------------------------------
# The literal seed-0 world (golden).
# ---------------------------------------------------------------------------

# The reference's cell-opening bitmask grid at StdRng::seed_from_u64(0)
# (`main.rs:356-396`; bit 1 = open up, 2 = down, 4 = left, 8 = right),
# as generated by the validated stream above.
SEED0_GRID = [
    [8, 12, 6, 2, 2, 8, 14, 4, 10, 6],
    [2, 8, 13, 7, 3, 2, 11, 12, 7, 1],
    [3, 2, 2, 9, 13, 15, 7, 8, 5, 2],
    [11, 13, 7, 8, 12, 7, 11, 14, 14, 5],
    [3, 10, 15, 12, 12, 5, 3, 3, 11, 6],
    [3, 3, 9, 4, 8, 12, 7, 1, 3, 1],
    [1, 9, 12, 14, 6, 10, 7, 10, 15, 6],
    [10, 12, 12, 7, 3, 1, 1, 3, 1, 1],
    [3, 8, 14, 5, 1, 2, 8, 7, 10, 6],
    [1, 8, 13, 12, 12, 5, 8, 13, 5, 1],
]

SEED0_WORLD_SHA256 = (
    "835634dcae357bf1b5f146f6ceab319dd2b1494f78f2266c14d6135f77b234d2"
)


def test_seed0_reference_world_golden():
    s = build_scene(MazeConfig(rng="reference"))
    assert s.grid.tolist() == SEED0_GRID
    assert s.num_planes == 84
    # Mirror walls and light panels the reference rolls at seed 0.
    assert np.nonzero(s.is_mirror)[0].tolist() == [5, 26, 39, 75]
    lights = np.nonzero(s.emission[:, 3] == 2.0)[0].tolist()
    assert lights == [4, 6, 8, 11, 13, 16, 20, 28, 32, 37, 41, 47, 55,
                      60, 63, 65, 68, 70, 82]
    h = hashlib.sha256()
    for a in (s.origin, s.v, s.u, s.color, s.is_mirror, s.emission,
              s.kind, s.grid):
        h.update(np.ascontiguousarray(a).tobytes())
    assert h.hexdigest() == SEED0_WORLD_SHA256


def test_maze_spanning_tree_property_reference_stream():
    # Kruskal must knock down exactly n_cells - 1 edges: each opened edge
    # sets one bit in each adjacent cell.
    g = np.array(SEED0_GRID, dtype=np.uint8)
    popcount = np.unpackbits(g[..., None], axis=-1).sum()
    assert popcount == 2 * (10 * 10 - 1)


def test_reference_rng_differs_from_numpy_and_is_deterministic():
    ref = build_scene(MazeConfig(rng="reference"))
    npy = build_scene(MazeConfig())
    assert not np.array_equal(ref.grid, npy.grid)
    again = build_scene(MazeConfig(rng="reference"))
    assert np.array_equal(ref.origin, again.origin)
    assert np.array_equal(ref.grid, again.grid)


def test_reference_threshold_uses_f32_literal_semantics():
    # 1.0 - 0.10 in f64 is one 2^-24 step ABOVE the reference's 0.90f32
    # literal; the roll must compare against the f32 value.
    assert float(np.float32(1.0 - 0.10)) != 1.0 - 0.10
    # A gen_f32 landing exactly on f32(0.9) must be a MIRROR roll
    # (reference: diffuse iff gen < 0.90f32).
    thresh = float(np.float32(0.9))
    assert not (thresh < thresh)


def test_rng_config_validation():
    with pytest.raises(ValueError):
        MazeConfig(rng="chacha")
