"""Morton (Z-order) codes — the ONE bit-interleave used everywhere.

Two independent orderings in the engine are Morton curves and must stay
definitionally identical: the chunk-window sort (render/scheduler.py —
keeps tracer blocks screen-coherent) and the plane-tile clustering
(render/pallas_tracer.py — keeps per-tile AABBs tight for the
conservative skip). Both previously hand-copied the same magic-constant
spread; this module is the single source so they cannot drift.
"""

from __future__ import annotations


def morton2(x, y):
    """Interleave two <=16-bit unsigned coordinate ARRAYS into Morton
    codes, staying in the inputs' dtype. Works on numpy and jax.numpy
    arrays alike (any unsigned dtype with >=32 bits)."""

    def spread(v):  # 16 -> 32-bit bit-interleave
        m = v.dtype.type
        v = v & m(0xFFFF)
        v = (v | (v << m(8))) & m(0x00FF00FF)
        v = (v | (v << m(4))) & m(0x0F0F0F0F)
        v = (v | (v << m(2))) & m(0x33333333)
        v = (v | (v << m(1))) & m(0x55555555)
        return v

    return spread(x) | (spread(y) << y.dtype.type(1))
