"""Golden-image regression tests (SURVEY.md section 4).

The world is deterministic at seed 0 (the reference's
StdRng::seed_from_u64(0), `main.rs:381`), the RNG streams are
counter-based, and CI runs on the CPU backend — so full renders and
scripted engine runs are reproducible and diffed against committed
goldens. Regenerate with tests/_golden_tools.py helpers if a change
intentionally alters output (and say so in the commit message).
"""

import os

import numpy as np
import pytest

from _golden_tools import render_golden_frame, run_golden_script

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    with np.load(os.path.join(GOLDEN_DIR, name)) as z:
        return z["img"]


@pytest.mark.parametrize("backend", ["brute", "pallas"])
@pytest.mark.slow
def test_full_frame_matches_golden(backend):
    img = render_golden_frame(backend)
    ref = _load(f"frame_{backend}.npz")
    # Float renders: allow tiny cross-version numeric drift, no structure
    # change (>99.9% of pixels within 2e-3).
    close = np.isclose(img, ref, atol=2e-3).mean()
    assert close > 0.999, f"golden mismatch: {close:.4f} of pixels close"
    np.testing.assert_allclose(img.mean(), ref.mean(), atol=1e-4)


@pytest.mark.parametrize("backend", ["brute", "pallas"])
def test_scripted_run_matches_golden(backend):
    img = run_golden_script(backend)
    ref = _load(f"script_{backend}.npz")
    assert img.dtype == ref.dtype == np.uint8
    # 8-bit quantized screen: allow 1 LSB on a handful of pixels.
    diff = np.abs(img.astype(int) - ref.astype(int))
    assert (diff <= 1).mean() > 0.999
    assert diff.max() <= 4
