"""Warm drain requeue (FALDOI_GROW_WARM_BAND) vs the cold full re-grow.

The warm requeue (core.match_growing._warm_requeue) keeps trusted pixels
far from any pruned hole fixed across outer iterations instead of
re-solving them; this pins that the chunked-mode output stays close to the
cold (reference-semantics) drain and inside the golden rg gate.
"""

import numpy as np
import pytest

from faldoi_tpu.io import read_flo
from faldoi_tpu.io.image import read_image_split
from faldoi_tpu.core.preprocess import prepare_pair
from faldoi_tpu.core.match_growing import match_growing
from faldoi_tpu import params as P

BASE = "/root/reference/example_data/clean/easy/"
GOLD = "tests/golden/"
SL = np.s_[150:198, 300:364]  # the tiny e2e crop (test_e2e_parity)


def _epe(a, b):
    fin = np.isfinite(a[..., 0]) & np.isfinite(b[..., 0])
    return float(np.hypot(a[..., 0] - b[..., 0],
                          a[..., 1] - b[..., 1])[fin].mean())


def _grow(monkeypatch, warm_band):
    monkeypatch.setenv("FALDOI_GROW_WARM_BAND", str(warm_band))
    i0 = read_image_split(BASE + "frame_0002.png")[:, SL[0], SL[1]]
    i1 = read_image_split(BASE + "frame_0003.png")[:, SL[0], SL[1]]
    go = read_flo(GOLD + "deep_mt_1.flo")[SL[0], SL[1]]
    ba = read_flo(GOLD + "deep_mt_2.flo")[SL[0], SL[1]]
    a, b = prepare_pair(i0, i1)
    prm = P.Parameters()
    prm.val_method = P.M_TVL1
    prm.iterations_of = P.LOCAL_ITER
    prm.epsilon = P.FB_TOL
    rg, _, _ = match_growing(go, ba, a, b, prm, bsz=256, mode="chunked")
    return rg


@pytest.mark.slow
def test_warm_matches_cold_chunked(monkeypatch):
    cold = _grow(monkeypatch, 0)
    warm = _grow(monkeypatch, 8)
    # warm is NOT identical to cold: the kept far field skips the drains'
    # re-polish (the cold path re-solves every patch each outer iteration,
    # nudging flows slightly).  Measured drift at this crop is ~0.064 px
    # (full-scale: rg 0.46 -> 0.52 at band 10); the gate pins it stays a
    # drift, not a divergence.
    assert _epe(warm, cold) <= 0.12, "warm vs cold drain rg EPE"
    ref = read_flo(GOLD + "tiny/m0_rg.flo")
    assert _epe(warm, ref) <= 0.15, "warm drain rg vs reference binaries"


@pytest.mark.slow
def test_warm_plus_polish_within_golden_gate(monkeypatch):
    """A polish pass (FALDOI_GROW_POLISH) after warm drains restores part of
    the skipped re-solve: measured tiny-crop rg vs the reference binaries is
    0.096 (warm-only 0.120, cold 0.073).  Gate generously to pin the
    mechanism works without anchoring run-to-run noise."""
    monkeypatch.setenv("FALDOI_GROW_POLISH", "1")
    warm = _grow(monkeypatch, 10)
    ref = read_flo(GOLD + "tiny/m0_rg.flo")
    assert _epe(warm, ref) <= 0.12, "warm+polish rg vs reference binaries"
