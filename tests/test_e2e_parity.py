"""End-to-end growing + global refinement vs COMMITTED reference outputs.

tests/golden/tiny/m0_{rg,var}.flo are the rebuilt reference binaries'
outputs (local_faldoi + global_faldoi, method 0, default params) on the
48x64 clean/easy crop with the cached DeepMatching seeds — captured once by
scripts/run_parity.py (see its docstring for the rebuild recipe).  This test
asserts the production-config pipeline stays within the parity gate WITHOUT
needing the binaries, so CI catches growing/solver regressions.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from faldoi_tpu.io import read_flo
from faldoi_tpu.io.image import read_image_split
from faldoi_tpu.core.preprocess import prepare_pair
from faldoi_tpu.core.match_growing import match_growing
from faldoi_tpu.core.global_step import tvl2_global
from faldoi_tpu import params as P

BASE = "/root/reference/example_data/clean/easy/"
GOLD = "tests/golden/"
SL = np.s_[150:198, 300:364]  # run_parity.py "tiny"


def _epe(a, b):
    fin = np.isfinite(a[..., 0]) & np.isfinite(b[..., 0])
    return float(np.hypot(a[..., 0] - b[..., 0],
                          a[..., 1] - b[..., 1])[fin].mean())


@pytest.fixture(scope="module")
def pipeline_out():
    i0 = read_image_split(BASE + "frame_0002.png")[:, SL[0], SL[1]]
    i1 = read_image_split(BASE + "frame_0003.png")[:, SL[0], SL[1]]
    go = read_flo(GOLD + "deep_mt_1.flo")[SL[0], SL[1]]
    ba = read_flo(GOLD + "deep_mt_2.flo")[SL[0], SL[1]]
    a, b = prepare_pair(i0, i1)
    prm = P.Parameters()
    prm.val_method = P.M_TVL1
    prm.iterations_of = P.LOCAL_ITER
    prm.epsilon = P.FB_TOL
    rg, _, _ = match_growing(go, ba, a, b, prm, bsz=256, mode="fused")
    u1, u2 = tvl2_global(a, b, jnp.nan_to_num(jnp.asarray(rg[..., 0])),
                         jnp.nan_to_num(jnp.asarray(rg[..., 1])))
    var = np.stack([np.asarray(u1), np.asarray(u2)], axis=-1)
    return rg, var


def test_var_matches_reference_binaries(pipeline_out):
    _, var = pipeline_out
    ref = read_flo(GOLD + "tiny/m0_var.flo")
    assert _epe(var, ref) <= 0.05, "final var EPE vs reference binaries"


def test_rg_close_to_reference_binaries(pipeline_out):
    rg, _ = pipeline_out
    ref = read_flo(GOLD + "tiny/m0_rg.flo")
    # rg-level gate: wavefront-vs-serial ordering still costs ~0.1 px at
    # this crop (PARITY.md "Known deviations"); this bound catches
    # regressions while the ordering work continues
    assert _epe(rg, ref) <= 0.15, "rg EPE vs reference binaries"


def test_growing_fills_every_pixel(pipeline_out):
    """Property from SURVEY §4: the growing must fill 100% of pixels (the
    reference's local_growing drains the queue until every pixel pops)."""
    rg, _ = pipeline_out
    assert np.isfinite(rg).all(), "unfilled pixels in the growing output"
