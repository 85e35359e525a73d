"""Parity of the non-default global functionals vs the reference binary.

The goldens ``tests/golden/var_m{2,4,6}.flo`` were produced by the rebuilt
reference ``global_faldoi`` (``global_faldoi.cpp:1177,1449,1642`` —
nltvl1_PD / tvcsad_PD / nltvcsad_PD) on the full clean/easy pair with the
cached local-step flow ``deep_rg.flo`` as input (see
``tests/golden/global_m{2,4,6}.log`` for the run logs).  These are
full-image 400-iteration solves — minutes on the 1-core CPU host, so they
are opt-in via FALDOI_SLOW_TESTS (CI runs the crop-level functional tests
in test_global_functionals.py instead).
"""

import os

import numpy as np
import pytest

from faldoi_tpu.io import read_flo

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
IMS = os.path.join(GOLDEN, "ims_easy.txt")

slow = pytest.mark.skipif(
    not os.environ.get("FALDOI_SLOW_TESTS"),
    reason="full-image parity vs reference binary (slow; set FALDOI_SLOW_TESTS=1)",
)


def _run_global(method: int, tmp_path):
    from faldoi_tpu.cli import global_faldoi as gcli

    out = str(tmp_path / f"var_m{method}.flo")
    rc = gcli.main([IMS, os.path.join(GOLDEN, "deep_rg.flo"), out,
                    "-m", str(method)])
    assert rc in (0, None)
    ours = read_flo(out)
    ref = read_flo(os.path.join(GOLDEN, f"var_m{method}.flo"))
    d = np.hypot(ours[..., 0] - ref[..., 0], ours[..., 1] - ref[..., 1])
    return float(d.mean()), float(d.max())


@slow
@pytest.mark.parametrize("method", [2, 4, 6])
def test_global_method_parity(method, tmp_path):
    mean_epe, max_epe = _run_global(method, tmp_path)
    print(f"m{method}: mean {mean_epe:.4f} max {max_epe:.4f}")
    assert mean_epe <= 0.05, (
        f"method {method} global parity {mean_epe:.4f} > 0.05 px"
    )
