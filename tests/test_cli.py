"""CLI and config-layer tests (fast, no heavy solves)."""

import numpy as np

from faldoi_tpu import params as P
from faldoi_tpu.cli.global_faldoi import pick_option
from faldoi_tpu.io import read_flo


def test_pick_option_erases():
    args = ["ims.txt", "-m", "4", "in.flo", "-w", "7"]
    assert pick_option(args, "m", "0") == "4"
    assert pick_option(args, "w", "5") == "7"
    assert pick_option(args, "absent", "def") == "def"
    assert args == ["ims.txt", "in.flo"]


def test_init_params_defaults_and_clamping(tmp_path):
    p = P.init_params(None, P.GLOBAL_STEP)
    assert p.warps == P.PAR_DEFAULT_NWARPS_GLOBAL
    assert p.lambda_ == P.PAR_DEFAULT_LAMBDA

    f = tmp_path / "params.txt"
    # lambda ok, theta <=0 -> default, tau > 0.25 -> default, rest defaults
    f.write_text("10\n-1\n0.9\n0.1\n0.2\n0.1\n0.1\n0.1\n2.0\n")
    p = P.init_params(str(f), P.LOCAL_STEP)
    assert p.lambda_ == 10.0
    assert p.theta == P.PAR_DEFAULT_THETA
    assert p.tau == P.PAR_DEFAULT_TAU
    assert p.beta == 0.1
    assert p.mu == 2.0
    assert p.warps == P.PAR_DEFAULT_NWARPS_LOCAL


def test_sparse_flow_cli(tmp_path):
    from faldoi_tpu.cli import sparse_flow as cli

    m = tmp_path / "m.txt"
    m.write_text("2.9 1.1 4.9 3.6\n")
    out = tmp_path / "o.flo"
    assert cli.main([str(m), "8", "4", str(out)]) == 0
    f = read_flo(str(out))
    assert f.shape == (4, 8, 2)
    assert np.isclose(f[1, 2, 0], 2.0) and np.isclose(f[1, 2, 1], 2.5)
    assert np.isnan(f[0, 0, 0])


def test_method_local_params_quirks():
    from faldoi_tpu.models import method_local_params

    # NLTV-L1: lambda=2 (energy_model.cpp:714)
    assert method_local_params(P.M_NLTVL1)[0] == 2.0
    # CSAD: 0.85
    assert method_local_params(P.M_TVCSAD)[0] == 0.85
    # weighted TVL1: lambda scaled by the off-center weight (wr+1 index,
    # energy_model.cpp:744)
    from faldoi_tpu.ops.gaussian import gaussian1d_weight

    central = float(gaussian1d_weight(5)[6])
    lam = method_local_params(P.M_TVL1_W)[0]
    assert np.isclose(lam, 40.0 / central**2)


def test_frame_list_rejects_three(tmp_path):
    from faldoi_tpu.core.preprocess import read_frame_list

    f = tmp_path / "ims.txt"
    f.write_text("a.png\nb.png\nc.png\n")
    import pytest

    with pytest.raises(ValueError):
        read_frame_list(str(f))
