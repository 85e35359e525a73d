"""Functional registry — maps method ids 0-8 to their solvers.

Mirrors the reference's dispatchers (``energy_model.cpp:691-802`` for the
local/patch step, ``global_faldoi.cpp:2132-2167`` for the global step),
including the per-method hardcoded (lambda, theta, tau) overrides and the
weighted variants' fallback to the unweighted *global* solvers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from faldoi_tpu import params as P


def method_local_params(method: int, w_radio: int = P.PAR_DEFAULT_WINSIZE):
    """Hardcoded per-method (lambda, theta, tau) for the LOCAL step
    (energy_model.cpp:704-800). The params file is ignored for methods 0-7."""
    from faldoi_tpu.ops.gaussian import gaussian1d_weight

    lam, theta, tau = P.PAR_DEFAULT_LAMBDA, P.PAR_DEFAULT_THETA, P.PAR_DEFAULT_TAU
    if method == P.M_NLTVL1:
        lam, theta, tau = 2.0, 0.3, 0.1
    elif method in (P.M_TVCSAD, P.M_NLTVCSAD):
        lam, theta, tau = 0.85, 0.3, 0.1
    elif method == P.M_TVL1_W:
        central = float(gaussian1d_weight(w_radio)[w_radio + 1])
        lam = P.PAR_DEFAULT_LAMBDA / (central * central)
    elif method in (P.M_NLTVCSAD_W, P.M_NLTVL1_W, P.M_TVCSAD_W):
        # NB: M_NLTVL1_W sets lambda=2 then overrides to 0.85
        # (energy_model.cpp:765-768)
        central = float(gaussian1d_weight(w_radio)[w_radio + 1])
        lam, theta, tau = 0.85 / (central * central), 0.3, 0.1
    return lam, theta, tau


def method_global_params(method: int, prm: P.Parameters):
    """Per-method (lambda, theta, tau) for the GLOBAL step
    (global_faldoi.cpp:2132-2158): TVL1 takes the params file; the others are
    hardcoded."""
    if method in (P.M_TVL1, P.M_TVL1_W, P.M_TVL1_OCC):
        return prm.lambda_, prm.theta, prm.tau
    if method in (P.M_NLTVCSAD, P.M_NLTVCSAD_W, P.M_NLTVL1, P.M_NLTVL1_W):
        lam = 2.0 if method in (P.M_NLTVL1, P.M_NLTVL1_W) else 0.85
        return lam, 0.3, 0.1
    if method in (P.M_TVCSAD, P.M_TVCSAD_W):
        return 0.85, 0.3, 0.125
    raise ValueError(f"unknown method {method}")


def global_refine(
    method: int,
    i0n: jnp.ndarray,
    i1n: jnp.ndarray,
    i_1n: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    prm: P.Parameters,
    i0_planes=None,
    occ_init=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Dispatch the global step. Returns (u1, u2, chi or None)."""
    lam, theta, tau = method_global_params(method, prm)
    if method in (P.M_TVL1, P.M_TVL1_W):
        from faldoi_tpu.core.global_step import tvl2_global

        u1, u2 = tvl2_global(
            i0n, i1n, u1, u2, lam, theta, tau, prm.tol_OF, prm.warps
        )
        return u1, u2, None
    if method in (P.M_NLTVL1, P.M_NLTVL1_W):
        from faldoi_tpu.core.global_step_nltv import nltvl1_global

        u1, u2 = nltvl1_global(i0n, i1n, i0_planes, u1, u2, lam, theta, tau,
                               prm.warps)
        return u1, u2, None
    if method in (P.M_TVCSAD, P.M_TVCSAD_W):
        from faldoi_tpu.core.global_step_csad import tvcsad_global

        u1, u2 = tvcsad_global(i0n, i1n, u1, u2, lam, theta, tau, prm.tol_OF,
                               prm.warps)
        return u1, u2, None
    if method in (P.M_NLTVCSAD, P.M_NLTVCSAD_W):
        from faldoi_tpu.core.global_step_csad import nltvcsad_global

        u1, u2 = nltvcsad_global(i0n, i1n, i0_planes, u1, u2, lam, theta, tau,
                                 prm.warps)
        return u1, u2, None
    if method == P.M_TVL1_OCC:
        from faldoi_tpu.core.occlusion import tvl2_occ_global

        return tvl2_occ_global(i0n, i1n, i_1n, u1, u2, occ_init, prm)
    raise ValueError(f"unknown method {method}")
