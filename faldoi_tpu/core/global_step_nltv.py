"""Global NLTV-L1 solver (``nltvl1_PD``, global_faldoi.cpp:1177-1328).

Same warping + TH-threshold skeleton as TV-L1, but the regulariser's dual
variables live on 24 non-local neighbours weighted by Lab similarity, and the
iteration runs a fixed MAX_ITERATIONS_GLOBAL times (the reference disabled
the tolerance break, :1248-1249).  Primal error is the *mean* squared update
(unused for termination, kept for logging parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from faldoi_tpu.ops import bicubic_warp, centered_gradient
from faldoi_tpu.ops.bicubic import bicubic_warp_stack
from faldoi_tpu.ops.nonlocal_ops import (
    neighbor_offsets,
    nltv_weights,
    nonlocal_divergence,
    nonlocal_gradient_duals,
    rgb_to_lab_np,
)
from faldoi_tpu.core.pd_common import tvl1_threshold, warp_constants
from faldoi_tpu.params import MAX_ITERATIONS_GLOBAL, NL_BETA

GLOBAL_WS = 2.0   # MAX_BETA (global_faldoi.cpp:887) — spatial scale
GLOBAL_WI = 5.0   # MAX_INTENSITY (global_faldoi.cpp:886)


@functools.partial(jax.jit, static_argnames=("offs", "warps", "max_iters"))
def _nltvl1_jit(i0, i1, u1, u2, wp, wt, offs, lambda_, theta, tau,
                warps, max_iters):
    l_t = lambda_ * theta
    i1x, i1y = centered_gradient(i1)
    n_d = len(offs)
    sc_p = jnp.zeros((n_d,) + u1.shape, u1.dtype)
    sc_q = jnp.zeros_like(sc_p)

    for _ in range(warps):
        i1w, i1wx, i1wy = bicubic_warp_stack(jnp.stack([i1, i1x, i1y]),
                                             u1, u2, True)
        grad, rho_c = warp_constants(i0, i1w, i1wx, i1wy, u1, u2)

        def body(_, st):
            u1, u2, u1_, u2_, sc_p, sc_q = st
            v1, v2 = tvl1_threshold(u1, u2, rho_c, i1wx, i1wy, grad, l_t)
            sc_p = nonlocal_gradient_duals(sc_p, u1_, wp, wt, offs, tau)
            sc_q = nonlocal_gradient_duals(sc_q, u2_, wp, wt, offs, tau)
            div_p = nonlocal_divergence(sc_p, wp, wt, offs)
            div_q = nonlocal_divergence(sc_q, wp, wt, offs)
            # ofnltv_getP (global_faldoi.cpp:1090-1120): note +div sign
            nu1 = u1 - tau * (div_p + (u1 - v1) / theta)
            nu2 = u2 - tau * (div_q + (u2 - v2) / theta)
            u1_ = 2.0 * nu1 - u1
            u2_ = 2.0 * nu2 - u2
            return (nu1, nu2, u1_, u2_, sc_p, sc_q)

        st = (u1, u2, u1, u2, sc_p, sc_q)
        st = jax.lax.fori_loop(0, max_iters, body, st)
        u1, u2, _, _, sc_p, sc_q = st
    return u1, u2


def nltvl1_global(i0n, i1n, i0_planes, u1, u2, lambda_, theta, tau, warps,
                  max_iters=MAX_ITERATIONS_GLOBAL):
    """i0_planes: original (pd, h, w) color frame for the Lab weights."""
    lab = rgb_to_lab_np(np.asarray(i0_planes))
    wp, wt, offs = nltv_weights(lab, NL_BETA, GLOBAL_WS, GLOBAL_WI)
    return _nltvl1_jit(
        i0n, i1n, u1, u2, jnp.asarray(wp), jnp.asarray(wt), tuple(offs),
        lambda_, theta, tau, warps, max_iters,
    )
