"""Shared primal-dual building blocks for the TV-L1-family solvers.

The reference implements the same iteration nine times (one file per
functional, patch + image domains).  Here it exists once, as pure functions
over whole arrays; the patch solver applies them on (P, P) canvases under
``vmap`` and the global solver on the full image inside ``lax.while_loop``.

Math (reference: ``tvl2_model.cpp:82-172``, ``global_faldoi.cpp:307-381``):

* ``tvl1_threshold``: pointwise data-term proximal step on v.
* ``tvl2_getD``: dual ascent with projection by the *previous* dual's norm
  (the reference divides by max(1, |xi_old|), not |xi_new|).
* ``tvl2_getP``: primal descent; returns the per-pixel squared update used
  for the convergence test.
"""

from __future__ import annotations

import jax.numpy as jnp

from faldoi_tpu.params import GRAD_IS_ZERO


def tvl1_threshold(u1, u2, rho_c, i1wx, i1wy, grad, l_t):
    """TH operator (tvl2_model.cpp:364-391): v = u + d with d from the
    three-way threshold on rho."""
    rho = rho_c + i1wx * u1 + i1wy * u2
    fi = jnp.where(grad < GRAD_IS_ZERO, 0.0, -rho / jnp.where(grad == 0, 1.0, grad))
    d1 = jnp.where(
        rho < -l_t * grad,
        l_t * i1wx,
        jnp.where(rho > l_t * grad, -l_t * i1wx, fi * i1wx),
    )
    d2 = jnp.where(
        rho < -l_t * grad,
        l_t * i1wy,
        jnp.where(rho > l_t * grad, -l_t * i1wy, fi * i1wy),
    )
    return u1 + d1, u2 + d2


def tvl2_getD(xi11, xi12, xi21, xi22, u1x, u1y, u2x, u2y, tau):
    """Dual ascent + projection by the OLD xi norm (tvl2_model.cpp:82-118)."""
    xi_n = jnp.sqrt(xi11 * xi11 + xi12 * xi12 + xi21 * xi21 + xi22 * xi22)
    xi_n = jnp.maximum(1.0, xi_n)
    return (
        (xi11 + tau * u1x) / xi_n,
        (xi12 + tau * u1y) / xi_n,
        (xi21 + tau * u2x) / xi_n,
        (xi22 + tau * u2y) / xi_n,
    )


def tvl2_getP(u1, u2, v1, v2, div_xi1, div_xi2, theta, tau):
    """Primal descent (tvl2_model.cpp:122-172). Returns new u and the
    per-pixel squared update magnitude."""
    nu1 = u1 - tau * (-div_xi1 + (u1 - v1) / theta)
    nu2 = u2 - tau * (-div_xi2 + (u2 - v2) / theta)
    u_n = (nu1 - u1) ** 2 + (nu2 - u2) ** 2
    return nu1, nu2, u_n


def warp_constants(i0, i1w, i1wx, i1wy, u1, u2):
    """Per-warp constants (tvl2_model.cpp:334-346): |grad I1w|^2 and the
    constant part of rho."""
    grad = i1wx * i1wx + i1wy * i1wy
    rho_c = i1w - i1wx * u1 - i1wy * u2 - i0
    return grad, rho_c
