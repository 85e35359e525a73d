"""Global TV-CSAD and NLTV-CSAD solvers.

CSAD data term ("centralized sum of absolute differences"): the proximal
v-step is an exact median of 2n+1 breakpoints over a 7x7 neighbourhood
(``tvcsad_PD``, global_faldoi.cpp:1449-1637; ``nltvcsad_PD``, :1642-1808).
The reference sorts a per-pixel vector; we batch it as one (h, w, 97) sort.

Reference quirks preserved:
* the selected order statistic is ``ba[it/2 + 1]`` = index n+1, one past the
  true median (marked "TODO: possible error" in the reference, :1567) — kept
  for output parity;
* TV-CSAD's grad is ``hypot(Ix^2+Iy^2, 0.01)`` (:1519) while NLTV-CSAD uses
  ``Ix^2+Iy^2`` guarded by GRAD_IS_ZERO and normalises by sqrt(grad);
* TV-CSAD's dual projection is per-component (``tvcsad_getD``, :1428-1446),
  unlike TV-L1's joint 4-norm;
* NLTV-CSAD runs the fixed 400 iterations (no tol break), TV-CSAD breaks on
  the mean-squared update.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from faldoi_tpu.ops import bicubic_warp, centered_gradient, divergence, forward_gradient
from faldoi_tpu.ops.bicubic import bicubic_warp_stack
from faldoi_tpu.ops.nonlocal_ops import (
    neighbor_offsets,
    nltv_weights,
    nonlocal_divergence,
    nonlocal_gradient_duals,
    rgb_to_lab_np,
    shift_pull,
    valid_mask,
)
from faldoi_tpu.params import (
    DT_NEI,
    DT_R,
    GRAD_IS_ZERO,
    MAX_ITERATIONS_GLOBAL,
    NL_BETA,
)
from faldoi_tpu.core.global_step_nltv import GLOBAL_WI, GLOBAL_WS


def _csad_setup(h, w):
    offs = neighbor_offsets(DT_R)
    masks = np.stack([valid_mask(h, w, dy, dx) for (dy, dx) in offs])
    ncount = masks.sum(axis=0).astype(np.float32)  # PosNei.n per pixel
    return tuple(offs), jnp.asarray(masks), jnp.asarray(ncount)


def _csad_b(i0, i1w, i1wx, i1wy, u1, u2, denom, offs, masks):
    """b_j = (I0 - I0_j - I1w + I1w_j + I1wx*u1 + I1wy*u2) / denom
    (global_faldoi.cpp:1530-1531)."""
    base = i0 - i1w + i1wx * u1 + i1wy * u2
    bs = []
    for j, (dy, dx) in enumerate(offs):
        i0_n = shift_pull(i0, dy, dx)
        i1w_n = shift_pull(i1w, dy, dx)
        bs.append(jnp.where(masks[j], (base - i0_n + i1w_n) / denom, 0.0))
    return jnp.stack(bs)


def _csad_vstep(u1, u2, b, i1wx, i1wy, denom, masks, ncount, l_t_grad):
    """Median-of-breakpoints prox (global_faldoi.cpp:1549-1570): sort the
    valid entries of [-(b_j - dot/denom)] ++ [(n-2j)*l_t*grad, j=0..n] and
    take index n+1 (the reference's it/2+1)."""
    n_d = b.shape[0]
    dot = (i1wx * u1 + i1wy * u2) / denom
    part1 = jnp.where(masks, -(b - dot[None]), jnp.inf)          # (n_d, h, w)
    jidx = jnp.arange(n_d + 1, dtype=jnp.float32)[:, None, None]
    part2 = jnp.where(
        jidx <= ncount[None],
        (ncount[None] - 2.0 * jidx) * l_t_grad[None],
        jnp.inf,
    )                                                             # (n_d+1, h, w)
    ba = jnp.concatenate([part1, part2], axis=0)                  # (2*n_d+1, h, w)
    ba = jnp.sort(ba, axis=0)
    sel = (ncount + 1.0).astype(jnp.int32)[None]                  # index n+1
    med = jnp.take_along_axis(ba, sel, axis=0)[0]
    v1 = u1 - i1wx * med / denom
    v2 = u2 - i1wy * med / denom
    return v1, v2


@functools.partial(jax.jit, static_argnames=("offs", "warps", "max_iters"))
def _tvcsad_jit(i0, i1, u1, u2, masks, ncount, offs, lambda_, theta, tau,
                tol, warps, max_iters):
    l_t = lambda_ * theta
    i1x, i1y = centered_gradient(i1)
    xi11 = jnp.zeros_like(u1)
    xi12 = jnp.zeros_like(u1)
    xi21 = jnp.zeros_like(u1)
    xi22 = jnp.zeros_like(u1)

    for _ in range(warps):
        i1w, i1wx, i1wy = bicubic_warp_stack(jnp.stack([i1, i1x, i1y]),
                                             u1, u2, True)
        grad = jnp.hypot(i1wx * i1wx + i1wy * i1wy, 0.01)  # :1519
        b = _csad_b(i0, i1w, i1wx, i1wy, u1, u2, grad, offs, masks)

        def body(st):
            u1, u2, u1_, u2_, xi11, xi12, xi21, xi22, err, n = st
            v1, v2 = _csad_vstep(u1, u2, b, i1wx, i1wy, grad, masks, ncount,
                                 l_t * grad)
            u1x, u1y = forward_gradient(u1_)
            u2x, u2y = forward_gradient(u2_)
            # tvcsad_getD (:1428-1446): per-component projection
            xi1_n = jnp.maximum(1.0, jnp.hypot(xi11, xi12))
            xi2_n = jnp.maximum(1.0, jnp.hypot(xi21, xi22))
            xi11 = (xi11 + tau * u1x) / xi1_n
            xi12 = (xi12 + tau * u1y) / xi1_n
            xi21 = (xi21 + tau * u2x) / xi2_n
            xi22 = (xi22 + tau * u2y) / xi2_n
            div1 = divergence(xi11, xi12)
            div2 = divergence(xi21, xi22)
            nu1 = u1 - tau * (-div1 + (u1 - v1) / theta)
            nu2 = u2 - tau * (-div2 + (u2 - v2) / theta)
            err = jnp.mean((nu1 - u1) ** 2 + (nu2 - u2) ** 2)
            u1_ = 2.0 * nu1 - u1
            u2_ = 2.0 * nu2 - u2
            return (nu1, nu2, u1_, u2_, xi11, xi12, xi21, xi22, err, n + 1)

        def cond(st):
            return jnp.logical_and(st[8] > tol * tol, st[9] < max_iters)

        st = (u1, u2, u1, u2, xi11, xi12, xi21, xi22,
              jnp.asarray(jnp.inf, u1.dtype), jnp.asarray(0, jnp.int32))
        st = jax.lax.while_loop(cond, body, st)
        u1, u2, _, _, xi11, xi12, xi21, xi22 = st[:8]
    return u1, u2


def tvcsad_global(i0n, i1n, u1, u2, lambda_, theta, tau, tol, warps,
                  max_iters=MAX_ITERATIONS_GLOBAL):
    h, w = i0n.shape
    offs, masks, ncount = _csad_setup(h, w)
    return _tvcsad_jit(i0n, i1n, u1, u2, masks, ncount, offs,
                       lambda_, theta, tau, tol, warps, max_iters)


@functools.partial(
    jax.jit, static_argnames=("offs_dt", "offs_nl", "warps", "max_iters")
)
def _nltvcsad_jit(i0, i1, u1, u2, masks, ncount, wp, wt, offs_dt, offs_nl,
                  lambda_, theta, tau, warps, max_iters):
    l_t = lambda_ * theta
    i1x, i1y = centered_gradient(i1)
    n_d = len(offs_nl)
    sc_p = jnp.zeros((n_d,) + u1.shape, u1.dtype)
    sc_q = jnp.zeros_like(sc_p)

    for _ in range(warps):
        i1w, i1wx, i1wy = bicubic_warp_stack(jnp.stack([i1, i1x, i1y]),
                                             u1, u2, True)
        grad = i1wx * i1wx + i1wy * i1wy
        gok = grad > GRAD_IS_ZERO
        sq = jnp.sqrt(jnp.where(gok, grad, 1.0))
        b = _csad_b(i0, i1w, i1wx, i1wy, u1, u2, sq, offs_dt, masks)

        def body(_, st):
            u1, u2, u1_, u2_, sc_p, sc_q = st
            v1, v2 = _csad_vstep(u1, u2, b, i1wx, i1wy, sq, masks, ncount,
                                 l_t * sq)
            v1 = jnp.where(gok, v1, u1)  # :1735-1737
            v2 = jnp.where(gok, v2, u2)
            sc_p = nonlocal_gradient_duals(sc_p, u1_, wp, wt, offs_nl, tau)
            sc_q = nonlocal_gradient_duals(sc_q, u2_, wp, wt, offs_nl, tau)
            div_p = nonlocal_divergence(sc_p, wp, wt, offs_nl)
            div_q = nonlocal_divergence(sc_q, wp, wt, offs_nl)
            nu1 = u1 - tau * (div_p + (u1 - v1) / theta)
            nu2 = u2 - tau * (div_q + (u2 - v2) / theta)
            u1_ = 2.0 * nu1 - u1
            u2_ = 2.0 * nu2 - u2
            return (nu1, nu2, u1_, u2_, sc_p, sc_q)

        st = (u1, u2, u1, u2, sc_p, sc_q)
        st = jax.lax.fori_loop(0, max_iters, body, st)
        u1, u2, _, _, sc_p, sc_q = st
    return u1, u2


def nltvcsad_global(i0n, i1n, i0_planes, u1, u2, lambda_, theta, tau, warps,
                    max_iters=MAX_ITERATIONS_GLOBAL):
    h, w = i0n.shape
    offs_dt, masks, ncount = _csad_setup(h, w)
    lab = rgb_to_lab_np(np.asarray(i0_planes))
    wp, wt, offs_nl = nltv_weights(lab, NL_BETA, GLOBAL_WS, GLOBAL_WI)
    return _nltvcsad_jit(
        i0n, i1n, u1, u2, masks, ncount, jnp.asarray(wp), jnp.asarray(wt),
        offs_dt, tuple(offs_nl), lambda_, theta, tau, warps, max_iters,
    )
