"""Iterated FALDOI local minimization — ``match_growing_variational``
(local_faldoi.cpp:1060-1741), TPU wavefront edition.

Per outer iteration: forward and backward growings, FB-consistency pruning,
deletion of untrusted flow, re-queueing of survivors; a final forward-only
growing produces the output.  The reference's fwd/bwd OpenMP task pair (P1)
and its spatial partition threads (P2) are subsumed by the batched sweeps —
every patch of both directions could run in one device batch; we currently
run the two directions back-to-back per iteration.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from faldoi_tpu.ops.stencils import centered_gradient
from faldoi_tpu.core.local_step import GrowState, LocalSolver, init_state
from faldoi_tpu.core.pruning import prune
from faldoi_tpu.models import method_local_params
from faldoi_tpu import params as P


def _delete_untrusted(state: GrowState, trust, n) -> GrowState:
    """delete_not_trustable_candidates (:283-311): NaN flow, inf energy."""
    bad = trust == 0
    nanv = jnp.where(bad, jnp.nan, 0.0)
    return state._replace(
        out_u=jnp.where(bad, jnp.nan, state.out_u),
        out_v=jnp.where(bad, jnp.nan, state.out_v),
        ene=jnp.where(bad, jnp.inf, state.ene),
        wu=state.wu + nanv,   # NaN-poison untrusted working flow
        wv=state.wv + nanv,
    )


def _insert_potential(state: GrowState, n) -> GrowState:
    """insert_potential_candidates (:813-846) + prepare_data_for_growing
    (:860-870): survivors become the new queue; everything else resets."""
    ok = jnp.isfinite(state.out_u) & jnp.isfinite(state.out_v)
    return state._replace(
        cand_u=jnp.where(ok, state.out_u, 0.0),
        cand_v=jnp.where(ok, state.out_v, 0.0),
        cand_e=jnp.where(ok, state.ene, jnp.inf),
        fixed=jnp.zeros_like(state.fixed),
        ene=jnp.full_like(state.ene, jnp.inf),
        out_u=jnp.full_like(state.out_u, jnp.nan),
        out_v=jnp.full_like(state.out_v, jnp.nan),
    )


def _flow2d(state: GrowState, h, w):
    return np.stack(
        [
            np.asarray(state.out_u[: h * w]).reshape(h, w),
            np.asarray(state.out_v[: h * w]).reshape(h, w),
        ],
        axis=-1,
    )


def match_growing(
    go: np.ndarray,              # (h, w, 2) forward seeds (NaN-sparse)
    ba: np.ndarray,              # (h, w, 2) backward seeds
    i0n: jnp.ndarray,            # normalized/smoothed frames
    i1n: jnp.ndarray,
    prm: P.Parameters,
    sal_go: Optional[np.ndarray] = None,
    sal_ba: Optional[np.ndarray] = None,
    bsz: int = 4096,
    verbose: bool = False,
    fused: bool = True,
    delta: float = float("inf"),
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (flow (h,w,2), energy (h,w)) for the forward direction."""
    h, w = i0n.shape
    n = h * w
    lam, theta, tau = method_local_params(prm.val_method, prm.w_radio)

    i0x, i0y = centered_gradient(i0n)
    i1x, i1y = centered_gradient(i1n)
    imgs_go = (i0n, i1n, i1x, i1y)   # fwd: warp I1
    imgs_ba = (i1n, i0n, i0x, i0y)   # bwd: warp I0

    def mksal(s):
        base = np.ones(n + 1, np.float32)
        if s is not None:
            base[:n] = np.asarray(s, np.float32).ravel()
        return jnp.asarray(base)

    sal_g = mksal(sal_go)
    sal_b = mksal(sal_ba)

    solver = LocalSolver(
        h, w, wr=prm.w_radio, bsz=bsz, lambda_=lam, theta=theta, tau=tau,
        tol=prm.tol_OF, warps=prm.warps, max_iters=prm.max_iter_patch,
        fused=fused, delta=delta,
    )

    import time

    import jax

    def tick(label, t0):
        if verbose:
            print(f"(match_growing) {label}: {time.time() - t0:.2f}s")
        return time.time()

    t = time.time()
    st_go = init_state(h, w)
    st_ba = init_state(h, w)
    st_go = solver.insert_seeds(st_go, go, imgs_go, sal_g)
    st_ba = solver.insert_seeds(st_ba, ba, imgs_ba, sal_b)
    jax.block_until_ready(st_go)
    t = tick("seed insertion", t)

    trust_all = jnp.ones((n + 1,), jnp.int32)
    trust_go, trust_ba = trust_all, trust_all

    for it in range(prm.iterations_of):
        st_go = solver.grow(st_go, imgs_go, trust_go, sal_g, it)
        st_ba = solver.grow(st_ba, imgs_ba, trust_ba, sal_b, it)
        jax.block_until_ready(st_ba)
        t = tick(f"growings it={it}", t)

        fwd = _flow2d(st_go, h, w)
        bwd = _flow2d(st_ba, h, w)
        tg, tb = prune(
            i0n, i1n, jnp.asarray(fwd), jnp.asarray(bwd), prm.epsilon
        )
        if verbose:
            print(
                f"iter {it}: FB-chosen fwd {float(tg.mean()):.3f} "
                f"bwd {float(tb.mean()):.3f}"
            )
        trust_go = jnp.concatenate([tg.ravel(), jnp.ones((1,), jnp.int32)])
        trust_ba = jnp.concatenate([tb.ravel(), jnp.ones((1,), jnp.int32)])

        st_go = _insert_potential(_delete_untrusted(st_go, trust_go, n), n)
        st_ba = _insert_potential(_delete_untrusted(st_ba, trust_ba, n), n)
        t = tick(f"prune+requeue it={it}", t)

    # final forward-only growing (local_faldoi.cpp:1636-1712)
    st_go = solver.grow(st_go, imgs_go, trust_go, sal_g, prm.iterations_of)
    jax.block_until_ready(st_go)
    t = tick("final growing", t)

    flow = _flow2d(st_go, h, w)
    ene = np.asarray(st_go.ene[:n]).reshape(h, w)
    return flow, ene
