#!/usr/bin/env python
"""Time ONE full-sweep config on the TPU, honouring the env dials
(FALDOI_WSCATTER_R / FALDOI_TOPK / FALDOI_WARP_ROWS / FALDOI_ABLATE ...)
via local_step.ordering_dials — the A/B harness for the r4 kernel work.

Usage: python scripts/tpu_sweep_bench.py [bsz] [first_iter 0|1]
Prints: one line  `bsz=<B> dials=<tuple> <ms> ms/sweep`
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from faldoi_tpu.core.patch_solver import pad_for_crops
from faldoi_tpu.core.functionals import solve_tvl1, make_solver_consts
from faldoi_tpu.core.local_step import _sweep_body, init_state, ordering_dials
from faldoi_tpu.ops.stencils import centered_gradient

H, W = 436, 1024
N = H * W
REPS = 30
bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
first_iter = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W), jnp.float32)
i1x, i1y = centered_gradient(img)
sc = make_solver_consts(0, pad_for_crops(img, 11), img, i1x, i1y,
                        40.0, 0.3, 0.125, 0.01, wr=5)
cand = jax.random.uniform(key, (N,), jnp.float32)
state0 = init_state(H, W)
state0 = state0._replace(
    cand_e=jnp.concatenate([cand, jnp.full((1,), jnp.inf)]),
    cand_u=jnp.zeros((N + 1,)), cand_v=jnp.zeros((N + 1,)))
sal = jnp.ones((N + 1,), jnp.float32)
trust2d = jnp.ones((H, W), jnp.float32)
dials = ordering_dials()


@jax.jit
def run(st):
    def body(s, _):
        s2, _acc = _sweep_body(
            s, solve_tvl1, sc, trust2d, sal, jnp.asarray(0),
            H, W, 5, bsz, 1, 4, delta=0.01, delta_rel=0.5,
            floor=512, floor_scale=64,
            fill="patch" if first_iter else "patch_rb",
            relax=False, with_chi=False, first_iter=first_iter, dials=dials,
        )
        return s2._replace(cand_e=st.cand_e, fixed=st.fixed), None

    s, _ = jax.lax.scan(body, st, None, length=REPS)
    return s


print(f"# device: {jax.devices()[0]}", file=sys.stderr)
r = run(state0)
jax.block_until_ready(r)
best = float("inf")
for _ in range(3):
    t0 = time.time()
    jax.block_until_ready(run(state0))
    best = min(best, time.time() - t0)
print(f"bsz={bsz} fi={int(first_iter)} dials={dials} "
      f"{best/REPS*1000:.3f} ms/sweep")


def run_pair(bsz_, fi):
    """Measure the vmapped 2-lane pair sweep (the production grow_pair
    shape) for comparison with 2x the single-lane cost."""
    st2 = jax.tree.map(lambda a: jnp.stack([a, a]), state0)
    sc2 = jax.tree.map(lambda a: jnp.stack([a, a]) if a is not None else None,
                       sc)
    tr2 = jnp.stack([trust2d, trust2d])
    sal2 = jnp.stack([sal, sal])

    @jax.jit
    def run2(s2):
        def one(s, sc_, tr, sl):
            s2_, acc = _sweep_body(
                s, solve_tvl1, sc_, tr, sl, jnp.asarray(0),
                H, W, 5, bsz_, 1, 4, delta=0.01, delta_rel=0.5,
                floor=512, floor_scale=64,
                fill="patch" if fi else "patch_rb",
                relax=False, with_chi=False, first_iter=fi, dials=dials,
            )
            return s2_._replace(cand_e=state0.cand_e, fixed=state0.fixed), acc

        def body(s2_, _):
            s2n, _a = jax.vmap(one, in_axes=(0, 0, 0, 0))(s2_, sc2, tr2, sal2)
            return s2n, None

        s2_, _ = jax.lax.scan(body, s2, None, length=REPS)
        return s2_

    r = run2(st2)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run2(st2))
        best = min(best, time.time() - t0)
    print(f"PAIR bsz={bsz_} fi={int(fi)} {best/REPS*1000:.3f} ms/sweep")


if os.environ.get("FALDOI_SWEEP_BENCH_PAIR"):
    run_pair(bsz, first_iter)
