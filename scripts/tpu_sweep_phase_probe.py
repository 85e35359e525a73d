#!/usr/bin/env python
"""Time the iteration-0 (lean) vs requeue-drain (generic) sweep bodies on
the real TPU at production shapes, with FALDOI_ABLATE attribution.

The verbose bench shows it=0 sweeps at ~17 ms but requeue-drain sweeps at
~60 ms (same bsz) — this isolates which phase of the generic sweep body
carries the difference.

Usage: python scripts/tpu_sweep_phase_probe.py [bsz] [ablate]
  ablate: '' | nofill | nosolve | nowscatter  (sets FALDOI_ABLATE)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
if len(sys.argv) > 2 and sys.argv[2]:
    os.environ["FALDOI_ABLATE"] = sys.argv[2]

import numpy as np
import jax
import jax.numpy as jnp

h, w = 436, 1024
n = h * w
REPS = 20

from faldoi_tpu.core.patch_solver import pad_for_crops
from faldoi_tpu.core.functionals import solve_tvl1, make_solver_consts
from faldoi_tpu.core.local_step import _sweep_body, init_state
from faldoi_tpu.ops.stencils import centered_gradient

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (h, w), jnp.float32)
i1x, i1y = centered_gradient(img)
sc = make_solver_consts(0, pad_for_crops(img, 11), img, i1x, i1y,
                        40.0, 0.3, 0.125, 0.01, wr=5)
cand = jax.random.uniform(key, (n,), jnp.float32)
state0 = init_state(h, w)
# half-fixed state with a working flow — the requeue-drain regime
fixed = (jax.random.uniform(jax.random.PRNGKey(1), (n,)) < 0.5)
wu = jnp.where(fixed, 0.3, jnp.nan)
state0 = state0._replace(
    cand_e=jnp.concatenate([cand, jnp.full((1,), jnp.inf)]),
    cand_u=jnp.zeros((n + 1,)), cand_v=jnp.zeros((n + 1,)),
    fixed=jnp.concatenate([fixed, jnp.zeros((1,), bool)]),
    wu=jnp.concatenate([wu, jnp.full((1,), jnp.nan)]),
    wv=jnp.concatenate([wu, jnp.full((1,), jnp.nan)]),
)
sal = jnp.ones((n + 1,), jnp.float32)
trust2d = jnp.ones((h, w), jnp.float32)

print(f"# device: {jax.devices()[0]} bsz={bsz} "
      f"ablate={os.environ.get('FALDOI_ABLATE', '')}", file=sys.stderr)


def mkrun(first_iter):
    it = jnp.asarray(0 if first_iter else 1)

    @jax.jit
    def run(st):
        def body(s, _):
            s2, _acc = _sweep_body(
                s, solve_tvl1, sc, trust2d, sal, it,
                h, w, 5, bsz, 1, 4, delta=0.01, delta_rel=0.5,
                floor=512, floor_scale=64, fill="patch", relax=False,
                with_chi=False, first_iter=first_iter,
            )
            # keep the queue alive so every scan step does full work
            return s2._replace(cand_e=st.cand_e, fixed=st.fixed,
                               wu=st.wu, wv=st.wv), None

        s, _ = jax.lax.scan(body, st, None, length=REPS)
        return s

    return run


for name, first in (("lean(it0)", True), ("generic(it>=1)", False)):
    run = mkrun(first)
    s = run(state0)
    jax.block_until_ready(s)
    t0 = time.time()
    jax.block_until_ready(run(state0))
    print(f"{name:16s} {(time.time() - t0) / REPS * 1000:8.2f} ms/sweep")
