#!/usr/bin/env python
"""Capture a jax.profiler device trace of the sweep scan on the TPU and
print the top ops by total self-time.

Usage: python scripts/tpu_profile_sweep.py [bsz] [outdir]
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_trace"
h, w = 436, 1024
n = h * w
REPS = 30

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
state = init_state(h, w)
state = state._replace(
    cand_e=jnp.concatenate([cand, jnp.full((1,), jnp.inf)]),
    cand_u=jnp.zeros((n + 1,)), cand_v=jnp.zeros((n + 1,)))
sal = jnp.ones((n + 1,), jnp.float32)
trust2d = jnp.ones((h, w), jnp.float32)


@jax.jit
def run(st):
    def body(s, _):
        s2, _acc = _sweep_body(
            s, solve_tvl1, sc, trust2d, sal, jnp.asarray(0),
            h, w, 5, bsz, 1, 4, delta=0.01, delta_rel=0.5,
            floor=512, floor_scale=64, fill="patch_rb", relax=False,
            with_chi=False,
        )
        return s2._replace(cand_e=st.cand_e, fixed=st.fixed), None

    s, _ = jax.lax.scan(body, st, None, length=REPS)
    return s


print(f"# device: {jax.devices()[0]}  bsz={bsz}", file=sys.stderr)
r = run(state)
jax.block_until_ready(r)

with jax.profiler.trace(outdir):
    r = run(state)
    jax.block_until_ready(r)

# parse the trace: top ops by self time on the device track
files = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
assert files, f"no trace under {outdir}"
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
ev = [e for e in tr.get("traceEvents", [])
      if e.get("ph") == "X" and e.get("dur")]
# keep device-side events (TensorFlow Op / XLA Ops tracks carry 'args')
tot = {}
for e in ev:
    name = e.get("name", "?")
    cat = (e.get("args") or {}).get("long_name", "")
    key_ = name.split(".")[0]
    tot[key_] = tot.get(key_, 0) + e["dur"]
top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
total = sum(tot.values())
print(f"total traced us: {total}  (~{total/REPS/1000:.2f} ms/sweep if 1 track)")
for k, v in top:
    print(f"{v/REPS/1000:9.3f} ms/sweep  {v/total*100:5.1f}%  {k}")
