#!/usr/bin/env python
"""Device-trace the sweep and print the top INDIVIDUAL ops (not name-prefix
aggregates) with their HLO long names — the per-kernel evidence for the r4
roofline work.

Usage: python scripts/tpu_trace_ops.py [bsz] [config]
  config: default | relax | prod  (prod = the shipping bench config)
"""
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
outdir = f"/tmp/sweep_trace_ops_{bsz}"
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
            with_chi=False, dials=(0, "0", 0.0, 0, "approx", ""),
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

files = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
assert files, f"no trace under {outdir}"
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)

# Identify device-side process/thread ids: the TPU op track is labelled
# e.g. "/device:TPU:0" with thread name "XLA Ops" / "Steps"... collect pid
# metadata first.
pids = {}
tids = {}
for e in tr.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

dev_pids = {p for p, name in pids.items()
            if "TPU" in name or "/device" in name.lower()}
print("# tracks:", {p: pids[p] for p in sorted(pids)}, file=sys.stderr)

tot = {}
long = {}
for e in tr.get("traceEvents", []):
    if e.get("ph") != "X" or not e.get("dur"):
        continue
    if dev_pids and e.get("pid") not in dev_pids:
        continue
    tname = tids.get((e.get("pid"), e.get("tid")), "")
    if "XLA Op" not in tname and "Ops" not in tname and dev_pids:
        # keep only the op-level track to avoid double counting
        if tname and "step" in tname.lower():
            continue
    name = e.get("name", "?")
    tot[name] = tot.get(name, 0) + e["dur"]
    ln = (e.get("args") or {}).get("long_name", "")
    if ln and name not in long:
        long[name] = ln

top = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
total = sum(tot.values())
print(f"# total device-track us: {total:.0f} (~{total/REPS/1000:.2f} ms/sweep)")
for k, v in top:
    ln = long.get(k, "")[:110].replace("\n", " ")
    print(f"{v/REPS/1000:8.3f} ms {v/total*100:5.1f}%  {k:34s} {ln}")
