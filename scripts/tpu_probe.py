#!/usr/bin/env python
"""Micro-instrumentation of the growing pipeline on the real TPU:
compile time + per-dispatch run time of each jitted piece, at a given size.

Usage: python scripts/tpu_probe.py [maxdim] [bsz]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

from faldoi_tpu.io import read_flo
from faldoi_tpu.io.image import read_image_split
from faldoi_tpu.core.preprocess import prepare_pair
from faldoi_tpu.core import local_step as LS
from faldoi_tpu.core.functionals import SOLVERS, make_solver_consts
from faldoi_tpu.core.patch_solver import pad_for_crops
from faldoi_tpu.core.pruning import prune
from faldoi_tpu.core.global_step import tvl2_global
from faldoi_tpu import params as P

BASE = "/root/reference/example_data/clean/easy/"
GOLD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests/golden/")

maxdim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

i0 = read_image_split(BASE + "frame_0002.png")
i1 = read_image_split(BASE + "frame_0003.png")
go = read_flo(GOLD + "deep_mt_1.flo")
if maxdim:
    i0 = i0[:, :maxdim, :maxdim]
    i1 = i1[:, :maxdim, :maxdim]
    go = go[:maxdim, :maxdim]

a, b = prepare_pair(i0, i1)
h, w = a.shape
n = h * w
print(f"# size {h}x{w}, bsz={bsz}")

lam, theta, tau = 40.0, 0.3, 0.125
p = 11
from faldoi_tpu.ops.stencils import centered_gradient
i1x, i1y = centered_gradient(b)
sc = make_solver_consts(P.M_TVL1, pad_for_crops(a, p), b, i1x, i1y,
                        lam, theta, tau, 0.01, wr=5)
solver = SOLVERS[P.M_TVL1]
sal = jnp.ones((n + 1,), jnp.float32)
trust = jnp.ones((n + 1,), jnp.int32)

state = LS.init_state(h, w)
ls = LS.LocalSolver(h, w, wr=5, bsz=bsz, solver=solver, warps=1, max_iters=4,
                    mode="step", delta=0.05, fill="dense")

t0 = time.time()
state = ls.insert_seeds(state, go, sc, sal)
jax.block_until_ready(state)
print(f"seed insertion (incl compile): {time.time()-t0:.2f}s")

# one grow_step: compile
t0 = time.time()
st2, n_acc = LS.grow_step(state, solver, sc, trust, sal, jnp.asarray(0),
                          h, w, 5, bsz, warps=1, max_iters=4, delta=0.05,
                          fill="dense")
jax.block_until_ready(st2)
print(f"grow_step first call (compile+run): {time.time()-t0:.2f}s")

# steady-state dispatch time
t0 = time.time()
k = 10
for _ in range(k):
    st2, n_acc = LS.grow_step(st2, solver, sc, trust, sal, jnp.asarray(0),
                              h, w, 5, bsz, warps=1, max_iters=4, delta=0.05,
                              fill="dense")
jax.block_until_ready(st2)
dt = (time.time() - t0) / k
print(f"grow_step steady: {dt*1000:.1f} ms/sweep, accepted last={int(n_acc)}")

# grow to completion in step mode, count sweeps
state2 = ls.insert_seeds(LS.init_state(h, w), go, sc, sal)
t0 = time.time()
state2 = ls.grow(state2, sc, trust, sal, 0)
jax.block_until_ready(state2)
print(f"full growing (step mode): {time.time()-t0:.2f}s, sweeps={ls.last_sweeps}")
fixed_frac = float(state2.fixed[:n].mean())
print(f"fixed fraction: {fixed_frac:.3f}")

# chunked mode compile cost
ls2 = LS.LocalSolver(h, w, wr=5, bsz=bsz, solver=solver, warps=1, max_iters=4,
                     mode="chunked", delta=0.05, chunk=16, fill="dense")
state3 = ls2.insert_seeds(LS.init_state(h, w), go, sc, sal)
t0 = time.time()
state3 = ls2.grow(state3, sc, trust, sal, 0)
jax.block_until_ready(state3)
print(f"full growing (chunked16, incl compile): {time.time()-t0:.2f}s, sweeps~{ls2.last_sweeps}")
t0 = time.time()
state3b = ls2.insert_seeds(LS.init_state(h, w), go, sc, sal)
state3b = ls2.grow(state3b, sc, trust, sal, 0)
jax.block_until_ready(state3b)
print(f"full growing (chunked16, warm): {time.time()-t0:.2f}s")

# prune timing
fwd = np.stack([np.asarray(state2.out_u[:n]).reshape(h, w),
                np.asarray(state2.out_v[:n]).reshape(h, w)], -1)
t0 = time.time()
tg, tb = prune(a, b, jnp.asarray(fwd), jnp.asarray(fwd), 2.0)
jax.block_until_ready(tg)
print(f"prune (incl compile): {time.time()-t0:.2f}s")

# global step timing
t0 = time.time()
u1g, u2g = tvl2_global(a, b, jnp.asarray(fwd[..., 0]), jnp.asarray(fwd[..., 1]))
jax.block_until_ready(u1g)
print(f"tvl2_global first (compile+run): {time.time()-t0:.2f}s")
t0 = time.time()
u1g, u2g = tvl2_global(a, b, jnp.asarray(fwd[..., 0]), jnp.asarray(fwd[..., 1]))
jax.block_until_ready(u1g)
print(f"tvl2_global warm: {time.time()-t0:.2f}s")
