#!/usr/bin/env python
"""Measure the axon tunnel's dispatch characteristics: per-launch throughput,
sync round-trip latency, and on-device sweep time — to pick the growing
execution mode (step / chunked / fused) rationally.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
     timeout 580 python scripts/tpu_latency_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print(f"device: {jax.devices()[0]}", flush=True)

# 1. trivial kernel: dispatch throughput + sync latency
@jax.jit
def tiny(x):
    return x + 1.0

x = jnp.zeros((8, 128), jnp.float32)
x = tiny(x).block_until_ready()  # compile

t0 = time.time()
for _ in range(20):
    x = tiny(x)
x.block_until_ready()
print(f"tiny x20 pipelined: {(time.time()-t0)/20*1000:.1f} ms/launch", flush=True)

t0 = time.time()
for _ in range(5):
    x = tiny(x).block_until_ready()
print(f"tiny x5 synced: {(time.time()-t0)/5*1000:.1f} ms/roundtrip", flush=True)

# 2. device->host fetch of a scalar
s = jnp.sum(x)
t0 = time.time()
for _ in range(5):
    v = int(jnp.sum(x)[()] if False else jax.device_get(jnp.sum(x)))
print(f"scalar fetch: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

# 3. real sweep body at full size: on-device time via chunked loop
from faldoi_tpu.core.local_step import grow_chunk, grow_step, init_state
from faldoi_tpu.core.functionals import make_solver_consts, solve_tvl1
from faldoi_tpu.core.patch_solver import pad_for_crops
from faldoi_tpu.ops import centered_gradient

h, w = 436, 1024
bsz = 8192
wr, p = 5, 11
rng = np.random.RandomState(0)
i0 = jnp.asarray(rng.rand(h, w).astype(np.float32))
i1 = jnp.asarray(rng.rand(h, w).astype(np.float32))
i1x, i1y = centered_gradient(i1)
sc = make_solver_consts(0, pad_for_crops(i0, p), i1, i1x, i1y,
                        40.0, 0.3, 0.125, 0.01, wr=wr, p=p)
st = init_state(h, w)
n = h * w
# fix a blob of seeds so sweeps do real work
st = st._replace(
    fixed=st.fixed.at[: n // 100].set(True),
    cand_e=st.cand_e.at[n // 100 : n // 50].set(1.0),
)
trust = jnp.ones((n + 1,), jnp.int32)
sal = jnp.ones((n + 1,), jnp.float32)
it = jnp.asarray(0, jnp.int32)

kw = dict(delta=float("inf"), fill="dense", floor=bsz, relax=True,
          warps=1, max_iters=4)

t0 = time.time()
st1, acc = grow_step(st, solve_tvl1, sc, trust, sal, it, h, w, wr, bsz, **kw)
jax.block_until_ready(st1)
print(f"grow_step compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
s2 = st
for _ in range(8):
    s2, acc = grow_step(s2, solve_tvl1, sc, trust, sal, it, h, w, wr, bsz, **kw)
jax.block_until_ready(s2)
print(f"grow_step x8 pipelined: {(time.time()-t0)/8*1000:.0f} ms/sweep", flush=True)

t0 = time.time()
s3, acc = grow_chunk(st, solve_tvl1, sc, trust, sal, it, h, w, wr, bsz,
                     chunk=16, **kw)
jax.block_until_ready(s3)
dt_c = time.time() - t0
print(f"grow_chunk16 compile+run: {dt_c:.1f}s", flush=True)
t0 = time.time()
s3, acc = grow_chunk(st, solve_tvl1, sc, trust, sal, it, h, w, wr, bsz,
                     chunk=16, **kw)
jax.block_until_ready(s3)
dt_c = time.time() - t0
print(f"grow_chunk16 warm: {dt_c:.1f}s -> {dt_c/16*1000:.0f} ms/sweep on-device",
      flush=True)
print("RC=0", flush=True)
