#!/usr/bin/env python
"""Probe round 2: scatter `unique_indices` and top_k alternatives.

The r4 roofline (scripts/tpu_roofline.py) shows the sweep is
latency-bound: scatters run ~1 GB/s (0.1% HBM peak) because XLA serialises
scatters whose indices may collide.  Candidates:

  * unique_indices=True on the B-sized fix/centre scatters (top_k indices
    ARE unique — safe) and on the working-flow payload sets (the "approx"
    mode already accepts arbitrary collision resolution; XLA documents
    duplicate behaviour as undefined, measured here before adopting);
  * merged payload: one scatter writing a (len, 2) row per index;
  * jax.lax.approx_max_k vs lax.top_k over the 446k candidate field.

Usage: python scripts/tpu_scatter_probe2.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax import lax

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

n = 436 * 1024
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
REPS = 20
key = jax.random.PRNGKey(0)
qB = jax.random.permutation(key, n)[:B]          # unique
q4 = jax.random.randint(key, (4 * B,), 0, n)     # duplicates possible
vB = jax.random.uniform(key, (B,), jnp.float32)
v4 = jax.random.uniform(key, (4 * B,), jnp.float32)
big_q = jax.random.randint(key, (B * 121,), 0, n)
big_v = jax.random.uniform(key, (B * 121,), jnp.float32)
elig = jax.random.uniform(key, (n,), jnp.float32)


def timeit(name, fn, carry):
    def rep(c0):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, c0, None, length=REPS)
        return c
    f = jax.jit(rep)
    r = jax.block_until_ready(f(carry))
    t0 = time.time()
    r = jax.block_until_ready(f(carry))
    dt = (time.time() - t0) / REPS
    print(f"{name:52s} {dt*1000:9.3f} ms")


z = jnp.zeros((n,), jnp.float32)
z2 = jnp.zeros((n, 2), jnp.float32)


def mk_setB(unique):
    def f(c):
        u, v = c
        q = (qB + (u[0] > 0).astype(jnp.int32)) % n
        u = u.at[q].set(vB, unique_indices=unique)
        v = v.at[q].set(vB, unique_indices=unique)
        return (u, v)
    return f


def mk_setB_rows(unique):
    def f(c):
        q = (qB + (c[0, 0] > 0).astype(jnp.int32)) % n
        vals = jnp.stack([vB, vB], axis=-1)
        return c.at[q].set(vals, unique_indices=unique)
    return f


def mk_set4(unique):
    def f(c):
        u, v = c
        q = (q4 + (u[0] > 0).astype(jnp.int32)) % n
        u = u.at[q].set(v4, unique_indices=unique)
        v = v.at[q].set(v4, unique_indices=unique)
        return (u, v)
    return f


def mk_min4(unique):
    def f(c):
        q = (q4 + (c[0] > 0).astype(jnp.int32)) % n
        return c.at[q].min(v4, unique_indices=unique)
    return f


def mk_wflow(unique):
    def f(c):
        u, v = c
        q = (big_q + (u[0] > 0).astype(jnp.int32)) % n
        u = u.at[q].set(big_v, unique_indices=unique)
        v = v.at[q].set(big_v, unique_indices=unique)
        return (u, v)
    return f


def mk_wflow_rows(unique):
    def f(c):
        q = (big_q + (c[0, 0] > 0).astype(jnp.int32)) % n
        vals = jnp.stack([big_v, big_v], axis=-1)
        return c.at[q].set(vals, unique_indices=unique)
    return f


timeit("fix set 2x(B) dup-safe", mk_setB(False), (z, z))
timeit("fix set 2x(B) unique", mk_setB(True), (z, z))
timeit("fix set rows (B,2) dup-safe", mk_setB_rows(False), z2)
timeit("fix set rows (B,2) unique", mk_setB_rows(True), z2)
timeit("cand set 2x(4B) dup-safe", mk_set4(False), (z, z))
timeit("cand set 2x(4B) unique(UNSAFE)", mk_set4(True), (z, z))
timeit("cand min 1x(4B) dup-safe", mk_min4(False), z)
timeit("cand min 1x(4B) unique(UNSAFE)", mk_min4(True), z)
timeit("wflow set 2x(121B) dup-safe", mk_wflow(False), (z, z))
timeit("wflow set 2x(121B) unique(UNSAFE)", mk_wflow(True), (z, z))
timeit("wflow rows (121B,2) dup-safe", mk_wflow_rows(False), z2)
timeit("wflow rows (121B,2) unique(UNSAFE)", mk_wflow_rows(True), z2)


# --- top_k alternatives over the (n,) eligible field
def f_topk(c):
    e = elig + c[0] * 1e-30
    neg, idx = lax.top_k(-e, B)
    return c * (1 + (neg[0] + idx[0]) * 1e-30)


def f_approx(c):
    e = elig + c[0] * 1e-30
    neg, idx = lax.approx_max_k(-e, B, recall_target=0.95)
    return c * (1 + (neg[0] + idx[0]) * 1e-30)


def f_approx99(c):
    e = elig + c[0] * 1e-30
    neg, idx = lax.approx_max_k(-e, B, recall_target=0.99)
    return c * (1 + (neg[0] + idx[0]) * 1e-30)


timeit(f"top_k n=446k k={B}", f_topk, z[:n])
timeit(f"approx_max_k r=.95 k={B}", f_approx, z[:n])
timeit(f"approx_max_k r=.99 k={B}", f_approx99, z[:n])
