#!/usr/bin/env python
"""Probe scatter formulations for the sweep body's payload updates.

The sweep body writes (e, u, v, chi) payloads through scatter-min/max at
three sites; round-2's formulation used one scatter PER PLANE per direction
(~32 small scatters/sweep, overhead-bound at ~1.6 ms each on the tunneled
v5e).  Candidates measured here:

  a) separate: 4 planes x 4 directions = 16 scatters of B      (baseline)
  b) dir-concat: 4 planes x 1 scatter of 4B
  c) flat-interleave: payload planes interleaved in one (3n,) array,
     one scatter of 3*4B scalar updates (contiguous rows per index)
  d) rows: payload as (n, 4) rows, one scatter of 4B row updates
     (minor dim padded to the 128 lane width by TPU tiling - may lose)
  e) rows-major: payload as (4, n), scatter on axis 1

Usage: python scripts/tpu_scatter_probe.py [n] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 436 * 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
REPS = 20
key = jax.random.PRNGKey(0)
q4 = jax.random.randint(key, (4 * B,), 0, n)
v4 = jax.random.uniform(key, (4 * B,), jnp.float32)
big_q = jax.random.randint(key, (B * 121,), 0, n)
big_v = jax.random.uniform(key, (B * 121,), jnp.float32)


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
    print(f"{name:48s} {dt*1000:9.2f} ms")


# --- candidate-update site: 4 directions x (1 min + 3 payload sets)
def f_separate(c):
    e, u, v, x = c
    for k in range(4):
        q = (q4[k * B:(k + 1) * B] + (e[0] > 0).astype(jnp.int32)) % n
        vv = v4[k * B:(k + 1) * B]
        e = e.at[q].min(vv)
        u = u.at[q].set(vv)
        v = v.at[q].set(vv)
        x = x.at[q].set(vv)
    return (e, u, v, x)


def f_dirconcat(c):
    e, u, v, x = c
    q = (q4 + (e[0] > 0).astype(jnp.int32)) % n
    e = e.at[q].min(v4)
    u = u.at[q].set(v4)
    v = v.at[q].set(v4)
    x = x.at[q].set(v4)
    return (e, u, v, x)


def f_flat(c):
    e, p = c  # p: (3n,) interleaved [u0 v0 chi0 u1 ...]
    q = (q4 + (e[0] > 0).astype(jnp.int32)) % n
    e = e.at[q].min(v4)
    q3 = (q[:, None] * 3 + jnp.arange(3)[None, :]).reshape(-1)
    vals = jnp.stack([v4, v4, v4], axis=-1).reshape(-1)
    p = p.at[q3].set(vals)
    return (e, p)


def f_rows(c):
    e, p = c  # p: (n, 3)
    q = (q4 + (e[0] > 0).astype(jnp.int32)) % n
    e = e.at[q].min(v4)
    vals = jnp.stack([v4, v4, v4], axis=-1)
    p = p.at[q].set(vals)
    return (e, p)


def f_rows_major(c):
    e, p = c  # p: (3, n)
    q = (q4 + (e[0] > 0).astype(jnp.int32)) % n
    e = e.at[q].min(v4)
    vals = jnp.stack([v4, v4, v4], axis=0)
    p = p.at[:, q].set(vals)
    return (e, p)


z = jnp.zeros((n,), jnp.float32)
timeit("a) separate 16xB", f_separate, (z, z, z, z))
timeit("b) dir-concat 4x(4B)", f_dirconcat, (z, z, z, z))
timeit("c) flat-interleave 1x(3*4B)+min", f_flat,
       (z, jnp.zeros((3 * n,), jnp.float32)))
timeit("d) rows (n,3) 1x(4B rows)+min", f_rows,
       (z, jnp.zeros((n, 3), jnp.float32)))
timeit("e) rows-major (3,n)+min", f_rows_major,
       (z, jnp.zeros((3, n), jnp.float32)))

# --- working-flow site: B*121 updates
def g_separate(c):
    kbuf, u, v, x = c
    q = (big_q + (kbuf[0] > 0).astype(jnp.int32)) % n
    kbuf = kbuf.at[q].max(big_v)
    u = u.at[q].set(big_v)
    v = v.at[q].set(big_v)
    x = x.at[q].set(big_v)
    return (kbuf, u, v, x)


def g_flat(c):
    kbuf, p = c
    q = (big_q + (kbuf[0] > 0).astype(jnp.int32)) % n
    kbuf = kbuf.at[q].max(big_v)
    q3 = (q[:, None] * 3 + jnp.arange(3)[None, :]).reshape(-1)
    vals = jnp.stack([big_v, big_v, big_v], axis=-1).reshape(-1)
    p = p.at[q3].set(vals)
    return (kbuf, p)


def g_2only(c):
    # chi dropped (TVL1 family): key max + 2 payload planes
    kbuf, u, v = c
    q = (big_q + (kbuf[0] > 0).astype(jnp.int32)) % n
    kbuf = kbuf.at[q].max(big_v)
    u = u.at[q].set(big_v)
    v = v.at[q].set(big_v)
    return (kbuf, u, v)


timeit("wflow separate 4x(121B)", g_separate, (z, z, z, z))
timeit("wflow flat-interleave", g_flat, (z, jnp.zeros((3 * n,), jnp.float32)))
timeit("wflow 3x(121B) (no chi)", g_2only, (z, z, z))
