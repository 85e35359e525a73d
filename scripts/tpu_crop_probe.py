#!/usr/bin/env python
"""Compare per-plane crops vs one channels-last stacked crop."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax import lax

h, w, bsz, p, C = 436, 1024, 8192, 11, 8
REPS = 20
key = jax.random.PRNGKey(0)
planes = jax.random.uniform(key, (C, h + p, w + p), jnp.float32)
planes_last = jnp.transpose(planes, (1, 2, 0))
oy = jax.random.randint(key, (bsz,), 0, h)
ox = jax.random.randint(key, (bsz,), 0, w)


def timeit(name, fn, carry):
    def rep(c0):
        def body(c, _):
            return fn(c), None
        return lax.scan(body, c0, None, length=REPS)[0]
    f = jax.jit(rep)
    r = f(carry)
    jax.block_until_ready(r)
    t0 = time.time()
    jax.block_until_ready(f(carry))
    print(f"{name:50s} {(time.time()-t0)/REPS*1000:9.2f} ms")


def f_sep(c):
    o2 = (oy + (c[0] > 0)) % h
    outs = []
    for k in range(C):
        outs.append(jax.vmap(
            lambda a, b: lax.dynamic_slice(planes[k], (a, b), (p, p)),
            out_axes=-1)(o2, ox))
    return c + sum(o.mean() for o in outs) * 1e-30
timeit("8 separate vmapped crops", f_sep, jnp.zeros((4,)))


def f_stack(c):
    o2 = (oy + (c[0] > 0)) % h
    outs = jax.vmap(
        lambda a, b: lax.dynamic_slice(planes_last, (a, b, 0), (p, p, C)),
        out_axes=-1)(o2, ox)
    return c + outs.mean() * 1e-30
timeit("1 stacked channels-last crop (p,p,C)", f_stack, jnp.zeros((4,)))


def f_stack_major(c):
    o2 = (oy + (c[0] > 0)) % h
    outs = jax.vmap(
        lambda a, b: lax.dynamic_slice(planes, (0, a, b), (C, p, p)),
        out_axes=-1)(o2, ox)
    return c + outs.mean() * 1e-30
timeit("1 stacked channels-major crop (C,p,p)", f_stack_major, jnp.zeros((4,)))


# gather whole rows instead: for each patch, 11 rows of width p from (h+p, (w+p)*C)?
def f_rows(c):
    o2 = (oy + (c[0] > 0)) % h
    # gather p rows per patch from channels-last flattened rows
    flat = planes_last.reshape(h + p, (w + p) * C)
    def one(a, b):
        rows = lax.dynamic_slice(flat, (a, 0), (p, (w + p) * C))
        return lax.dynamic_slice(rows, (0, b * C), (p, p * C))
    outs = jax.vmap(one, out_axes=-1)(o2, ox)
    return c + outs.mean() * 1e-30
timeit("2-level row crop", f_rows, jnp.zeros((4,)))
