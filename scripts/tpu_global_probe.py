#!/usr/bin/env python
"""Profile tvl2_global's cost structure at full size on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from faldoi_tpu.core.pd_common import (tvl1_threshold, tvl2_getD, tvl2_getP,
                                       warp_constants)
from faldoi_tpu.ops import bicubic_warp, centered_gradient, divergence, forward_gradient

h, w = 436, 1024
key = jax.random.PRNGKey(0)
i0 = jax.random.uniform(key, (h, w), jnp.float32)
i1 = jax.random.uniform(key, (h, w), jnp.float32)
u1 = jax.random.normal(key, (h, w), jnp.float32)
u2 = jax.random.normal(key, (h, w), jnp.float32)
i1x, i1y = centered_gradient(i1)

ITERS = 400


def pd_fori(i0, i1, i1x, i1y, u1, u2):
    """One warp, fixed 400 PD iterations, no tolerance check."""
    l_t = 40.0 * 0.3
    i1w = bicubic_warp(i1, u1, u2, True)
    i1wx = bicubic_warp(i1x, u1, u2, True)
    i1wy = bicubic_warp(i1y, u1, u2, True)
    grad, rho_c = warp_constants(i0, i1w, i1wx, i1wy, u1, u2)

    def body(_, st):
        u1, u2, u1_, u2_, xi11, xi12, xi21, xi22 = st
        v1, v2 = tvl1_threshold(u1, u2, rho_c, i1wx, i1wy, grad, l_t)
        u1x, u1y = forward_gradient(u1_)
        u2x, u2y = forward_gradient(u2_)
        xi11, xi12, xi21, xi22 = tvl2_getD(xi11, xi12, xi21, xi22,
                                           u1x, u1y, u2x, u2y, 0.125)
        d1 = divergence(xi11, xi12)
        d2 = divergence(xi21, xi22)
        nu1, nu2, _un = tvl2_getP(u1, u2, v1, v2, d1, d2, 0.3, 0.125)
        return (nu1, nu2, 2 * nu1 - u1, 2 * nu2 - u2, xi11, xi12, xi21, xi22)

    z = jnp.zeros_like(u1)
    st = (u1, u2, u1, u2, z, z, z, z)
    st = jax.lax.fori_loop(0, ITERS, body, st)
    return st[0], st[1]


f = jax.jit(pd_fori)
r = f(i0, i1, i1x, i1y, u1, u2)
jax.block_until_ready(r)
t0 = time.time()
r = f(i0, i1, i1x, i1y, u1, u2)
jax.block_until_ready(r)
dt = time.time() - t0
per_it = (dt) / ITERS
bw = 11 * h * w * 4 * 2 / per_it / 1e9  # ~11 planes read+write per iter
print(f"1 warp x {ITERS} fori PD iters: {dt:.2f}s  ({per_it*1e3:.2f} ms/iter, "
      f"~{bw:.0f} GB/s effective)")

# dense bicubic warp cost
g = jax.jit(lambda u1, u2: bicubic_warp(i1, u1, u2, True))
r2 = g(u1, u2); jax.block_until_ready(r2)
t0 = time.time()
for _ in range(5):
    r2 = g(u1 + r2 * 1e-9, u2)
jax.block_until_ready(r2)
print(f"dense bicubic_warp full image: {(time.time()-t0)/5*1e3:.1f} ms")
