#!/usr/bin/env python
"""Probe crop-block geometry (width/stride) and warp-window rows for the
sweep's gather phases (r4 kernel work).

Trace evidence (tpu_trace_ops.py, B=8192): the state-plane crop chain reads
(B, 11, 128, 6) = 92 MB/sweep (11.6x overfetch from CROP_WIDTH=128) and
costs ~6.3 ms; the warp window gather reads (B, 32, 64) x4 channels
= 200 MB and costs ~5.3 ms.  Narrower blocks cut the gathered volume
proportionally IF the gather stays on the fast embedding path.

Usage: python scripts/tpu_crop3_probe.py [B]
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

H, W = 436, 1024
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
P = 11
REPS = 20
key = jax.random.PRNGKey(0)
oy = jax.random.randint(key, (B,), 0, H - P)
ox = jax.random.randint(key, (B,), 0, W - P)


def timeit(name, fn, carry):
    def rep(c0):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, c0, None, length=REPS)
        return c
    f = jax.jit(rep)
    r = jax.block_until_ready(f(carry))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = jax.block_until_ready(f(carry))
        best = min(best, time.time() - t0)
    print(f"{name:56s} {best/REPS*1000:9.3f} ms")


def crop_via_blocks(stride, width, C):
    """state-plane crop: gather block rows + one-hot extract (as
    crop_stack_blocks, incl. the NaN-transparent double einsum)."""
    nb = (W - 1) // stride + 1
    blocks = jax.random.uniform(key, (H + P, nb, width, C), jnp.float32)

    def f(c):
        o2 = (oy + (c[0, 0, 0, 0] > 0).astype(jnp.int32)) % (H - P)
        bx = ox // stride
        off = ox - bx * stride

        def one(oy_k, bx_k, off_k):
            rows = oy_k + jnp.arange(P)
            g = blocks[rows, bx_k]                    # (P, width, C)
            onehot = ((off_k + jnp.arange(P))[:, None]
                      == jnp.arange(width)[None, :]).astype(g.dtype)
            bad = jnp.isnan(g)
            vals = jnp.einsum("rlc,jl->rjc", jnp.where(bad, 0.0, g), onehot,
                              precision=lax.Precision.HIGHEST)
            hit = jnp.einsum("rlc,jl->rjc", bad.astype(g.dtype), onehot,
                             precision=lax.Precision.HIGHEST)
            return jnp.where(hit > 0.5, jnp.nan, vals)

        out = jax.vmap(one, out_axes=-1)(o2, bx, off)
        return c.at[0, 0, 0].set(c[0, 0, 0] + out.sum() * 1e-30)

    return f


def warp_blocks(stride, width, nrows, C):
    nb = (W - 1) // stride + 1
    blocks = jax.random.uniform(key, (C, H, nb, width), jnp.float32)

    def f(c):
        o2 = (oy + (c[0] > 0).astype(jnp.int32)) % (H - nrows)
        bx = jnp.minimum(ox // stride, nb - 1)

        def one(oy_k, bx_k):
            return blocks[:, oy_k + jnp.arange(nrows), bx_k]  # (C, nr, width)

        g = jax.vmap(one)(o2, bx)
        return c * (1 + g.sum() * 1e-30)

    return f


z = jnp.zeros((B, P, P, 6), jnp.float32)
for stride, width in ((64, 128), (16, 32), (32, 64), (8, 16)):
    timeit(f"crop gather+extract s{stride}/w{width} C=6 (B={B})",
           crop_via_blocks(stride, width, 6), z)

zw = jnp.ones((B,), jnp.float32)
for stride, width, nr in ((32, 64, 32), (32, 64, 16), (16, 32, 24),
                          (16, 48, 20)):
    timeit(f"warp window gather s{stride}/w{width}/nr{nr} C=3",
           warp_blocks(stride, width, nr, 3), zw)
