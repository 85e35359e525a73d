#!/usr/bin/env python
"""Does Pallas compile+run on this (tunneled axon) TPU backend?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print(f"# device: {jax.devices()[0]}")


def kernel(x_ref, y_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0 + y_ref[...]


@jax.jit
def f(x, y):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, y)


x = jnp.ones((256, 256), jnp.float32)
y = jnp.ones((256, 256), jnp.float32)
t0 = time.time()
out = jax.block_until_ready(f(x, y))
print(f"elementwise pallas ok in {time.time() - t0:.1f}s:",
      float(out[0, 0]) == 3.0)


# grid + VMEM blocking + in-kernel loop (the PD-kernel shape)
def kernel2(x_ref, o_ref):
    acc = x_ref[...]
    for _ in range(4):
        acc = acc + jnp.roll(acc, 1, axis=0) * 0.25
    o_ref[...] = acc


@jax.jit
def g(x):
    return pl.pallas_call(
        kernel2,
        grid=(x.shape[-1] // 128,),
        in_specs=[pl.BlockSpec((11, 11, 128), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((11, 11, 128), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


x2 = jnp.ones((11, 11, 1024), jnp.float32)
t0 = time.time()
out2 = jax.block_until_ready(g(x2))
print(f"gridded pallas ok in {time.time() - t0:.1f}s, shape {out2.shape}")
