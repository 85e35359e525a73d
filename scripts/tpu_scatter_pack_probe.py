#!/usr/bin/env python
"""Packed vs separate payload scatters at sweep shapes.

The sweep's working-flow scatter writes (key-max winner) u and v planes with
two separate 1M-element scatter ops; if one scatter of (M, 2) rows costs
about the same as one of (M,), packing halves the payload-scatter cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

N = 436 * 1024
M = 121 * 8192


def bench(fn, *args, reps=20):
    for _ in range(3):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print(f"# device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, N, M))
    u = jnp.asarray(rng.random(M, np.float32))
    v = jnp.asarray(rng.random(M, np.float32))
    uv = jnp.stack([u, v], -1)
    tu = jnp.zeros((N + 1,), jnp.float32)
    tuv = jnp.zeros((N + 1, 2), jnp.float32)

    f_sep = jax.jit(lambda a, b: (a.at[q].set(u), b.at[q].set(v)))
    f_pack = jax.jit(lambda a: a.at[q].set(uv))
    f_one = jax.jit(lambda a: a.at[q].set(u))
    f_max = jax.jit(lambda a: a.at[q].max(u))
    print(f"separate u+v set     {bench(f_sep, tu, tu):7.2f} ms")
    print(f"packed (M,2) set     {bench(f_pack, tuv):7.2f} ms")
    print(f"single (M,) set      {bench(f_one, tu):7.2f} ms")
    print(f"single (M,) max      {bench(f_max, tu):7.2f} ms")

    # gather readback (winner detect)
    f_gath = jax.jit(lambda a: a[q])
    print(f"single (M,) gather   {bench(f_gath, tu):7.2f} ms")

    # 4*bsz-sized ops (candidate scatters)
    M2 = 4 * 8192
    q2 = jnp.asarray(rng.integers(0, N, M2))
    u2 = jnp.asarray(rng.random(M2, np.float32))
    uv2 = jnp.stack([u2, u2], -1)
    f_sep2 = jax.jit(lambda a, b: (a.at[q2].set(u2), b.at[q2].set(u2)))
    f_pack2 = jax.jit(lambda a: a.at[q2].set(uv2))
    print(f"4bsz sep u+v set     {bench(f_sep2, tu, tu):7.2f} ms")
    print(f"4bsz packed set      {bench(f_pack2, tuv):7.2f} ms")


if __name__ == "__main__":
    main()
