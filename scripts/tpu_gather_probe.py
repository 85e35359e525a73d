#!/usr/bin/env python
"""Correctness + timing of the Pallas DMA patch gather vs the XLA gather.

Usage: python scripts/tpu_gather_probe.py [bsz] [nch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from faldoi_tpu.ops.pallas_sweep import (
    _pallas_gather_patches, _xla_gather_patches,
)

bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
nch = int(sys.argv[2]) if len(sys.argv) > 2 else 6
h, w, p = 436, 1024, 16
print(f"# device: {jax.devices()[0]} bsz={bsz} nch={nch}", file=sys.stderr)

key = jax.random.PRNGKey(0)
stack = jax.random.uniform(key, (h + p, w + p, nch), jnp.float32)
oy = jax.random.randint(key, (bsz,), 0, h)
ox = jax.random.randint(jax.random.PRNGKey(1), (bsz,), 0, w)

ref = _xla_gather_patches(stack, oy, ox, p)
got = _pallas_gather_patches(stack, oy, ox, p)
np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
print("exact match", flush=True)


def timeit(name, fn):
    # chain REPS calls with a data dependency to defeat hoisting
    REPS = 20

    @jax.jit
    def run(stk, o1, o2):
        def body(c, _):
            r = fn(stk, (o1 + c) % h, o2, p)
            return c + (r[0, 0, 0, 0] > 2).astype(jnp.int32), None

        c, _ = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                            length=REPS)
        return c

    r = run(stack, oy, ox)
    jax.block_until_ready(r)
    t0 = time.time()
    jax.block_until_ready(run(stack, oy, ox))
    dt = (time.time() - t0) / REPS
    print(f"{name:24s} {dt * 1000:8.3f} ms")


timeit("xla gather", _xla_gather_patches)
for lps in (128, 256):
    timeit(f"pallas dma (lps={lps})",
           lambda s, a, b, pp, _l=lps: _pallas_gather_patches(
               s, a, b, pp, lanes_per_step=_l))
