#!/usr/bin/env python
"""Batched patch-crop formulations vs the vmapped dynamic_slice.

The device trace (scripts/tpu_profile_sweep.py) shows the vmapped
``dynamic_slice`` crop lowers to a SERIAL per-patch while loop on TPU
(~1.4-3 us per patch: tiny slice + dynamic-update-slice per iteration), and
the same pattern repeats for the bicubic window slices inside the solver —
together the majority of the sweep cost at small batch.

Candidate replacements measured here:

  dslice      current: vmapped lax.dynamic_slice (serial loop)
  blockgather pre-split columns into overlapping 128-wide blocks (stride
              BS), so every p-wide window lives in ONE block; gather rows
              of blocks (slice covers full trailing dims -> XLA's fast
              embedding-style gather), then extract the p columns with a
              one-hot MXU matmul over the 128 lanes
  rowgather   gather full (W+p) rows per patch row, one-hot column extract
  take        flat elementwise take of all p*p cells

Usage: python scripts/tpu_crop2_probe.py [bsz] [nch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
nch = int(sys.argv[2]) if len(sys.argv) > 2 else 6
h, w, p = 436, 1024, 11
hp, wp = h + p, w + p
REPS = 20
print(f"# device: {jax.devices()[0]} bsz={bsz} nch={nch}", file=sys.stderr)

key = jax.random.PRNGKey(0)
stack = jax.random.uniform(key, (hp, wp, nch), jnp.float32)
oy = np.asarray(jax.random.randint(key, (bsz,), 0, h))
ox = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (bsz,), 0, w))
oy = jnp.asarray(oy)
ox = jnp.asarray(ox)

BS = 64          # block stride; block width 128 covers any p<=65 window
NBLK = -(-wp // BS)


def make_blocks(stk):
    # (H, W, C) -> (H, NBLK, 128, C); block k covers columns [BS*k, BS*k+128)
    pad = jnp.pad(stk, ((0, 0), (0, BS * (NBLK - 1) + 128 - wp), (0, 0)))
    idx = (jnp.arange(NBLK) * BS)[:, None] + jnp.arange(128)[None, :]
    return pad[:, idx, :]  # (H, NBLK, 128, C)


blocks = make_blocks(stack)


def crop_dslice(stk, oy, ox):
    def one(a, b):
        return lax.dynamic_slice(stk, (a, b, 0), (p, p, nch))
    return jax.vmap(one, out_axes=-1)(oy, ox)  # (p, p, C, B)


def crop_blockgather(blk, oy, ox):
    bx = ox // BS
    off = ox - bx * BS                       # [0, BS)
    rows = oy[:, None] + jnp.arange(p)[None, :]          # (B, p)
    # gather (B, p) (row, block) pairs -> (B, p, 128, C)
    g = blk[rows, bx[:, None]]
    # one-hot column extract on the MXU: out[b,r,j,c] = g[b,r,off+j,c]
    onehot = (off[:, None, None] + jnp.arange(p)[None, :, None]
              == jnp.arange(128)[None, None, :]).astype(g.dtype)  # (B,p,128)
    out = jnp.einsum("bjl,brlc->rjcb", onehot, g,
                     precision=lax.Precision.HIGHEST)
    return out


def crop_rowgather(stk, oy, ox):
    rows = oy[:, None] + jnp.arange(p)[None, :]
    g = stk[rows]                                         # (B, p, W+p, C)
    onehot = (ox[:, None, None] + jnp.arange(p)[None, :, None]
              == jnp.arange(wp)[None, None, :]).astype(g.dtype)
    return jnp.einsum("bjl,brlc->rjcb", onehot, g,
                      precision=lax.Precision.HIGHEST)


def crop_take(stk, oy, ox):
    flat = stk.reshape(-1, nch)
    rows = (oy[:, None] + jnp.arange(p)[None, :])[:, :, None]
    cols = (ox[:, None] + jnp.arange(p)[None, :])[:, None, :]
    idx = rows * wp + cols                                # (B, p, p)
    g = flat[idx.reshape(-1)]                             # (B*p*p, C)
    return g.reshape(bsz, p, p, nch).transpose(1, 2, 3, 0)


ref = np.asarray(crop_dslice(stack, oy, ox))
for name, fn, arg in (
    ("blockgather", crop_blockgather, blocks),
    ("rowgather", crop_rowgather, stack),
    ("take", crop_take, stack),
):
    got = np.asarray(jax.jit(fn)(arg, oy, ox))
    np.testing.assert_allclose(ref, got, atol=0, rtol=0, err_msg=name)
print("all variants exact vs dynamic_slice", flush=True)


def timeit(name, fn, arg):
    @jax.jit
    def run(a, o1, o2):
        def body(c, _):
            r = fn(a, (o1 + c) % h, o2)
            return c + (r[0, 0, 0, 0] > 2).astype(jnp.int32), None
        c, _ = lax.scan(body, jnp.asarray(0, jnp.int32), None, length=REPS)
        return c

    r = run(arg, oy, ox)
    jax.block_until_ready(r)
    t0 = time.time()
    jax.block_until_ready(run(arg, oy, ox))
    print(f"{name:14s} {(time.time() - t0) / REPS * 1000:8.3f} ms")


timeit("dslice", crop_dslice, stack)
timeit("blockgather", crop_blockgather, blocks)
timeit("rowgather", crop_rowgather, stack)
timeit("take", crop_take, stack)
