#!/usr/bin/env python
"""Probe windowed (2-D slice) scatter/gather vs the flat-index formulations
used by the sweep (r4 kernel work).

The trace (scripts/tpu_trace_ops.py) shows the two working-flow scatters
(121*B scalar updates each) cost 1.2 ms/sweep at B=1024 and 9.6 ms at
B=8192 — the single largest sweep phase.  A windowed formulation scatters
B (11,11) windows instead of 121*B scalars (update windows at clamped 2-D
starts; masked cells carry values gathered from the same window, making
those writes idempotent).

Usage: python scripts/tpu_window_probe.py [B]
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
n = H * W
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
P = 11
REPS = 20
key = jax.random.PRNGKey(0)
cy = jax.random.randint(key, (B,), 0, H - P)
cx = jax.random.randint(key, (B,), 0, W - P)
flatq = ((cy[:, None, None] + jnp.arange(P)[None, :, None]) * W
         + cx[:, None, None] + jnp.arange(P)[None, None, :]).reshape(-1)
vals = jax.random.uniform(key, (B, P, P), jnp.float32)


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


zf = jnp.zeros((n + 1,), jnp.float32)
z2 = jnp.zeros((H, W), jnp.float32)


def f_flat(c):
    q = (flatq + (c[0] > 0).astype(jnp.int32)) % n
    return c.at[q].set(vals.reshape(-1))


def f_win_scatter(c):
    # one scatter of B (P,P) windows on the 2-D plane
    cy2 = (cy + (c[0, 0] > 0).astype(jnp.int32)) % (H - P)
    starts = jnp.stack([cy2, cx], axis=-1)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))
    return lax.scatter(c, starts, vals, dn,
                       indices_are_sorted=False, unique_indices=False)


def f_win_gather(c):
    # B (P,P) windows gathered from the 2-D plane (the crop read analogue)
    cy2 = (cy + (c[0, 0] > 0).astype(jnp.int32)) % (H - P)
    starts = jnp.stack([cy2, cx], axis=-1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    g = lax.gather(c, starts, dn, slice_sizes=(P, P),
                   mode=lax.GatherScatterMode.CLIP)
    return c.at[0, 0].set(g.sum() * 1e-30 + c[0, 0])


def f_win_gather6(c):
    # 6-channel windows (the state-plane crop: (B, P, P, 6))
    cy2 = (cy + (c[0, 0, 0] > 0).astype(jnp.int32)) % (H - P)
    starts = jnp.stack([cy2, cx], axis=-1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    g = lax.gather(c, starts, dn, slice_sizes=(P, P, 6),
                   mode=lax.GatherScatterMode.CLIP)
    return c.at[0, 0, 0].set(g.sum() * 1e-30 + c[0, 0, 0])


def f_rowwin_scatter(c):
    # scatter as B*P row-segments of width P on the flat plane
    cy2 = (cy + (c[0] > 0).astype(jnp.int32)) % (H - P)
    starts = ((cy2[:, None] + jnp.arange(P)[None, :]) * W
              + cx[:, None]).reshape(-1, 1)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    return lax.scatter(c, starts, vals.reshape(-1, P), dn,
                       indices_are_sorted=False, unique_indices=False)


timeit(f"flat scatter 121B scalars (B={B})", f_flat, zf)
timeit("window scatter Bx(11,11) 2-D", f_win_scatter, z2)
timeit("row-window scatter BPx(11,) flat", f_rowwin_scatter, zf)
timeit("window gather Bx(11,11) 2-D", f_win_gather, z2)
timeit("window gather Bx(11,11,6)", f_win_gather6,
       jnp.zeros((H, W, 6), jnp.float32))
