#!/usr/bin/env python
"""Pallas spike (r4): can per-lane ALIGNED window DMAs beat XLA's batched
row-gather for the sweep's warp-window fetch?

The XLA block-gather fetch costs ~55 ns per gathered row (width-independent
<= 128 lanes; scripts/tpu_crop3_probe.py), i.e. ~5.3 ms/sweep at bsz=8192
for the (3, 24-32, 64) warp windows.  Mosaic DMA constraints: minor-dim
slices must be 128-lane aligned -> fetch (40, 256) windows at
(8-aligned row, 128-aligned col) origins covering any 24x(<=128-spread)
sample window.  This probe measures ONLY the data movement + a trivial
reduce, double-buffered, G lanes per grid step.

Verdict recorded in EXPERIMENTS_r04.jsonl (`pallas_gather`).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 440, 1024           # H padded to 8 | W multiple of 128
ROWS, COLS = 40, 128
C = 3
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
G = 4                      # lanes per grid step
REPS = 10

key = jax.random.PRNGKey(0)
planes = jax.random.uniform(key, (C, H, W), jnp.float32)
oy8 = (jax.random.randint(key, (B,), 0, (H - ROWS) // 8) * 8).astype(jnp.int32)
cb = (jax.random.randint(key, (B,), 0, (W - COLS) // 128) * 128).astype(jnp.int32)


def kernel(oy_ref, cb_ref, hbm_ref, out_ref, scratch, sems):
    g = pl.program_id(0)

    def get_dma(slot, lane):
        i = g * G + lane if False else None  # noqa: readability
        return None

    def body():
        # simple (non-pipelined across grid steps) double buffer over the
        # G lanes of this step
        def fetch(slot, k):
            lane = g * G + k
            oy = pl.multiple_of(oy_ref[lane], 8)
            cbk = pl.multiple_of(cb_ref[lane], 128)
            return pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(oy, ROWS), pl.ds(cbk, COLS)],
                scratch.at[slot],
                sems.at[slot],
            )

        fetch(0, 0).start()
        for k in range(G):
            slot = k % 2
            if k + 1 < G:
                fetch((k + 1) % 2, k + 1).start()
            fetch(slot, k).wait()
            out_ref[pl.ds(g * G + k, 1), :] = (
                jnp.sum(scratch[slot]) * 1e-6
                + jnp.zeros((1, 128), jnp.float32))

    body()


@jax.jit
def run(planes, oy8, cb):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, C, ROWS, COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
    )(oy8, cb, planes)


def scan_reps(fn, *args):
    @jax.jit
    def rep(c):
        def body(carry, _):
            r = fn(planes, oy8 + (carry > 0).astype(jnp.int32) * 0, cb)
            return carry + r[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, c, None, length=REPS)
        return c
    return rep


print(f"# device: {jax.devices()[0]}  B={B}", file=sys.stderr)
try:
    r = run(planes, oy8, cb)
    jax.block_until_ready(r)
    rep = scan_reps(run)
    c = rep(jnp.float32(0.0)); jax.block_until_ready(c)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(rep(jnp.float32(0.0)))
        best = min(best, time.time() - t0)
    vol = B * C * ROWS * COLS * 4 / 1e6
    print(f"pallas window DMA (B={B}, {C}x{ROWS}x{COLS}): "
          f"{best/REPS*1000:.3f} ms  ({vol:.0f} MB -> "
          f"{vol/1e3/(best/REPS):.0f} GB/s)")
except Exception as e:
    import traceback; traceback.print_exc()
