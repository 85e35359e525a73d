"""Pallas TPU kernel experiments for the sweep body's memory-bound pieces.

Status: measured and documented NEGATIVE result (kept as the record and a
starting point for tile-aligned variants).

The wavefront sweep's per-lane costs are irregular small-window moves: the
patch crop (B ``dynamic_slice``s of (p, p, C) windows) and the patch-extent
scatters.  An in-program profile (scripts/tpu_profile_sweep.py, 436x1024)
shows XLA already handles these far better than the standalone
micro-benchmarks suggested: at B=1024 the crop's dynamic-slice fusion is
~1.0 ms/sweep and all scatter (dynamic-update-slice) fusions together are
~3.7 ms/sweep of a ~12 ms sweep; at B=8192 ~1.2 ms and ~9 ms of ~91 ms.

The natural Pallas replacement — one async DMA descriptor per (p, p, C)
window straight into the output block (``_pallas_gather_patches`` below) —
compiles through the Mosaic pipeline but is REJECTED at the memref level:
DMA slices along the lane-tiled minor dimension must be 128-aligned
("Slice shape along dimension 2 must be aligned to tiling (128), but is
6"), and every layout of a 16-wide window puts a sub-128 extent on the
minor dim.  Beating XLA here requires tile-aligned overfetch (copy
(24, 256)-aligned regions per lane, extract in-kernel via dynamic rolls or
one-hot MXU matmuls) — ~16x data amplification for ~2-4x projected win on
a piece that is <15%% of the sweep.  Not worth it while sweep COUNT and
batch-size adaptation dominate (see core/local_step.py grow_pair).

``gather_patches`` therefore defaults to the XLA gather everywhere; the
Pallas path is kept for explicit experimentation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_gather_patches(stack, oy, ox, p):
    """vmapped dynamic_slice (XLA gather): (H, W, C) -> (p, p, C, B)."""
    nch = stack.shape[-1]

    def one(oy_k, ox_k):
        return jax.lax.dynamic_slice(stack, (oy_k, ox_k, 0), (p, p, nch))

    return jax.vmap(one, out_axes=-1)(oy, ox)


@functools.partial(jax.jit, static_argnames=("p", "lanes_per_step"))
def _pallas_gather_patches(stack, oy, ox, p, lanes_per_step=128):
    """Per-window async-DMA gather.  DOES NOT COMPILE on current Mosaic:
    the per-lane (p, p, C) DMA slices the lane-tiled minor dim at sub-128
    extents (see module docstring).  Kept for tile-aligned rework."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hp, wp, nch = stack.shape
    b = oy.shape[0]
    lb = lanes_per_step
    assert b % lb == 0 and lb % 128 == 0, (b, lb)

    def kernel(oy_ref, ox_ref, stack_ref, out_ref, sems):
        i = pl.program_id(0)

        def issue(l, _):
            lane = i * lb + l
            pltpu.make_async_copy(
                stack_ref.at[pl.ds(oy_ref[lane], p),
                             pl.ds(ox_ref[lane], p), :],
                out_ref.at[:, :, :, l],
                sems.at[l],
            ).start()
            return 0

        jax.lax.fori_loop(0, lb, issue, 0)

        def wait(l, _):
            lane = i * lb + l
            pltpu.make_async_copy(
                stack_ref.at[pl.ds(oy_ref[lane], p),
                             pl.ds(ox_ref[lane], p), :],
                out_ref.at[:, :, :, l],
                sems.at[l],
            ).wait()
            return 0

        jax.lax.fori_loop(0, lb, wait, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // lb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (p, p, nch, lb), lambda i, *_: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((lb,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, p, nch, b), stack.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(oy, ox, stack)


def gather_patches(stack, oy, ox, p, lanes_per_step=128):
    """(H, W, C), (B,), (B,) -> (p, p, C, B) patch crops (XLA gather)."""
    return _xla_gather_patches(stack, oy, ox, p)
