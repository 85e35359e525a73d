"""Block-aligned batched window gathers — the TPU-fast replacement for
vmapped ``lax.dynamic_slice`` crops.

Why this exists (measured, scripts/tpu_profile_sweep.py + the trace
analysis recorded in EXPERIMENTS_r03.jsonl): a vmapped ``dynamic_slice``
with per-lane origins lowers on TPU to a SERIAL device loop — one tiny
slice + dynamic-update-slice pair per lane, ~1.4-3 us each.  At bsz=8192
the growing sweep spent ~53 of 71 ms/sweep inside four such loops (the
state-plane crop, the two bicubic warp-window slices, and the source-patch
crop).  ``lax.gather`` with arbitrary windows hits the same path.

The fast formulation has two parts:

1. **Column blocks** (``make_col_blocks``): pre-split the image's column
   axis into overlapping ``width``-wide blocks at ``stride`` spacing, so
   that any window of extent <= width - stride + 1 lies entirely inside ONE
   block.  The result adds a block axis: (..., H, W) -> (..., H, NB, width).
2. **Row gather + one-hot extract**: a window read becomes plain advanced
   indexing ``blocks[oy + arange(nrows), bx]`` — a gather whose slices
   cover the full trailing (lane) dims, which XLA lowers to its fast
   embedding-style gather — followed, where a tight p-wide crop is needed,
   by a one-hot contraction over the ``width`` lanes on the MXU
   (``extract_cols``).  With ``Precision.HIGHEST`` the one-hot contraction
   is BIT-EXACT (f32 = 3 exact bf16 terms, each multiplied by an exact
   0/1, summed with exact zeros).

Measured (scripts/tpu_crop2_probe.py, 436x1024, (11,11,6) crops, TPU v5e):
vmapped dynamic_slice 16.0 ms @ bsz 8192 vs block gather 3.4 ms; 2.8 ms vs
1.4 ms @ 1024.

These helpers are used per-patch under ``vmap`` — the indexing and the
einsum batch natively (one gather / one batched matmul for the whole
sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def n_blocks(w: int, stride: int, width: int) -> int:
    """Number of blocks so that block ``k = ox // stride`` exists (and is
    right-padded to full ``width``) for every column ox in [0, w)."""
    return (w - 1) // stride + 1


def make_col_blocks(x: jnp.ndarray, stride: int, width: int) -> jnp.ndarray:
    """(..., H, W) -> (..., H, NB, width); block k covers columns
    [stride*k, stride*k + width).  Edge-padded on the right (clamped reads
    beyond W reproduce the Neumann/window-edge semantics of the callers).

    Built from NB static slices (fusable copies — no gather)."""
    w = x.shape[-1]
    nb = n_blocks(w, stride, width)
    pad_w = stride * (nb - 1) + width - w
    if pad_w:
        x = jnp.concatenate(
            [x, jnp.repeat(x[..., -1:], pad_w, axis=-1)], axis=-1
        )
    cols = [x[..., stride * k : stride * k + width] for k in range(nb)]
    return jnp.stack(cols, axis=-2)


def gather_window(blocks: jnp.ndarray, oy, bx, nrows: int) -> jnp.ndarray:
    """Read an (nrows, width)-window from single-plane blocks (H, NB, width)
    at row origin ``oy`` (scalar) and block index ``bx`` (scalar).  Under
    vmap this is one batched fast gather."""
    rows = oy + jnp.arange(nrows)
    return blocks[rows, bx]


def extract_cols(g: jnp.ndarray, off, p: int) -> jnp.ndarray:
    """One-hot MXU column crop: g (..., width) -> (..., p), columns
    [off, off+p).  Bit-exact for finite values (Precision.HIGHEST one-hot
    contraction) and NaN-transparent: a NaN cell stays a NaN in ITS column
    only.  (A plain one-hot matmul would smear it across the whole row —
    0*NaN = NaN — which silently poisons crops of NaN-sentinel state planes
    like the growing's working flow.)  +/-inf is NOT preserved (it would
    need a second mask); callers hold flows/weights/images, never inf."""
    width = g.shape[-1]
    onehot = (
        (off + jnp.arange(p))[:, None] == jnp.arange(width)[None, :]
    ).astype(g.dtype)
    bad = jnp.isnan(g)
    vals = jnp.einsum("...l,jl->...j", jnp.where(bad, 0.0, g), onehot,
                      precision=lax.Precision.HIGHEST)
    hit = jnp.einsum("...l,jl->...j", bad.astype(g.dtype), onehot,
                     precision=lax.Precision.HIGHEST)
    return jnp.where(hit > 0.5, jnp.nan, vals)


# ---------------------------------------------------------------------------
# p x p crops (the dynamic_slice replacements)
# ---------------------------------------------------------------------------

# Crop blocks use stride 64 / width 128: any p <= 65 window fits one block,
# the extract contraction is lane-aligned, and memory is 2x the source.
CROP_STRIDE = 64
CROP_WIDTH = 128


def make_crop_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H, NB, 128) crop blocks (stride 64)."""
    return make_col_blocks(x, CROP_STRIDE, CROP_WIDTH)


def crop_plane_blocks(blocks: jnp.ndarray, oy, ox, p: int) -> jnp.ndarray:
    """(p, p) crop from single-plane crop blocks (H, NB, 128) — the
    block-gather equivalent of patch_solver.crop_padded.  ``oy``/``ox``
    scalars (vmap for batches)."""
    bx = ox // CROP_STRIDE
    g = gather_window(blocks, oy, bx, p)           # (p, 128)
    return extract_cols(g, ox - bx * CROP_STRIDE, p)


def crop_stack_blocks(blocks: jnp.ndarray, oy, ox, p: int) -> jnp.ndarray:
    """(p, p, C) crop from channels-last crop blocks (H, NB, 128, C).
    NaN-transparent (see extract_cols) — the growing's state planes use NaN
    as the "missing" sentinel."""
    bx = ox // CROP_STRIDE
    rows = oy + jnp.arange(p)
    g = blocks[rows, bx]                            # (p, 128, C)
    off = ox - bx * CROP_STRIDE
    onehot = (
        (off + jnp.arange(p))[:, None] == jnp.arange(CROP_WIDTH)[None, :]
    ).astype(g.dtype)
    bad = jnp.isnan(g)
    # out[r, j, c] = g[r, off+j, c]
    vals = jnp.einsum("rlc,jl->rjc", jnp.where(bad, 0.0, g), onehot,
                      precision=lax.Precision.HIGHEST)
    hit = jnp.einsum("rlc,jl->rjc", bad.astype(g.dtype), onehot,
                     precision=lax.Precision.HIGHEST)
    return jnp.where(hit > 0.5, jnp.nan, vals)


# NaN sentinel for the fast (single-einsum) crop path: callers encode NaN
# as SENTINEL before blocking and decode (> SENTINEL/2 -> NaN) after the
# crop.  Exact: f32(1e30) rides the HIGHEST-precision one-hot contraction
# bit-exactly, and 0 * SENTINEL = 0 (unlike 0 * NaN), so no second "hit"
# einsum or compare/select pass over the (p, 128, C) gather is needed —
# the double-einsum NaN-transparent path cost ~4 ms/sweep at bsz=8192
# (trace: copy_select_fusion + compare fusions, scripts/tpu_trace_ops.py).
SENTINEL = jnp.float32(1e30)


def crop_stack_blocks_fast(blocks: jnp.ndarray, oy, ox, p: int) -> jnp.ndarray:
    """``crop_stack_blocks`` without NaN transparency — single einsum.
    Caller contract: NaNs in the source planes were replaced by SENTINEL
    before ``make_crop_blocks``; decode after the crop with
    ``jnp.where(out > SENTINEL / 2, jnp.nan, out)``."""
    bx = ox // CROP_STRIDE
    rows = oy + jnp.arange(p)
    g = blocks[rows, bx]                            # (p, 128, C)
    off = ox - bx * CROP_STRIDE
    onehot = (
        (off + jnp.arange(p))[:, None] == jnp.arange(CROP_WIDTH)[None, :]
    ).astype(g.dtype)
    return jnp.einsum("rlc,jl->rjc", g, onehot,
                      precision=lax.Precision.HIGHEST)


def crop_chans_blocks(blocks: jnp.ndarray, oy, ox, p: int) -> jnp.ndarray:
    """(C, p, p) crop from channels-first crop blocks (C, H, NB, 128)."""
    bx = ox // CROP_STRIDE
    rows = oy + jnp.arange(p)
    g = blocks[:, rows, bx]                         # (C, p, 128)
    return extract_cols(g, ox - bx * CROP_STRIDE, p)
