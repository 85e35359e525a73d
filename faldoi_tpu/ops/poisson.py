"""Batched Poisson/harmonic hole filling on fixed-size patch canvases.

TPU re-design of ``src/elap_recsep.c`` (used by ``interpolate_poisson``,
``local_faldoi.cpp:326-368``): coarse-to-fine multigrid where each level
fills NaN holes by a few relaxation sweeps of the Laplace equation, with the
coarse solution (2x zoom-out with NaN-discarding block averages) as init.

Everything is expressed as static shifts + ``where`` masks (no gathers), so
the whole pyramid vectorises cleanly on the VPU under ``vmap``.

Differences from the reference, by design (documented for parity review):

* the reference's ``perform_one_iteration`` is a raster-order Gauss-Seidel
  over the masked pixels; a sequential scan is hostile to vectorisation, so
  we use red-black Gauss-Seidel (two half-sweeps), which converges
  comparably.  The fill only *initialises* the patch PD solve, which then
  runs its own iterations, so the end-to-end effect is below the EPE gate.
* the reference's clamped-index block average (``zoom_out_by_factor_two``)
  equals a NaN-discarding mean over the in-box cells (clamping duplicates
  values uniformly), which is what we compute.
* all levels live on static (P, P) canvases with a dynamic valid box
  (ph, pw) so the whole pyramid is shape-static under ``vmap``/``jit``.

Reference call site: timestep 0.4, niter 3, scale 7 (local_faldoi.cpp:357).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _level_sizes(p: int, scale: int):
    sizes = [p]
    for _ in range(scale - 1):
        if sizes[-1] == 1:
            break  # 1x1 levels are exact no-ops (clamped laplacian = 0)
        sizes.append(max(1, math.ceil(sizes[-1] / 2)))
    return sizes


def _shift(y, dr, dc):
    """Static shift pulling the neighbour at (+dr, +dc) into each cell,
    repeating the canvas edge (box clamping is applied by callers)."""
    if dr == 1:
        y = jnp.concatenate([y[1:, :], y[-1:, :]], axis=0)
    elif dr == -1:
        y = jnp.concatenate([y[:1, :], y[:-1, :]], axis=0)
    if dc == 1:
        y = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
    elif dc == -1:
        y = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
    return y


def _neighbors_clamped(y, ph, pw, p):
    """The four getpixel_1 neighbours with clamping at the valid box."""
    rows = jnp.arange(p)[:, None]
    cols = jnp.arange(p)[None, :]
    right = jnp.where(cols + 1 < pw, _shift(y, 0, 1), y)
    left = jnp.where(cols - 1 >= 0, _shift(y, 0, -1), y)
    down = jnp.where(rows + 1 < ph, _shift(y, 1, 0), y)
    up = jnp.where(rows - 1 >= 0, _shift(y, -1, 0), y)
    return right, left, down, up


def _relax(y, hole, ph, pw, timestep, niter, p):
    """Red-black Gauss-Seidel on the valid box; only hole pixels move."""
    rows = jnp.arange(p)[:, None]
    cols = jnp.arange(p)[None, :]
    inbox = (rows < ph) & (cols < pw)
    red = (rows + cols) % 2 == 0

    def halfsweep(y, color_mask):
        r, l, d, u = _neighbors_clamped(y, ph, pw, p)
        lap = -4.0 * y + r + l + d + u
        return jnp.where(hole & inbox & color_mask, y + timestep * lap, y)

    for _ in range(niter):
        y = halfsweep(y, red)
        y = halfsweep(y, ~red)
    return y


def _zoom_out2(x, ph, pw, p_parent, p_child):
    """NaN-discarding 2x2 block average (elap_recsep.c:129-185)."""
    rows = jnp.arange(p_parent)[:, None]
    cols = jnp.arange(p_parent)[None, :]
    x = jnp.where((rows < ph) & (cols < pw), x, jnp.nan)
    pad = 2 * p_child - p_parent
    if pad:
        x = jnp.pad(x, ((0, pad), (0, pad)), constant_values=jnp.nan)
    blocks = jnp.stack(
        [x[0::2, 0::2], x[0::2, 1::2], x[1::2, 0::2], x[1::2, 1::2]]
    )
    fin = jnp.isfinite(blocks)
    cnt = fin.sum(axis=0)
    s = jnp.where(fin, blocks, 0.0).sum(axis=0)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), jnp.nan)


def _zoom_in2(x, p_parent):
    """Pixel replication into 2x2 blocks; the reference's
    round((i-0.5)/2) index reduces to i//2 (elap_recsep.c:191-199)."""
    up = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    return up[:p_parent, :p_parent]


def poisson_fill_canvas(
    x: jnp.ndarray,
    ph,
    pw,
    timestep: float = 0.4,
    niter: int = 3,
    scale: int = 7,
) -> jnp.ndarray:
    """Fill NaNs of a (P, P) canvas whose valid region is [0, ph) x [0, pw).

    Values outside the valid box are ignored and returned as 0.
    """
    p = x.shape[0]
    sizes = _level_sizes(p, scale)

    levels = [x]
    phs = [ph]
    pws = [pw]
    for k in range(1, len(sizes)):
        levels.append(
            _zoom_out2(levels[-1], phs[-1], pws[-1], sizes[k - 1], sizes[k])
        )
        phs.append((phs[-1] + 1) // 2)
        pws.append((pws[-1] + 1) // 2)

    out = None
    for k in range(len(sizes) - 1, -1, -1):
        xk = levels[k]
        init = jnp.zeros_like(xk) if out is None else _zoom_in2(out, sizes[k])
        rows = jnp.arange(sizes[k])[:, None]
        cols = jnp.arange(sizes[k])[None, :]
        inbox = (rows < phs[k]) & (cols < pws[k])
        hole = ~jnp.isfinite(xk)
        y = jnp.where(inbox, jnp.where(hole, init, xk), 0.0)
        y = jnp.where(jnp.isfinite(y), y, 0.0)
        out = _relax(y, hole, phs[k], pws[k], timestep, niter, sizes[k])
    return out


@functools.partial(jax.jit, static_argnames=("timestep", "niter", "scale"))
def poisson_fill_batch(
    x: jnp.ndarray, ph: jnp.ndarray, pw: jnp.ndarray,
    timestep: float = 0.4, niter: int = 3, scale: int = 7
) -> jnp.ndarray:
    """vmap of poisson_fill_canvas over a (B, P, P) batch with (B,) boxes."""
    return jax.vmap(
        lambda xi, phi, pwi: poisson_fill_canvas(xi, phi, pwi, timestep, niter, scale)
    )(x, ph, pw)
