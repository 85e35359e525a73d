"""Finite-difference stencils with the reference's boundary conditions.

Dense, whole-image formulations of the reference's scalar loops:

* ``divergence`` / ``forward_gradient`` / ``backward_gradient``: Chambolle-2004
  boundary handling (``src/mask.c:39-176``).
* ``centered_gradient``: one-sided halves at the borders (``src/mask.c:184-240``).
* ``*_patch``: the patch-domain variants (``src/utils.cpp:63-220``) where the
  *patch* edge is treated as an image edge (the reference's
  patch-edge-as-image-edge quirk).  Our batched patch solver materialises
  every patch on a fixed (P, P) canvas whose valid region is the rectangle
  ``[0, ph) x [0, pw)``; these functions take that rectangle explicitly so the
  whole solver stays shape-static under ``vmap``/``jit``.

All functions are jit-friendly: concatenation/where only, no scatters.
"""

from __future__ import annotations

import jax.numpy as jnp


def forward_gradient(f: jnp.ndarray):
    """Forward differences; zero on last row/col (mask.c:92-130)."""
    fx = jnp.concatenate([f[:, 1:] - f[:, :-1], jnp.zeros_like(f[:, :1])], axis=1)
    fy = jnp.concatenate([f[1:, :] - f[:-1, :], jnp.zeros_like(f[:1, :])], axis=0)
    return fx, fy


def backward_gradient(f: jnp.ndarray):
    """Backward differences; zero on first row/col (mask.c:138-176)."""
    fx = jnp.concatenate([jnp.zeros_like(f[:, :1]), f[:, 1:] - f[:, :-1]], axis=1)
    fy = jnp.concatenate([jnp.zeros_like(f[:1, :]), f[1:, :] - f[:-1, :]], axis=0)
    return fx, fy


def centered_gradient(f: jnp.ndarray):
    """Centered differences, one-sided halves at borders (mask.c:184-240)."""
    px = jnp.concatenate([f[:, :1], f, f[:, -1:]], axis=1)
    py = jnp.concatenate([f[:1, :], f, f[-1:, :]], axis=0)
    dx = 0.5 * (px[:, 2:] - px[:, :-2])
    dy = 0.5 * (py[2:, :] - py[:-2, :])
    return dx, dy


def five_point_gradient(f: jnp.ndarray):
    """Five-point derivative (1/12)[-1 8 0 -8 1] in the interior, centered
    elsewhere (mask.c:384-462; the reference's border loops are written with
    ``ny`` where ``nx`` is meant — we implement the documented intent, i.e.
    centered differences on the two outermost rings)."""
    dx_c, dy_c = centered_gradient(f)
    c = 1.0 / 12.0
    dx5 = c * (f[2:-2, :-4] - 8.0 * f[2:-2, 1:-3] + 8.0 * f[2:-2, 3:-1] - f[2:-2, 4:])
    dy5 = c * (f[:-4, 2:-2] - 8.0 * f[1:-3, 2:-2] + 8.0 * f[3:-1, 2:-2] - f[4:, 2:-2])
    dx = dx_c.at[2:-2, 2:-2].set(dx5[:, :])
    dy = dy_c.at[2:-2, 2:-2].set(dy5[:, :])
    return dx, dy


def divergence(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Backward-difference divergence, Chambolle BCs (mask.c:39-83)."""
    dx = jnp.concatenate(
        [v1[:, :1], v1[:, 1:-1] - v1[:, :-2], -v1[:, -2:-1]], axis=1
    )
    dy = jnp.concatenate(
        [v2[:1, :], v2[1:-1, :] - v2[:-2, :], -v2[-2:-1, :]], axis=0
    )
    return dx + dy


# ---------------------------------------------------------------------------
# Patch-domain variants on a fixed (P, P) canvas with valid box (ph, pw).
# ---------------------------------------------------------------------------


def _rowcol_ids(shape):
    rows = jnp.arange(shape[0])[:, None]
    cols = jnp.arange(shape[1])[None, :]
    return rows, cols


def forward_gradient_patch(f: jnp.ndarray, ph, pw):
    """Forward differences on the valid box; the box edge acts as the image
    edge (utils.cpp:175-220). Values outside the box are zeroed."""
    rows, cols = _rowcol_ids(f.shape)
    right = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    down = jnp.concatenate([f[1:, :], f[-1:, :]], axis=0)
    fx = jnp.where((cols < pw - 1) & (rows < ph), right - f, 0.0)
    fy = jnp.where((rows < ph - 1) & (cols < pw), down - f, 0.0)
    return fx, fy


def divergence_patch(v1: jnp.ndarray, v2: jnp.ndarray, ph, pw) -> jnp.ndarray:
    """Backward-difference divergence with Chambolle BCs at the valid-box
    edges (utils.cpp:63-112). Values outside the box are zeroed."""
    rows, cols = _rowcol_ids(v1.shape)
    left = jnp.concatenate([v1[:, :1], v1[:, :-1]], axis=1)
    up = jnp.concatenate([v2[:1, :], v2[:-1, :]], axis=0)
    dx = jnp.where(cols == 0, v1, jnp.where(cols == pw - 1, -left, v1 - left))
    dy = jnp.where(rows == 0, v2, jnp.where(rows == ph - 1, -up, v2 - up))
    inside = (rows < ph) & (cols < pw)
    return jnp.where(inside, dx + dy, 0.0)
