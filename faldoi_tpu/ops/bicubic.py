"""Bicubic (Catmull-Rom-style) sampling and warping.

Dense, gather-based formulation of ``src/bicubic_interpolation.c``.  We keep
the reference's exact semantics so outputs are numerically comparable:

* integer positions via C ``(int)`` casts (truncation toward zero, not floor),
* the 4x4 stencil is laid out around the truncated point using sign steps
  ``sx = sign(uu)``, ``sy = sign(vv)`` (bicubic_interpolation.c:146-163),
* *including* the reference's quirk that the ``my`` row index uses ``sx``
  instead of ``sy`` (bicubic_interpolation.c:159),
* Neumann clamping with an "out of domain" flag; ``border_out=True`` returns
  0 there (used by the whole-image warps and the FB-consistency check),
  ``border_out=False`` extrapolates with the clamped stencil (patch warps),
* interpolation fractions are ``uu - x_clamped`` (can fall outside [0,1) for
  out-of-domain points when border_out=False — intentional, as in C).

This is a gather-heavy op: 16 flat gathers per output pixel.  XLA lowers it
to TPU gathers; the patch solver amortises it by warping all patches of a
wavefront batch in one call.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cubic(v0, v1, v2, v3, x):
    """1-D cubic cell (bicubic_interpolation.c:103-111)."""
    return v1 + 0.5 * x * (
        v2 - v0 + x * (2.0 * v0 - 5.0 * v1 + 4.0 * v2 - v3 + x * (3.0 * (v1 - v2) + v3 - v0))
    )


def bicubic_interp_at(img: jnp.ndarray, uu: jnp.ndarray, vv: jnp.ndarray,
                      border_out: bool):
    """Sample ``img`` (h, w) at positions (x=uu, y=vv); shapes of uu/vv are
    arbitrary and broadcast to the output shape."""
    ny, nx = img.shape
    sx = jnp.where(uu < 0, -1, 1).astype(jnp.int32)
    sy = jnp.where(vv < 0, -1, 1).astype(jnp.int32)
    iu = uu.astype(jnp.int32)  # C (int) cast: truncation toward zero
    iv = vv.astype(jnp.int32)

    def clampx(i):
        return jnp.clip(i, 0, nx - 1), (i < 0) | (i >= nx)

    def clampy(i):
        return jnp.clip(i, 0, ny - 1), (i < 0) | (i >= ny)

    x, o0 = clampx(iu)
    y, o1 = clampy(iv)
    mx, o2 = clampx(iu - sx)
    my, o3 = clampy(iv - sx)  # sic: sx, reproducing bicubic_interpolation.c:159
    dx, o4 = clampx(iu + sx)
    dy, o5 = clampy(iv + sy)
    ddx, o6 = clampx(iu + 2 * sx)
    ddy, o7 = clampy(iv + 2 * sy)
    out = o0 | o1 | o2 | o3 | o4 | o5 | o6 | o7

    flat = img.ravel()

    def g(ix, iy):
        return jnp.take(flat, iy * nx + ix)

    fx = uu - x.astype(uu.dtype)
    fy = vv - y.astype(vv.dtype)

    # Interpolate each of the 4 columns along y, then along x.
    cols = []
    for cx in (mx, x, dx, ddx):
        cols.append(_cubic(g(cx, my), g(cx, y), g(cx, dy), g(cx, ddy), fy))
    r = _cubic(cols[0], cols[1], cols[2], cols[3], fx)

    if border_out:
        r = jnp.where(out, 0.0, r)
    return r


def bicubic_warp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                 border_out: bool) -> jnp.ndarray:
    """Warp a whole image by the flow (u, v): out[i,j] = img(j+u, i+v)
    (bicubic_interpolation.c:245-266)."""
    ny, nx = img.shape
    jj = jnp.arange(nx, dtype=img.dtype)[None, :]
    ii = jnp.arange(ny, dtype=img.dtype)[:, None]
    return bicubic_interp_at(img, jj + u, ii + v, border_out)
