"""Image pyramid resampling — ``src/zoom.c`` equivalents.

The reference links these everywhere but the shipped pipeline is
single-scale (SURVEY §2.4); they are provided for API completeness and for
building multiscale variants: ``zoom_out`` Gaussian-presmooths with
sigma = 0.6 * sqrt(1/factor^2 - 1) then bicubic-resamples (zoom.c:19-61);
``zoom_in`` bicubic-upsamples to an explicit target size (zoom.c:64-106);
``zoom_size`` rounds the scaled size to nearest (zoom.c:12-16).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from faldoi_tpu.ops.bicubic import bicubic_interp_at
from faldoi_tpu.ops.gaussian import gaussian_smooth

ZOOM_SIGMA_ZERO = 0.6


def zoom_size(n: int, factor: float) -> int:
    """zoom.c:12-16: nearest-int scaled size."""
    return int(n * factor + 0.5)


def zoom_out(img: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Downsample by factor < 1 with anti-alias presmoothing (zoom.c:19-61)."""
    assert 0 < factor < 1
    ny, nx = img.shape
    nyy = zoom_size(ny, factor)
    nxx = zoom_size(nx, factor)
    sigma = ZOOM_SIGMA_ZERO * math.sqrt(1.0 / (factor * factor) - 1.0)
    sm = gaussian_smooth(img, sigma)
    i2 = jnp.arange(nyy, dtype=img.dtype)[:, None] / factor
    j2 = jnp.arange(nxx, dtype=img.dtype)[None, :] / factor
    jj = jnp.broadcast_to(j2, (nyy, nxx))
    ii = jnp.broadcast_to(i2, (nyy, nxx))
    return bicubic_interp_at(sm, jj, ii, False)


def zoom_in(img: jnp.ndarray, nyy: int, nxx: int) -> jnp.ndarray:
    """Bicubic upsample to (nyy, nxx) (zoom.c:64-106)."""
    ny, nx = img.shape
    fy = nyy / float(ny)
    fx = nxx / float(nx)
    i2 = jnp.arange(nyy, dtype=img.dtype)[:, None] / fy
    j2 = jnp.arange(nxx, dtype=img.dtype)[None, :] / fx
    jj = jnp.broadcast_to(j2, (nyy, nxx))
    ii = jnp.broadcast_to(i2, (nyy, nxx))
    return bicubic_interp_at(img, jj, ii, False)
