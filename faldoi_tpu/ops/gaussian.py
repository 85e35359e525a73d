"""Separable Gaussian smoothing with the reference's exact kernel and padding.

Matches ``src/mask.c:248-357``:

* window size = ``int(5 * sigma) + 1`` one-sided taps,
* kernel ``B[i] = exp(-i^2 / (2 sigma^2)) / (sigma sqrt(2 pi))`` normalised by
  ``2 * sum(B) - B[0]``,
* row pass then column pass, each in-place,
* REFLECTING boundary: the *left* pad mirrors about the first sample without
  repeating it (``R[i] = I[size - i]``) while the *right* pad mirrors with
  repetition (``R[bdx + i] = I[xdim - i - 1]``) — an asymmetry we reproduce.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def gaussian_kernel(sigma: float) -> np.ndarray:
    """One-sided taps B[0..size-1] exactly as mask.c:267-279 computes them."""
    size = int(5 * sigma) + 1
    den = 2.0 * sigma * sigma
    b = np.array(
        [
            1.0 / (sigma * math.sqrt(2.0 * 3.1415926)) * math.exp(-i * i / den)
            for i in range(size)
        ],
        dtype=np.float32,
    )
    norm = np.float32(2.0 * b.sum(dtype=np.float32) - b[0])
    return (b / norm).astype(np.float32)


def _smooth_rows(img: jnp.ndarray, b: np.ndarray) -> jnp.ndarray:
    size = b.shape[0]
    left = jnp.pad(img, ((0, 0), (size, 0)), mode="reflect")[:, :size]
    right = jnp.pad(img, ((0, 0), (0, size)), mode="symmetric")[:, -size:]
    r = jnp.concatenate([left, img, right], axis=1)
    out = b[0] * r[:, size:-size]
    n = img.shape[1]
    for j in range(1, size):
        out = out + b[j] * (
            r[:, size - j : size - j + n] + r[:, size + j : size + j + n]
        )
    return out


def gaussian_smooth(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Smooth (h, w) image; row pass then column pass (mask.c:248-357)."""
    if sigma <= 0:
        return img
    b = gaussian_kernel(sigma)
    out = _smooth_rows(img, b)
    out = _smooth_rows(out.T, b).T
    return out


def gaussian1d_weight(r: int) -> np.ndarray:
    """Un-normalised 1-D Gaussian window of length 2r+1, sigma = r/3
    (mask.c:360-378); used by the weighted functionals' data terms."""
    sigma = r * 0.3333
    den = 2.0 * sigma * sigma
    i = np.arange(2 * r + 1, dtype=np.float64)
    w = 1.0 / (sigma * math.sqrt(2.0 * 3.1415926)) * np.exp(-((i - r) ** 2) / den)
    return w.astype(np.float32)
