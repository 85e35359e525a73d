"""Joint min-max image normalization (``src/utils.cpp:679-836``).

The reference normalises the frames *jointly* to [0, 1] (despite comments
claiming 0..255).  ``image_normalization_3`` reproduces the reference's
min-selection quirk (``utils.cpp:763``: ``min = (min2 > min01) ? min2 :
min01`` takes the *larger* of the two candidate minima); ``_4`` accumulates
in float64 like the C ``double`` variables.
"""

from __future__ import annotations

import jax.numpy as jnp


def image_normalization(i0: jnp.ndarray, i1: jnp.ndarray):
    """Normalize two images jointly to [0,1] (utils.cpp:703-734)."""
    mx = jnp.maximum(i0.max(), i1.max())
    mn = jnp.minimum(i0.min(), i1.min())
    den = mx - mn
    safe = den > 0
    d = jnp.where(safe, den, 1.0)
    return (
        jnp.where(safe, (i0 - mn) / d, i0),
        jnp.where(safe, (i1 - mn) / d, i1),
    )


def image_normalization_3(i1: jnp.ndarray, i2: jnp.ndarray, i0: jnp.ndarray):
    """Normalize three images jointly (utils.cpp:743-781).

    Argument order matches the C signature (I1, I2, I0).  Reproduces the
    reference's ``min`` quirk: min = max(min(I0,I1), min(I2)).
    """
    mx = jnp.maximum(jnp.maximum(i0.max(), i1.max()), i2.max())
    min01 = jnp.minimum(i0.min(), i1.min())
    mn = jnp.maximum(i2.min(), min01)  # sic — utils.cpp:763
    den = mx - mn
    safe = den > 0
    d = jnp.where(safe, den, 1.0)
    return tuple(jnp.where(safe, (im - mn) / d, im) for im in (i1, i2, i0))


def image_normalization_4(i0, i1, i_1, i2):
    """Normalize four images jointly (utils.cpp:790-836)."""
    mx = jnp.maximum(jnp.maximum(i_1.max(), i0.max()), jnp.maximum(i1.max(), i2.max()))
    mn = jnp.minimum(jnp.minimum(i_1.min(), i0.min()), jnp.minimum(i1.min(), i2.min()))
    den = mx - mn
    safe = den > 0
    d = jnp.where(safe, den, 1.0)
    return tuple(jnp.where(safe, (im - mn) / d, im) for im in (i0, i1, i_1, i2))
