"""Bilateral flow filter (core/bilateral.py vs the reference's dormant
machinery, energy_model.cpp:97-157 + local_faldoi.cpp:380-482)."""

import numpy as np

import jax.numpy as jnp

from faldoi_tpu.core.bilateral import bilateral_filter_flow


def test_fills_untrusted_from_same_colored_region():
    h, w = 32, 48
    # two color regions; flow differs per region
    img = np.zeros((h, w), np.float32)
    img[:, 24:] = 1.0
    u1 = np.where(img > 0.5, 3.0, -1.0).astype(np.float32)
    u2 = np.zeros((h, w), np.float32)
    trust = np.ones((h, w), np.int32)
    fixed = np.zeros((h, w), np.int32)
    # knock out a blob well inside the right (u=3) region
    trust[10:20, 30:40] = 0
    r1, r2 = bilateral_filter_flow(
        jnp.asarray(img), jnp.asarray(u1), jnp.asarray(u2),
        jnp.asarray(trust), jnp.asarray(fixed),
    )
    r1 = np.asarray(r1)
    blob = r1[10:20, 30:40]
    # reference semantics: untrusted pixels seed from 0 and participate in
    # the average, so the fill moves TOWARD the surrounding flow without
    # fully reaching it (a structural limitation of the original filter —
    # one reason the reference keeps the call disabled)
    assert (blob > 0.5).all() and (blob < 3.0).all()
    # color weighting keeps the left region's -1 from bleeding in
    assert (blob > 0.0).all()
    # pixels nearer the trusted boundary recover more than the interior
    assert float(blob[0].mean()) > float(blob[4].mean())
    # trusted pixels untouched
    assert float(np.abs(r1[trust == 1] - u1[trust == 1]).max()) == 0.0


def test_trusted_and_fixed_pixels_preserved():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16).astype(np.float32)
    u1 = rng.randn(16, 16).astype(np.float32)
    u2 = rng.randn(16, 16).astype(np.float32)
    trust = (rng.rand(16, 16) > 0.3).astype(np.int32)
    fixed = ((rng.rand(16, 16) > 0.5) & (trust == 0)).astype(np.int32)
    r1, r2 = bilateral_filter_flow(
        jnp.asarray(img), jnp.asarray(u1), jnp.asarray(u2),
        jnp.asarray(trust), jnp.asarray(fixed),
    )
    keep = (trust | fixed).astype(bool)
    assert np.allclose(np.asarray(r1)[keep], u1[keep])
    assert np.allclose(np.asarray(r2)[keep], u2[keep])
    assert np.isfinite(np.asarray(r1)).all()
