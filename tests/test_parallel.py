"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_dp_global_refine_sharded():
    from faldoi_tpu.parallel import dp_global_refine, make_mesh

    mesh = make_mesh(4, 1)
    rng = np.random.RandomState(0)
    b, h, w = 4, 16, 32
    i0 = rng.rand(b, h, w).astype(np.float32)
    i1 = rng.rand(b, h, w).astype(np.float32)
    z = np.zeros((b, h, w), np.float32)
    r1, r2 = dp_global_refine(mesh, i0, i1, z, z, warps=1, iters=3)
    assert r1.shape == (b, h, w)
    assert np.isfinite(np.asarray(r1)).all()


def test_spatial_sharding_matches_single_device():
    """The halo-exchange PD solve must agree with the unsharded solver."""
    from faldoi_tpu.parallel import make_mesh, spatial_tvl2_global
    from faldoi_tpu.core.global_step import tvl2_global

    rng = np.random.RandomState(1)
    h, w = 32, 64
    i0 = jnp.asarray(rng.rand(h, w).astype(np.float32))
    i1 = jnp.asarray(rng.rand(h, w).astype(np.float32))
    z = jnp.zeros((h, w), jnp.float32)

    mesh = make_mesh(1, 4)
    s1, s2 = spatial_tvl2_global(mesh, i0, i1, z, z, iters=20, warps=1)
    r1, r2 = tvl2_global(i0, i1, z, z, warps=1, max_iters=20, tol=0.0)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2), atol=2e-5)


def test_pipeline_train_step():
    from faldoi_tpu.parallel import make_mesh, pipeline_train_step

    mesh = make_mesh(2, 1)
    rng = np.random.RandomState(2)
    b, h, w = 2, 16, 32
    i0 = rng.rand(b, h, w).astype(np.float32)
    i1 = rng.rand(b, h, w).astype(np.float32)
    seeds = np.full((b, h, w, 2), np.nan, np.float32)
    seeds[:, ::4, ::4] = rng.randn(b, 4, 8, 2).astype(np.float32) * 0.5
    out = pipeline_train_step(mesh, i0, i1, seeds)
    assert out.shape == (b, h, w, 2)
    assert np.isfinite(np.asarray(out)).all()
