"""Block-gather crops/windows must equal their dynamic_slice ancestors.

The block formulation (ops/blockgather.py) replaces the serial per-patch
dynamic_slice loops on TPU; these tests pin its exactness (the one-hot MXU
extract runs at Precision.HIGHEST, which is bit-exact for 0/1 weights) and
the right-edge block coverage (bx = ox // stride must exist and cover
ox + p for every in-image origin).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faldoi_tpu.ops.blockgather import (
    make_col_blocks, make_crop_blocks, crop_plane_blocks,
    crop_stack_blocks, crop_chans_blocks, CROP_STRIDE,
)


@pytest.mark.parametrize("w", [64, 97, 128, 200, 1035])
def test_crop_plane_matches_dynamic_slice(w):
    h, p = 53, 11
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
    img_pad = jnp.pad(img, ((0, p), (0, p)), mode="edge")
    blocks = make_crop_blocks(img_pad)
    # hit interior + all right-edge origins (the block-coverage edge case)
    oys = np.r_[0, 7, h - 1, rng.integers(0, h, 8)]
    oxs = np.r_[0, 13, w - 1, w - 2, w - p, rng.integers(0, w, 8)]
    for oy in oys:
        for ox in oxs:
            ref = jax.lax.dynamic_slice(img_pad, (int(oy), int(ox)), (p, p))
            got = crop_plane_blocks(blocks, int(oy), int(ox), p)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_crop_stack_and_chans_match():
    h, w, p, c = 40, 150, 11, 6
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((c, h + p, w)), jnp.float32)
    blk_cf = make_crop_blocks(x)                       # (C, H, NB, 128)
    blk_cl = jnp.moveaxis(blk_cf, 0, -1)               # (H, NB, 128, C)
    for oy, ox in [(0, 0), (3, w - 1), (h - 1, 77), (12, w - p)]:
        ref = np.stack([np.asarray(
            jax.lax.dynamic_slice(
                jnp.pad(x[k], ((0, 0), (0, p)), mode="edge"),
                (oy, ox), (p, p))) for k in range(c)])
        got_cf = np.asarray(crop_chans_blocks(blk_cf, oy, ox, p))
        got_cl = np.asarray(crop_stack_blocks(blk_cl, oy, ox, p))
        np.testing.assert_array_equal(ref, got_cf)
        np.testing.assert_array_equal(ref.transpose(1, 2, 0), got_cl)


def test_vmapped_batch_gather():
    h, w, p = 60, 130, 11
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((h + p, w)), jnp.float32)
    blocks = make_crop_blocks(img)
    oy = jnp.asarray(rng.integers(0, h, 64))
    ox = jnp.asarray(rng.integers(0, w, 64))
    got = jax.vmap(lambda a, b: crop_plane_blocks(blocks, a, b, p))(oy, ox)
    ref = jax.vmap(
        lambda a, b: jax.lax.dynamic_slice(
            jnp.pad(img, ((0, 0), (0, p)), mode="edge"), (a, b), (p, p))
    )(oy, ox)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_nan_transparency():
    """A NaN sentinel must stay in ITS cell only — the one-hot MXU extract
    must not smear it across the row (0*NaN = NaN).  This is the exact bug
    that broke the growing when the sweep-state crop (whose wu/wv/out
    planes use NaN = missing) moved to block gathers."""
    h, w, p, c = 40, 150, 11, 3
    rng = np.random.default_rng(7)
    x = rng.standard_normal((c, h + p, w)).astype(np.float32)
    x[1, 5, 30] = np.nan
    x[0, 13, 38] = np.nan
    blk_cf = make_crop_blocks(jnp.asarray(x))
    blk_cl = jnp.moveaxis(blk_cf, 0, -1)
    ref = x[:, 3:14, 28:39]
    got_cf = np.asarray(crop_chans_blocks(blk_cf, 3, 28, p))
    got_cl = np.asarray(crop_stack_blocks(blk_cl, 3, 28, p))
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(got_cf))
    np.testing.assert_array_equal(np.isnan(ref.transpose(1, 2, 0)),
                                  np.isnan(got_cl))
    fin = ~np.isnan(ref)
    np.testing.assert_array_equal(ref[fin], got_cf[fin])
    got_pl = np.asarray(crop_plane_blocks(make_crop_blocks(
        jnp.asarray(x[1])), 3, 28, p))
    np.testing.assert_array_equal(np.isnan(ref[1]), np.isnan(got_pl))


def test_warp_window_blocks_match_window_sample():
    from faldoi_tpu.ops.bicubic import (
        bicubic_window_sample, bicubic_window_sample_blocks,
    )
    from faldoi_tpu.core.functionals import make_warp_blocks, WARP_BSTRIDE

    h, w = 80, 300
    rng = np.random.default_rng(3)
    planes = jnp.asarray(rng.standard_normal((3, h, w)), jnp.float32)
    blocks = make_warp_blocks(planes)
    # coherent sample cloud (a patch warped by a smooth flow), incl. edges
    for cx, cy in [(20.3, 30.7), (0.2, 0.1), (w - 2.5, h - 1.5), (150.0, 5.0)]:
        uu = jnp.asarray(cx + rng.uniform(-6, 6, (121,)), jnp.float32)
        vv = jnp.asarray(cy + rng.uniform(-6, 6, (121,)), jnp.float32)
        ref = bicubic_window_sample(planes, uu, vv, False, win=32)
        got = bicubic_window_sample_blocks(blocks, h, w, uu, vv, False,
                                           WARP_BSTRIDE)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=0, atol=2e-6)
