#!/usr/bin/env python
"""Ablation timing of the sweep-body pieces on the real TPU.

Each piece runs REPS times inside one jitted lax.scan whose carry feeds the
next iteration's input (prevents XLA from hoisting the loop-invariant body),
so we time pure device execution without tunnel dispatch latency.

Usage: python scripts/tpu_ablate.py [h] [w] [bsz]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

h = int(sys.argv[1]) if len(sys.argv) > 1 else 96
w = int(sys.argv[2]) if len(sys.argv) > 2 else 96
bsz = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
REPS = 20
n = h * w
p = 11
wr = 5

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (h, w), jnp.float32)
from faldoi_tpu.core.patch_solver import pad_for_crops, crop_padded
from faldoi_tpu.core.local_step import _dense_fill
from faldoi_tpu.core.functionals import solve_tvl1, make_solver_consts
from faldoi_tpu.ops.stencils import centered_gradient

img_pad = pad_for_crops(img, p)
i1x, i1y = centered_gradient(img)
sc = make_solver_consts(0, img_pad, img, i1x, i1y, 40.0, 0.3, 0.125, 0.01, wr=wr)

idx = jax.random.randint(key, (bsz,), 0, n)
vals = jax.random.uniform(key, (bsz,), jnp.float32)
big_q = jax.random.randint(key, (bsz * p * p,), 0, n)
big_v = jax.random.uniform(key, (bsz * p * p,), jnp.float32)
cand = jax.random.uniform(key, (n,), jnp.float32)

oy = jnp.clip(idx // w - wr, 0, None)
ox = jnp.clip(idx % w - wr, 0, None)
ph = jnp.minimum(idx // w + 1 + wr, h) - oy
pw = jnp.minimum(idx % w + 1 + wr, w) - ox


def timeit(name, fn, seed_carry):
    """fn: carry -> carry (same pytree structure)."""
    def rep(c0):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, c0, None, length=REPS)
        return c
    f = jax.jit(rep)
    r = f(seed_carry)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(seed_carry)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / REPS
    print(f"{name:45s} {dt*1000:9.2f} ms")
    return dt


# 1. top_k: carry = cand field; perturb with top_k result
def f_topk(c):
    neg, ix = jax.lax.top_k(-c, bsz)
    return c.at[ix].add(1e-9)
timeit("top_k(n,%d) + scatter_add bsz" % bsz, f_topk, cand)

# 2. scatter set (bsz) with dependent indices
def f_scat(c):
    i2 = (idx + (c[0] > 0).astype(jnp.int32)) % n
    return c.at[i2].set(vals + c[0] * 1e-30)
timeit("scatter_set bsz", f_scat, cand)

# 3. big scatter max (bsz*121)
def f_scatmax(c):
    q2 = (big_q + (c[0] > 0).astype(jnp.int32)) % n
    return c.at[q2].max(big_v + c[0] * 1e-30)
timeit("scatter_max bsz*121", f_scatmax, cand)

# 4. dense fill
def f_fill(c):
    out = _dense_fill(c > 0.5, c)
    return out + 1e-30
timeit("dense_fill 16it", f_fill, img)

# 5. vmapped crop_padded x1
def f_crop(c):
    cp = pad_for_crops(c, p)
    got = jax.vmap(lambda a, b: crop_padded(cp, a, b, p), out_axes=-1)(oy, ox)
    return c + got.mean() * 1e-30
timeit("pad + vmap crop_padded x1 (bsz)", f_crop, img)

# 6. the full batched PD solve
u0 = jnp.zeros((p, p, bsz), jnp.float32)
def f_solve(u0):
    i = idx % w
    j = idx // w
    def one(i_k, j_k, oy_k, ox_k, ph_k, pw_k, u1, u2, c0):
        return solve_tvl1(sc, i_k, j_k, oy_k, ox_k, ph_k, pw_k, u1, u2, c0,
                          p, 1, 4, wr)
    su, sv, schi, e = jax.vmap(
        one, in_axes=(0, 0, 0, 0, 0, 0, -1, -1, -1), out_axes=(-1, -1, -1, 0)
    )(i, j, oy, ox, ph, pw, u0, u0, u0)
    return su * 1e-9
timeit("vmapped PD solve (1 warp, 4 iters)", f_solve, u0)

# 7. bicubic batched gather alone
from faldoi_tpu.ops.bicubic import bicubic_interp_at
gxy = jax.random.uniform(key, (p, p, bsz), jnp.float32) * (w - 1)
def f_warp(g):
    out = jax.vmap(lambda gx: bicubic_interp_at(img, gx, gx, False),
                   in_axes=-1, out_axes=-1)(g)
    return g + out * 1e-30
timeit("vmapped bicubic (bsz x 121 pts)", f_warp, gxy)

# 8. per-patch multigrid fill alone (the fill='patch' per-sweep cost: two
# channels, bsz patches)
from faldoi_tpu.ops.poisson import poisson_fill_canvas
canv = jnp.where(jax.random.uniform(key, (p, p, bsz)) > 0.7,
                 jax.random.uniform(key, (p, p, bsz)), jnp.nan)
def f_pfill(c):
    out = jax.vmap(lambda x, a, b: poisson_fill_canvas(x, a, b),
                   in_axes=(-1, 0, 0), out_axes=-1)(c, ph, pw)
    return c + out * 1e-30
timeit("vmapped patch poisson fill x2ch (bsz)", lambda c: f_pfill(f_pfill(c)),
       canv)

# 9. nearest_fill_image (the fill='dense' per-sweep cost, x2 channels)
from faldoi_tpu.ops.poisson import nearest_fill_image
def f_nfill(c):
    out = nearest_fill_image(jnp.where(c > 0.7, c, jnp.nan))
    return c + out * 1e-30
timeit("nearest_fill_image x2ch", lambda c: f_nfill(f_nfill(c)), img)

# 10. whole sweep body, both fills
from faldoi_tpu.core.local_step import _sweep_body, init_state
state = init_state(h, w)
state = state._replace(cand_e=jnp.concatenate([cand, jnp.full((1,), jnp.inf)]),
                       cand_u=jnp.zeros((n + 1,)), cand_v=jnp.zeros((n + 1,)))
sal = jnp.ones((n + 1,), jnp.float32)
trust2d = jnp.ones((h, w), jnp.float32)
for fill in ("dense", "patch", "patch_rb"):
    def f_sweep(st, _fill=fill):
        st2, n_acc = _sweep_body(st, solve_tvl1, sc, trust2d, sal,
                                 jnp.asarray(0), h, w, wr, bsz, 1, 4,
                                 delta=0.05, fill=_fill)
        # recycle: reset candidates so the sweep stays busy
        return st2._replace(cand_e=st.cand_e, fixed=st.fixed)
    timeit(f"FULL sweep body fill={fill}", f_sweep, state)
