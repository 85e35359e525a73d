#!/usr/bin/env python
"""Validate the windowed-MXU bicubic design: time the einsum + weight build
vs the current gather at batch sizes of interest."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax import lax

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
S = 121
WIN = int(sys.argv[2]) if len(sys.argv) > 2 else 32
C = 3
REPS = 20
key = jax.random.PRNGKey(0)


def timeit(name, fn, seed_carry):
    def rep(c0):
        def body(c, _):
            return fn(c), None
        c, _ = lax.scan(body, c0, None, length=REPS)
        return c
    f = jax.jit(rep)
    r = f(seed_carry)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(seed_carry)
    jax.block_until_ready(r)
    print(f"{name:55s} {(time.time()-t0)/REPS*1000:9.2f} ms")


wy = jax.random.uniform(key, (B, S), jnp.float32)
win = jax.random.uniform(key, (B, C, WIN, WIN), jnp.float32)

# weight build: 4 taps scattered into (B, S, WIN) one-hot-ish matrices
rel = jax.random.randint(key, (B, S), 0, WIN - 3)
taps = jax.random.uniform(key, (4, B, S), jnp.float32)
ridx = jnp.arange(WIN)


def build_w(rel, taps):
    w = jnp.zeros((rel.shape[0], rel.shape[1], WIN), jnp.float32)
    for k in range(4):
        w = w + jnp.where((rel + k)[..., None] == ridx, taps[k][..., None], 0.0)
    return w


def f_build(c):
    rel2 = (rel + (c[0, 0, 0] > 0).astype(jnp.int32)) % (WIN - 3)
    return build_w(rel2, taps)[..., 0:S, :] * 1e-30 + c
timeit("weight build (B,S,WIN) x2", lambda c: f_build(c) + f_build(c),
       jnp.zeros((B, S, WIN), jnp.float32))

Wy = build_w(rel, taps)
Wx = build_w(rel, taps)


def f_einsum(c):
    w2 = win + c[0, 0, 0, 0] * 1e-30
    # (B,S,WIN) x (B,C,WIN,WIN) x (B,S,WIN) -> (B,C,S)
    t = jnp.einsum("bsr,bcrk->bcsk", Wy, w2,
                   precision=lax.Precision.HIGHEST)
    out = jnp.einsum("bcsk,bsk->bcs", t, Wx,
                     precision=lax.Precision.HIGHEST)
    return w2 * (1 + out[0, 0, 0] * 1e-30)
timeit(f"einsum HIGHEST (B={B},C=3,S=121,WIN={WIN})", f_einsum, win)


def f_einsum_def(c):
    w2 = win + c[0, 0, 0, 0] * 1e-30
    t = jnp.einsum("bsr,bcrk->bcsk", Wy, w2)
    out = jnp.einsum("bcsk,bsk->bcs", t, Wx)
    return w2 * (1 + out[0, 0, 0] * 1e-30)
timeit("einsum DEFAULT", f_einsum_def, win)

# window extraction from full image
H, W = 436, 1024
img3 = jax.random.uniform(key, (C, H, W), jnp.float32)
oys = jax.random.randint(key, (B,), 0, H - WIN)
oxs = jax.random.randint(key, (B,), 0, W - WIN)


def f_extract(c):
    o2 = (oys + (c[0, 0, 0, 0] > 0).astype(jnp.int32)) % (H - WIN)
    wins = jax.vmap(
        lambda oy, ox: lax.dynamic_slice(img3, (0, oy, ox), (C, WIN, WIN))
    )(o2, oxs)
    return wins * 1e-30 + c
timeit("window extraction vmapped dynamic_slice", f_extract, win)

# everything combined
def f_all(c):
    o2 = (oys + (c[0, 0, 0, 0] > 0).astype(jnp.int32)) % (H - WIN)
    wins = jax.vmap(
        lambda oy, ox: lax.dynamic_slice(img3, (0, oy, ox), (C, WIN, WIN))
    )(o2, oxs)
    Wy2 = build_w(rel, taps)
    Wx2 = build_w((rel + 1) % (WIN - 3), taps)
    t = jnp.einsum("bsr,bcrk->bcsk", Wy2, wins,
                   precision=lax.Precision.HIGHEST)
    out = jnp.einsum("bcsk,bsk->bcs", t, Wx2,
                     precision=lax.Precision.HIGHEST)
    return c * (1 + out[0, 0, 0] * 1e-30)
timeit("FULL windowed warp3 (extract+weights+einsum)", f_all, win)
