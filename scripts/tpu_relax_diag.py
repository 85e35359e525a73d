#!/usr/bin/env python
"""Diagnose relaxation convergence: per-sweep acceptance counts."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from faldoi_tpu.io import read_flo
from faldoi_tpu.io.image import read_image_split
from faldoi_tpu.core.preprocess import prepare_pair
from faldoi_tpu.core import local_step as LS
from faldoi_tpu.core.functionals import SOLVERS, make_solver_consts
from faldoi_tpu.core.patch_solver import pad_for_crops
from faldoi_tpu.ops.stencils import centered_gradient
from faldoi_tpu import params as P

BASE = "/root/reference/example_data/clean/easy/"
GOLD = "/root/repo/tests/golden/"

maxdim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
relax = os.environ.get("RELAX", "1") == "1"

i0 = read_image_split(BASE + "frame_0002.png")
i1 = read_image_split(BASE + "frame_0003.png")
go = read_flo(GOLD + "deep_mt_1.flo")
if maxdim:
    i0 = i0[:, :maxdim, :maxdim]
    i1 = i1[:, :maxdim, :maxdim]
    go = go[:maxdim, :maxdim]

a, b = prepare_pair(i0, i1)
h, w = a.shape
n = h * w
p = 11
i1x, i1y = centered_gradient(b)
sc = make_solver_consts(P.M_TVL1, pad_for_crops(a, p), b, i1x, i1y,
                        40.0, 0.3, 0.125, 0.01, wr=5)
solver = SOLVERS[P.M_TVL1]
sal = jnp.ones((n + 1,), jnp.float32)
trust = jnp.ones((n + 1,), jnp.int32)

ls = LS.LocalSolver(h, w, wr=5, bsz=bsz, solver=solver, warps=1, max_iters=4,
                    mode="step", fill="dense", relax=relax)
state = ls.insert_seeds(LS.init_state(h, w), go, sc, sal)
print(f"size {h}x{w} bsz={bsz} relax={relax} floor={ls.floor}", flush=True)

t0 = time.time()
for s in range(600):
    state, n_acc = LS.grow_step(state, solver, sc, trust, sal, jnp.asarray(0),
                                h, w, 5, bsz, warps=1, max_iters=4,
                                delta=float("inf"), fill="dense",
                                floor=ls.floor, relax=relax,
                                relax_margin=float(os.environ.get("MARGIN", "0.95")))
    na = int(n_acc)
    nf = int(state.fixed[:n].sum())
    if s < 20 or s % 10 == 0 or na == 0:
        print(f"sweep {s}: accepted={na} fixed={nf}/{n} "
              f"t={time.time()-t0:.1f}s", flush=True)
    if na == 0:
        break
