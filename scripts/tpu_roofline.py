#!/usr/bin/env python
"""Roofline/MFU evidence for the growing sweep (VERDICT r3 item 1).

Times one wavefront sweep at a given batch size on the real TPU, breaks the
cost into phases by structural ablation (FALDOI_ABLATE cuts a phase out of
the program and XLA DCEs its dead chain), and reports, per phase:

  * measured ms/sweep (difference vs the full sweep),
  * XLA's own cost_analysis() flops / bytes for the full program,
  * MFU (vs the v5e MXU peak) and HBM-BW utilisation implied by the
    measured time.

TPU v5e (v5 lite) peaks used: 197 TFLOP/s bf16 MXU (f32-via-bf16 3-pass
HIGH precision ~1/3 of that), 819 GB/s HBM.

Usage: python scripts/tpu_roofline.py [bsz ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from faldoi_tpu.core.patch_solver import pad_for_crops
from faldoi_tpu.core.functionals import solve_tvl1, make_solver_consts
from faldoi_tpu.core.local_step import _sweep_body, init_state
from faldoi_tpu.ops.stencils import centered_gradient

H, W = 436, 1024
N = H * W
REPS = 30
PEAK_BF16 = 197e12          # v5e MXU
PEAK_HBM = 819e9            # bytes/s

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W), jnp.float32)
i1x, i1y = centered_gradient(img)
sc = make_solver_consts(0, pad_for_crops(img, 11), img, i1x, i1y,
                        40.0, 0.3, 0.125, 0.01, wr=5)
cand = jax.random.uniform(key, (N,), jnp.float32)
state0 = init_state(H, W)
state0 = state0._replace(
    cand_e=jnp.concatenate([cand, jnp.full((1,), jnp.inf)]),
    cand_u=jnp.zeros((N + 1,)), cand_v=jnp.zeros((N + 1,)))
sal = jnp.ones((N + 1,), jnp.float32)
trust2d = jnp.ones((H, W), jnp.float32)


def build(bsz, ablate, first_iter=False):
    """One compiled program = REPS sweeps (work held constant by resetting
    the queue each sweep)."""
    os.environ["FALDOI_ABLATE"] = ablate
    dials = (0, "0", 0.0, 0, "approx", ablate)

    def one(st):
        s2, _acc = _sweep_body(
            st, solve_tvl1, sc, trust2d, sal, jnp.asarray(0),
            H, W, 5, bsz, 1, 4, delta=0.01, delta_rel=0.5,
            floor=512, floor_scale=64, fill="patch_rb", relax=False,
            with_chi=False, first_iter=first_iter, dials=dials,
        )
        return s2._replace(cand_e=state0.cand_e, fixed=state0.fixed)

    def run(st):
        def body(s, _):
            return one(s), None
        s, _ = jax.lax.scan(body, st, None, length=REPS)
        return s

    return jax.jit(run)


def measure(fn):
    lowered = fn.lower(state0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    r = fn(state0)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = fn(state0)
        jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    ms = best / REPS * 1e3
    flops = float(ca.get("flops", 0)) / REPS
    byts = float(ca.get("bytes accessed", 0)) / REPS
    return ms, flops, byts


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 8192]
    print(f"# device: {jax.devices()[0]}  {H}x{W}  REPS={REPS}")
    ablations = [
        ("full", ""),
        ("nofill", "nofill"),          # - per-patch Poisson fill
        ("nowscatter", "nowscatter"),  # - working-flow scatter
        ("nosolve", "nosolve"),        # - whole patch solver (warp+PD+eval)
        ("nowarp", "nowarp"),          # - warp3 in solver (keeps eval warp)
        ("noeval", "noeval"),          # - eval warp1
        ("nopd", "nopd"),              # - PD iterations
        ("base", "nofill,nosolve,nowscatter"),  # topk+crops+scatters only
    ]
    for bsz in sizes:
        rows = {}
        for name, ab in ablations:
            ms, fl, by = measure(build(bsz, ab))
            rows[name] = (ms, fl, by)
            mfu = fl / (ms / 1e3) / PEAK_BF16 * 100
            bw = by / (ms / 1e3) / PEAK_HBM * 100
            print(f"bsz={bsz:5d} {name:11s} {ms:8.2f} ms/sweep  "
                  f"XLA flops={fl/1e9:7.3f}G bytes={by/1e6:8.1f}M  "
                  f"MFU={mfu:5.1f}%  HBM={bw:5.1f}%")
        full = rows["full"][0]
        print(f"# bsz={bsz} phase deltas (full {full:.2f} ms): " + "  ".join(
            f"{k}={full - rows[k][0]:+.2f}" for k in
            ("nofill", "nowscatter", "nosolve", "nowarp", "noeval", "nopd")))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
