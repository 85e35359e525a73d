#!/usr/bin/env python
"""Time the full match_growing + global step on the TPU with verbose
per-stage telemetry, and record rg/var parity vs the goldens.

Usage: python scripts/tpu_growing_bench.py [bsz] [mode] [delta] [floor]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

print(f"# device: {jax.devices()[0]}", flush=True)

from faldoi_tpu.io import read_flo
from faldoi_tpu.io.image import read_image_split
from faldoi_tpu.core.preprocess import prepare_pair
from faldoi_tpu.core.match_growing import match_growing
from faldoi_tpu.core.global_step import tvl2_global
from faldoi_tpu import params as P

BASE = "/root/reference/example_data/clean/easy/"
GOLD = "/root/repo/tests/golden/"

bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
mode = sys.argv[2] if len(sys.argv) > 2 else "chunked"
delta = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
floor = int(sys.argv[4]) if len(sys.argv) > 4 else None
relax = os.environ.get("RELAX", "1") == "1"

i0 = read_image_split(BASE + "frame_0002.png")
i1 = read_image_split(BASE + "frame_0003.png")
go = read_flo(GOLD + "deep_mt_1.flo")
ba = read_flo(GOLD + "deep_mt_2.flo")
gt = read_flo(BASE + "gt/frame_0002.flo")
ref_rg = read_flo(GOLD + "deep_rg.flo")
ref_var = read_flo(GOLD + "deep_var.flo")

a, b = prepare_pair(i0, i1)
prm = P.Parameters()
prm.val_method = P.M_TVL1
prm.iterations_of = P.LOCAL_ITER
prm.epsilon = P.FB_TOL

for rep in range(2):
    t0 = time.time()
    flow, ene, _ = match_growing(go, ba, a, b, prm, bsz=bsz, mode=mode,
                                 delta=delta, fill="dense", floor=floor,
                                 relax=relax, verbose=True)
    t_local = time.time() - t0
    t0 = time.time()
    u1, u2 = tvl2_global(a, b, jnp.asarray(flow[..., 0]),
                         jnp.asarray(flow[..., 1]))
    out = np.stack([np.asarray(u1), np.asarray(u2)], -1)
    t_glob = time.time() - t0
    fin = np.isfinite(flow[..., 0]) & np.isfinite(ref_rg[..., 0])
    epe_rg = float(np.hypot(flow[..., 0] - ref_rg[..., 0],
                            flow[..., 1] - ref_rg[..., 1])[fin].mean())
    epe_var = float(np.hypot(out[..., 0] - ref_var[..., 0],
                             out[..., 1] - ref_var[..., 1]).mean())
    epe_gt = float(np.hypot(out[..., 0] - gt[..., 0],
                            out[..., 1] - gt[..., 1]).mean())
    print(f"rep{rep}: local={t_local:.1f}s global={t_glob:.1f}s "
          f"rg_epe={epe_rg:.4f} var_epe={epe_var:.4f} gt_epe={epe_gt:.4f}",
          flush=True)
