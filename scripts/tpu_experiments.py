#!/usr/bin/env python
"""Sweep-count / wall-clock experiment matrix for the TPU local step.

Runs match_growing + tvl2_global on clean/easy with DeepMatching seeds for a
list of growing configs, in ONE process (in-memory jit reuse + persistent
compile cache), and appends one JSON line per config to EXPERIMENTS_r03.jsonl
with wall-clock, per-iteration sweep counts, and rg/var/gt EPE.

Usage: python scripts/tpu_experiments.py [config ...]
Configs by name (default: block16 relax block16_relax flood).
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ROOT + "/.jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", ROOT + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

print(f"# device: {jax.devices()[0]}", flush=True)

from faldoi_tpu.profiling import warm_tunnel

_t0 = time.time()
warm_tunnel(sync=True)  # absorb the tunnel's one-time first-transfer stall
print(f"# d2h warm: {time.time() - _t0:.2f}s", flush=True)

from faldoi_tpu.io import read_flo
from faldoi_tpu.io.image import read_image_split
from faldoi_tpu.core.preprocess import prepare_pair
from faldoi_tpu.core.match_growing import match_growing
from faldoi_tpu.core.global_step import tvl2_global
from faldoi_tpu import params as P

BASE = "/root/reference/example_data/clean/easy/"
GOLD = ROOT + "/tests/golden/"
OUT = ROOT + "/EXPERIMENTS_r03.jsonl"

# base = the parity-validated r2 default (measured 559.4s local, var 0.0271,
# rg 0.4257 on TPU v5lite); every config below changes ONE lever vs base
BASE_KW = dict(bsz=8192, mode="chunked", delta=0.01, fill="patch",
               relax=False, delta_rel=0.5, floor_scale=64, block=0)
CONFIGS = {
    "base": {},
    "block16": dict(block=16),
    "block32": dict(block=32),
    "relax": dict(relax=True),
    "block16_relax": dict(block=16, relax=True),
    # pure top-k flood: delta=inf + full floor -> sweep-count lower bound
    "flood": dict(delta=float("inf"), floor=8192, floor_scale=0),
    "bsz16k": dict(bsz=16384, block=16),
    # dense-phase floor raises: floor_dyn = min(floor, queue//64) — the
    # sparse-phase throttle (queue//64) is untouched, only large-queue
    # (requeue) phases accept more per sweep
    "floor1k": dict(floor=1024),
    "floor2k": dict(floor=2048),
    "floor4k": dict(floor=4096),
    "floor8k": dict(floor=8192),
    "floor8k_d02": dict(floor=8192, delta=0.02),
    "floor8k_16k": dict(floor=16384, bsz=16384),
    # staged sparse throttle: queue//64 while the queue is small (the
    # parity-critical racing-fronts regime), queue//fs_hi once the
    # frontier is large
    "staged16": dict(floor=8192, floor_scale_hi=16, queue_hi=32768),
    "staged8": dict(floor=8192, floor_scale_hi=8, queue_hi=32768),
    "staged4_q64": dict(floor=8192, floor_scale_hi=4, queue_hi=65536),
    "staged16_q64": dict(floor=4096, floor_scale_hi=16, queue_hi=65536),
    "staged16_rerun": dict(floor=4096, floor_scale_hi=16, queue_hi=32768),
    "floor4k_rerun": dict(floor=4096),
    # looser band everywhere
    "d02": dict(delta=0.02),
    "drel1": dict(delta_rel=1.0),
    "fs32": dict(floor_scale=32),
    "fs128": dict(floor_scale=128),
    "fs256": dict(floor_scale=256),
    # post-seedfix speed direction: the seed-payload fix (733da8e) halved
    # rg/var error at identical dials, so the speed end of the frontier
    # (looser bands / wider warm skips) must be re-measured — a config that
    # failed the 0.05 var gate pre-fix may pass it now at a fraction of the
    # time.  Env dials are applied per-config via the "_env" key.
    "pf_base": {},
    "pf_d02": dict(delta=0.02),
    "pf_d05": dict(delta=0.05),
    "pf_fs32": dict(floor_scale=32),
    "pf_fs16": dict(floor_scale=16),
    "pf_d02_fs32": dict(delta=0.02, floor_scale=32),
    "pf_d05_fs16": dict(delta=0.05, floor_scale=16),
    "pf_warm5": dict(_env={"FALDOI_GROW_WARM_BAND": "5"}),
    "pf_warm5_d02": dict(delta=0.02,
                         _env={"FALDOI_GROW_WARM_BAND": "5"}),
    "pf_staged16": dict(floor=8192, floor_scale_hi=16, queue_hi=32768),
    "pf_drel1": dict(delta_rel=1.0),
    # pipelined vs blocking rung adaptation (grow_pair max_acc sync)
    "ab_sync_d05": dict(delta=0.05,
                        _env={"FALDOI_GROW_SYNC_ADAPT": "1"}),
    "ab_pipe_d05": dict(delta=0.05),
    "ab_pipe_d05_b": dict(delta=0.05),
    "ab_sync_d05_b": dict(delta=0.05,
                          _env={"FALDOI_GROW_SYNC_ADAPT": "1"}),
    "ab_pipe_d05_fs16": dict(delta=0.05, floor_scale=16),
    "ab_pipe_d05_fs32": dict(delta=0.05, floor_scale=32),
    # parity frontier re-timed under pipelined adaptation (the strict
    # ordering dials have more, smaller sweeps -> were sync-dominated)
    "fr_d05": dict(delta=0.05),
    "fr_em11": dict(delta=0.05,
                    _env={"FALDOI_GROW_EXACTMIN": "11",
                          "FALDOI_GROW_WARM_BAND": "0"}),
    "fr_em11_warm": dict(delta=0.05,
                         _env={"FALDOI_GROW_EXACTMIN": "11"}),
    "fr_em11_d01": dict(delta=0.01,
                        _env={"FALDOI_GROW_EXACTMIN": "11",
                              "FALDOI_GROW_WARM_BAND": "0"}),
    "fr_em11_bf": dict(delta=0.05,
                       _env={"FALDOI_GROW_EXACTMIN": "11",
                             "FALDOI_GROW_EXACTMIN_BAND": "2",
                             "FALDOI_GROW_WARM_BAND": "0"}),
    "fr_em11_bf_warm": dict(delta=0.05,
                            _env={"FALDOI_GROW_EXACTMIN": "11",
                                  "FALDOI_GROW_EXACTMIN_BAND": "2"}),
    # post-seedfix WIDE-acceptance re-measure: flood/block/huge-delta were
    # written off on pre-733da8e numbers (var 0.65), but those runs were
    # dominated by the seed-payload indexing bug (every scattered candidate
    # flow came from a wrong lane).  With correct payloads, unordered or
    # loosely-ordered acceptance may keep var parity at far fewer sweeps.
    "pf2_d10": dict(delta=0.10),
    "pf2_d20": dict(delta=0.20),
    "pf2_block16": dict(delta=0.05, block=16),
    "pf2_block32": dict(delta=0.05, block=32),
    "pf2_flood": dict(delta=float("inf"), floor=8192, floor_scale=0),
    "pf2_drel2": dict(delta=0.05, delta_rel=2.0),
    "pf2_base": dict(delta=0.05),  # same-session shipping baseline
    "pf2_relax": dict(delta=0.05, relax=True),
}


def main():
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

    names = sys.argv[1:] or ["block16", "relax", "block16_relax", "flood"]
    for name in names:
        kw = dict(BASE_KW, **CONFIGS[name])
        cfg_env = kw.pop("_env", {})
        saved_env = {k: os.environ.get(k) for k in cfg_env}
        os.environ.update(cfg_env)
        print(f"=== {name}: {kw} env={cfg_env} ===", flush=True)
        t0 = time.time()
        flow, ene, _ = match_growing(go, ba, a, b, prm, verbose=True, **kw)
        t_local = time.time() - t0
        t0 = time.time()
        u1, u2 = tvl2_global(a, b, jnp.asarray(flow[..., 0]),
                             jnp.asarray(flow[..., 1]))
        out = np.stack([np.asarray(u1), np.asarray(u2)], -1)
        t_glob = time.time() - t0
        fin = np.isfinite(flow[..., 0]) & np.isfinite(ref_rg[..., 0])
        env_knobs = {k: v for k, v in os.environ.items()
                     if k.startswith("FALDOI_GROW_")}
        rec = {
            "config": os.environ.get("FALDOI_EXP_LABEL", name),
            "kw": {k: str(v) for k, v in kw.items()},
            "env": env_knobs,
            "local_s": round(t_local, 1), "global_s": round(t_glob, 1),
            "rg_epe": round(float(np.hypot(
                flow[..., 0] - ref_rg[..., 0],
                flow[..., 1] - ref_rg[..., 1])[fin].mean()), 4),
            "var_epe": round(float(np.hypot(
                out[..., 0] - ref_var[..., 0],
                out[..., 1] - ref_var[..., 1]).mean()), 4),
            "gt_epe": round(float(np.hypot(
                out[..., 0] - gt[..., 0],
                out[..., 1] - gt[..., 1]).mean()), 4),
        }
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        save = os.environ.get("FALDOI_EXP_SAVE")
        if save:
            from faldoi_tpu.io import write_flo
            write_flo(f"{save}_{rec['config']}_rg.flo", np.asarray(flow))
            write_flo(f"{save}_{rec['config']}_var.flo", out)


if __name__ == "__main__":
    main()
