#!/usr/bin/env python
"""Measure the reference binaries' OWN sensitivity to infinitesimal seed
perturbations — the reproducibility floor that bounds any reimplementation's
achievable parity (r4; see PARITY.md "CSAD chaos").

The CSAD-family local solvers (m4-m7) are data-prox-only in practice (the
inert-TV quirk): every grown pixel's flow is a near-pass-through of patch
inits, so the serial pop ORDER becomes the output.  The pop order is
decided by float-LSB energy comparisons -> the output is chaotic in the
inputs.  This probe perturbs the seed flows by +-1e-5 px and diffs the
rebuilt reference binaries against themselves.

Measured (48x64 tiny clean/easy crop, DeepMatching seeds, loc_it=3):

    m0: rg mean 0.0197   var mean 0.0021   (stable: 0.05 gate meaningful)
    m4: rg mean 0.3633   var mean 0.1671   (chaotic: the reference cannot
                                            reproduce ITSELF to 0.05)

Usage: python scripts/csad_chaos_probe.py [--method 4] [--workdir DIR]
Requires the rebuilt binaries (see scripts/run_parity.py docstring).
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFBUILD = os.environ.get("FALDOI_REFBUILD", "/tmp/refbuild")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/csad_chaos")
    ap.add_argument("--eps", type=float, default=1e-5)
    args = ap.parse_args()

    from scripts.run_parity import make_fixtures
    from faldoi_tpu.io import read_flo, write_flo

    os.makedirs(args.workdir, exist_ok=True)
    ims, s1, s2, _gt = make_fixtures("tiny", args.method, args.workdir)

    rng = np.random.RandomState(0)
    pert = []
    for s in (s1, s2):
        fl = read_flo(s)
        fin = np.isfinite(fl)
        fl2 = fl.copy()
        fl2[fin] += rng.uniform(-args.eps, args.eps,
                                size=int(fin.sum())).astype(np.float32)
        p = s.replace(".flo", "_pert.flo")
        write_flo(p, fl2)
        pert.append(p)

    m = str(args.method)

    def run(tag, sa, sb):
        rg = os.path.join(args.workdir, f"rg_{tag}.flo")
        var = os.path.join(args.workdir, f"var_{tag}.flo")
        subprocess.run([REFBUILD + "/local_faldoi", ims, sa, sb, rg,
                        os.path.join(args.workdir, "sim.tiff"), "-m", m],
                       check=True, capture_output=True)
        subprocess.run([REFBUILD + "/global_faldoi", ims, rg, var, "-m", m],
                       check=True, capture_output=True)
        return read_flo(rg), read_flo(var)

    rg_a, var_a = run("base", s1, s2)
    rg_b, var_b = run("pert", pert[0], pert[1])

    fin = np.isfinite(rg_a[..., 0]) & np.isfinite(rg_b[..., 0])
    erg = np.hypot(rg_a[..., 0] - rg_b[..., 0],
                   rg_a[..., 1] - rg_b[..., 1])[fin]
    ev = np.hypot(var_a[..., 0] - var_b[..., 0],
                  var_a[..., 1] - var_b[..., 1])
    print(f"m{m} ref-vs-ref (seeds +-{args.eps}): rg mean {erg.mean():.4f} "
          f"median {np.median(erg):.4f}  var mean {ev.mean():.4f} "
          f"median {np.median(ev):.4f}")


if __name__ == "__main__":
    main()
