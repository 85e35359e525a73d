#!/usr/bin/env python
"""Error-tail analysis for rg-level parity: connected components of
|ours - reference_rg| > 1 px, with per-component seed diagnostics.

For each large error component it reports: size, bbox, the reference's mean
flow, ours, and what the SEEDS inside the component say (how many agree with
the reference vs with us) — distinguishing "we lose correct seeds" from
"no seeds there / seeds themselves disagree".

Usage: python scripts/tail_analysis.py <ours_rg.flo> [<other_rg.flo> ...]
"""
import os
import sys

import numpy as np
from scipy import ndimage

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from faldoi_tpu.io import read_flo

GOLD = ROOT + "/tests/golden/"


def analyze(path, ref, seeds, top=8):
    ours = read_flo(path)
    fin = np.isfinite(ours[..., 0]) & np.isfinite(ref[..., 0])
    err = np.hypot(ours[..., 0] - ref[..., 0], ours[..., 1] - ref[..., 1])
    err = np.where(fin, err, 0.0)
    print(f"\n=== {path}")
    print(f"rg EPE {err[fin].mean():.4f}; >1px: {(err > 1).mean() * 100:.1f}%"
          f" of px carrying {err[err > 1].sum() / err.sum() * 100:.0f}%"
          f" of total error")
    lab, n = ndimage.label(err > 1.0)
    sizes = ndimage.sum(np.ones_like(lab), lab, range(1, n + 1))
    order = np.argsort(sizes)[::-1][:top]
    sfin = np.isfinite(seeds[..., 0])
    for rank, ci in enumerate(order):
        m = lab == ci + 1
        ys, xs = np.nonzero(m)
        ref_u = ref[m].mean(0)
        our_u = ours[m].mean(0)
        sm = m & sfin
        ns = int(sm.sum())
        line = (f"#{rank}: {int(sizes[ci])}px bbox=({ys.min()},{xs.min()})-"
                f"({ys.max()},{xs.max()}) ref=({ref_u[0]:+.2f},{ref_u[1]:+.2f})"
                f" ours=({our_u[0]:+.2f},{our_u[1]:+.2f}) seeds={ns}")
        if ns:
            sflow = seeds[sm]
            rloc = ref[sm]
            oloc = ours[sm]
            agree_ref = int((np.hypot(*(sflow - rloc).T) < 1).sum())
            agree_our = int((np.hypot(*(sflow - oloc).T) < 1).sum())
            line += f" (agree ref {agree_ref}, agree ours {agree_our})"
        print(line)


def main():
    ref = read_flo(GOLD + "deep_rg.flo")
    seeds = read_flo(GOLD + "deep_mt_1.flo")
    for path in sys.argv[1:]:
        analyze(path, ref, seeds)


if __name__ == "__main__":
    main()
