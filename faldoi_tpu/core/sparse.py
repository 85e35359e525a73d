"""Sparse seed rasterisation — reference "Algorithm 4" (``sparse_flow.cpp``).

Reads 4-column match lines ``x0 y0 x1 y1`` and writes ``u = x1-x0, v = y1-y0``
at pixel ``(floor(x0), floor(y0))`` of an all-NaN field.  Later matches
overwrite earlier ones at the same pixel, as in the C loop.
"""

from __future__ import annotations

import numpy as np


def parse_matches(path: str) -> np.ndarray:
    """Read a match file; returns (n, >=4) float array (extra columns kept)."""
    rows = []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 4:
                rows.append([float(p) for p in parts])
    if not rows:
        return np.zeros((0, 4), np.float32)
    ncol = min(len(r) for r in rows)
    return np.array([r[:ncol] for r in rows], dtype=np.float32)


def sparse_flow_from_matches(matches: np.ndarray, w: int, h: int) -> np.ndarray:
    """Rasterise matches into an (h, w, 2) NaN-initialised flow field."""
    out = np.full((h, w, 2), np.nan, dtype=np.float32)
    if matches.shape[0]:
        x0, y0, x1, y1 = matches[:, 0], matches[:, 1], matches[:, 2], matches[:, 3]
        i = np.floor(x0).astype(np.int64)
        j = np.floor(y0).astype(np.int64)
        ok = (i >= 0) & (i < w) & (j >= 0) & (j < h)
        out[j[ok], i[ok], 0] = (x1 - x0)[ok]
        out[j[ok], i[ok], 1] = (y1 - y0)[ok]
    return out


def sparse_flow(match_path: str, w: int, h: int) -> np.ndarray:
    try:  # native fast path
        from faldoi_tpu.native import faldoi_io as _native

        rows, n = _native.parse_matches(match_path, 4)
        payload = _native.rasterize_matches(rows, n, w, h)
        return np.frombuffer(payload, "<f4").reshape(h, w, 2).copy()
    except ImportError:
        return sparse_flow_from_matches(parse_matches(match_path), w, h)
