"""Dataset enumeration helpers (``scripts_python/utils.py``)."""

from __future__ import annotations

import os
from typing import List, Tuple


def list_images_dataset(root: str, dataset: str = "sintel",
                        render: str = "clean") -> List[Tuple[str, str]]:
    """Enumerate consecutive frame pairs of a dataset directory.

    sintel: root/<render>/<sequence>/frame_XXXX.png
    middlebury: root/<sequence>/frame10.png + frame11.png
    Returns a list of (frame_t, frame_t+1) path pairs.
    """
    pairs = []
    if dataset == "sintel":
        base = os.path.join(root, render)
        for seq in sorted(os.listdir(base)):
            d = os.path.join(base, seq)
            if not os.path.isdir(d):
                continue
            frames = sorted(
                f for f in os.listdir(d) if f.startswith("frame_") and
                f.endswith(".png")
            )
            for a, b in zip(frames, frames[1:]):
                pairs.append((os.path.join(d, a), os.path.join(d, b)))
    elif dataset == "middlebury":
        for seq in sorted(os.listdir(root)):
            d = os.path.join(root, seq)
            f0 = os.path.join(d, "frame10.png")
            f1 = os.path.join(d, "frame11.png")
            if os.path.isfile(f0) and os.path.isfile(f1):
                pairs.append((f0, f1))
    else:
        raise ValueError(f"unknown dataset {dataset!r}")
    return pairs


def write_pair_list(path: str, i0: str, i1: str, i_1: str = None,
                    i2: str = None) -> str:
    """Write an ims.txt frame list (2 or 4 frames)."""
    names = [i0, i1] + ([i_1, i2] if i_1 and i2 else [])
    with open(path, "w") as fh:
        fh.write("\n".join(names) + "\n")
    return path


# read_frame_list lives in core.preprocess (the canonical list reader
# with ancestor-relative resolution); re-exported here for the drivers.
from faldoi_tpu.core.preprocess import read_frame_list  # noqa: E402,F401
