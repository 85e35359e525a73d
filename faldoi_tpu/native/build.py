"""Build the faldoi_io native extension in-place.

Usage: python -m faldoi_tpu.native.build
The package works without it (pure-Python fallbacks); the extension
accelerates host-side I/O for dataset streaming.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "faldoi_io.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "faldoi_io" + suffix)
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
