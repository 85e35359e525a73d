"""CLI: rasterise a 4-column match list into a sparse .flo seed field.
Contract-compatible with the reference ``sparse_flow`` binary
(sparse_flow.cpp:50-72): ``sparse_flow matches.txt columns rows out.flo``."""

from __future__ import annotations

import sys

from faldoi_tpu.core.sparse import sparse_flow
from faldoi_tpu.io import write_flo


def main(argv=None):
    args = sys.argv[1:] if argv is None else argv
    if len(args) != 4:
        print("usage: sparse_flow matches.txt columns rows out.flo", file=sys.stderr)
        return 1
    out = sparse_flow(args[0], int(args[1]), int(args[2]))
    write_flo(args[3], out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
