#!/usr/bin/env python3
"""Render the analytic terrain spike to a PNG (parity:
python/tools/terrain_spike.py)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--colormap", default="viridis")
    ap.add_argument("--out", default="terrain_spike.png")
    args = ap.parse_args(argv)

    from vulkan_forge import TerrainSpike
    t = TerrainSpike(args.width, args.height, args.grid, args.colormap)
    t.render_png(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
