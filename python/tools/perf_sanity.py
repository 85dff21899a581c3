#!/usr/bin/env python3
"""Performance sanity harness.

Measures cold init (constructor + first render, i.e. XLA compile) and
steady-state render timings; emits the same JSON schema and enforcement
semantics as the reference tool (python/tools/perf_sanity.py):
  - default: report-only, never fails (CI-safe)
  - VF_ENFORCE_PERF=1 + --baseline: fail if steady p95 > baseline p95 +
    --regress-pct percent
  - VF_ENFORCE_PERF=1, no baseline: budget_ms = 40 * (W*H)/(512*512),
    fail if steady p95 > budget_ms * --budget-mult
"""
from __future__ import annotations

import argparse
import csv
import json
import math
import os
import statistics as stats
import sys
import time
from typing import Any, Dict, List

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

try:
    from vulkan_forge import Renderer
except Exception as e:  # pragma: no cover
    raise SystemExit(f"Failed to import vulkan_forge.Renderer: {e}")


def percentile(values: List[float], p: float) -> float:
    if not values:
        return float("nan")
    k = (len(values) - 1) * (p / 100.0)
    f = math.floor(k)
    c = math.ceil(k)
    if f == c:
        return values[int(k)]
    return values[f] * (c - k) + values[c] * (k - f)


def measure(width: int, height: int, runs: int, warmups: int) -> Dict[str, Any]:
    t0 = time.perf_counter()
    r = Renderer(width, height)
    r.render_triangle_rgba()  # cold render (includes XLA compile)
    init_ms = (time.perf_counter() - t0) * 1000.0

    for _ in range(max(0, warmups)):
        r.render_triangle_rgba()

    steady = []
    for _ in range(runs):
        t = time.perf_counter()
        r.render_triangle_rgba()
        steady.append((time.perf_counter() - t) * 1000.0)

    steady_sorted = sorted(steady)
    return {
        "width": width, "height": height,
        "runs": runs, "warmups": warmups,
        "init_ms": init_ms,
        "steady": {
            "samples_ms": steady,
            "mean_ms": stats.fmean(steady) if steady else float("nan"),
            "median_ms": stats.median(steady) if steady else float("nan"),
            "p95_ms": percentile(steady_sorted, 95.0) if steady else float("nan"),
            "stdev_ms": stats.pstdev(steady) if len(steady) > 1 else 0.0,
            "min_ms": min(steady) if steady else float("nan"),
            "max_ms": max(steady) if steady else float("nan"),
        },
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--runs", type=int, default=30)
    ap.add_argument("--warmups", type=int, default=3)
    ap.add_argument("--json", default="perf_report.json")
    ap.add_argument("--csv", default="")
    ap.add_argument("--baseline", default="")
    ap.add_argument("--regress-pct", type=float, default=50.0)
    ap.add_argument("--budget-mult", type=float, default=3.0)
    args = ap.parse_args(argv)

    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    rep = measure(args.width, args.height, args.runs, args.warmups)

    if args.csv:
        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["iter", "ms"])
            for i, ms in enumerate(rep["steady"]["samples_ms"]):
                w.writerow([i, f"{ms:.4f}"])

    with open(args.json, "w", encoding="utf-8") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep, indent=2))

    # Enforcement parity with the reference tool: opt-in, and failures exit
    # with code 2 (perf_sanity.py:118-137 in the reference).
    if os.environ.get("VF_ENFORCE_PERF", "").strip() == "1":
        p95 = rep["steady"]["p95_ms"]
        if args.baseline:
            try:
                with open(args.baseline, "r", encoding="utf-8") as f:
                    base = json.load(f)
                base_p95 = float(base["steady"]["p95_ms"])
                limit = base_p95 * (1.0 + args.regress_pct / 100.0)
                if p95 > limit:
                    print(f"FAIL: p95 {p95:.3f}ms > baseline {base_p95:.3f}ms"
                          f" * (1 + {args.regress_pct:.1f}%) = {limit:.3f}ms")
                    return 2
            except Exception as e:
                print(f"WARNING: failed to read baseline '{args.baseline}': {e}")
        else:
            budget = 40.0 * (args.width * args.height) / (512.0 * 512.0)
            limit = budget * args.budget_mult
            if p95 > limit:
                print(f"FAIL: p95 {p95:.3f}ms > scaled budget {limit:.3f}ms "
                      f"(budget {budget:.3f} * mult {args.budget_mult:.2f})")
                return 2

    print("Performance sanity OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
