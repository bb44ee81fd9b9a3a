"""Benchmark entry point for the driver: ONE JSON line on stdout.

Primary metric: batched rectangle-pair SAT throughput on the local chip
(BASELINE.json north star: >= 1e9 pairs/sec/chip => vs_baseline >= 1.0).
Secondary metrics go to stderr for humans.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    from collide2d_tpu.utils.benchmarks import bench_mc, bench_sat, bench_sat_pallas

    sat = bench_sat_pallas(pairs=1 << 23, iters=20)
    print(
        json.dumps(
            {
                "metric": "sat_rect_pairs_per_sec",
                "value": sat["value"],
                "unit": sat["unit"],
                "vs_baseline": sat["vs_baseline"],
            }
        )
    )
    # Secondary metrics (humans, stderr): XLA SAT path + fused MC sampler.
    for fn in (bench_sat, bench_mc):
        try:
            print(json.dumps(fn()), file=sys.stderr)
        except Exception as e:  # secondary metrics must never break the bench
            print(f"{fn.__name__} failed: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
