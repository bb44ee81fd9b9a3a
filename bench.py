"""Benchmark entry point for the driver: ONE JSON line on stdout.

Primary metric: batched rectangle-pair SAT throughput on the local chip
(BASELINE.json north star: >= 1e9 pairs/sec/chip => vs_baseline >= 1.0).
Secondary metrics go to stderr for humans.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    from collide2d_tpu.utils.benchmarks import bench_mc, bench_sat

    sat = bench_sat(pairs=1 << 22, iters=20)
    print(
        json.dumps(
            {
                "metric": sat["metric"],
                "value": sat["value"],
                "unit": sat["unit"],
                "vs_baseline": sat["vs_baseline"],
            }
        )
    )
    try:
        mc = bench_mc()
        print(json.dumps(mc), file=sys.stderr)
    except Exception as e:  # secondary metric must never break the bench
        print(f"bench_mc failed: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
