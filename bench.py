"""Benchmark entry point for the driver: headline JSON is the FINAL line.

Primary metric: batched rectangle-pair SAT throughput on the local chip
(BASELINE.json north star: >= 1e9 pairs/sec/chip => vs_baseline >= 1.0),
measured on the Pallas kernel (the production narrow-phase path).

Output contract (the driver parses the LAST JSON line of the combined
stdout+stderr stream):
- the headline runs FIRST and its JSON prints immediately (so even a
  timeout mid-secondaries leaves a valid capture),
- secondary metrics print '# '-prefixed to stderr (never parseable as
  the headline),
- the headline JSON prints once more as the very last stdout line.

The headline carries ``effective_gbps`` — the HBM bandwidth the claimed
throughput implies at the kernel's 128 bytes/pair cost model — and
``hbm_read_gbps``, the bandwidth a trivial-math Pallas kernel with the
SAT kernel's exact memory pattern measures on the same device with the
same difference-quotient methodology. A headline whose implied bandwidth
exceeds what the device demonstrably streams is flagged here rather than
shipped.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    import os
    import threading
    import time

    # Watchdog: the axon tunnel can wedge hard enough that PJRT backend
    # init (or a mid-run dispatch) blocks FOREVER, which would hang the
    # whole round capture. Bound backend init at 15 min; after that,
    # require progress (one completed bench section) every 30 min. On a
    # stall, exit via os._exit — the headline prints early precisely so
    # a mid-secondaries kill still leaves a valid capture.
    init_timeout = float(os.environ.get("COLLIDE2D_BENCH_INIT_TIMEOUT", 900))
    stall_timeout = float(os.environ.get("COLLIDE2D_BENCH_STALL_TIMEOUT", 1800))
    last_progress = [time.monotonic()]
    init_done = threading.Event()

    def _watchdog() -> None:
        if not init_done.wait(timeout=init_timeout):
            print(
                f"# FATAL: TPU backend init did not complete in "
                f"{init_timeout:.0f}s (axon tunnel wedged?) - aborting bench",
                file=sys.stderr,
                flush=True,
            )
            os._exit(17)
        while True:
            time.sleep(min(60.0, stall_timeout / 4))
            if time.monotonic() - last_progress[0] > stall_timeout:
                print(
                    f"# FATAL: no bench progress for {stall_timeout:.0f}s "
                    "(tunnel stall?) - aborting; headline (if printed) "
                    "remains valid",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(18)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    jax.devices()  # force backend init under the watchdog's deadline
    init_done.set()
    last_progress[0] = time.monotonic()

    from collide2d_tpu.utils.benchmarks import (
        bench_mc,
        bench_mc_pallas,
        bench_mc_polygons_pallas,
        bench_reduce_bandwidth,
        bench_sat,
        bench_sat_pallas,
        bench_sat_pallas_bf16,
        bench_sat_polygons_pallas,
        bench_stream_bandwidth_pallas,
    )

    digest: dict[str, object] = {}

    def digest_add(res: dict) -> None:
        # One compact (name -> value) pair per measured metric, plus a
        # short whitelist of qualitative extras. The digest line prints
        # on stdout immediately before the final headline so the
        # driver's 2000-char tail capture always carries the WHOLE
        # measured surface, not whichever secondaries printed last
        # (round-3 verdict: only 6 of ~30 metrics survived the tail).
        name = res.get("metric")
        if not name:
            return
        # A few metrics stay stderr-only: constants (the MXU refutation
        # pair), a probe of a probe, and an A/B baseline — dropping them
        # here keeps every LIVE metric inside the 1700-char line.
        if name in (
            "hbm_read_gbps_xla",
            "mc_samples_per_sec_pallas_noshape_box_muller",
            "sat_polygon_pairs_per_sec_mxu_dot",
            "sat_polygon_pairs_per_sec_mxu_dot_bf16",
        ):
            return
        # compact: the '_per_sec' suffix is uniform noise (every rate
        # metric carries it) and integer-valued rates need no '.0' —
        # together they buy ~300 chars, enough to keep EVERY metric in
        # the line instead of trimming the longest names.
        key = name.replace("_per_sec", "")
        key = key.replace("pallas_vs_jnp_agreement", "rect_agreement")
        for unit in ("_samples", "_pairs", "_queries", "_rows"):
            key = key.replace(unit, "")

        def compact(v):
            v = float(f"{float(v):.3g}")
            return int(v) if abs(v) >= 1e4 and v == int(v) else v

        try:
            digest[key] = compact(res["value"])
        except (KeyError, TypeError, ValueError):
            return
        for extra, short in (
            ("ok", "ok"),
            ("frac_within_005", "frac005"),
            ("frac_ambiguous_ca", "amb"),
            ("window_exceeded", "wex"),
            ("steady_state_configs_per_sec", "steady"),
        ):
            if (extra == "frac_within_005"
                    and name != "pallas_vs_jnp_agreement"):
                # review r3 #7 asked for it on bench_agreement; the
                # polygon agreements keep theirs on stderr
                continue
            if extra in res:
                v = res[extra]
                digest[f"{key}.{short}"] = (
                    bool(v) if isinstance(v, (bool,)) else compact(v)
                )

    def log(obj) -> None:
        # '# ' prefix: diagnostics must never parse as the headline line.
        print("# " + json.dumps(obj), file=sys.stderr, flush=True)
        if isinstance(obj, dict):
            digest_add(obj)

    # Bandwidth anchor first (needed for the headline's sanity check):
    # the LARGER of the XLA streaming reduce (not bandwidth-optimal,
    # ~50% of chip) and the Pallas trivial-math kernel with the SAT
    # kernel's exact memory pattern (the honest ceiling).
    hbm_gbps = None
    for probe in (bench_stream_bandwidth_pallas, bench_reduce_bandwidth):
        try:
            res = probe()
            hbm_gbps = max(hbm_gbps or 0.0, res["value"])
            log(res)
        except Exception as e:
            print(f"# {probe.__name__} failed: {e}", file=sys.stderr, flush=True)
        last_progress[0] = time.monotonic()

    # Headline: Pallas SAT throughput, sanity-checked against the measured
    # streaming bandwidth (the kernel reads 128 bytes/pair, so value *
    # 128e-9 GB/s must not exceed what the chip demonstrably streams).
    # iters=100: shorter loops under-report through the remote tunnel
    # (clock ramp + RTT jitter swamp ~10 ms of device work).
    sat = bench_sat_pallas(pairs=1 << 23, iters=100)
    headline = {
        "metric": "sat_rect_pairs_per_sec",
        "value": sat["value"],
        "unit": "pairs/s",
        "vs_baseline": sat["vs_baseline"],
        "effective_gbps": sat["effective_gbps"],
    }
    if hbm_gbps is not None:
        headline["hbm_read_gbps"] = hbm_gbps
        if sat["effective_gbps"] > 1.15 * hbm_gbps:
            print(
                f"# WARNING: implied bandwidth {sat['effective_gbps']:.0f} "
                f"GB/s exceeds measured streaming bandwidth {hbm_gbps:.0f} "
                "GB/s - timing methodology suspect",
                file=sys.stderr,
                flush=True,
            )
            headline["bandwidth_check"] = "FAILED"
        else:
            headline["bandwidth_check"] = "ok"
    digest_add(headline)
    line = json.dumps(headline)
    print(line, flush=True)  # early capture, in case secondaries time out
    last_progress[0] = time.monotonic()

    # Secondary metrics (stderr, '#'-prefixed). Failures never break the
    # headline.
    import functools

    from collide2d_tpu.utils.benchmarks import (
        bench_agreement,
        bench_agreement_polygons,
        bench_e2e,
        bench_learned_train,
    )

    agreement_poly = bench_agreement_polygons
    agreement_poly_moving = functools.partial(
        bench_agreement_polygons, moving=True
    )
    agreement_poly_moving.__name__ = "bench_agreement_polygons_moving"

    from collide2d_tpu.utils.benchmarks import (
        bench_mc_moving,
        bench_mc_moving_pallas,
        bench_mc_moving_polygons,
    )

    moving_rot = functools.partial(bench_mc_moving_pallas, rotating=True)
    moving_rot.__name__ = "bench_mc_moving_pallas_rotating"
    moving_jnp_rot = functools.partial(bench_mc_moving, rotating=True)
    moving_jnp_rot.__name__ = "bench_mc_moving_jnp_rotating"
    # A/B: the pure conservative-advancement loop (no screening cascade)
    # — the round-3 27x perf hole, kept measured in every capture.
    moving_jnp_rot_nos = functools.partial(
        bench_mc_moving, rotating=True, screen=False
    )
    moving_jnp_rot_nos.__name__ = "bench_mc_moving_jnp_rotating_noscreen"
    moving_poly_rot = functools.partial(bench_mc_moving_polygons,
                                        rotating=True)
    moving_poly_rot.__name__ = "bench_mc_moving_polygons_rotating"
    moving_poly_rot_nos = functools.partial(
        bench_mc_moving_polygons, rotating=True, screen=False
    )
    moving_poly_rot_nos.__name__ = "bench_mc_moving_polygons_rotating_noscreen"
    noshape = functools.partial(bench_mc_pallas, shape_noise=False)
    noshape.__name__ = "bench_mc_pallas_noshape"
    # A/B record of the round-3 normal-draw change (erfinv is the
    # production default; this line keeps the Box-Muller baseline in
    # every capture so the win stays measured, not remembered).
    noshape_bm = functools.partial(
        bench_mc_pallas, shape_noise=False, normal_method="box_muller"
    )
    noshape_bm.__name__ = "bench_mc_pallas_noshape_box_muller"
    poly_bf16 = functools.partial(bench_sat_polygons_pallas, precision="bf16")
    poly_bf16.__name__ = "bench_sat_polygons_pallas_bf16"
    from collide2d_tpu.utils.benchmarks import bench_sat_polygons_mxu

    poly_mxu = bench_sat_polygons_mxu
    poly_mxu_bf16 = functools.partial(bench_sat_polygons_mxu, dtype="bf16")
    poly_mxu_bf16.__name__ = "bench_sat_polygons_mxu_bf16"
    e2e = functools.partial(bench_e2e, configs=65536)
    e2e.__name__ = "bench_e2e"
    e2e_tuned = functools.partial(bench_e2e, configs=65536, schedule="tuned")
    e2e_tuned.__name__ = "bench_e2e_tuned"
    # measured-distribution DP schedule (mc.schedule_sim.optimize_
    # checkpoints): same per-bin CI criterion, checkpoint placement fit
    # to the workload's estimated convergence-point distribution
    e2e_opt = functools.partial(bench_e2e, configs=65536, schedule="opt")
    e2e_opt.__name__ = "bench_e2e_opt"
    from collide2d_tpu.utils.benchmarks import bench_e2e_polygons

    e2e_poly = functools.partial(bench_e2e_polygons, configs=32768)
    e2e_poly.__name__ = "bench_e2e_polygons"
    e2e_poly_opt = functools.partial(
        bench_e2e_polygons, configs=32768, schedule="opt"
    )
    e2e_poly_opt.__name__ = "bench_e2e_polygons_opt"
    from collide2d_tpu.utils.benchmarks import bench_obb_pallas

    from collide2d_tpu.utils.benchmarks import (
        bench_distance,
        bench_distance_pallas,
        bench_manifold,
        bench_manifold_pallas,
        bench_polygon_distance,
        bench_polygon_distance_pallas,
        bench_scene,
        bench_scene_raycast,
        bench_scene_raycast_pallas,
        bench_scene_swept,
        bench_toi_pallas,
    )

    for fn in (
        bench_sat,
        bench_obb_pallas,
        bench_distance,
        bench_distance_pallas,
        bench_polygon_distance,
        bench_polygon_distance_pallas,
        bench_manifold,
        bench_manifold_pallas,
        bench_scene,
        bench_scene_swept,
        bench_scene_raycast,
        bench_scene_raycast_pallas,
        bench_toi_pallas,
        bench_mc,
        bench_mc_pallas,
        noshape,
        noshape_bm,
        bench_mc_polygons_pallas,
        # trajectory sampling: fused kernel vs threefry XLA path, both
        # regimes (translation-only = exact window; rotating = CA) —
        # the rotating pair records the kernel's quantified loss there
        bench_mc_moving_pallas,
        bench_mc_moving,
        moving_rot,
        moving_jnp_rot,
        moving_jnp_rot_nos,
        # trajectory k-gons (MovingPolygonConfigs): jnp path by design
        bench_mc_moving_polygons,
        moving_poly_rot,
        moving_poly_rot_nos,
        bench_sat_pallas_bf16,
        bench_sat_polygons_pallas,
        poly_bf16,
        poly_mxu,
        poly_mxu_bf16,
        # On-hardware statistical acceptance of the fused MC paths
        # (hardware-PRNG distribution vs threefry; ok must be true).
        # The polygon pair exists because it caught a REAL round-3
        # label bias (bf16 einsum in the packed tables) that interpret
        # tests cannot see.
        bench_agreement,
        agreement_poly,
        agreement_poly_moving,
        bench_learned_train,
        # LAST: the adaptive-driver metric compiles the whole bucket
        # ladder; under a congested tunnel that can take minutes, and the
        # timeout-proof contract (headline already printed, secondaries on
        # stderr) keeps a mid-run kill harmless.
        e2e,
        e2e_tuned,
        e2e_opt,
        e2e_poly,
        e2e_poly_opt,
    ):
        try:
            log(fn())
        except Exception as e:
            print(f"# {fn.__name__} failed: {e}", file=sys.stderr, flush=True)
        last_progress[0] = time.monotonic()

    sys.stderr.flush()
    # The digest: every measured (metric, value) pair in ONE stdout line
    # right before the final headline, so the driver's tail capture
    # (last 2000 chars of stdout+stderr) carries the whole surface.
    # Budget: 2000 minus the ~250-char headline, with margin (trim the
    # longest names first if a future metric set overflows).
    digest_line = json.dumps(
        {"metric": "digest", "n": len(digest), "metrics": digest},
        separators=(",", ":"),
    )
    while len(digest_line) > 1700 and digest:
        digest.pop(max(digest, key=len))
        digest_line = json.dumps(
            {"metric": "digest", "n": len(digest), "metrics": digest},
            separators=(",", ":"),
        )
    print(digest_line, flush=True)
    print(line, flush=True)  # the contract: headline is the FINAL line
    return 0


if __name__ == "__main__":
    sys.exit(main())
