"""Command-line interface: the reference's three binaries as subcommands.

    collide2d generate  ...   # generate_dataset.cu         (L4)
    collide2d relabel   ...   # compute_collision_probability.cu
    collide2d ztest     ...   # ztest.cu
    collide2d balance   ...   # balance_datasets.py
    collide2d show      ...   # show_data.ipynb contour plot
    collide2d bench     ...   # throughput benchmarks (no reference analog)

Flag names and defaults mirror the reference's boost::program_options
schemas (generate_dataset.cu:66-169, compute_collision_probability.cu:
44-85, ztest.cu:49-101), including the short options -n/-b/-s/-w/-h.
"""

from __future__ import annotations

import argparse
import sys

from collide2d_tpu.data.pipeline import (
    GenerateConfig,
    RelabelConfig,
    ZTestConfig,
    generate_dataset,
    relabel_dataset,
    ztest,
)


_IMPL_HELP = ("MC sampler: auto = fused Pallas kernel on TPU, threefry-jnp "
              "elsewhere (and under a mesh, where jnp keeps labels "
              "bitwise-equal to unsharded); pallas = explicit opt-in, "
              "fastest, block-tied streams")


def _add_adaptive_extensions(p: argparse.ArgumentParser) -> None:
    """The AdaptiveConfig extension flags shared by every mode that runs
    the adaptive driver (flag parity across generate/relabel/ztest/
    polylabel — review r2 finding)."""
    p.add_argument("--schedule", default="reference",
                   choices=["reference", "tuned", "opt"],
                   help="convergence-checkpoint schedule: 'reference' "
                        "(default; the mode's reference cadence), "
                        "'tuned' (one extra rule-of-three checkpoint, "
                        "~26%% fewer samples and +32%% configs/s at "
                        "65k-config batches, same CI guarantees), or "
                        "'opt' (generate/relabel: DP-optimized "
                        "checkpoints fit to a cp-distribution probe of "
                        "the workload — 16k sampled configs for generate, "
                        "the first input batch for relabel; "
                        "mc/schedule_sim.optimize_checkpoints — same CI "
                        "guarantees, checkpoints only move where "
                        "convergence is tested; measured 1.85x steady-"
                        "state on the production 1e7 generate. ztest "
                        "rejects it: one file at a fixed cadence)")
    p.add_argument("--prune_sigma", type=float, default=0.0,
                   help="label configurations that cannot collide within "
                        "this many noise std-devs as cp=0 without sampling "
                        "(0 = off/reference parity; 6.0 recommended: label "
                        "error ~1e-8, far below every accuracy bin)")
    p.add_argument("--ladder", default="eighth",
                   choices=["half", "quarter", "eighth", "sixteenth"],
                   help="repack bucket ladder granularity (eighth, the "
                        "default: <=12.5%% padding AND the tightest "
                        "practical bound on how long converged rows ride "
                        "before a repack — measured +3-5%% end to end over "
                        "quarter; quarter/half: progressively fewer "
                        "compiled shapes for cold-cache hosts; sixteenth: "
                        "saves 1-2%% device slots over eighth but costs 2x "
                        "the compile bill and extra dispatches — measured "
                        "net-negative on this tunnel since the erfinv "
                        "kernel; only for dispatch-cheap deployments)")


def _schedule_arg(args: argparse.Namespace):
    return None if args.schedule in (None, "reference") else args.schedule


def _add_generate(sub: argparse._SubParsersAction) -> None:
    d = GenerateConfig()
    p = sub.add_parser("generate", help="create a labeled collision dataset")
    p.add_argument("--data_dir", default=d.data_dir, help="where to store the data")
    p.add_argument("--num_batches", "-n", type=int, default=d.num_batches,
                   help="number of batches")
    p.add_argument("--batch_size", "-b", type=int, default=d.batch_size,
                   help="number of samples per batch")
    p.add_argument("--start_batch_count", "-s", type=int, default=d.start_batch_count,
                   help="start value for batches")
    p.add_argument("--num_poses", type=int, default=d.num_poses, help="number of poses")
    p.add_argument("--num_variances", type=int, default=d.num_variances,
                   help="number of variances")
    p.add_argument("--shape_variance", action="store_true",
                   help="whether or not to have shape variance")
    p.add_argument("--max_samples", type=int, default=d.max_samples,
                   help="maximum number of samples for z-test")
    p.add_argument("--accuracy_bins", type=float, nargs="+",
                   default=list(d.accuracy_bins),
                   help="accuracy bins e.g. 0.0 0.01 0.1 1.0")
    p.add_argument("--bin_accuracy", type=float, nargs="+",
                   default=list(d.bin_accuracy),
                   help="accuracy for each bin e.g. 0.0001 0.001 0.01")
    p.add_argument("--min_variance", type=float, nargs=5, default=list(d.min_variance),
                   help="min variance for each dimension")
    p.add_argument("--max_variance", type=float, nargs=5, default=list(d.max_variance),
                   help="max variance for each dimension")
    p.add_argument("--min_pose", type=float, nargs=3, default=list(d.min_pose),
                   help="min pose for each dimension")
    p.add_argument("--max_pose", type=float, nargs=3, default=list(d.max_pose),
                   help="max pose for each dimension")
    p.add_argument("--robot_width", "-w", type=float, default=d.robot_width)
    p.add_argument("--robot_height", type=float, default=d.robot_height)
    p.add_argument("--spread", type=float, default=d.spread, help="spread of poses")
    p.add_argument("--pose_dir", default=d.pose_dir, help="directory of poses")
    p.add_argument("--variance_dir", default=d.variance_dir,
                   help="directory of variances")
    p.add_argument("--seed", type=int, default=None,
                   help="device PRNG seed (default: time-based, like the reference)")
    p.add_argument("--refcompat_tables", action="store_true",
                   help="bit-identical libstdc++ pose/variance table sampling")
    p.add_argument("--no_shuffle", action="store_true")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="rounds between mid-batch checkpoints (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="skip existing batch files and resume mid-batch from "
                        "data_dir/checkpoint_{batch}.npz (one per in-flight "
                        "pipelined batch; requires a fixed --seed)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the configuration axis across all local chips")
    p.add_argument("--overlap_batches", type=int, default=3,
                   help="cross-batch pipelining depth: batch i+1's rounds "
                        "interleave with batch i's convergence tail so the "
                        "chip never idles at batch boundaries; outputs are "
                        "bitwise-identical across ALL depths (1 = batches "
                        "run one at a time through the same eager-resolve "
                        "scheduler, so its outputs stay comparable — it is "
                        "NOT the pipelined-readback solo driver that "
                        "ztest/polylabel use; relabel pipelines the same "
                        "way via its own --overlap_batches)")
    p.add_argument("--verbose", type=_bool_flag, default=True,
                   help="per-sync structured progress lines ([mc] round/"
                        "active/done/samples-per-sec) + batch progress")
    p.add_argument("--trace_dir", default="",
                   help="capture a jax.profiler trace of the run here")
    p.add_argument("--impl", default="auto", choices=["auto", "jnp", "pallas"],
                   help=_IMPL_HELP)
    _add_adaptive_extensions(p)
    p.set_defaults(func=_run_generate)


def _run_generate(args: argparse.Namespace) -> int:
    cfg = GenerateConfig(
        data_dir=args.data_dir,
        pose_dir=args.pose_dir,
        variance_dir=args.variance_dir,
        num_batches=args.num_batches,
        batch_size=args.batch_size,
        start_batch_count=args.start_batch_count,
        num_poses=args.num_poses,
        num_variances=args.num_variances,
        max_samples=args.max_samples,
        min_variance=tuple(args.min_variance),
        max_variance=tuple(args.max_variance),
        min_pose=tuple(args.min_pose),
        max_pose=tuple(args.max_pose),
        accuracy_bins=tuple(args.accuracy_bins),
        bin_accuracy=tuple(args.bin_accuracy),
        robot_width=args.robot_width,
        robot_height=args.robot_height,
        spread=args.spread,
        shape_variance=args.shape_variance,
        seed=args.seed,
        refcompat_tables=args.refcompat_tables,
        shuffle=not args.no_shuffle,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
        data_parallel=args.data_parallel,
        overlap_batches=args.overlap_batches,
        schedule=_schedule_arg(args),
        verbose=args.verbose,
        trace_dir=args.trace_dir,
        prune_sigma=args.prune_sigma,
        impl=args.impl,
        ladder=args.ladder,
    )
    generate_dataset(cfg)
    return 0


def _add_relabel(sub: argparse._SubParsersAction) -> None:
    d = RelabelConfig()
    p = sub.add_parser(
        "relabel",
        help="recompute collision probabilities for an existing dataset",
    )
    p.add_argument("--data_in", default=d.data_in, help="where to read the data")
    p.add_argument("--data_out", default=d.data_out, help="where to write the data")
    p.add_argument("--max_samples", type=int, default=d.max_samples)
    p.add_argument("--robot_width", "-w", type=float, default=d.robot_width)
    p.add_argument("--robot_height", type=float, default=d.robot_height)
    p.add_argument("--shuffle", type=_bool_flag, default=d.shuffle,
                   help="whether or not to shuffle data")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the configuration axis across all local chips")
    p.add_argument("--sample_parallel", type=int, default=d.sample_parallel,
                   help="shard each configuration's sample budget across "
                        "this many devices (jnp path: bitwise-identical "
                        "labels; --impl pallas: step-split, i.i.d. streams)")
    p.add_argument("--verbose", type=_bool_flag, default=True,
                   help="per-sync structured progress lines ([mc] round/"
                        "active/done/samples-per-sec) + batch progress")
    p.add_argument("--impl", default="auto", choices=["auto", "jnp", "pallas"],
                   help=_IMPL_HELP)
    p.add_argument("--trace_dir", default="",
                   help="capture a jax.profiler trace of the run here")
    _add_adaptive_extensions(p)
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="rounds between mid-batch checkpoints (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="skip already-written output batches and resume "
                        "mid-batch from per-batch checkpoint files "
                        "(requires a fixed --seed; the first run's "
                        "output-numbering window is pinned so a rerun "
                        "never appends a second copy)")
    p.add_argument("--overlap_batches", type=int, default=3,
                   help="cross-batch pipelining depth (see generate "
                        "--overlap_batches): batch i+1's rounds fill the "
                        "chip while batch i's tail converges; threefry "
                        "labels are bitwise-identical across all depths")
    p.set_defaults(func=_run_relabel)


def _run_relabel(args: argparse.Namespace) -> int:
    relabel_dataset(
        RelabelConfig(
            data_in=args.data_in,
            data_out=args.data_out,
            max_samples=args.max_samples,
            robot_width=args.robot_width,
            robot_height=args.robot_height,
            shuffle=args.shuffle,
            seed=args.seed,
            data_parallel=args.data_parallel,
            sample_parallel=args.sample_parallel,
            verbose=args.verbose,
            trace_dir=args.trace_dir,
            impl=args.impl,
            schedule=_schedule_arg(args),
            prune_sigma=args.prune_sigma,
            ladder=args.ladder,
            checkpoint_every=args.checkpoint_every,
            resume=args.resume,
            overlap_batches=args.overlap_batches,
        )
    )
    return 0


def _add_ztest(sub: argparse._SubParsersAction) -> None:
    d = ZTestConfig()
    p = sub.add_parser("ztest", help="high-precision relabel of one file")
    p.add_argument("--data_dir", default=d.data_dir, help="where to read the data")
    p.add_argument("--data_file_in", default=d.data_file_in)
    p.add_argument("--data_file_out", default=d.data_file_out)
    p.add_argument("--max_samples", type=int, default=d.max_samples)
    p.add_argument("--robot_width", "-w", type=float, default=d.robot_width)
    p.add_argument("--robot_height", type=float, default=d.robot_height)
    p.add_argument("--shuffle", type=_bool_flag, default=d.shuffle,
                   help="shuffle the written artifact (reference's flag is a "
                        "no-op due to an inverted condition; ours works)")
    p.add_argument("--cps_only", type=_bool_flag, default=d.cps_only,
                   help="whether or not to only compute collision probabilities")
    p.add_argument("--meta_dir", default=d.meta_dir,
                   help="path to meta folder containing accuracy_bins.npy and "
                        "bin_accuracy.npy")
    p.add_argument("--n_batch", type=int, default=d.n_batch,
                   help="samples per round (fixed schedule)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--sample_parallel", type=int, default=d.sample_parallel,
                   help="shard each configuration's sample budget across "
                        "this many devices (jnp path: psum'd counts are "
                        "bitwise equal to single-device labels; --impl "
                        "pallas: step-split, i.i.d. streams); must divide "
                        "n_batch")
    p.add_argument("--verbose", type=_bool_flag, default=True,
                   help="per-sync structured progress lines ([mc] round/"
                        "active/done/samples-per-sec) + batch progress")
    p.add_argument("--impl", default="auto", choices=["auto", "jnp", "pallas"],
                   help=_IMPL_HELP)
    p.add_argument("--trace_dir", default="",
                   help="capture a jax.profiler trace of the run here")
    _add_adaptive_extensions(p)
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="rounds between mid-run checkpoints to "
                        "data_dir/ztest_checkpoint.npz (0 = off; a rerun "
                        "with the same --seed auto-resumes from it)")
    p.set_defaults(func=_run_ztest)


def _run_ztest(args: argparse.Namespace) -> int:
    ztest(
        ZTestConfig(
            data_dir=args.data_dir,
            data_file_in=args.data_file_in,
            data_file_out=args.data_file_out,
            max_samples=args.max_samples,
            robot_width=args.robot_width,
            robot_height=args.robot_height,
            shuffle=args.shuffle,
            cps_only=args.cps_only,
            meta_dir=args.meta_dir,
            n_batch=args.n_batch,
            seed=args.seed,
            sample_parallel=args.sample_parallel,
            verbose=args.verbose,
            trace_dir=args.trace_dir,
            impl=args.impl,
            schedule=_schedule_arg(args),
            prune_sigma=args.prune_sigma,
            ladder=args.ladder,
            checkpoint_every=args.checkpoint_every,
        )
    )
    return 0


def _add_balance(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("balance", help="balance datasets across cp bins / plot histogram")
    p.add_argument("data_dirs", nargs="+", help="one or two dataset directories")
    p.add_argument("--bins", type=float, nargs="+",
                   default=[0.0, 0.001, 0.01, 0.1, 1.0])
    p.add_argument("--out", default=None, help="save balanced dataset(s) to .npy")
    p.add_argument("--hist", default="hist.svg", help="histogram output path")
    p.set_defaults(func=_run_balance)


def _run_balance(args: argparse.Namespace) -> int:
    import numpy as np

    from collide2d_tpu.data import balance as bal

    datasets = [bal.load_data(d) for d in args.data_dirs]
    bal.plot_histogram(datasets[0], np.asarray(args.bins), args.hist)
    print(f"histogram -> {args.hist}")
    if len(datasets) == 2:
        bins0 = bal.compute_bin_idx(datasets[0][:, 2], args.bins)
        bins1 = bal.compute_bin_idx(datasets[1][:, 2], args.bins)
        b0, b1 = bal.balance(datasets[0], datasets[1], bins0, bins1)
        print(f"balanced sizes: {b0.shape} {b1.shape}")
        if args.out:
            np.save(args.out + "_0.npy", b0)
            np.save(args.out + "_1.npy", b1)
            print(f"saved {args.out}_0.npy {args.out}_1.npy")
    elif args.out:
        bins0 = bal.compute_bin_idx(datasets[0][:, 2], args.bins)
        np.save(args.out, bal.balance_single(datasets[0], bins0))
        print(f"saved {args.out}")
    return 0


def _add_show(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("show", help="contour-plot cp(x,y) for one (var,pose) slice")
    p.add_argument("data_file", help="a labeled batch .npy file")
    p.add_argument("--var_idx", type=float, default=0)
    p.add_argument("--pose_idx", type=float, default=0)
    p.add_argument("--out", default="contour.png")
    p.set_defaults(func=_run_show)


def _run_show(args: argparse.Namespace) -> int:
    import numpy as np

    from collide2d_tpu.data import visualize as viz

    data = np.load(args.data_file)
    x, y, z = viz.get_data_for_specific_var_and_pos(data, args.var_idx, args.pose_idx)
    if len(z) < 4:
        print(
            f"only {len(z)} rows for (var_idx={args.var_idx}, "
            f"pose_idx={args.pose_idx}); need >= 4 for interpolation. "
            "Generate with small --num_poses/--num_variances to densify slices.",
            file=sys.stderr,
        )
        return 1
    viz.plot_contour(x, y, z, args.out)
    print(f"contour -> {args.out}")
    return 0


def _add_compare(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "compare",
        help="label-agreement report between two labelings (the z-test "
             "comparison the reference leaves outside the repo)",
    )
    p.add_argument("file_a", help=".npy: (N,5) dataset rows or (N,) cps")
    p.add_argument("file_b", help=".npy: same configurations, same order")
    p.add_argument("--n_samples_a", type=float, default=4_000_000)
    p.add_argument("--n_samples_b", type=float, default=4_000_000)
    p.add_argument("--tolerance", type=float, default=0.005)
    p.set_defaults(func=_run_compare)


def _run_compare(args: argparse.Namespace) -> int:
    import numpy as np

    from collide2d_tpu.data.validate import compare_labels

    report = compare_labels(
        np.load(args.file_a),
        np.load(args.file_b),
        n_samples_a=args.n_samples_a,
        n_samples_b=args.n_samples_b,
        tolerance=args.tolerance,
    )
    print(report)
    return 0 if report.frac_within_tolerance >= 0.95 else 1


def _add_bench(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("bench", help="throughput benchmarks on the local device")
    p.add_argument("--pairs", type=int, default=1 << 20)
    p.add_argument("--iters", type=int, default=20)
    p.set_defaults(func=_run_bench)


def _run_bench(args: argparse.Namespace) -> int:
    from collide2d_tpu.utils.benchmarks import run_all

    for line in run_all(pairs=args.pairs, iters=args.iters):
        print(line)
    return 0


def _add_polylabel(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "polylabel",
        help="adaptively label convex k-gon configurations (beyond the "
             "reference: its MC machinery is rectangle-only)",
    )
    p.add_argument("--data_in", required=True,
                   help=".npz with obstacle_verts (C,K,2), position (C,2), "
                        "pose_theta (C,), std_dev (C,3), robot_verts (K2,2) "
                        "[optional mask (C,K) bool for padded K-gons]")
    p.add_argument("--data_out", required=True,
                   help="output .npz: cp (C,), n_samples (C,), converged (C,)")
    p.add_argument("--max_samples", type=int, default=4_000_000,
                   help="per-configuration sample cap")
    p.add_argument("--accuracy_bins", type=float, nargs="+",
                   default=[0.0, 0.01, 0.1, 1.0])
    p.add_argument("--bin_accuracy", type=float, nargs="+",
                   default=[1e-4, 1e-3, 1e-2])
    p.add_argument("--impl", choices=["auto", "jnp", "pallas"], default="auto",
                   help=_IMPL_HELP)
    _add_adaptive_extensions(p)
    p.add_argument("--seed", type=int, default=None,
                   help="PRNG seed (default: time-randomized, like the "
                        "reference's curand seed)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the configuration axis across all local "
                        "chips (uid-keyed jnp path: labels bitwise-equal "
                        "to a single-chip run)")
    p.add_argument("--sample_parallel", type=int, default=0,
                   help="shard each configuration's sample budget across "
                        "this many devices (jnp path: labels bitwise-equal "
                        "to a single-chip run; with --impl pallas the fused "
                        "kernel's step budget splits across the shards, "
                        "i.i.d. streams); ignored with --data_parallel")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="rounds between mid-run checkpoints to "
                        "<data_out>.checkpoint.npz (0 = off; a rerun with "
                        "the same --seed auto-resumes from it)")
    p.add_argument("--verbose", type=_bool_flag, default=False)

    def run(args: argparse.Namespace) -> int:
        import time

        import numpy as np
        import jax

        from collide2d_tpu.mc.estimator import (
            AdaptiveConfig,
            PolygonConfigs,
            adaptive_collision_probabilities,
        )

        data = np.load(args.data_in)
        for field in ("obstacle_verts", "position", "pose_theta", "std_dev",
                      "robot_verts"):
            if field not in data:
                raise SystemExit(f"polylabel: {args.data_in} missing '{field}'")
        cfgs = PolygonConfigs.from_padded(
            data["position"], data["pose_theta"], data["obstacle_verts"],
            data["std_dev"], mask=data["mask"] if "mask" in data else None,
        )
        cfg = AdaptiveConfig(
            accuracy_bins=tuple(args.accuracy_bins),
            bin_accuracy=tuple(args.bin_accuracy),
            max_samples=args.max_samples,
            impl=args.impl,
            prune_sigma=args.prune_sigma,
            schedule=_schedule_arg(args),
            ladder=args.ladder,
        )
        seed = args.seed if args.seed is not None else int(time.time())
        progress = None
        if args.verbose:
            def progress(num_left, n_samples, round):
                print(f"[polylabel] round {round}: left={num_left} "
                      f"n_samples={n_samples}", flush=True)
        mesh = None
        if args.data_parallel:
            from collide2d_tpu.parallel import make_mesh

            mesh = make_mesh(jax.devices())
        elif args.sample_parallel and args.sample_parallel > 1:
            from collide2d_tpu.parallel import make_mesh

            devices = jax.devices()
            if len(devices) < args.sample_parallel:
                raise SystemExit(
                    f"polylabel: sample_parallel={args.sample_parallel} "
                    f"needs that many devices, have {len(devices)}"
                )
            mesh = make_mesh(devices[: args.sample_parallel],
                             sample_axis=args.sample_parallel)
        cp, n_used, done = adaptive_collision_probabilities(
            jax.random.PRNGKey(seed), cfgs,
            np.asarray(data["robot_verts"], np.float32), cfg,
            progress=progress, mesh=mesh,
            checkpoint_path=(
                args.data_out + ".checkpoint.npz" if args.checkpoint_every
                else None
            ),
            checkpoint_every=args.checkpoint_every,
        )
        np.savez(args.data_out, cp=cp, n_samples=n_used, converged=done)
        print(f"labeled {cfgs.num} configurations -> {args.data_out} "
              f"(converged {float(done.mean()):.1%})")
        return 0

    p.set_defaults(func=run)


def _add_movelabel(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "movelabel",
        help="adaptively label TRAJECTORY configurations: P(a moving "
             "robot hits the noisy obstacle over t in [0, t_max]) — the "
             "quantity a planner validating an edge needs (beyond the "
             "reference: its labels are static-pose only)",
    )
    p.add_argument("--data_in", required=True,
                   help=".npz with position (C,2), pose_theta (C,), "
                        "obstacle_wh (C,2), std_dev (C,5), velocity (C,2) "
                        "[optional omega (C,), t_max (C,), robot_wh (2,)]. "
                        "POLYGON trajectories: provide obstacle_verts "
                        "(C,K,2) + robot_verts (K2,2) instead of "
                        "obstacle_wh/robot_wh, with std_dev (C,3) pose "
                        "noise (k-gon batches run the jnp path)")
    p.add_argument("--data_out", required=True,
                   help="output .npz: cp (C,), n_samples (C,), converged (C,)")
    p.add_argument("--robot_width", "-w", type=float, default=4.07,
                   help="robot width when data_in has no robot_wh "
                        "(reference default, generate_dataset.cu:60)")
    p.add_argument("--robot_height", type=float, default=1.74)
    p.add_argument("--max_samples", type=int, default=4_000_000,
                   help="per-configuration sample cap")
    p.add_argument("--accuracy_bins", type=float, nargs="+",
                   default=[0.0, 0.01, 0.1, 1.0])
    p.add_argument("--bin_accuracy", type=float, nargs="+",
                   default=[1e-4, 1e-3, 1e-2])
    p.add_argument("--impl", choices=["auto", "jnp", "pallas"], default="auto",
                   help=_IMPL_HELP + " (trajectory batches: 'auto' uses the "
                        "fused kernel only on translation-only batches, "
                        "where it measures faster)")
    p.add_argument("--ca_iters", type=int, default=48,
                   help="conservative-advancement budget per ROTATING "
                        "sample (translation-only samples resolve through "
                        "the exact first-contact window and ignore this; "
                        "certified-hit lower bound tightens as it grows)")
    p.add_argument("--ca_tol", type=float, default=1e-4,
                   help="contact certification tolerance of the rotating-"
                        "sample advancement")
    _add_adaptive_extensions(p)
    p.add_argument("--seed", type=int, default=None,
                   help="PRNG seed (default: time-randomized, like the "
                        "reference's curand seed)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the configuration axis across all local "
                        "chips (uid-keyed jnp path: labels bitwise-equal "
                        "to a single-chip run)")
    p.add_argument("--sample_parallel", type=int, default=0,
                   help="shard each configuration's sample budget across "
                        "this many devices (jnp path: labels bitwise-equal "
                        "to a single-chip run); ignored with "
                        "--data_parallel")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="rounds between mid-run checkpoints to "
                        "<data_out>.checkpoint.npz (0 = off; a rerun with "
                        "the same --seed auto-resumes from it)")
    p.add_argument("--verbose", type=_bool_flag, default=False)

    def run(args: argparse.Namespace) -> int:
        import time

        import numpy as np
        import jax

        from collide2d_tpu.mc.estimator import (
            AdaptiveConfig,
            adaptive_collision_probabilities,
        )
        from collide2d_tpu.mc.moving import moving_configs

        data = np.load(args.data_in)
        poly = "obstacle_verts" in data
        obstacle_field = "obstacle_verts" if poly else "obstacle_wh"
        for field in ("position", "pose_theta", obstacle_field, "std_dev",
                      "velocity"):
            if field not in data:
                raise SystemExit(f"movelabel: {args.data_in} missing "
                                 f"'{field}'")
        if poly:
            from collide2d_tpu.mc.moving import moving_polygon_configs

            if "robot_verts" not in data:
                raise SystemExit(
                    "movelabel: polygon input (obstacle_verts present) "
                    "requires 'robot_verts' (K2, 2)"
                )
            if args.impl == "pallas":
                raise SystemExit(
                    "movelabel: --impl pallas is not available for "
                    "polygon trajectory batches (use auto or jnp)"
                )
            cfgs = moving_polygon_configs(
                data["position"], data["pose_theta"],
                data["obstacle_verts"], data["std_dev"], data["velocity"],
                omega=data["omega"] if "omega" in data else 0.0,
                t_max=data["t_max"] if "t_max" in data else 1.0,
            )
            robot_wh = np.asarray(data["robot_verts"], np.float32)
        else:
            cfgs = moving_configs(
                data["position"], data["pose_theta"], data["obstacle_wh"],
                data["std_dev"], data["velocity"],
                omega=data["omega"] if "omega" in data else 0.0,
                t_max=data["t_max"] if "t_max" in data else 1.0,
            )
            robot_wh = (np.asarray(data["robot_wh"], np.float32)
                        if "robot_wh" in data
                        else np.asarray(
                            [args.robot_width, args.robot_height],
                            np.float32))
        cfg = AdaptiveConfig(
            accuracy_bins=tuple(args.accuracy_bins),
            bin_accuracy=tuple(args.bin_accuracy),
            max_samples=args.max_samples,
            impl=args.impl,
            prune_sigma=args.prune_sigma,
            schedule=_schedule_arg(args),
            ladder=args.ladder,
            ca_iters=args.ca_iters,
            ca_tol=args.ca_tol,
        )
        seed = args.seed if args.seed is not None else int(time.time())
        progress = None
        if args.verbose:
            def progress(num_left, n_samples, round):
                print(f"[movelabel] round {round}: left={num_left} "
                      f"n_samples={n_samples}", flush=True)
        mesh = None
        if args.data_parallel:
            from collide2d_tpu.parallel import make_mesh

            mesh = make_mesh(jax.devices())
        elif args.sample_parallel and args.sample_parallel > 1:
            from collide2d_tpu.parallel import make_mesh

            devices = jax.devices()
            if len(devices) < args.sample_parallel:
                raise SystemExit(
                    f"movelabel: sample_parallel={args.sample_parallel} "
                    f"needs that many devices, have {len(devices)}"
                )
            mesh = make_mesh(devices[: args.sample_parallel],
                             sample_axis=args.sample_parallel)
        cp, n_used, done = adaptive_collision_probabilities(
            jax.random.PRNGKey(seed), cfgs, robot_wh, cfg,
            progress=progress, mesh=mesh,
            checkpoint_path=(
                args.data_out + ".checkpoint.npz" if args.checkpoint_every
                else None
            ),
            checkpoint_every=args.checkpoint_every,
        )
        np.savez(args.data_out, cp=cp, n_samples=n_used, converged=done)
        print(f"labeled {cfgs.num} trajectories -> {args.data_out} "
              f"(converged {float(done.mean()):.1%})")
        return 0

    p.set_defaults(func=run)


def _add_train(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "train",
        help="fit the learned collision-probability MLP on a generated "
             "dataset (the dataset's stated downstream purpose, "
             "generate_dataset.cu:30-36; the reference stops at the data)",
    )
    p.add_argument("--data_dir", default="./data/",
                   help="dataset directory (batch files + poses/variances)")
    p.add_argument("--out", default="model.npz", help="model artifact path")
    p.add_argument("--hidden", type=int, nargs="+", default=[256, 256, 256])
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8192)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--val_fraction", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16",
                   help="matmul input dtype (accumulation is always f32); "
                        "bfloat16 is the MXU's native mode")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch axis over all local devices "
                        "(replicated params, XLA-inserted gradient "
                        "all-reduce)")
    p.add_argument("--accuracy_bins", type=float, nargs="+",
                   default=[0.0, 0.01, 0.1, 1.0],
                   help="bins for the per-bin validation MAE report")
    p.add_argument("--balance_bins", type=float, nargs="+", default=None,
                   help="cp bin edges: balance the training rows across "
                        "these bins first (data/balance truncation — the "
                        "reference's balance_datasets.py step), countering "
                        "the annulus sampler's ~61%% zero-cp mass")
    p.add_argument("--robot_width", type=float, default=4.07,
                   help="robot used for the physics feature columns "
                        "(signed distance at the mean pose) — must match "
                        "the robot the dataset was labeled with")
    p.add_argument("--robot_height", type=float, default=1.74)
    p.add_argument("--verbose", type=_bool_flag, default=True)
    p.set_defaults(func=_run_train)


def _run_train(args: argparse.Namespace) -> int:
    from collide2d_tpu.models.learned import (
        TrainConfig,
        load_training_data,
        save_model,
        train_model,
    )

    robot_wh = (args.robot_width, args.robot_height)
    features, labels = load_training_data(
        args.data_dir, balance_bins=args.balance_bins, robot_wh=robot_wh
    )
    balanced = " (balanced)" if args.balance_bins else ""
    print(f"training on {features.shape[0]} rows from {args.data_dir}"
          f"{balanced}")
    cfg = TrainConfig(
        hidden=tuple(args.hidden),
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        val_fraction=args.val_fraction,
        seed=args.seed,
        compute_dtype=args.compute_dtype,
        data_parallel=args.data_parallel,
        verbose=args.verbose,
    )
    result = train_model(features, labels, cfg,
                         accuracy_bins=tuple(args.accuracy_bins),
                         robot_wh=robot_wh)
    save_model(args.out, result, cfg)
    bins = ", ".join(
        f"[{lo:g},{hi:g}): {mae:.4f}"
        for (lo, hi), mae in zip(
            zip(args.accuracy_bins[:-1], args.accuracy_bins[1:]),
            result.val_mae_per_bin,
        )
    )
    print(f"val bce {result.val_bce:.5f}  val mae {result.val_mae:.4f}")
    if bins:
        print(f"val mae per cp bin: {bins}")
    print(f"model -> {args.out}")
    return 0


def _add_predict(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "predict",
        help="predict cps for one batch file with a trained model; output "
             "is the bare cps vector (ztest --cps_only schema), directly "
             "comparable to MC labels via `collide2d compare`",
    )
    p.add_argument("--model", required=True, help="model artifact (.npz)")
    p.add_argument("--data_in", required=True,
                   help=".npy batch: (N,5) dataset rows or (N,4) relabel "
                        "rows")
    p.add_argument("--data_dir", default="./data/",
                   help="directory holding poses.npy / variances.npy")
    p.add_argument("--out", default="predicted_cps.npy")
    p.set_defaults(func=_run_predict)


def _run_predict(args: argparse.Namespace) -> int:
    from collide2d_tpu.models.learned import predict_file
    from collide2d_tpu.utils.io_npy import save_npy

    cps = predict_file(args.model, args.data_in, args.data_dir)
    save_npy(args.out, cps)
    print(f"predicted {cps.shape[0]} cps -> {args.out}")
    return 0


def _bool_flag(value: str) -> bool:
    if value.lower() in ("1", "true", "yes", "on"):
        return True
    if value.lower() in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {value!r}")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="collide2d",
        description="TPU-native 2D convex collision engine "
                    "(dataset generation / relabeling / validation)",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    _add_generate(sub)
    _add_relabel(sub)
    _add_ztest(sub)
    _add_balance(sub)
    _add_show(sub)
    _add_compare(sub)
    _add_bench(sub)
    _add_polylabel(sub)
    _add_movelabel(sub)
    _add_train(sub)
    _add_predict(sub)
    args = parser.parse_args(argv)
    # Remote TPU compiles cost minutes; make them once-per-machine rather
    # than once-per-process (opt out: COLLIDE2D_CACHE_DIR="").
    from collide2d_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
