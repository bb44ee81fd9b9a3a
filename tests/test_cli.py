"""CLI surface: flag schemas mirror the reference binaries' options."""

import numpy as np
import pytest

import collide2d_tpu.cli as cli


def _parse(argv):
    """Parse argv and return the config the subcommand WOULD run with
    (monkeypatched executor captures it)."""
    import argparse

    parser = argparse.ArgumentParser(prog="collide2d")
    sub = parser.add_subparsers(dest="command", required=True)
    cli._add_generate(sub)
    cli._add_relabel(sub)
    cli._add_ztest(sub)
    cli._add_polylabel(sub)
    cli._add_movelabel(sub)
    return parser.parse_args(argv)


def test_generate_defaults_match_reference():
    # generate_dataset.cu:44-64 defaults, exactly.
    a = _parse(["generate"])
    assert a.data_dir == "./data/"
    assert a.num_batches == 100 and a.batch_size == 100_000
    assert a.num_poses == 64**4 and a.num_variances == 64**4
    assert a.max_samples == 4_000_000
    assert a.min_variance == [0.0] * 5 and a.max_variance == [0.3] * 5
    assert a.min_pose == [0.1, 0.1, 0.0]
    np.testing.assert_allclose(a.max_pose, [5.0, 5.0, 2 * np.pi])
    assert a.accuracy_bins == [0.0, 0.01, 0.1, 1.0]
    assert a.bin_accuracy == [0.0001, 0.001, 0.01]
    assert a.robot_width == 4.07 and a.robot_height == 1.74
    assert a.spread == 4.0 and a.shape_variance is False


def test_generate_short_flags():
    a = _parse(["generate", "-n", "3", "-b", "64", "-s", "7", "-w", "2.5"])
    assert (a.num_batches, a.batch_size, a.start_batch_count) == (3, 64, 7)
    assert a.robot_width == 2.5


def test_relabel_and_ztest_defaults():
    r = _parse(["relabel"])
    assert r.data_in == "./data_in/" and r.data_out == "./data_out/"
    assert r.shuffle is True  # compute_collision_probability.cu:41
    assert r.overlap_batches == 3  # pipelined by default, like generate
    z = _parse(["ztest"])
    assert z.data_dir == "./data/" and z.max_samples == 4_000_000
    assert z.cps_only is False and z.n_batch == 10_000  # ztest.cu:332


def test_extension_flag_defaults():
    # extensions beyond the reference CLI keep reference-parity defaults:
    # everything off / auto unless explicitly requested.
    g = _parse(["generate"])
    assert g.prune_sigma == 0.0 and g.impl == "auto"
    assert g.schedule == "reference" and g.trace_dir == ""
    assert g.verbose is True and g.data_parallel is False
    r = _parse(["relabel"])
    assert r.sample_parallel == 0 and r.impl == "auto"
    z = _parse(["ztest"])
    assert z.sample_parallel == 0 and z.impl == "auto"
    z2 = _parse(["ztest", "--sample_parallel", "8", "--impl", "jnp"])
    assert z2.sample_parallel == 8 and z2.impl == "jnp"
    with pytest.raises(SystemExit):  # invalid impl rejected at parse time
        _parse(["generate", "--impl", "cuda"])


def test_adaptive_extension_flag_parity():
    # Every AdaptiveConfig capability is reachable from EVERY mode that
    # runs the adaptive driver (review r2 finding: relabel/ztest used to
    # lack schedule/pruning/ladder/checkpointing; polylabel lacked
    # sample_parallel + checkpointing).
    for mode in ("generate", "relabel", "ztest"):
        a = _parse([mode])  # polylabel is covered separately below
        assert a.schedule == "reference" and a.prune_sigma == 0.0
        assert a.ladder == "eighth" and a.checkpoint_every == 0
        b = _parse([mode, "--schedule", "tuned", "--prune_sigma", "6.0",
                    "--ladder", "half", "--checkpoint_every", "4"])
        assert b.schedule == "tuned" and b.prune_sigma == 6.0
        assert b.ladder == "half" and b.checkpoint_every == 4
        assert cli._schedule_arg(a) is None
        assert cli._schedule_arg(b) == "tuned"
    r = _parse(["relabel", "--resume"])
    assert r.resume is True and _parse(["relabel"]).resume is False
    p = _parse(["polylabel", "--data_in", "i.npz", "--data_out", "o.npz"])
    assert p.schedule == "reference" and p.prune_sigma == 0.0
    assert p.ladder == "eighth" and p.checkpoint_every == 0
    assert p.sample_parallel == 0
    p2 = _parse(["polylabel", "--data_in", "i", "--data_out", "o",
                 "--sample_parallel", "4", "--checkpoint_every", "2",
                 "--schedule", "tuned"])
    assert p2.sample_parallel == 4 and p2.checkpoint_every == 2
    assert p2.schedule == "tuned"
    m = _parse(["movelabel", "--data_in", "i.npz", "--data_out", "o.npz"])
    assert m.schedule == "reference" and m.prune_sigma == 0.0
    assert m.ladder == "eighth" and m.checkpoint_every == 0
    assert m.sample_parallel == 0 and m.impl == "auto"
    assert m.ca_iters == 48 and m.ca_tol == 1e-4
    assert m.robot_width == 4.07 and m.robot_height == 1.74
    m2 = _parse(["movelabel", "--data_in", "i", "--data_out", "o",
                 "--ca_iters", "128", "--ca_tol", "2e-4", "-w", "2.0",
                 "--sample_parallel", "4", "--schedule", "tuned"])
    assert m2.ca_iters == 128 and m2.ca_tol == 2e-4
    assert m2.robot_width == 2.0 and m2.sample_parallel == 4
    assert m2.schedule == "tuned"


def test_bool_flag_parsing():
    assert cli._bool_flag("true") and cli._bool_flag("1")
    assert not cli._bool_flag("false") and not cli._bool_flag("off")
    with pytest.raises(Exception):
        cli._bool_flag("maybe")


def test_bad_subcommand_exits():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])


def test_ztest_rejects_opt_schedule(tmp_path):
    """'opt' needs a workload distribution to probe; ztest validates one
    file at a fixed cadence and must fail loudly, not crash later in
    AdaptiveConfig.checkpoints."""
    import numpy as np
    import pytest

    from collide2d_tpu.cli import main
    from collide2d_tpu.utils.io_npy import save_npy

    d = tmp_path / "data"
    (d / "tmp").mkdir(parents=True)
    save_npy(d / "poses.npy", np.ones((4, 3), np.float32))
    save_npy(d / "variances.npy", np.full((4, 5), 0.01, np.float32))
    rows = np.zeros((8, 4), np.float32)
    save_npy(d / "tmp" / "0.npy", rows)
    with pytest.raises(ValueError, match="fixed cadence"):
        main(["ztest", "--data_dir", str(d), "--schedule", "opt",
              "--max_samples", "1000"])
