"""End-to-end dataset pipeline: artifacts, schemas, resume, modes."""

import shutil

import numpy as np
import pytest

from collide2d_tpu.data import schemas
from collide2d_tpu.data.pipeline import (
    GenerateConfig,
    RelabelConfig,
    ZTestConfig,
    generate_dataset,
    relabel_dataset,
    ztest,
)
from collide2d_tpu.mc.estimator import AdaptiveConfig
from collide2d_tpu.utils.io_npy import get_num_batches_in_dir

# Small, fast adaptive schedule for CPU tests.
FAST = AdaptiveConfig(
    max_samples=4000, initial_batch=1000, initial_phase_samples=2000,
    later_batch=2000, bin_accuracy=(0.02, 0.02, 0.05), min_active=64,
)


def _gen_cfg(tmp_path, **kw):
    defaults = dict(
        data_dir=str(tmp_path / "data"),
        num_batches=2,
        batch_size=128,
        num_poses=16,
        num_variances=16,
        seed=0,
        verbose=False,
        adaptive=FAST,
        max_samples=FAST.max_samples,
    )
    defaults.update(kw)
    return GenerateConfig(**defaults)


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("gen")
    cfg = _gen_cfg(tmp_path)
    generate_dataset(cfg)
    return tmp_path / "data", cfg


def test_generate_artifacts(generated):
    data_dir, cfg = generated
    # Golden artifact set (SURVEY.md §4d): tables, meta, numbered batches.
    assert (data_dir / "poses.npy").exists()
    assert (data_dir / "variances.npy").exists()
    assert (data_dir / "meta" / "accuracy_bins.npy").exists()
    assert (data_dir / "meta" / "bin_accuracy.npy").exists()
    poses = np.load(data_dir / "poses.npy")
    variances = np.load(data_dir / "variances.npy")
    assert poses.shape == (16, 3) and poses.dtype == np.float32
    assert variances.shape == (16, 5) and variances.dtype == np.float32
    # shape_variance defaults off: width/height noise dims are zero
    # (generate_dataset.cu:285-290).
    assert (variances[:, 3:] == 0).all()
    np.testing.assert_array_equal(
        np.load(data_dir / "meta" / "accuracy_bins.npy"),
        np.asarray(cfg.accuracy_bins, np.float32),
    )
    for i in range(2):
        batch = np.load(data_dir / f"{i}.npy")
        assert batch.shape == (128, 5) and batch.dtype == np.float32
        pos, cp, var_idx, pose_idx = schemas.unpack_dataset_rows(batch)
        assert (cp >= 0).all() and (cp <= 1).all()
        assert set(np.unique(var_idx)) <= set(np.arange(16.0))
        assert set(np.unique(pose_idx)) <= set(np.arange(16.0))
        # positions live on the sampled ring, never at the origin
        assert np.hypot(pos[:, 0], pos[:, 1]).min() > 0.1


def test_generate_deterministic_with_seed(tmp_path, generated):
    data_dir, cfg = generated
    cfg2 = _gen_cfg(tmp_path, data_dir=str(tmp_path / "data2"), num_batches=1)
    generate_dataset(cfg2)
    a = np.load(data_dir / "0.npy")
    b = np.load(tmp_path / "data2" / "0.npy")
    np.testing.assert_array_equal(a, b)


def test_generate_resume_numbering(tmp_path, generated):
    data_dir, cfg = generated
    cfg2 = _gen_cfg(
        tmp_path,
        data_dir=str(data_dir),
        num_batches=1,
        start_batch_count=2,
        pose_dir=str(data_dir / "poses.npy"),
        variance_dir=str(data_dir / "variances.npy"),
    )
    generate_dataset(cfg2)
    assert (data_dir / "2.npy").exists()
    assert get_num_batches_in_dir(data_dir) == 3


def test_pose_variance_reuse(tmp_path, generated):
    # --pose_dir/--variance_dir reuse pregenerated tables
    # (generate_dataset.cu:282-307,319-336).
    data_dir, _ = generated
    out = tmp_path / "reuse"
    cfg = _gen_cfg(
        tmp_path,
        data_dir=str(out),
        num_batches=1,
        pose_dir=str(data_dir / "poses.npy"),
        variance_dir=str(data_dir / "variances.npy"),
    )
    generate_dataset(cfg)
    # reused tables are NOT re-saved into the new dir (reference behavior:
    # tables are only saved when sampled).
    assert not (out / "poses.npy").exists()
    assert (out / "0.npy").exists()


def test_relabel_round_trip(tmp_path, generated):
    data_dir, cfg = generated
    batch = np.load(data_dir / "0.npy")
    data_in = tmp_path / "in"
    data_in.mkdir()
    np.save(data_in / "0.npy", batch[:, [0, 1, 3, 4]].astype(np.float32))

    n_before = get_num_batches_in_dir(data_dir)
    relabel_dataset(
        RelabelConfig(
            data_in=str(data_in), data_out=str(data_dir), shuffle=False,
            seed=1, verbose=False, adaptive=FAST, max_samples=FAST.max_samples,
        )
    )
    out = np.load(data_dir / f"{n_before}.npy")
    assert out.shape == batch.shape
    # Unshuffled relabel restores input row order exactly
    # (the reference's index-column machinery, cc.cu:337-344).
    np.testing.assert_array_equal(out[:, [0, 1, 3, 4]], batch[:, [0, 1, 3, 4]])
    # Labels agree within the (loose) test accuracy targets.
    assert np.abs(out[:, 2] - batch[:, 2]).mean() < 0.05


def test_ztest_cps_only_and_default_paths(tmp_path, generated):
    # ztest's default output path OVERWRITES data_dir/0.npy with a 1-D cps
    # vector (ztest.cu:200-206) — run it on a private copy of the dataset
    # so the module-scoped fixture stays pristine for the other tests.
    src_dir, cfg = generated
    data_dir = tmp_path / "data"
    shutil.copytree(src_dir, data_dir)
    batch = np.load(data_dir / "0.npy")[:64]
    tmp_in = data_dir / "tmp"
    tmp_in.mkdir(exist_ok=True)
    np.save(tmp_in / "0.npy", batch[:, [0, 1, 3, 4]].astype(np.float32))

    cps = ztest(
        ZTestConfig(
            data_dir=str(data_dir), cps_only=True, seed=2, verbose=False,
            n_batch=1000, max_samples=4000, adaptive=FAST,
        )
    )
    assert cps.shape == (64,)
    # default output path: data_dir/0.npy is OVERWRITTEN (ztest.cu:200-206)
    out = np.load(data_dir / "0.npy")
    np.testing.assert_array_equal(out, cps)
    assert np.abs(cps - batch[:, 2]).mean() < 0.05


def test_ztest_full_records(tmp_path, generated):
    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")[:32]
    inp = tmp_path / "zin.npy"
    np.save(inp, batch[:, [0, 1, 3, 4]].astype(np.float32))
    outp = tmp_path / "zout.npy"
    ztest(
        ZTestConfig(
            data_dir=str(data_dir), data_file_in=str(inp),
            data_file_out=str(outp), seed=3, verbose=False,
            n_batch=1000, max_samples=4000, adaptive=FAST,
        )
    )
    out = np.load(outp)
    assert out.shape == (32, 5)
    np.testing.assert_array_equal(out[:, [0, 1, 3, 4]], batch[:, [0, 1, 3, 4]])


def test_missing_tables_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        ztest(ZTestConfig(data_dir=str(tmp_path / "nope"), verbose=False))


def test_schema_validation():
    with pytest.raises(ValueError):
        schemas.unpack_dataset_rows(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        schemas.unpack_relabel_rows(np.zeros((4, 5), np.float32))


def test_ztest_sample_parallel_bitwise(tmp_path, generated):
    # The deep-budget path (VERDICT r1 item 5): ztest with the per-config
    # sample budget sharded over a (1, 8) sample mesh must emit labels
    # BIT-IDENTICAL to the single-device run — steps round-robin with the
    # single-chip fold_in tags and the psum is exact.
    from collide2d_tpu.parallel import make_mesh
    from tests.conftest import cpu_devices

    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")[:32]
    inp = tmp_path / "zin.npy"
    np.save(inp, batch[:, [0, 1, 3, 4]].astype(np.float32))
    # step_samples pinned so both runs use the same per-step fold_in tags
    adaptive = AdaptiveConfig(
        max_samples=4096, fixed_batch=1024, step_samples=128,
        bin_accuracy=(0.02, 0.02, 0.05), min_active=8,
    )
    common = dict(
        data_dir=str(data_dir), data_file_in=str(inp), seed=9,
        verbose=False, n_batch=1024, max_samples=4096, adaptive=adaptive,
    )
    base = ztest(ZTestConfig(
        data_file_out=str(tmp_path / "z_base.npy"), **common))
    mesh = make_mesh(cpu_devices(), sample_axis=8)
    got = ztest(ZTestConfig(
        data_file_out=str(tmp_path / "z_ss.npy"), mesh=mesh, **common))
    np.testing.assert_array_equal(got, base)


def test_relabel_sample_parallel_bitwise(tmp_path, generated):
    from collide2d_tpu.parallel import make_mesh
    from tests.conftest import cpu_devices

    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")[:32]
    din = tmp_path / "rin"
    din.mkdir()
    np.save(din / "0.npy", batch[:, [0, 1, 3, 4]].astype(np.float32))
    adaptive = AdaptiveConfig(
        max_samples=4096, fixed_batch=1024, step_samples=128,
        bin_accuracy=(0.02, 0.02, 0.05), min_active=8,
    )

    def run(out_name, mesh):
        out = tmp_path / out_name
        # relabel needs tables/meta in data_out
        out.mkdir()
        for f in ("poses.npy", "variances.npy"):
            shutil.copy(data_dir / f, out / f)
        shutil.copytree(data_dir / "meta", out / "meta")
        relabel_dataset(RelabelConfig(
            data_in=str(din), data_out=str(out), seed=31, shuffle=False,
            verbose=False, adaptive=adaptive, max_samples=4096, mesh=mesh,
        ))
        return np.load(out / "0.npy")

    base = run("r_base", None)
    got = run("r_ss", make_mesh(cpu_devices(), sample_axis=8))
    np.testing.assert_array_equal(got, base)


def test_ztest_sample_parallel_validation(tmp_path, generated):
    data_dir, _ = generated
    src = tmp_path / "zv"
    _copy_tables(data_dir, src)
    (src / "tmp").mkdir()
    batch = np.load(data_dir / "0.npy")[:16]
    np.save(src / "tmp" / "0.npy", batch[:, [0, 1, 3, 4]].astype(np.float32))
    with pytest.raises(ValueError, match="divide"):
        ztest(ZTestConfig(
            data_dir=str(src), verbose=False,
            n_batch=1000, sample_parallel=7,
        ))


def test_generate_data_parallel_bitwise(tmp_path, generated):
    # DP generation over the 8-device CPU mesh writes byte-identical
    # batches (uid-keyed threefry streams are placement-independent).
    from collide2d_tpu.parallel import make_mesh
    from tests.conftest import cpu_devices

    data_dir, _ = generated
    cfg = _gen_cfg(
        tmp_path, data_dir=str(tmp_path / "dp"), num_batches=1,
        mesh=make_mesh(cpu_devices()),
        pose_dir=str(data_dir / "poses.npy"),
        variance_dir=str(data_dir / "variances.npy"),
    )
    generate_dataset(cfg)
    cfg_ref = _gen_cfg(
        tmp_path, data_dir=str(tmp_path / "sp"), num_batches=1,
        pose_dir=str(data_dir / "poses.npy"),
        variance_dir=str(data_dir / "variances.npy"),
    )
    generate_dataset(cfg_ref)
    a = np.load(tmp_path / "dp" / "0.npy")
    b = np.load(tmp_path / "sp" / "0.npy")
    np.testing.assert_array_equal(a, b)


def _copy_tables(src, dst):
    import shutil

    dst.mkdir(parents=True, exist_ok=True)
    for name in ("poses.npy", "variances.npy"):
        shutil.copy(src / name, dst / name)
    (dst / "meta").mkdir(exist_ok=True)
    for name in ("accuracy_bins.npy", "bin_accuracy.npy"):
        shutil.copy(src / "meta" / name, dst / "meta" / name)


def test_relabel_resume_skips_and_appends_once(tmp_path, generated):
    # --resume must (a) skip outputs an interrupted run already wrote and
    # (b) pin the first run's append window via the .relabel_start marker
    # so the rerun continues the SAME numbering instead of appending a
    # second copy after its own partial output.
    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")
    data_in = tmp_path / "rin"
    data_in.mkdir()
    np.save(data_in / "0.npy", batch[:64, [0, 1, 3, 4]].astype(np.float32))
    np.save(data_in / "1.npy", batch[64:128, [0, 1, 3, 4]].astype(np.float32))

    kw = dict(data_in=str(data_in), shuffle=False, seed=5, verbose=False,
              adaptive=FAST, max_samples=FAST.max_samples, resume=True)
    out_a = tmp_path / "out_a"
    _copy_tables(data_dir, out_a)
    relabel_dataset(RelabelConfig(data_out=str(out_a), **kw))
    assert (out_a / "0.npy").exists() and (out_a / "1.npy").exists()
    assert not (out_a / ".relabel_start").exists()  # clean finish

    # Simulate a run killed after writing output batch 0: marker + 0.npy.
    # The marker carries the run identity (a stale marker from a
    # DIFFERENT run must never pin the window — see the stale test below).
    import json
    import shutil

    out_b = tmp_path / "out_b"
    _copy_tables(data_dir, out_b)
    (out_b / ".relabel_start").write_text(json.dumps(
        {"start": 0, "data_in": str(data_in.resolve()), "seed": 5,
         "num_batches": 2}))
    shutil.copy(out_a / "0.npy", out_b / "0.npy")
    relabel_dataset(RelabelConfig(data_out=str(out_b), **kw))
    # The rerun skipped 0 and wrote 1 in the ORIGINAL window — the union
    # is byte-identical to the uninterrupted run (same fold_in(key, i)).
    assert get_num_batches_in_dir(out_b) == 2
    np.testing.assert_array_equal(
        np.load(out_b / "1.npy"), np.load(out_a / "1.npy")
    )
    assert not (out_b / ".relabel_start").exists()

    # A STALE marker — different identity (old data_in/seed) or the
    # pre-identity plain-int format — must be ignored, not silently skip
    # every output batch of the new run (review r3 finding).
    for stale in ("0", json.dumps({"start": 0, "data_in": "/elsewhere",
                                   "seed": 99, "num_batches": 7})):
        out_c = tmp_path / f"out_c_{hash(stale) & 0xffff:x}"
        _copy_tables(data_dir, out_c)
        (out_c / ".relabel_start").write_text(stale)
        relabel_dataset(RelabelConfig(data_out=str(out_c), **kw))
        assert get_num_batches_in_dir(out_c) == 2  # actually wrote output
        np.testing.assert_array_equal(
            np.load(out_c / "1.npy"), np.load(out_a / "1.npy")
        )
        assert not (out_c / ".relabel_start").exists()


def test_relabel_overlap_bitwise_and_checkpoint_cleanup(tmp_path, generated):
    # Pipelined relabel (cross-batch interleaving, like generate): on the
    # threefry path the labels are keyed by fold_in(key, batch_index), so
    # every overlap depth produces byte-identical batch files; a clean
    # finish leaves no per-batch checkpoint_*.npz behind.
    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")
    data_in = tmp_path / "oin"
    data_in.mkdir()
    for i in range(3):
        np.save(data_in / f"{i}.npy",
                batch[i * 40:(i + 1) * 40, [0, 1, 3, 4]].astype(np.float32))

    kw = dict(data_in=str(data_in), shuffle=False, seed=7, verbose=False,
              adaptive=FAST, max_samples=FAST.max_samples,
              checkpoint_every=2)
    outs = {}
    for overlap in (1, 3):
        out = tmp_path / f"ov{overlap}"
        _copy_tables(data_dir, out)
        relabel_dataset(RelabelConfig(data_out=str(out),
                                      overlap_batches=overlap, **kw))
        assert not list(out.glob("checkpoint_*.npz"))
        outs[overlap] = [np.load(out / f"{i}.npy") for i in range(3)]
    for a, b in zip(outs[1], outs[3]):
        np.testing.assert_array_equal(a, b)


def test_ztest_rejects_negative_indices(tmp_path, generated):
    # numpy fancy-indexing WRAPS negative indices to the table tail, so
    # a corrupt input whose idx column decodes to -1 would silently
    # label the wrong configuration; the host bounds check must fire on
    # the ztest path too, not just relabel (review r3 finding).
    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")[:32]
    rows = batch[:, [0, 1, 3, 4]].astype(np.float32)
    rows[3, 3] = -1.0  # negative pose_idx
    bad = tmp_path / "neg.npy"
    np.save(bad, rows)
    with pytest.raises(ValueError, match="pose_idx"):
        ztest(ZTestConfig(
            data_dir=str(data_dir), data_file_in=str(bad),
            data_file_out=str(tmp_path / "out.npy"), cps_only=True,
            seed=2, verbose=False, n_batch=1000, max_samples=4000,
            adaptive=FAST,
        ))


def test_relabel_rejects_out_of_range_indices(tmp_path, generated):
    # jnp.take NaN-fills out-of-range gathers instead of raising (unlike
    # the numpy fancy-index it replaced), so a table-mismatched input
    # must be rejected loudly on the host before the device gather —
    # not silently labeled with NaN-derived garbage (review r3 finding).
    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")[:32]
    rows = batch[:, [0, 1, 3, 4]].astype(np.float32)
    rows[0, 2] = 99.0  # var_idx beyond the 16-row test table
    data_in = tmp_path / "badin"
    data_in.mkdir()
    np.save(data_in / "0.npy", rows)
    out = tmp_path / "badout"
    _copy_tables(data_dir, out)
    with pytest.raises(ValueError, match="var_idx"):
        relabel_dataset(RelabelConfig(
            data_in=str(data_in), data_out=str(out), shuffle=False,
            seed=3, verbose=False, adaptive=FAST,
            max_samples=FAST.max_samples,
        ))


def test_ztest_checkpoint_flag(tmp_path, generated):
    # --checkpoint_every wires mid-run checkpoints into ztest; a clean
    # finish removes the file (estimator-level resume semantics are
    # covered by test_aux.test_checkpoint_resume_identical_result).
    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")[:64]
    src = tmp_path / "zt"
    _copy_tables(data_dir, src)
    (src / "tmp").mkdir()
    np.save(src / "tmp" / "0.npy", batch[:, [0, 1, 3, 4]].astype(np.float32))
    cps = ztest(
        ZTestConfig(
            data_dir=str(src), cps_only=True, seed=2, verbose=False,
            n_batch=1000, max_samples=4000, adaptive=FAST,
            checkpoint_every=1,
        )
    )
    assert cps.shape == (64,)
    assert not (src / "ztest_checkpoint.npz").exists()


def test_ztest_schedule_replaces_fixed_batch(tmp_path, generated, monkeypatch):
    # An explicit --schedule must replace ztest's fixed 10k cadence
    # (fixed_batch wins inside AdaptiveConfig.batch_for, so it is dropped
    # when a schedule is requested); without one, the reference's fixed
    # n_batch stands (ztest.cu:332).
    import collide2d_tpu.data.pipeline as pl

    data_dir, _ = generated
    batch = np.load(data_dir / "1.npy")[:16]
    src = tmp_path / "zts"
    _copy_tables(data_dir, src)
    (src / "tmp").mkdir()
    np.save(src / "tmp" / "0.npy", batch[:, [0, 1, 3, 4]].astype(np.float32))

    captured = {}

    def fake_label_batch(key, positions, pose_idx, var_idx, poses, std_devs,
                         robot_wh, adaptive, **kw):
        captured["adaptive"] = adaptive
        return schemas.pack_dataset_rows(
            positions, np.zeros(len(positions), np.float32), var_idx, pose_idx
        )

    monkeypatch.setattr(pl, "_label_batch", fake_label_batch)
    base = dict(data_dir=str(src), seed=1, verbose=False, cps_only=True)
    ztest(ZTestConfig(**base))
    assert captured["adaptive"].fixed_batch == 10_000
    ztest(ZTestConfig(schedule="tuned", prune_sigma=6.0, ladder="half", **base))
    a = captured["adaptive"]
    assert a.fixed_batch is None and a.schedule == "tuned"
    assert a.prune_sigma == 6.0 and a.ladder == "half"


def test_generate_overlap_bitwise_identical(tmp_path):
    # Cross-batch pipelining (overlap_batches=2, the default) must
    # produce byte-identical batch files to the strictly serial loop:
    # each batch keeps its own fold_in key and scheduler trajectory;
    # interleaving only reorders device dispatch.
    kw = dict(num_batches=3, batch_size=96, num_poses=8, num_variances=8,
              seed=11, verbose=False, adaptive=FAST,
              max_samples=FAST.max_samples)
    a = tmp_path / "serial"
    b = tmp_path / "overlap"
    generate_dataset(GenerateConfig(
        data_dir=str(a), overlap_batches=1, **kw))
    generate_dataset(GenerateConfig(
        data_dir=str(b), overlap_batches=2, **kw))
    for i in range(3):
        np.testing.assert_array_equal(
            np.load(a / f"{i}.npy"), np.load(b / f"{i}.npy"),
            err_msg=f"batch {i} differs between serial and overlapped runs",
        )
    np.testing.assert_array_equal(np.load(a / "poses.npy"),
                                  np.load(b / "poses.npy"))


def test_generate_overlap_resume_and_checkpoints(tmp_path):
    # Pipelined mode + --resume + per-batch checkpoint files: a rerun
    # skips written batches, and a clean finish leaves no checkpoint_*.
    kw = dict(num_batches=3, batch_size=64, num_poses=8, num_variances=8,
              seed=13, verbose=False, adaptive=FAST,
              max_samples=FAST.max_samples, overlap_batches=2,
              checkpoint_every=2, resume=True)
    d = tmp_path / "d"
    generate_dataset(GenerateConfig(data_dir=str(d), **kw))
    assert get_num_batches_in_dir(d) == 3
    assert not list(d.glob("checkpoint_*.npz"))
    before = [np.load(d / f"{i}.npy") for i in range(3)]
    # delete batch 1; the resumed run must regenerate it identically and
    # leave 0/2 untouched
    (d / "1.npy").unlink()
    generate_dataset(GenerateConfig(data_dir=str(d), **kw))
    for i in range(3):
        np.testing.assert_array_equal(np.load(d / f"{i}.npy"), before[i])
