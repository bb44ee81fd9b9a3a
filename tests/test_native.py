"""Native runtime: libstdc++-compatible RNG/shuffle + async npy writer."""

import numpy as np
import pytest

from collide2d_tpu.utils import native
from collide2d_tpu.utils.io_npy import get_num_batches_in_dir, mkdirs


needs_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native runtime"
)


@needs_native
def test_ref_engine_deterministic():
    # std::default_random_engine is default-seeded => identical tables on
    # every run, matching the reference's host sampling determinism
    # (generate_dataset.cu:279, SURVEY.md §2 latent-bug list).
    t1 = native.RefEngine().uniform_table(8, [0.0] * 5, [0.3] * 5)
    t2 = native.RefEngine().uniform_table(8, [0.0] * 5, [0.3] * 5)
    np.testing.assert_array_equal(t1, t2)
    assert t1.dtype == np.float32 and t1.shape == (8, 5)
    assert (t1 >= 0).all() and (t1 <= 0.3).all()


@needs_native
def test_ref_engine_stream_continuity():
    # Variances then poses from ONE engine must differ from two engines —
    # the reference shares a single generator across both tables.
    e = native.RefEngine()
    v = e.uniform_table(4, [0.0] * 5, [1.0] * 5)
    p_cont = e.uniform_table(4, [0.0] * 3, [1.0] * 3)
    p_fresh = native.RefEngine().uniform_table(4, [0.0] * 3, [1.0] * 3)
    assert not np.array_equal(p_cont, p_fresh)


@needs_native
def test_ref_engine_golden_values():
    """Pin the refcompat contract to VALUES, not to the toolchain.

    `RefEngine` promises the exact libstdc++ streams the reference
    consumes (std::default_random_engine = minstd_rand0 default-seeded,
    generate_dataset.cu:279; std::shuffle seed 0, generate_dataset.cu:
    496). The determinism/continuity tests above would still pass on a
    libc++/MSVC toolchain whose std::default_random_engine differs —
    silently voiding the bit-compat promise — so this test hardcodes
    golden values generated with libstdc++ (g++ 13, this image) and
    FAILS (never skips) on any deviation.

    Independent sanity anchor: minstd_rand0 from seed 1 yields 16807 as
    its first output, and libstdc++'s uniform_real_distribution maps it
    through generate_canonical in FLOAT arithmetic as
    float32(16806 / 2147483646) * float32(0.3) = 2.3477712e-06 — which
    is exactly the first golden word below (0x361d8e67).
    """
    # First 8 floats (bit patterns) of a default-seeded [0, 0.3)^5 table,
    # row-major — one shared engine, one distribution per column.
    tbl = native.RefEngine().uniform_table(2, [0.0] * 5, [0.3] * 5)
    got = [f"{b:08x}" for b in np.frombuffer(tbl.tobytes(), np.uint32)[:8]]
    assert got == [
        "361d8e67", "3d21a237", "3e681f39", "3e0ce5b7",
        "3e23aa86", "3d86874e", "3c673bd4", "3e508c19",
    ], f"libstdc++ minstd_rand0 uniform stream mismatch: {got}"
    assert tbl[0, 0] == np.float32(
        np.float32(np.float32(16806.0) / np.float32(2147483646.0))
        * np.float32(0.3)
    )

    # std::shuffle(10 rows, engine(0)) permutation.
    assert native.std_shuffle_perm(10, 0).tolist() == [
        2, 7, 1, 6, 8, 0, 4, 9, 5, 3
    ]

    # Checksum of the (64, 5) variance + (64, 3) pose table pair drawn
    # from ONE engine in reference order (variances first —
    # generate_dataset.cu:279-330), the refcompat_tables code path.
    import math
    import zlib

    e = native.RefEngine()
    v = e.uniform_table(64, [0.0] * 5, [0.3] * 5)
    p = e.uniform_table(64, [0.1, 0.1, 0.0], [5.0, 5.0, 2 * math.pi])
    assert zlib.crc32(v.tobytes()) == 0x1A8486E6, "variance table drifted"
    assert zlib.crc32(p.tobytes()) == 0xCA9B0BA3, "pose table drifted"


@needs_native
def test_std_shuffle_perm_properties():
    p1 = native.std_shuffle_perm(1000, 0)
    p2 = native.std_shuffle_perm(1000, 0)
    np.testing.assert_array_equal(p1, p2)  # seed-0 engine is deterministic
    assert sorted(p1) == list(range(1000))
    assert not np.array_equal(p1, np.arange(1000))
    # NOTE: minstd_rand0 remaps seed 0 -> 1, so seeds 0 and 1 coincide
    # (libstdc++ behavior the reference inherits); use 2 for a contrast.
    p3 = native.std_shuffle_perm(1000, 2)
    assert not np.array_equal(p1, p3)


def test_async_writer_roundtrip(tmp_path):
    with native.AsyncNpyWriter() as w:
        for i in range(5):
            w.submit(tmp_path / f"{i}.npy", np.full((7, 5), i, np.float32))
        assert w.flush() == 0
    for i in range(5):
        back = np.load(tmp_path / f"{i}.npy")
        assert back.shape == (7, 5) and back.dtype == np.float32
        assert (back == i).all()


def test_get_num_batches_numeric_only(tmp_path):
    mkdirs(tmp_path)
    for name in ["0.npy", "1.npy", "7.npy", "poses.npy", "variances.npy",
                 "checkpoint3.npy", "notes.txt"]:
        (tmp_path / name).write_bytes(b"x")
    # utils.cu:36-56 semantics: numeric stems only.
    assert get_num_batches_in_dir(tmp_path) == 3
    assert get_num_batches_in_dir(tmp_path / "missing") == 0


def test_async_writer_failure_counted(tmp_path):
    # A write into a nonexistent directory must surface as a failure
    # (native: counted at flush; numpy fallback: raises at submit) and
    # must never leave a partially-written file or .tmp behind.
    from collide2d_tpu.utils import native

    rows = np.ones((4, 5), np.float32)
    with native.AsyncNpyWriter() as w:
        bad = tmp_path / "missing_dir" / "0.npy"
        if w._h is None:  # numpy fallback is synchronous
            with pytest.raises(OSError):
                w.submit(bad, rows)
        else:
            w.submit(bad, rows)
            assert w.flush() >= 1
        assert not bad.exists()
    assert not list(tmp_path.glob("**/*.tmp"))


def test_async_writer_atomic_publish(tmp_path):
    from collide2d_tpu.utils import native

    rows = np.arange(20, dtype=np.float32).reshape(4, 5)
    with native.AsyncNpyWriter() as w:
        w.submit(tmp_path / "0.npy", rows)
        assert w.flush() == 0
    np.testing.assert_array_equal(np.load(tmp_path / "0.npy"), rows)
    assert not list(tmp_path.glob("*.tmp"))  # temp renamed away


def test_save_npy_atomic(tmp_path):
    from collide2d_tpu.utils.io_npy import save_npy

    save_npy(tmp_path / "a.npy", np.zeros((3, 5), np.float32))
    assert (tmp_path / "a.npy").exists()
    assert not list(tmp_path.glob("*.tmp"))
