"""Balance post-processing vs the reference script's exact numerics
(balance_datasets.py:1-60)."""

import numpy as np
import pytest

from collide2d_tpu.data import balance as bal


def _rows(rng, n, cps=None):
    rows = rng.uniform(-5, 5, (n, 5)).astype(np.float32)
    rows[:, 2] = cps if cps is not None else rng.uniform(0, 1, n)
    return rows


def test_load_data_skip_rules(tmp_path, rng):
    # balance_datasets.py:8-11: skip poses*/variance*/checkpoint* files.
    np.save(tmp_path / "0.npy", _rows(rng, 10))
    np.save(tmp_path / "1.npy", _rows(rng, 7))
    np.save(tmp_path / "poses.npy", np.zeros((4, 3), np.float32))
    np.save(tmp_path / "variances.npy", np.zeros((4, 5), np.float32))
    np.save(tmp_path / "checkpoint3.npy", np.zeros((4, 5), np.float32))
    np.save(tmp_path / "ztest_cps.npy", np.zeros(9, np.float32))  # 1-D artifact
    data = bal.load_data(tmp_path)
    assert data.shape == (17, 5)


def test_load_data_empty_raises(tmp_path):
    tmp_path.mkdir(exist_ok=True)
    with pytest.raises(FileNotFoundError):
        bal.load_data(tmp_path)


def test_compute_bin_idx_edges():
    # balance_datasets.py:15-20: half-open bins except the last, which is
    # closed on both ends.
    bins = np.array([0.0, 0.001, 0.01, 0.1, 1.0])
    y = np.array([0.0, 0.0005, 0.001, 0.05, 0.1, 0.5, 1.0])
    masks = bal.compute_bin_idx(y, bins)
    assert len(masks) == 4
    np.testing.assert_array_equal(masks[0], [True, True, False, False, False, False, False])
    np.testing.assert_array_equal(masks[2], [False, False, False, True, False, False, False])
    # last bin includes both 0.1 and 1.0
    np.testing.assert_array_equal(masks[3], [False, False, False, False, True, True, True])
    # every value lands in exactly one bin
    assert (np.stack(masks).sum(0) == 1).all()


def test_balance_truncates_to_global_min(rng):
    bins = np.array([0.0, 0.5, 1.0])
    # dataset 0: 10 low + 4 high; dataset 1: 3 low + 8 high -> min = 3
    cps0 = np.concatenate([np.full(10, 0.2), np.full(4, 0.8)])
    cps1 = np.concatenate([np.full(3, 0.2), np.full(8, 0.8)])
    d0 = _rows(rng, 14, cps0)
    d1 = _rows(rng, 11, cps1)
    b0 = bal.compute_bin_idx(d0[:, 2], bins)
    b1 = bal.compute_bin_idx(d1[:, 2], bins)
    e0, e1 = bal.balance(d0, d1, b0, b1)
    assert e0.shape == (6, 5) and e1.shape == (6, 5)  # 3 per bin each
    # per-bin counts equalized
    for e in (e0, e1):
        m = bal.compute_bin_idx(e[:, 2], bins)
        assert [x.sum() for x in m] == [3, 3]


def test_balance_single(rng):
    bins = np.array([0.0, 0.5, 1.0])
    cps = np.concatenate([np.full(7, 0.1), np.full(2, 0.9)])
    d = _rows(rng, 9, cps)
    out = bal.balance_single(d, bal.compute_bin_idx(d[:, 2], bins))
    assert out.shape == (4, 5)


def test_plot_histogram(tmp_path, rng):
    pytest.importorskip("matplotlib")
    out = tmp_path / "hist.svg"
    bal.plot_histogram(_rows(rng, 50), out_path=out)
    assert out.exists() and out.stat().st_size > 0


def test_visualize_selectors_and_contour(tmp_path):
    """data/visualize.py: row selection mirrors the notebook's column
    semantics (schema #10: col 3 = var_idx, col 4 = pose_idx) and the
    contour renderer writes a file."""
    import numpy as np

    from collide2d_tpu.data.visualize import (
        get_data_for_specific_var,
        get_data_for_specific_var_and_pos,
        plot_contour,
    )

    rng = np.random.default_rng(0)
    n = 400
    rows = np.zeros((n, 5), np.float32)
    rows[:, 0] = rng.uniform(-5, 5, n)  # x
    rows[:, 1] = rng.uniform(-5, 5, n)  # y
    rows[:, 2] = rng.uniform(0, 1, n)   # cp
    rows[:, 3] = rng.integers(0, 3, n)  # var_idx (float32 column)
    rows[:, 4] = rng.integers(0, 3, n)  # pose_idx

    x, y, cp = get_data_for_specific_var_and_pos(rows, 1.0, 2.0)
    want = rows[(rows[:, 3] == 1) & (rows[:, 4] == 2)]
    assert len(x) == len(want) > 0
    np.testing.assert_array_equal(np.stack([x, y, cp], 1), want[:, :3])

    xv, yv, cpv = get_data_for_specific_var(rows, 0.0)
    assert len(xv) == (rows[:, 3] == 0).sum()

    out = plot_contour(
        rows[:, 0], rows[:, 1], rows[:, 2], tmp_path / "c.png"
    )
    assert (tmp_path / "c.png").exists()
    assert (tmp_path / "c.png").stat().st_size > 1000
