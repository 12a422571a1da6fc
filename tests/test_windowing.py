"""Windowing / normalization / npz-format tests (reference prepareData.py)."""
import numpy as np

from dstagnn_drought_tpu.data.dataset import load_windowed_dataset
from dstagnn_drought_tpu.data.windowing import (
    get_sample_indices,
    normalization,
    read_and_generate_dataset,
    search_data,
    windowed_npz_path,
)


def test_search_data_hour_windows():
    # pph=12, units=1, 12 hour-windows of length 12: GAMBIA-style 144-step input
    idx = search_data(300, 12, 150, 12, 1, 12)
    assert len(idx) == 12
    # oldest first, newest window ends at the label
    assert idx[0] == (150 - 12 * 12, 150 - 12 * 12 + 12)
    assert idx[-1] == (138, 150)


def test_search_data_boundaries():
    assert search_data(100, 1, 95, 12, 1, 12) is None  # label beyond end
    assert search_data(100, 2, 20, 12, 1, 12) is None  # window off the front
    assert search_data(100, 1, 12, 12, 1, 12) == [(0, 12)]


def test_get_sample_indices_week_day_hour():
    T, N, F = 24 * 7 * 3, 4, 2
    t = 24 * 7 * 2
    data = np.arange(T * N * F, dtype=np.float64).reshape(T, N, F)
    week, day, hour, target = get_sample_indices(data, 1, 1, 2, t, 12, 1)
    assert week.shape == (12, N, F)
    assert day.shape == (12, N, F)
    assert hour.shape == (24, N, F)  # 2 hour-windows of length num_for_predict
    np.testing.assert_array_equal(target, data[t: t + 12])
    np.testing.assert_array_equal(week, data[t - 24 * 7: t - 24 * 7 + 12])
    np.testing.assert_array_equal(day, data[t - 24: t - 24 + 12])
    # hour windows at offsets t−2, t−1 (pph=1), oldest first, each of length
    # num_for_predict — overlapping slices, exactly like prepareData.py:14-18
    np.testing.assert_array_equal(
        hour, np.concatenate([data[t - 2: t + 10], data[t - 1: t + 11]])
    )


def test_normalization_train_stats():
    rng = np.random.default_rng(1)
    tr, va, te = rng.normal(5, 3, (20, 4, 2, 6)), rng.normal(5, 3, (7, 4, 2, 6)), rng.normal(5, 3, (7, 4, 2, 6))
    stats, trn, _, _ = normalization(tr, va, te)
    assert stats["_mean"].shape == (1, 1, 2, 1)
    np.testing.assert_allclose(trn.mean(axis=(0, 1, 3)), 0, atol=1e-12)
    np.testing.assert_allclose(trn.std(axis=(0, 1, 3)), 1, atol=1e-12)


def test_read_and_generate_roundtrip(tmp_path):
    T, N, F = 120, 5, 3
    rng = np.random.default_rng(2)
    data = rng.normal(size=(T, N, F))
    src = tmp_path / "TOY.npz"
    np.savez(src, data=data)

    all_data = read_and_generate_dataset(str(src), 0, 0, 2, 12, points_per_hour=1, save=True)
    x = all_data["train"]["x"]
    assert x.shape[1:] == (N, F, 24)  # 2 hour-windows × num_for_predict
    # valid labels t: t >= pph·num_of_hours = 2 and t + 12 <= T
    n_valid = sum(s["x"].shape[0] for s in
                  (all_data["train"], all_data["val"], all_data["test"]))
    assert n_valid == (T - 12) - 2 + 1

    # npz naming convention matches the reference loader's expectation
    expect = str(tmp_path / "TOY_r2_d0_w0_dstagnn")
    assert windowed_npz_path(str(src), 2, 0, 0) == expect

    ds = load_windowed_dataset(str(src), 2, 0, 0)
    assert ds.train.x.dtype == np.float32
    np.testing.assert_allclose(ds.train.x, all_data["train"]["x"], atol=1e-6)
    assert ds.train.target.shape[1:] == (N, 12)
    assert ds.mean.shape == (1, 1, F, 1)


def test_target_is_last_feature(tmp_path):
    """The fork keeps feature −1 as the target (prepareData.py:99)."""
    T, N, F = 60, 3, 2
    data = np.zeros((T, N, F))
    data[..., 0] = 0.5  # non-target feature
    data[..., -1] = np.arange(T)[:, None]
    src = tmp_path / "TOY2.npz"
    np.savez(src, data=data)
    all_data = read_and_generate_dataset(str(src), 0, 0, 1, 6, points_per_hour=1)
    tgt = all_data["train"]["target"]
    first_label = 1  # first t with the (t-1, t-1+6) hour window in range
    np.testing.assert_array_equal(tgt[0, 0], np.arange(first_label, first_label + 6))
