"""Adjacency loaders and metrics vs the reference implementations."""
import numpy as np
import pytest

from dstagnn_drought_tpu.data.adjacency import (
    edge_list_adjacency,
    load_dense_adjacency,
    load_stag_adjacency,
    load_strg_adjacency,
)
from dstagnn_drought_tpu.training.metrics import masked_mape, horizon_report


def _write_edge_csv(path, edges):
    with open(path, "w") as f:
        f.write("from,to,cost\n")
        for i, j, c in edges:
            f.write(f"{i},{j},{c}\n")


def test_edge_list_directed(tmp_path, reference_path):
    from lib.utils1 import get_adjacency_matrix2

    p = tmp_path / "edges.csv"
    edges = [(0, 1, 1.5), (2, 3, 2.0), (3, 0, 0.7)]
    _write_edge_csv(p, edges)
    ours = edge_list_adjacency(str(p), 5)
    theirs = get_adjacency_matrix2(str(p), 5)
    np.testing.assert_array_equal(ours, theirs)
    assert ours[0, 1] == 1 and ours[1, 0] == 0  # stays directed


def test_edge_list_id_remap_symmetric(tmp_path, reference_path):
    from lib.utils1 import get_adjacency_matrix2

    ids = tmp_path / "ids.txt"
    ids.write_text("100\n200\n300\n")
    p = tmp_path / "edges.csv"
    _write_edge_csv(p, [(100, 300, 1.0), (200, 100, 2.0)])
    ours = edge_list_adjacency(str(p), 3, str(ids))
    theirs = get_adjacency_matrix2(str(p), 3, id_filename=str(ids))
    np.testing.assert_array_equal(ours, theirs)
    assert ours[0, 2] == 1 and ours[2, 0] == 1  # symmetrized


def test_dense_loaders_match_reference(tmp_path, reference_path):
    from lib.dataloader import (
        load_PA,
        load_weighted_adjacency_matrix,
        load_weighted_adjacency_matrix2,
    )

    rng = np.random.default_rng(3)
    M = rng.random((6, 6)) * (rng.random((6, 6)) < 0.4)
    np.fill_diagonal(M, 1.0)
    p = tmp_path / "dense.csv"
    np.savetxt(p, M, delimiter=",")

    np.testing.assert_array_equal(
        load_stag_adjacency(str(p)), load_weighted_adjacency_matrix(str(p), 6)
    )
    np.testing.assert_array_equal(load_strg_adjacency(str(p)), load_PA(str(p)))
    np.testing.assert_array_equal(
        load_dense_adjacency(str(p), 6), load_weighted_adjacency_matrix2(str(p), 6)
    )


def test_masked_mape_matches_reference(reference_path, rng):
    from lib.metrics import masked_mape_np

    y_true = rng.normal(10, 5, (50, 7)).astype(np.float32)
    y_true[rng.random(y_true.shape) < 0.2] = 0.0
    y_pred = y_true + rng.normal(0, 1, y_true.shape).astype(np.float32)
    ours = masked_mape(y_true, y_pred, 0)
    theirs = masked_mape_np(y_true, y_pred, 0)
    assert ours == pytest.approx(float(theirs), rel=1e-6)

    # NaN null-val branch
    y_true2 = y_true.copy()
    y_true2[0, 0] = np.nan
    assert masked_mape(y_true2, y_pred) == pytest.approx(
        float(masked_mape_np(y_true2, y_pred)), rel=1e-6, nan_ok=True
    )


def test_horizon_report_matches_sklearn(reference_path, rng):
    from sklearn.metrics import mean_absolute_error, mean_squared_error

    y = rng.normal(10, 5, (40, 6, 12))
    p = y + rng.normal(0, 1, y.shape)
    rep = horizon_report(y, p, null_val=0)
    assert len(rep["per_horizon"]) == 12
    i = 3
    assert rep["per_horizon"][i]["mae"] == pytest.approx(
        mean_absolute_error(y[:, :, i], p[:, :, i])
    )
    assert rep["per_horizon"][i]["rmse"] == pytest.approx(
        mean_squared_error(y[:, :, i], p[:, :, i]) ** 0.5
    )
    assert rep["overall"]["mae"] == pytest.approx(
        mean_absolute_error(y.reshape(-1, 1), p.reshape(-1, 1))
    )
