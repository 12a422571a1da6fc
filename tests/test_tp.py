"""Tensor-parallel temporal attention (folded over 'graph'): placement is
really sharded, training is numerically identical to the replicated run."""
import dataclasses

import jax
import numpy as np
import pytest

from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
from dstagnn_drought_tpu.training.loop import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_tat_tp_shardings_tree():
    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model
    from dstagnn_drought_tpu.parallel.mesh import make_mesh
    from dstagnn_drought_tpu.parallel.sharding import tat_tp_shardings

    mesh = make_mesh(2, 4)
    spec = ModelSpec(
        num_of_vertices=16, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=2, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    rng = np.random.default_rng(0)
    A = np.maximum((rng.random((16, 16)) < 0.3), np.eye(16, dtype=bool))
    params, _ = make_model(jax.random.PRNGKey(0), spec, A.astype(np.float32),
                           A.astype(np.float32))
    sh = tat_tp_shardings(params, mesh)
    tat0 = sh["blocks"][0]["tat"]
    assert tat0["wq"].spec == jax.sharding.PartitionSpec(None, "graph")
    assert tat0["wo"].spec == jax.sharding.PartitionSpec("graph", None)
    # layer norms and non-TAt weights stay replicated
    assert tat0["ln_scale"].spec == jax.sharding.PartitionSpec()
    assert sh["final_fc"]["w"].spec == jax.sharding.PartitionSpec()

    placed = jax.device_put(params, sh)
    assert not placed["blocks"][0]["tat"]["wq"].sharding.is_fully_replicated


def test_tat_tp_fallback_warns(caplog):
    """An indivisible H·d_k must fall back to replicated WITH a warning, and
    tp_report must flag it."""
    import logging

    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model
    from dstagnn_drought_tpu.parallel.mesh import make_mesh
    from dstagnn_drought_tpu.parallel.sharding import (
        tat_tp_shardings,
        tp_report,
    )

    mesh = make_mesh(2, 4)
    # H·d_k = 3·7 = 21, not divisible by graph axis 4
    spec = ModelSpec(
        num_of_vertices=16, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=1, in_channels=1, K=2, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=7, n_heads=3,
    )
    A = np.eye(16, dtype=np.float32)
    params, _ = make_model(jax.random.PRNGKey(0), spec, A, A)
    with caplog.at_level(logging.WARNING,
                         logger="dstagnn_drought_tpu.parallel.sharding"):
        sh = tat_tp_shardings(params, mesh)
    assert any("REPLICATED" in r.message for r in caplog.records)
    assert sh["blocks"][0]["tat"]["wq"].spec == jax.sharding.PartitionSpec()
    rep = tp_report(params, mesh)
    assert rep["fallback"]
    assert rep["per_device_bytes_tp"] == rep["per_device_bytes_replicated"]


def test_tp_report_divisible():
    """Divisible case: per-device bytes shrink by the sharded TAt share."""
    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model
    from dstagnn_drought_tpu.parallel.mesh import make_mesh
    from dstagnn_drought_tpu.parallel.sharding import tp_report

    mesh = make_mesh(2, 4)
    spec = ModelSpec(
        num_of_vertices=16, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=2, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    A = np.eye(16, dtype=np.float32)
    params, _ = make_model(jax.random.PRNGKey(0), spec, A, A)
    rep = tp_report(params, mesh)
    assert not rep["fallback"]
    assert rep["sharded_tat_bytes"] > 0
    expect = rep["replicated_bytes"] + rep["sharded_tat_bytes"] // 4
    assert rep["per_device_bytes_tp"] == expect
    assert rep["per_device_bytes_tp"] < rep["per_device_bytes_replicated"]


def test_tp_training_matches_replicated(tmp_path):
    rng = np.random.default_rng(2)
    N, F = 16, 1
    A = (rng.random((N, N)) < 0.3).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.2).astype(np.float32)
    n = 32
    x = rng.normal(size=(n, N, F, 12)).astype(np.float32)
    y = np.repeat(
        x[:, :, -1, :].mean(axis=2, keepdims=True), 6, axis=2
    ).astype(np.float32)
    sp = lambda s: Split(x[s], y[s])
    ds = ArrayDataset(
        train=sp(slice(0, 24)), val=sp(slice(24, 28)), test=sp(slice(28, 32)),
        mean=np.zeros((1, 1, F, 1)), std=np.ones((1, 1, F, 1)),
    )
    cfg = Config(
        data=DataConfig(num_of_vertices=N, len_input=12, num_for_predict=6,
                        dataset_name="TP_TOY"),
        training=TrainingConfig(
            in_channels=F, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=2, learning_rate=3e-3,
            data_axis=2, graph_axis=4, tp=True,
        ),
    ).validate()
    tr = Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                 experiments_root=str(tmp_path))
    assert not (
        tr.params["blocks"][0]["tat"]["wq"].sharding.is_fully_replicated
    )
    res = tr.run()
    assert np.isfinite(res["test_loss"])

    cfg1 = Config(
        data=cfg.data,
        training=dataclasses.replace(cfg.training, tp=False),
    ).validate()
    tr1 = Trainer(cfg1, dataset=ds, adj_merge=A, adj_pa=pa,
                  experiments_root=str(tmp_path / "repl"))
    res1 = tr1.run()
    np.testing.assert_allclose(res["test_loss"], res1["test_loss"], rtol=2e-3)
