"""Sparse mode wired through the model / trainer, incl. a GAMBIA-shaped run
(multichannel F=4 — the configuration the reference crashes on)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
from dstagnn_drought_tpu.models.dstagnn import ModelSpec, apply, make_model
from dstagnn_drought_tpu.ops.sparse import ell_from_adjacency
from dstagnn_drought_tpu.training.loop import Trainer


def graphs(rng, N):
    A = (rng.random((N, N)) < 0.25).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.2).astype(np.float32)
    return A, pa


def test_model_sparse_forward(rng):
    N = 14
    spec = ModelSpec(
        num_of_vertices=N, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=3, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    A, pa = graphs(rng, N)
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    ell = ell_from_adjacency(A)
    x = jnp.asarray(rng.normal(size=(2, N, 1, 12)), jnp.float32)
    out = apply(params, x, spec=spec, adj_pa=consts["adj_pa"],
                cheb_polys=consts["cheb_polys"], ell=ell)
    assert out.shape == (2, N, 4)
    assert np.isfinite(np.asarray(out)).all()
    # sparse and dense modes differ (different softmax support) but both live
    dense = apply(params, x, spec=spec, adj_pa=consts["adj_pa"],
                  cheb_polys=consts["cheb_polys"])
    assert not np.allclose(np.asarray(out), np.asarray(dense))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_model_halo_partitioned_matches_sparse(rng):
    """Full model forward, node-partitioned with targeted halo exchange,
    must reproduce the single-device sparse path exactly."""
    import functools

    from dstagnn_drought_tpu.parallel.graph_partition import build_halo_plan
    from dstagnn_drought_tpu.parallel.mesh import make_mesh
    from dstagnn_drought_tpu.training.step import make_optimizer, make_train_step

    mesh = make_mesh(2, 4)
    g = mesh.shape["graph"]
    N, B = 16, 4
    spec = ModelSpec(
        num_of_vertices=N, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=3, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    A, pa = graphs(rng, N)
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    ell = ell_from_adjacency(A)
    plan = build_halo_plan(ell, g)
    x = jnp.asarray(rng.normal(size=(B, N, 1, 12)), jnp.float32)

    ref = apply(params, x, spec=spec, adj_pa=consts["adj_pa"],
                cheb_polys=consts["cheb_polys"], ell=ell)
    got = apply(params, x, spec=spec, adj_pa=consts["adj_pa"],
                cheb_polys=consts["cheb_polys"], ell=ell,
                halo=(mesh, plan))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    # one full training step (fwd+bwd+Adam through the all_to_all) runs and
    # produces a finite loss
    opt = make_optimizer(1e-3)
    consts2 = dict(consts, ell=ell)
    step = make_train_step(
        spec, opt, mesh=mesh,
        apply_fn=functools.partial(apply, halo=(mesh, plan)),
    )
    opt_state = opt.init(params)
    idx = jnp.arange(B, dtype=jnp.int32)
    y = jnp.asarray(rng.normal(size=(B, N, 4)), jnp.float32)
    params2, _, _, loss = step(
        params, opt_state, jax.random.PRNGKey(1), x, y, idx, consts2
    )
    assert np.isfinite(float(loss))


def _gambia_shaped_config(N, F):
    # mirrors configurations/GAMBIA_dstagnn.conf structure at toy scale:
    # in_channels=4, nb_block=2, K=2, n_heads=2 (reference conf:16-23)
    return Config(
        data=DataConfig(num_of_vertices=N, len_input=12, num_for_predict=6,
                        dataset_name="GAMBIA_TOY"),
        training=TrainingConfig(
            in_channels=F, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=2, learning_rate=3e-3, sparse=True,
        ),
    ).validate()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_targeted_halo_config(tmp_path, rng):
    """Config-driven node partitioning: sparse + graph_axis=4 +
    halo='targeted' trains end to end over the (data, graph) mesh."""
    N, F = 16, 1
    A, pa = graphs(rng, N)
    n = 32
    x = rng.normal(size=(n, N, F, 12)).astype(np.float32)
    y = np.repeat(x[:, :, -1, :].mean(axis=2, keepdims=True), 6, axis=2).astype(
        np.float32
    )
    sp = lambda s: Split(x[s], y[s])
    ds = ArrayDataset(
        train=sp(slice(0, 24)), val=sp(slice(24, 28)), test=sp(slice(28, 32)),
        mean=np.zeros((1, 1, F, 1)), std=np.ones((1, 1, F, 1)),
    )
    cfg = Config(
        data=DataConfig(num_of_vertices=N, len_input=12, num_for_predict=6,
                        dataset_name="HALO_TOY"),
        training=TrainingConfig(
            in_channels=F, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=2, learning_rate=3e-3, sparse=True,
            data_axis=2, graph_axis=4, halo="targeted",
        ),
    ).validate()
    trainer = Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                      experiments_root=str(tmp_path))
    assert trainer.mesh is not None
    assert trainer.mesh.shape == {"data": 2, "graph": 4}
    result = trainer.run()
    assert np.isfinite(result["test_loss"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_halo_autopads_indivisible_nodes(tmp_path, rng):
    """N=14 does not divide graph_axis=4: the targeted-halo path pads the
    node axis with isolated dummy nodes (shard_ell) and trains end to end —
    GAMBIA's N=2139 = 3·23·31 needs this on every even-sized mesh."""
    N, F = 14, 1  # 14 % 4 != 0
    A, pa = graphs(rng, N)
    cfg = Config(
        data=DataConfig(num_of_vertices=N, len_input=12, num_for_predict=6,
                        dataset_name="HALO_PAD"),
        training=TrainingConfig(
            in_channels=F, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=2, learning_rate=3e-3, sparse=True,
            data_axis=2, graph_axis=4, halo="targeted",
        ),
    ).validate()
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
    trainer = Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                      experiments_root=str(tmp_path))
    assert trainer.mesh is not None
    result = trainer.run()
    assert np.isfinite(result["test_loss"])

    # parity: the padded-halo loss trajectory equals single-device sparse
    cfg1 = Config(
        data=cfg.data,
        training=dataclasses.replace(
            cfg.training, data_axis=1, graph_axis=1, halo="gather",
        ),
    ).validate()
    trainer1 = Trainer(cfg1, dataset=ds, adj_merge=A, adj_pa=pa,
                       experiments_root=str(tmp_path / "single"))
    result1 = trainer1.run()
    np.testing.assert_allclose(
        result["test_loss"], result1["test_loss"], rtol=2e-3
    )


def test_trainer_gambia_shaped_sparse(tmp_path, rng):
    N, F = 16, 4
    A, pa = graphs(rng, N)
    n = 24
    x = rng.normal(size=(n, N, F, 12)).astype(np.float32)
    y = np.repeat(x[:, :, -1, :].mean(axis=2, keepdims=True), 6, axis=2).astype(
        np.float32
    )
    sp = lambda s: Split(x[s], y[s])
    ds = ArrayDataset(
        train=sp(slice(0, 16)), val=sp(slice(16, 20)), test=sp(slice(20, 24)),
        mean=np.zeros((1, 1, F, 1)), std=np.ones((1, 1, F, 1)),
    )
    trainer = Trainer(
        _gambia_shaped_config(N, F), dataset=ds, adj_merge=A, adj_pa=pa,
        experiments_root=str(tmp_path),
    )
    assert "ell" in trainer.constants
    result = trainer.run()
    assert np.isfinite(result["test_loss"])
    assert len(result["report"]["per_horizon"]) == 6
