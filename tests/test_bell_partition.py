"""Node-partitioned BELL path (shard_map + fused kernel, interpret mode on
CPU): parity against the single-device BELL paths and an end-to-end Trainer
run over the (data, graph) mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.block_sparse import block_ell_from_adjacency

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def local_graph(N, radius=3, seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((N, N), np.float32)
    for j in range(N):
        lo, hi = max(0, j - radius), min(N, j + radius + 1)
        for i in range(lo, hi):
            if rng.random() < 0.7:
                A[i, j] = 1
    return A


def test_partitioned_bell_matches_single_device():
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        bell_cheb_conv_with_sat_pallas,
    )
    from dstagnn_drought_tpu.parallel.bell_partition import (
        build_bell_shard_plan,
        partitioned_bell_conv,
    )
    from dstagnn_drought_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 4)
    N, BS, K, C, T, dm, dk = 30, 8, 3, 4, 6, 16, 8
    A = local_graph(N)
    bell = block_ell_from_adjacency(A, block_size=BS)
    plan = build_bell_shard_plan(bell, mesh.shape["graph"])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, N, C, T)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, N, dm)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    cheb = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    adj_pa = jnp.asarray((rng.random((N, N)) < 0.3), jnp.float32)
    masks = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, 5)) * 0.1, jnp.float32)

    ref = bell_cheb_conv_with_sat_pallas(
        x, emb, bell, wq=wq, wk=wk, adj_pa=adj_pa, masks=masks,
        cheb_polys=cheb, thetas=thetas, n_heads=K, d_k=dk,
    )
    got = partitioned_bell_conv(
        mesh, emb, x, plan, adj_pa=adj_pa, masks=masks, cheb_polys=cheb,
        thetas=thetas, wq=wq, wk=wk, n_heads=K, d_k=dk,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_partitioned_bell_gradients_match():
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        bell_cheb_conv_with_sat_pallas,
    )
    from dstagnn_drought_tpu.parallel.bell_partition import (
        build_bell_shard_plan,
        partitioned_bell_conv,
    )
    from dstagnn_drought_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 4)
    N, BS, K, C, T, dm, dk = 20, 8, 2, 4, 6, 16, 8
    A = local_graph(N, seed=5)
    bell = block_ell_from_adjacency(A, block_size=BS)
    plan = build_bell_shard_plan(bell, 4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, N, C, T)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, N, dm)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    cheb = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    adj_pa = jnp.asarray((rng.random((N, N)) < 0.3), jnp.float32)
    masks = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, 5)) * 0.1, jnp.float32)

    def loss_single(emb, x, masks, thetas, wq, wk):
        return jnp.sum(bell_cheb_conv_with_sat_pallas(
            x, emb, bell, wq=wq, wk=wk, adj_pa=adj_pa, masks=masks,
            cheb_polys=cheb, thetas=thetas, n_heads=K, d_k=dk,
        ) ** 2)

    def loss_part(emb, x, masks, thetas, wq, wk):
        return jnp.sum(partitioned_bell_conv(
            mesh, emb, x, plan, adj_pa=adj_pa, masks=masks,
            cheb_polys=cheb, thetas=thetas, wq=wq, wk=wk,
            n_heads=K, d_k=dk,
        ) ** 2)

    args = (emb, x, masks, thetas, wq, wk)
    g_ref = jax.grad(loss_single, argnums=tuple(range(6)))(*args)
    g_got = jax.grad(loss_part, argnums=tuple(range(6)))(*args)
    names = ("emb", "x", "masks", "thetas", "wq", "wk")
    for a, b, name in zip(g_ref, g_got, names):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_trainer_partitioned_bell(tmp_path):
    from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
    from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
    from dstagnn_drought_tpu.training.loop import Trainer

    rng = np.random.default_rng(3)
    N, F = 24, 1  # 24/8 = 3 tiles, split over graph_axis=2
    A = local_graph(N, seed=7)
    A = np.maximum(A, A.T)
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
                        dataset_name="BELL_MESH"),
        training=TrainingConfig(
            in_channels=F, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=2, learning_rate=3e-3, sparse=True, sparse_format="bell",
            block_size=8, data_axis=2, graph_axis=4,
        ),
    ).validate()
    trainer = Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                      experiments_root=str(tmp_path))
    assert trainer.mesh is not None
    result = trainer.run()
    assert np.isfinite(result["test_loss"])

    # parity vs the single-device BELL trainer on the same data
    cfg1 = Config(
        data=cfg.data,
        training=dataclasses.replace(cfg.training, data_axis=1, graph_axis=1),
    ).validate()
    trainer1 = Trainer(cfg1, dataset=ds, adj_merge=A, adj_pa=pa,
                       experiments_root=str(tmp_path / "single"))
    result1 = trainer1.run()
    np.testing.assert_allclose(
        result["test_loss"], result1["test_loss"], rtol=2e-3
    )
