"""Mesh/sharding tests on the 8-virtual-device CPU backend
(SURVEY.md §4 "distributed without a cluster")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model
from dstagnn_drought_tpu.parallel.mesh import factor_devices, make_mesh
from dstagnn_drought_tpu.training.step import make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_factor_devices():
    assert factor_devices(8) == (2, 4)
    assert factor_devices(4) == (1, 4)
    assert factor_devices(2) == (1, 2)
    assert factor_devices(1) == (1, 1)
    assert factor_devices(8, graph_axis=2) == (4, 2)
    with pytest.raises(ValueError):
        factor_devices(8, graph_axis=3)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["graph"] == 8
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape == {"data": 4, "graph": 2}
    with pytest.raises(ValueError):
        make_mesh(3, 3)


def test_sharded_train_step_matches_single_device(rng):
    """DP+graph-sharded step computes the same loss as the unsharded step."""
    mesh = make_mesh(2, 4)
    N = 16
    spec = ModelSpec(
        num_of_vertices=N, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=2, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    A = (rng.random((N, N)) < 0.4).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.3).astype(np.float32)
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    optimizer = make_optimizer(1e-3)

    x = np.asarray(rng.normal(size=(8, N, 1, 12)), np.float32)
    y = np.asarray(rng.normal(size=(8, N, 4)), np.float32)
    idx = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)

    # single-device
    step1 = make_train_step(spec, optimizer)
    p1 = jax.tree.map(jnp.copy, params)
    o1 = optimizer.init(p1)
    p1, o1, _, loss1 = step1(p1, o1, key, jnp.asarray(x), jnp.asarray(y), idx, consts)

    # sharded
    repl = NamedSharding(mesh, P())
    p2 = jax.device_put(jax.tree.map(jnp.copy, params), repl)
    o2 = optimizer.init(p2)
    consts2 = jax.device_put(consts, repl)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "graph")))
    ys = jax.device_put(y, NamedSharding(mesh, P(None, "graph")))
    step2 = make_train_step(spec, optimizer, mesh=mesh, shard_nodes=True)
    p2, o2, _, loss2 = step2(p2, o2, key, xs, ys, idx, consts2)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    # updated params agree across the two shardings
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_maybe_initialize_distributed_noop(monkeypatch):
    """Without coordinator env vars (or explicit args) the single-host path
    must not attempt a rendezvous."""
    from dstagnn_drought_tpu.parallel.mesh import maybe_initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize_distributed() is False
