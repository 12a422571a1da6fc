"""Node-partitioned sparse conv vs single-device sparse path (4-way mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.sparse import (
    ell_from_adjacency,
    gather_edge_values,
    sparse_cheb_conv_with_sat,
    sparse_spatial_attention_scores,
)
from dstagnn_drought_tpu.parallel.graph_partition import (
    pad_nodes_for_mesh,
    partitioned_sparse_conv,
    shard_ell,
)
from dstagnn_drought_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_partitioned_matches_single_device(rng):
    mesh = make_mesh(2, 4)
    g = mesh.shape["graph"]
    N, C, T, K, dk, d_model, B = 24, 4, 6, 3, 8, 16, 2
    assert N == pad_nodes_for_mesh(N, g)

    A = (rng.random((N, N)) < 0.2).astype(np.float32)
    np.fill_diagonal(A, 0)
    ell = ell_from_adjacency(A)

    emb = jnp.asarray(rng.normal(size=(B, N, d_model)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, C, T)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32) * 0.2
    wk = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32) * 0.2
    thetas = jnp.asarray(rng.normal(size=(K, C, 5)), jnp.float32) * 0.2
    cheb_e = jnp.asarray(rng.normal(size=(K, N, ell.max_degree)), jnp.float32)
    bias_e = jnp.asarray(rng.normal(size=(K, N, ell.max_degree)), jnp.float32)

    # single-device reference
    scores = sparse_spatial_attention_scores(emb, ell, wq=wq, wk=wk, n_heads=K, d_k=dk)
    expected = sparse_cheb_conv_with_sat(
        x, scores, ell, cheb_edges=cheb_e, bias_edges=bias_e, thetas=thetas
    )

    got = partitioned_sparse_conv(
        mesh, emb, x, ell,
        cheb_edges=cheb_e, bias_edges=bias_e, thetas=thetas,
        wq=wq, wk=wk, n_heads=K, d_k=dk,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-4, rtol=2e-4
    )


def test_shard_ell_padding(rng):
    A = (rng.random((10, 10)) < 0.3).astype(np.float32)
    ell = ell_from_adjacency(A)
    padded = shard_ell(ell, 4)
    assert padded.num_nodes == 12
    # dummy targets aggregate nothing
    assert not np.asarray(padded.mask)[10:].any()
    np.testing.assert_array_equal(
        np.asarray(padded.indices)[:10], np.asarray(ell.indices)
    )
