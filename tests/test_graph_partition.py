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
    build_halo_plan,
    halo_partitioned_sparse_conv,
    halo_stats,
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


def _banded_adjacency(n, radius, rng):
    """Spatially-local graph: the post-RCM STAG shape the halo targets."""
    i = np.arange(n)
    A = (np.abs(i[:, None] - i[None, :]) <= radius).astype(np.float32)
    np.fill_diagonal(A, 0)
    A *= (rng.random((n, n)) < 0.7)
    A = np.maximum(A, A.T)
    return A


def test_halo_partitioned_matches_single_device(rng):
    mesh = make_mesh(2, 4)
    g = mesh.shape["graph"]
    N, C, T, K, dk, d_model, B = 32, 4, 6, 3, 8, 16, 2
    assert N == pad_nodes_for_mesh(N, g)

    # random graph — worst case for the halo (nearly everything is boundary)
    A = (rng.random((N, N)) < 0.2).astype(np.float32)
    np.fill_diagonal(A, 0)
    ell = ell_from_adjacency(A)
    plan = build_halo_plan(ell, g)

    emb = jnp.asarray(rng.normal(size=(B, N, d_model)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, C, T)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32) * 0.2
    wk = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32) * 0.2
    thetas = jnp.asarray(rng.normal(size=(K, C, 5)), jnp.float32) * 0.2
    cheb_e = jnp.asarray(rng.normal(size=(K, N, ell.max_degree)), jnp.float32)
    bias_e = jnp.asarray(rng.normal(size=(K, N, ell.max_degree)), jnp.float32)

    scores = sparse_spatial_attention_scores(emb, ell, wq=wq, wk=wk, n_heads=K, d_k=dk)
    expected = sparse_cheb_conv_with_sat(
        x, scores, ell, cheb_edges=cheb_e, bias_edges=bias_e, thetas=thetas
    )
    got = halo_partitioned_sparse_conv(
        mesh, emb, x, plan,
        cheb_edges=cheb_e, bias_edges=bias_e, thetas=thetas,
        wq=wq, wk=wk, n_heads=K, d_k=dk,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-4, rtol=2e-4
    )


def test_halo_volume_beats_all_gather_on_banded_graph(rng):
    # banded graph, radius ≪ nloc: the halo only ships the band boundary
    N, g, radius = 256, 4, 6
    A = _banded_adjacency(N, radius, rng)
    ell = ell_from_adjacency(A)
    plan = build_halo_plan(ell, g)
    stats = halo_stats(plan)
    # each device needs ≤ radius rows from each adjacent block (padded to 8);
    # all_gather would move N - N/g = 192 rows
    assert stats["halo_width"] <= 8
    assert stats["volume_ratio"] < 0.2, stats


def test_halo_plan_remap_is_consistent(rng):
    N, g = 48, 4
    A = (rng.random((N, N)) < 0.15).astype(np.float32)
    np.fill_diagonal(A, 0)
    ell = ell_from_adjacency(A)
    plan = build_halo_plan(ell, g)
    nloc, H = plan.nloc, plan.halo_width
    idx = np.asarray(ell.indices).reshape(g, nloc, -1)
    msk = np.asarray(ell.mask).reshape(g, nloc, -1)
    for r in range(g):
        for (j, e) in zip(*np.nonzero(msk[r])):
            gsrc = idx[r, j, e]
            lsrc = plan.local_indices[r, j, e]
            if r * nloc <= gsrc < (r + 1) * nloc:
                assert lsrc == gsrc - r * nloc  # own block: identity remap
            else:
                s = gsrc // nloc
                slot = lsrc - nloc - s * H
                assert 0 <= slot < H
                # the sender's schedule ships exactly that local row to r
                assert plan.send_idx[s, r, slot] == gsrc - s * nloc


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
