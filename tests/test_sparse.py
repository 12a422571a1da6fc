"""Sparse ELL path vs dense masked-softmax oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from dstagnn_drought_tpu.ops.sparse import (
    EllGraph,
    dense_reference_masked,
    ell_from_adjacency,
    gather_edge_values,
    sparse_cheb_conv_with_sat,
    sparse_spatial_attention_scores,
)


def random_graph(rng, N=20, density=0.15):
    A = (rng.random((N, N)) < density).astype(np.float32)
    np.fill_diagonal(A, 0)
    return A


def test_ell_roundtrip(rng):
    A = random_graph(rng)
    ell = ell_from_adjacency(A)
    N = A.shape[0]
    # every true edge (i -> target j) present exactly once
    dense_back = np.zeros((N, N))
    idx = np.asarray(ell.indices)
    msk = np.asarray(ell.mask)
    for j in range(N):
        for e in range(ell.max_degree):
            if msk[j, e]:
                dense_back[idx[j, e], j] += 1
    pattern = (A != 0) | np.eye(N, dtype=bool)
    np.testing.assert_array_equal(dense_back, pattern.astype(float))
    # padding points at the target itself
    assert np.all(idx[~msk] == np.nonzero(~msk)[0])


def test_gather_edge_values(rng):
    A = random_graph(rng, N=12)
    ell = ell_from_adjacency(A)
    dense = rng.normal(size=(3, 12, 12)).astype(np.float32)
    vals = np.asarray(gather_edge_values(jnp.asarray(dense), ell))
    idx = np.asarray(ell.indices)
    for j in (0, 5, 11):
        for e in range(ell.max_degree):
            assert vals[1, j, e] == dense[1, idx[j, e], j]


def test_sddmm_matches_dense_at_edges(rng):
    from dstagnn_drought_tpu.ops.attention import spatial_attention_scores

    N, d_model, K, dk = 15, 16, 3, 8
    A = random_graph(rng, N)
    ell = ell_from_adjacency(A)
    x = jnp.asarray(rng.normal(size=(2, N, d_model)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32) * 0.2
    wk = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32) * 0.2

    dense = spatial_attention_scores(x, wq=wq, wk=wk, n_heads=K, d_k=dk)
    sparse = sparse_spatial_attention_scores(x, ell, wq=wq, wk=wk, n_heads=K, d_k=dk)
    dense_at_edges = gather_edge_values(dense, ell)
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense_at_edges), atol=1e-5
    )


def test_sparse_conv_matches_masked_dense(rng):
    from dstagnn_drought_tpu.ops.attention import spatial_attention_scores
    from dstagnn_drought_tpu.ops.graph import cheb_polynomials, scaled_laplacian

    N, C, T, K, dk, d_model = 18, 4, 6, 3, 8, 16
    A = random_graph(rng, N, density=0.2)
    A = np.maximum(A, A.T)  # symmetric like the binarized STAG
    A[0, 1] = A[1, 0] = 1
    ell = ell_from_adjacency(A)

    # elementwise cheb recurrence → pattern(L̃) ⊆ pattern(A) ∪ I (exactness)
    Lt = scaled_laplacian(A)
    polys = cheb_polynomials(Lt, K)
    pattern = (A != 0) | np.eye(N, dtype=bool)
    assert np.all((np.asarray(polys) != 0) <= pattern[None])

    x = jnp.asarray(rng.normal(size=(2, N, C, T)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, N, d_model)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32) * 0.2
    wk = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32) * 0.2
    masks = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    adj_pa = jnp.asarray((rng.random((N, N)) < 0.3), jnp.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, 5)), jnp.float32) * 0.2
    bias = adj_pa[None] * masks

    dense_scores = spatial_attention_scores(emb, wq=wq, wk=wk, n_heads=K, d_k=dk)
    expected = dense_reference_masked(
        x, dense_scores, jnp.asarray(A),
        cheb_polys=polys, bias=bias, thetas=thetas,
    )

    edge_scores = sparse_spatial_attention_scores(
        emb, ell, wq=wq, wk=wk, n_heads=K, d_k=dk
    )
    got = sparse_cheb_conv_with_sat(
        x, edge_scores, ell,
        cheb_edges=gather_edge_values(polys, ell),
        bias_edges=gather_edge_values(bias, ell),
        thetas=thetas,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-4, rtol=2e-4
    )


def test_sparse_conv_grads_finite(rng):
    N, C, T, K, dk, d_model = 10, 2, 6, 2, 4, 8
    A = random_graph(rng, N, density=0.3)
    ell = ell_from_adjacency(A)
    x = jnp.asarray(rng.normal(size=(1, N, C, T)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, N, d_model)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(d_model, K * dk)), jnp.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, 3)), jnp.float32)
    cheb_e = jnp.asarray(rng.normal(size=(K, N, ell.max_degree)), jnp.float32)
    bias_e = jnp.asarray(rng.normal(size=(K, N, ell.max_degree)), jnp.float32)

    def loss(wq):
        s = sparse_spatial_attention_scores(emb, ell, wq=wq, wk=wq, n_heads=K, d_k=dk)
        out = sparse_cheb_conv_with_sat(
            x, s, ell, cheb_edges=cheb_e, bias_edges=bias_e, thetas=thetas
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(wq)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_ell_conv_scan_path_matches_gather(rng, monkeypatch):
    """Above the gather-size limit the aggregation scans over edge slots —
    numerically identical to the one-shot gather path."""
    import dstagnn_drought_tpu.ops.sparse as sp

    N, K, C, T, dm, dk = 18, 2, 3, 5, 8, 4
    A = (rng.random((N, N)) < 0.3).astype(np.float32)
    ell = sp.ell_from_adjacency(A)
    x = jnp.asarray(rng.normal(size=(2, N, C, T)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, N, dm)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    cheb = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, 4)) * 0.1, jnp.float32)
    s = sp.sparse_spatial_attention_scores(emb, ell, wq=wq, wk=wk,
                                           n_heads=K, d_k=dk)
    kw = dict(cheb_edges=sp.gather_edge_values(cheb, ell),
              bias_edges=sp.gather_edge_values(bias, ell), thetas=thetas)
    ref = sp.sparse_cheb_conv_with_sat(x, s, ell, **kw)
    monkeypatch.setattr(sp, "_GATHER_BYTES_LIMIT", 0)
    got = sp.sparse_cheb_conv_with_sat(x, s, ell, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
