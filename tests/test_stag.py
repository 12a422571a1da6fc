"""STAG construction: Sinkhorn vs exact LP, sparsification semantics, CSV IO."""
import numpy as np
import pytest

from dstagnn_drought_tpu.data.stag import (
    fast_sta_matrix,
    generate_stag,
    sinkhorn_distance,
    sparsify,
    sta_matrix,
)


def exact_wasserstein(p, q, D):
    """Exact OT via linprog — the reference's formulation (STAG_gen.py:17-37)."""
    from scipy.optimize import linprog

    size = len(p)
    A_eq = np.zeros((2 * size, size * size))
    for i in range(size):
        A_eq[i, i * size:(i + 1) * size] = 1
    for j in range(size):
        A_eq[size + j, j::size] = 1
    b_eq = np.concatenate([p, q])
    res = linprog(D.reshape(-1), A_eq=A_eq, b_eq=b_eq, method="highs")
    return res.fun if res.success else 1.0


def test_sinkhorn_matches_exact_lp(rng):
    """SURVEY.md §7.4 hard part #2: provable agreement with the exact LP."""
    for _ in range(5):
        T = 10
        p = rng.random(T) + 0.05
        p /= p.sum()
        q = rng.random(T) + 0.05
        q /= q.sum()
        D = np.clip(rng.random((T, T)), 0, 1)
        np.fill_diagonal(D, 0.0)
        exact = exact_wasserstein(p, q, D)
        approx = float(sinkhorn_distance(
            np.asarray(p, np.float32), np.asarray(q, np.float32),
            np.asarray(D, np.float32), eps=0.005, num_iters=500,
        ))
        assert abs(approx - exact) < 0.02, (approx, exact)
        assert approx >= exact - 5e-3  # entropic cost upper-bounds exact


def test_sinkhorn_identical_marginals_zero():
    T = 8
    p = np.full(T, 1 / T, np.float32)
    D = 1 - np.eye(T, dtype=np.float32)  # zero-cost diagonal
    assert float(sinkhorn_distance(p, p, D, eps=0.005, num_iters=500)) < 1e-2


def test_sta_matrix_properties(rng):
    data = rng.normal(size=(12, 9, 2)).astype(np.float32) + 3
    sta = sta_matrix(data, block_size=16, num_iters=100)
    assert sta.shape == (9, 9)
    np.testing.assert_allclose(sta, sta.T, atol=1e-6)
    assert np.all(np.diag(sta) == 0)
    assert np.all(sta >= -1e-5)
    # identical series → (near) zero distance
    data2 = data.copy()
    data2[:, 1, :] = data2[:, 0, :]
    sta2 = sta_matrix(data2, block_size=16, num_iters=200)
    assert sta2[0, 1] < 0.02


def test_sparsify_reference_vs_similar(rng):
    sta = rng.random((10, 10)).astype(np.float32)
    sta = (sta + sta.T) / 2
    np.fill_diagonal(sta, 0)
    A_ref, R_ref = sparsify(sta, sparsity=0.2, order="reference")
    A_sim, R_sim = sparsify(sta, sparsity=0.2, order="similar")
    adj = 1 - sta + np.identity(10)
    assert A_ref.sum(1).mean() == 2  # top = int(10*0.2)
    for i in range(10):
        ref_rows = np.where(A_ref[i])[0]
        # reference order: the SMALLEST adj entries (STAG_gen.py:113-116)
        assert set(ref_rows) == set(np.argsort(adj[i], kind="stable")[:2])
        sim_rows = np.where(A_sim[i])[0]
        assert set(sim_rows) == set(np.argsort(-adj[i], kind="stable")[:2])
        # weighted graph carries the adj values at selected positions
        np.testing.assert_allclose(R_ref[i, ref_rows], adj[i, ref_rows])
    # 'similar' always keeps the self loop (adj_ii = 2 is the max)
    assert np.all(np.diag(A_sim) == 1)


def test_generate_stag_csv_roundtrip(tmp_path, rng):
    from dstagnn_drought_tpu.data.adjacency import (
        load_stag_adjacency,
        load_strg_adjacency,
    )

    data = rng.normal(size=(10, 8, 2)).astype(np.float32) + 2
    sta, A, R, (a_path, r_path) = generate_stag(
        data, "TESTSET", str(tmp_path), sparsity=0.25,
        block_size=8, num_iters=50,
    )
    assert a_path.endswith("stag_025_TESTSET.csv")
    A_loaded = load_stag_adjacency(a_path)
    np.testing.assert_array_equal(A_loaded, A)
    R_loaded = load_strg_adjacency(r_path)  # loader binarizes (lib/dataloader.py:11-15)
    np.testing.assert_array_equal(R_loaded, (R > 0).astype(np.float64))
    assert (tmp_path / "stag_025_TESTSET.npy").exists()


def test_fast_sta_matrix(rng):
    data = rng.normal(size=(20, 12, 2)).astype(np.float32)
    coords = np.stack([np.arange(12), np.zeros(12)], 1).astype(np.float32)
    sta = fast_sta_matrix(data, coords, n_components=4, max_distance=3.0)
    assert sta.shape == (12, 12)
    np.testing.assert_allclose(sta, sta.T, atol=1e-6)
    # spatial gate: nodes farther than 3 apart have exactly zero entry
    assert sta[0, 5] == 0 and sta[0, 11] == 0
    assert np.any(sta[0, 1:4] != 0)
