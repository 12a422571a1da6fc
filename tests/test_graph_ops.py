"""Spectral graph ops vs scipy/reference golden values (SURVEY.md §4 unit)."""
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.graph import (
    cheb_polynomials,
    laplacian,
    power_iteration_lambda_max,
    scaled_laplacian,
)


def random_sym_adj(rng, n=24, density=0.2):
    A = (rng.random((n, n)) < density).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    # ensure no isolated nodes
    A[0, 1] = A[1, 0] = 1
    return A


def test_lambda_max_matches_scipy(rng):
    from scipy.sparse.linalg import eigs

    A = random_sym_adj(rng)
    L = np.diag(A.sum(1)) - A
    expected = eigs(L.astype(np.float64), k=1, which="LR")[0].real[0]
    got = float(power_iteration_lambda_max(np.asarray(L, np.float32)))
    assert abs(got - expected) / expected < 1e-4


def test_scaled_laplacian_matches_reference_formula(rng):
    from scipy.sparse.linalg import eigs

    A = random_sym_adj(rng)
    L = np.diag(A.sum(1)) - A
    lam = eigs(L.astype(np.float64), k=1, which="LR")[0].real[0]
    expected = 2 * L / lam - np.identity(A.shape[0])
    got = np.asarray(scaled_laplacian(A))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_cheb_polynomials_elementwise_recurrence(rng):
    """The reference recurrence is ELEMENTWISE (lib/utils.py:194) — verify we
    replicate that quirk, not the matrix recurrence."""
    A = random_sym_adj(rng, n=12)
    Lt = np.asarray(scaled_laplacian(A), np.float64)
    K = 4
    expected = [np.identity(12), Lt.copy()]
    for i in range(2, K):
        expected.append(2 * Lt * expected[i - 1] - expected[i - 2])
    got = np.asarray(cheb_polynomials(Lt, K))
    for k in range(K):
        np.testing.assert_allclose(got[k], expected[k], atol=1e-5)
    # and that matmul mode differs (sanity that the flag does something)
    got_mm = np.asarray(cheb_polynomials(Lt, K, matmul=True))
    assert not np.allclose(got_mm[2], got[2])


@pytest.mark.parametrize(
    "kind",
    [
        "id_mat", "com_lap_mat", "sym_normd_lap_mat", "wid_sym_normd_lap_mat",
        "hat_sym_normd_lap_mat", "rw_normd_lap_mat", "wid_rw_normd_lap_mat",
        "hat_rw_normd_lap_mat",
    ],
)
def test_laplacian_variants(rng, kind):
    A = random_sym_adj(rng, n=16)
    got = np.asarray(laplacian(A, kind), np.float64)
    n = A.shape[0]
    I = np.identity(n)
    deg = A.sum(1)
    D = np.diag(deg)
    if kind == "id_mat":
        expected = I
    elif kind == "com_lap_mat":
        expected = D - A
    elif kind in ("sym_normd_lap_mat", "wid_sym_normd_lap_mat"):
        d_is = np.diag(1 / np.sqrt(deg))
        sym = I - d_is @ A @ d_is
        if kind == "sym_normd_lap_mat":
            expected = sym
        else:
            lam = np.linalg.eigvalsh(sym).max()
            expected = 2 * sym / lam - I
    elif kind == "hat_sym_normd_lap_mat":
        wd_is = np.diag(1 / np.sqrt(deg + 1))
        expected = wd_is @ (A + I) @ wd_is
    elif kind in ("rw_normd_lap_mat", "wid_rw_normd_lap_mat"):
        rw = I - np.diag(1 / deg) @ A
        if kind == "rw_normd_lap_mat":
            expected = rw
        else:
            lam = np.linalg.eigvals(rw).real.max()
            expected = 2 * rw / lam - I
    else:
        expected = np.diag(1 / (deg + 1)) @ (A + I)
    np.testing.assert_allclose(got, expected, atol=5e-3)
