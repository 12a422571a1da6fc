"""Spectral graph operators, TPU-native.

Re-designs the reference's spectral helpers (reference: lib/utils.py:148-203,
duplicated in lib/utils1.py) as pure JAX:

  * ``scaled_laplacian`` — L̃ = 2L/λ_max − I. The reference computes λ_max with
    ``scipy.sparse.linalg.eigs(L, k=1, which='LR')`` on the host
    (lib/utils.py:168), a CPU-only hot spot. Here λ_max comes from on-device
    power iteration: the combinatorial Laplacian of the (symmetrized, binary)
    graphs this framework consumes is symmetric PSD, so the dominant
    eigenvalue in magnitude *is* the largest real eigenvalue.

  * ``cheb_polynomials`` — T_0..T_{K-1}. NOTE the reference recurrence is
    **elementwise**: ``2 * L_tilde * T_{k-1} - T_{k-2}`` on numpy arrays
    (lib/utils.py:194), i.e. Hadamard product, not a matrix polynomial. This is
    a long-standing quirk inherited from the ASTGCN codebase. We replicate it
    exactly (``matmul=False``) for parity and expose the mathematically
    conventional matrix recurrence behind ``matmul=True``.

  * ``laplacian`` — the legacy 8-variant Laplacian factory
    (lib/utils.py:199-291), covering the variants the STGCN-era code used.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_iters",))
def power_iteration_lambda_max(M: jax.Array, num_iters: int = 200) -> jax.Array:
    """Dominant eigenvalue of a symmetric matrix via power iteration.

    Deterministic start vector (ones) keeps this reproducible across runs and
    devices. For a symmetric PSD matrix this equals the largest eigenvalue,
    matching scipy ``eigs(k=1, which='LR')`` as used by the reference
    (lib/utils.py:168).
    """
    n = M.shape[0]
    # Generic deterministic start vector. NOT the ones vector: for a graph
    # Laplacian that is exactly the null eigenvector (zero row sums) and
    # power iteration would stall at 0.
    v0 = jax.random.normal(jax.random.PRNGKey(0), (n,), dtype=M.dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        w = M @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, num_iters, body, v0)
    return v @ (M @ v)


def scaled_laplacian(W: jax.Array, num_iters: int = 200) -> jax.Array:
    """L̃ = 2(D − W)/λ_max − I for a symmetric adjacency W.

    Matches reference lib/utils.py:148-170 numerically (λ_max via power
    iteration instead of host-side scipy eigs).
    """
    W = jnp.asarray(W, jnp.float32)
    if W.ndim != 2 or W.shape[0] != W.shape[1]:
        raise ValueError(f"adjacency must be square, got {W.shape}")
    D = jnp.diag(W.sum(axis=1))
    L = D - W
    lam = power_iteration_lambda_max(L, num_iters=num_iters)
    n = W.shape[0]
    return (2.0 * L) / lam - jnp.eye(n, dtype=W.dtype)


def cheb_polynomials(L_tilde: jax.Array, K: int, matmul: bool = False) -> jax.Array:
    """Stack of Chebyshev "polynomials" T_0..T_{K-1}, shape (K, N, N).

    ``matmul=False`` (default) replicates the reference's **elementwise**
    recurrence (lib/utils.py:191-196); ``matmul=True`` gives the conventional
    matrix recurrence T_k = 2 L̃ T_{k-1} − T_{k-2}.
    """
    L_tilde = jnp.asarray(L_tilde, jnp.float32)
    n = L_tilde.shape[0]
    polys = [jnp.eye(n, dtype=L_tilde.dtype)]
    if K > 1:
        polys.append(L_tilde)
    for _ in range(2, K):
        if matmul:
            nxt = 2.0 * (L_tilde @ polys[-1]) - polys[-2]
        else:
            nxt = 2.0 * L_tilde * polys[-1] - polys[-2]
        polys.append(nxt)
    return jnp.stack(polys[:K], axis=0)


def laplacian(adj: jax.Array, kind: str = "sym_normd_lap_mat") -> jax.Array:
    """Legacy Laplacian-variant factory (reference lib/utils.py:199-291).

    Supported kinds: id_mat, com_lap_mat, sym_normd_lap_mat,
    wid_sym_normd_lap_mat, hat_sym_normd_lap_mat, rw_normd_lap_mat,
    wid_rw_normd_lap_mat, hat_rw_normd_lap_mat.
    """
    A = jnp.asarray(adj, jnp.float32)
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)
    deg = A.sum(axis=1)
    if kind == "id_mat":
        return I
    if kind == "com_lap_mat":
        return jnp.diag(deg) - A

    if kind in ("sym_normd_lap_mat", "wid_sym_normd_lap_mat", "hat_sym_normd_lap_mat"):
        d_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)
        sym = I - (d_inv_sqrt[:, None] * A) * d_inv_sqrt[None, :]
        if kind == "sym_normd_lap_mat":
            return sym
        if kind == "wid_sym_normd_lap_mat":
            lam = power_iteration_lambda_max(sym)
            return 2.0 * sym / lam - I
        wd = deg + 1.0
        wd_inv_sqrt = jax.lax.rsqrt(wd)
        return (wd_inv_sqrt[:, None] * (A + I)) * wd_inv_sqrt[None, :]

    if kind in ("rw_normd_lap_mat", "wid_rw_normd_lap_mat", "hat_rw_normd_lap_mat"):
        d_inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-30), 0.0)
        rw = I - d_inv[:, None] * A
        if kind == "rw_normd_lap_mat":
            return rw
        if kind == "wid_rw_normd_lap_mat":
            lam = power_iteration_lambda_max(rw)
            return 2.0 * rw / lam - I
        wd_inv = 1.0 / (deg + 1.0)
        return wd_inv[:, None] * (A + I)

    raise ValueError(f"unknown laplacian kind {kind!r}")
