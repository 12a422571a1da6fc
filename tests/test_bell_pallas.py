"""Fused BELL Pallas kernel (interpret mode on CPU): forward parity against
the XLA block-sparse path, and gradients via the custom VJP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.block_sparse import (
    block_ell_from_adjacency,
    block_sparse_cheb_conv_with_sat,
    block_sparse_spatial_attention_scores,
    gather_block_values,
)
from dstagnn_drought_tpu.ops.pallas.bell_fused import (
    bell_cheb_conv_with_sat_pallas,
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


@pytest.fixture(scope="module")
def setup():
    N, BS, K, C, T, dm, dk = 20, 8, 3, 4, 6, 16, 8
    A = local_graph(N)
    bell = block_ell_from_adjacency(A, block_size=BS)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, N, C, T)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, N, dm)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    cheb = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    adj_pa = jnp.asarray((rng.random((N, N)) < 0.3), jnp.float32)
    masks = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, 5)) * 0.1, jnp.float32)
    return dict(N=N, K=K, dk=dk, A=A, bell=bell, x=x, emb=emb, wq=wq, wk=wk,
                cheb=cheb, adj_pa=adj_pa, masks=masks, thetas=thetas)


def _xla_path(s):
    scores = block_sparse_spatial_attention_scores(
        s["emb"], s["bell"], wq=s["wq"], wk=s["wk"],
        n_heads=s["K"], d_k=s["dk"],
    )
    bias = s["adj_pa"][None] * s["masks"]
    return block_sparse_cheb_conv_with_sat(
        s["x"], scores, s["bell"],
        cheb_blocks=gather_block_values(s["cheb"], s["bell"]),
        bias_blocks=gather_block_values(bias, s["bell"]),
        thetas=s["thetas"],
    )


def _pallas_path(s):
    return bell_cheb_conv_with_sat_pallas(
        s["x"], s["emb"], s["bell"],
        wq=s["wq"], wk=s["wk"], adj_pa=s["adj_pa"], masks=s["masks"],
        cheb_polys=s["cheb"], thetas=s["thetas"],
        n_heads=s["K"], d_k=s["dk"],
    )


def test_forward_matches_xla_block_path(setup):
    out_xla = _xla_path(setup)
    out_pallas = _pallas_path(setup)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )


def test_gradients_match_xla_block_path(setup):
    s = setup

    def loss_xla(emb, x, masks, wq, wk):
        t = dict(s, emb=emb, x=x, masks=masks, wq=wq, wk=wk)
        return jnp.sum(_xla_path(t) ** 2)

    def loss_pallas(emb, x, masks, wq, wk):
        t = dict(s, emb=emb, x=x, masks=masks, wq=wq, wk=wk)
        return jnp.sum(_pallas_path(t) ** 2)

    args = (s["emb"], s["x"], s["masks"], s["wq"], s["wk"])
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_xla, g_pal, ("emb", "x", "masks", "wq", "wk")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_jit_compatible(setup):
    fn = jax.jit(lambda: _pallas_path(setup))
    out = fn()
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def setup_chunked():
    """Dense-ish random graph: every target tile touches all 6 source blocks
    → max_slots = 6 > 4 → the online-softmax chunked kernel
    (_make_kernel_chunked, n_chunks = 2) runs instead of the single-chunk
    one. This is the path every random/non-banded STAG graph takes."""
    N, BS, K, C, T, dm, dk = 48, 8, 3, 4, 6, 16, 8
    rng = np.random.default_rng(7)
    A = (rng.random((N, N)) < 0.25).astype(np.float32)
    bell = block_ell_from_adjacency(A, block_size=BS)
    assert bell.max_blocks >= 5, "fixture must force the chunked kernel"
    x = jnp.asarray(rng.normal(size=(2, N, C, T)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, N, dm)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    cheb = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    adj_pa = jnp.asarray((rng.random((N, N)) < 0.3), jnp.float32)
    masks = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, 5)) * 0.1, jnp.float32)
    return dict(N=N, K=K, dk=dk, A=A, bell=bell, x=x, emb=emb, wq=wq, wk=wk,
                cheb=cheb, adj_pa=adj_pa, masks=masks, thetas=thetas)


def test_chunked_forward_matches_xla_block_path(setup_chunked):
    out_xla = _xla_path(setup_chunked)
    out_pallas = _pallas_path(setup_chunked)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )


def test_chunked_gradients_match_xla_block_path(setup_chunked):
    s = setup_chunked

    def loss_xla(emb, x, masks, wq, wk):
        t = dict(s, emb=emb, x=x, masks=masks, wq=wq, wk=wk)
        return jnp.sum(_xla_path(t) ** 2)

    def loss_pallas(emb, x, masks, wq, wk):
        t = dict(s, emb=emb, x=x, masks=masks, wq=wq, wk=wk)
        return jnp.sum(_pallas_path(t) ** 2)

    args = (s["emb"], s["x"], s["masks"], s["wq"], s["wk"])
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_xla, g_pal, ("emb", "x", "masks", "wq", "wk")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_chunked_bf16_forward(setup_chunked):
    """bf16 activations through the chunked kernel (the mixed-precision
    config): parity vs the XLA block path run at the same dtype."""
    s = dict(setup_chunked)
    s["x"] = s["x"].astype(jnp.bfloat16)
    out_pallas = _pallas_path(s)
    assert out_pallas.dtype == jnp.bfloat16
    ref = _xla_path(dict(s, x=s["x"].astype(jnp.float32)))
    np.testing.assert_allclose(
        np.asarray(out_pallas, np.float32), np.asarray(ref),
        rtol=2e-2, atol=2e-2 * float(np.abs(np.asarray(ref)).max()),
    )


def test_model_bell_pallas_matches_bell_xla():
    """Model-level: use_pallas on the BELL path equals the XLA BELL path."""
    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, apply, make_model

    N = 20
    spec = ModelSpec(
        num_of_vertices=N, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=3, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    A = local_graph(N, seed=12)
    A = np.maximum(A, A.T)
    pa = (np.random.default_rng(13).random((N, N)) < 0.2).astype(np.float32)
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    bell = block_ell_from_adjacency(A, block_size=8)
    x = jnp.asarray(
        np.random.default_rng(14).normal(size=(2, N, 1, 12)), jnp.float32
    )
    kw = dict(spec=spec, adj_pa=consts["adj_pa"],
              cheb_polys=consts["cheb_polys"], deterministic=True, ell=bell)
    out_xla = apply(params, x, **kw)
    out_pal = apply(params, x, use_pallas=True, **kw)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )
