"""Fused spatial-middle Pallas kernel vs the unfused XLA composition.

Covers forward values, every gradient (activations, pre_conv, positional
table, LayerNorm params, fused QK projection, learnable graph masks,
Chebyshev Θ), and the dropout path (same PRNG stream → identical mask).
Runs in interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.attention import spatial_attention_scores
from dstagnn_drought_tpu.ops.cheb import cheb_conv_with_sat
from dstagnn_drought_tpu.ops.nn import dropout, layer_norm
from dstagnn_drought_tpu.ops.pallas.block_spatial_fused import (
    fused_spatial_middle,
)

B, F, T, N, K, DK, D, C, CO = 3, 4, 6, 18, 3, 8, 24, 4, 5


@pytest.fixture
def tensors(rng):
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32) * 0.3
    adj = (rng.random((N, N)) < 0.3).astype(np.float32)
    return dict(
        tat=mk(B, F, T, N), x=mk(B, N, C, T),
        pre_w=mk(D, T, 1, F), pre_b=mk(D), pos=mk(N, D),
        gs=jnp.ones(D) * 1.05, bs=jnp.zeros(D) + 0.02,
        wq=mk(D, K * DK), wk=mk(D, K * DK),
        masks=mk(K, N, N), thetas=mk(K, C, CO),
    ), jnp.asarray(adj), mk(K, N, N)


def _unfused(a, adj, cheb, key=None, rate=0.0):
    x_tat = jnp.einsum("bftn,dtf->bnd", a["tat"], a["pre_w"][:, :, 0, :]) \
        + a["pre_b"]
    SEmx = layer_norm(x_tat + a["pos"][None], a["gs"], a["bs"])
    SEmx = dropout(SEmx, rate, key, key is None)
    STAt = spatial_attention_scores(
        SEmx, wq=a["wq"], wk=a["wk"], n_heads=K, d_k=DK
    )
    return cheb_conv_with_sat(
        a["x"], STAt, adj, cheb_polys=cheb, masks=a["masks"],
        thetas=a["thetas"],
    )


def _fused(a, adj, cheb, key=None, rate=0.0):
    return fused_spatial_middle(
        a["tat"], a["x"], pre_w=a["pre_w"], pre_b=a["pre_b"], pos=a["pos"],
        ln_scale=a["gs"], ln_bias=a["bs"], wq=a["wq"], wk=a["wk"],
        adj_pa=adj, masks=a["masks"], cheb_polys=cheb, thetas=a["thetas"],
        K=K, d_k=DK, dropout_rate=rate, dropout_key=key,
    )


def test_forward_matches_unfused(tensors):
    a, adj, cheb = tensors
    np.testing.assert_allclose(
        np.asarray(_fused(a, adj, cheb)), np.asarray(_unfused(a, adj, cheb)),
        atol=1e-4, rtol=1e-4,
    )


def test_gradients_match_unfused(tensors):
    a, adj, cheb = tensors
    loss = lambda fn: (lambda p: (jnp.sin(fn(p, adj, cheb)) ** 2).sum())
    g_ref = jax.grad(loss(_unfused))(a)
    g_f = jax.grad(loss(_fused))(a)
    for name in a:
        np.testing.assert_allclose(
            np.asarray(g_f[name]), np.asarray(g_ref[name]),
            atol=3e-3, rtol=3e-3, err_msg=f"grad {name}",
        )


def test_dropout_path_matches(tensors):
    a, adj, cheb = tensors
    key = jax.random.PRNGKey(7)
    np.testing.assert_allclose(
        np.asarray(_fused(a, adj, cheb, key, 0.25)),
        np.asarray(_unfused(a, adj, cheb, key, 0.25)),
        atol=1e-4, rtol=1e-4,
    )


def test_model_apply_with_fused_spatial(rng):
    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, apply, make_model

    n = 14
    spec = ModelSpec(
        num_of_vertices=n, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=3, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    A = (rng.random((n, n)) < 0.3).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((n, n)) < 0.2).astype(np.float32)
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    x = jnp.asarray(rng.normal(size=(2, n, 1, 12)), jnp.float32)
    kw = dict(spec=spec, adj_pa=consts["adj_pa"],
              cheb_polys=consts["cheb_polys"])
    ref = apply(params, x, **kw)
    got = apply(params, x, fuse_spatial=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    # training mode with dropout: same rng → same result as unfused
    key = jax.random.PRNGKey(3)
    ref_t = apply(params, x, deterministic=False, rng=key, **kw)
    got_t = apply(params, x, deterministic=False, rng=key,
                  fuse_spatial=True, **kw)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               atol=2e-4, rtol=2e-4)
