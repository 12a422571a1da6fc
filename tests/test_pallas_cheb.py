"""Fused Pallas cheb-attention kernel vs the XLA reference path.

Runs in Pallas interpret mode on the CPU test backend; the same code path
compiles to a real Mosaic kernel on TPU (exercised by bench/TPU runs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.cheb import cheb_conv_with_sat
from dstagnn_drought_tpu.ops.pallas.cheb_sat import (
    cheb_conv_with_sat_pallas,
    fused_sat_aggregate,
)


def _inputs(rng, B=2, K=3, N=19, C=4, T=6):
    scores = rng.normal(size=(B, K, N, N)).astype(np.float32)
    adj_pa = (rng.random((N, N)) < 0.3).astype(np.float32)
    masks = rng.normal(size=(K, N, N)).astype(np.float32)
    cheb = rng.normal(size=(K, N, N)).astype(np.float32)
    thetas = rng.normal(size=(K, C, 8)).astype(np.float32) * 0.1
    x = rng.normal(size=(B, N, C, T)).astype(np.float32)
    return scores, adj_pa, masks, cheb, thetas, x


def test_fused_aggregate_matches_xla(rng):
    scores, adj_pa, masks, cheb, thetas, x = _inputs(rng)
    B, N, C, T = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
    bias = adj_pa[None] * masks
    # XLA reference: column softmax → modulate → Aᵀ @ X
    p = jax.nn.softmax(scores + bias[None], axis=2)
    a = cheb[None] * p
    expected = np.einsum("bkij,bim->bkjm", a, x.reshape(B, N, C * T))
    got = fused_sat_aggregate(
        jnp.asarray(scores), jnp.asarray(bias), jnp.asarray(cheb),
        jnp.asarray(x.reshape(B, N, C * T)), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4, rtol=2e-4)


def test_conv_dropin_matches_dense(rng):
    scores, adj_pa, masks, cheb, thetas, x = _inputs(rng)
    dense = cheb_conv_with_sat(
        jnp.asarray(x), jnp.asarray(scores), jnp.asarray(adj_pa),
        cheb_polys=jnp.asarray(cheb), masks=jnp.asarray(masks),
        thetas=jnp.asarray(thetas),
    )
    fused = cheb_conv_with_sat_pallas(
        jnp.asarray(x), jnp.asarray(scores), jnp.asarray(adj_pa),
        cheb_polys=jnp.asarray(cheb), masks=jnp.asarray(masks),
        thetas=jnp.asarray(thetas),
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(dense), atol=2e-4, rtol=2e-4
    )


def test_gradients_match_dense(rng):
    scores, adj_pa, masks, cheb, thetas, x = _inputs(rng, B=1, K=2, N=11, C=2, T=5)

    def loss_dense(scores, masks, x):
        out = cheb_conv_with_sat(
            jnp.asarray(x), scores, jnp.asarray(adj_pa),
            cheb_polys=jnp.asarray(cheb), masks=masks, thetas=jnp.asarray(thetas),
        )
        return jnp.sum(out * out)

    def loss_fused(scores, masks, x):
        out = cheb_conv_with_sat_pallas(
            jnp.asarray(x), scores, jnp.asarray(adj_pa),
            cheb_polys=jnp.asarray(cheb), masks=masks, thetas=jnp.asarray(thetas),
        )
        return jnp.sum(out * out)

    args = (jnp.asarray(scores), jnp.asarray(masks), jnp.asarray(x))
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(*args)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    for gd, gf, name in zip(g_dense, g_fused, ("scores", "masks", "x")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gd), atol=5e-3, rtol=5e-3, err_msg=name
        )


def test_unaligned_shapes(rng):
    """N and M far from tile multiples still give exact results."""
    for N, C, T in ((7, 1, 12), (130, 3, 5), (33, 2, 9)):
        scores, adj_pa, masks, cheb, thetas, x = _inputs(
            rng, B=1, K=2, N=N, C=C, T=T
        )
        bias = adj_pa[None] * masks
        p = jax.nn.softmax(scores + bias[None], axis=2)
        a = cheb[None] * p
        expected = np.einsum("bkij,bim->bkjm", a, x.reshape(1, N, C * T))
        got = fused_sat_aggregate(
            jnp.asarray(scores), jnp.asarray(bias), jnp.asarray(cheb),
            jnp.asarray(x.reshape(1, N, C * T)), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4, rtol=2e-4)
