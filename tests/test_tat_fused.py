"""Fused temporal-attention Pallas kernel vs the XLA composition.

Forward values, raw-score outputs, and ALL gradients (inputs, weights,
LayerNorm params, positional table, res_att) must match the unfused path
(ops/attention.py + ops/nn.py). Runs in interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.attention import temporal_attention
from dstagnn_drought_tpu.ops.nn import layer_norm
from dstagnn_drought_tpu.ops.pallas.tat_fused import fused_temporal_attention

B, F, T, N, H, DK, DV = 2, 3, 6, 20, 2, 8, 8


@pytest.fixture
def tensors(rng):
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32) * 0.3
    return dict(
        x=mk(B, F, T, N), pos=mk(T, N),
        g0=jnp.ones(N) * 1.1, b0=jnp.zeros(N) + 0.05,
        wq=mk(N, H * DK), wk=mk(N, H * DK), wv=mk(N, H * DV),
        wo=mk(H * DV, N),
        g1=jnp.ones(N) * 0.9, b1=jnp.zeros(N) - 0.02,
        res=mk(B, F, H, T, T),
    )


def _ref(a, embed):
    te = layer_norm(a["x"] + a["pos"][None, None], a["g0"], a["b0"]) if embed \
        else a["x"]
    return temporal_attention(
        te, a["res"], wq=a["wq"], wk=a["wk"], wv=a["wv"], wo=a["wo"],
        ln_scale=a["g1"], ln_bias=a["b1"], n_heads=H, d_k=DK, d_v=DV,
    )


def _fused(a, embed):
    return fused_temporal_attention(
        a["x"], a["res"],
        pos=a["pos"] if embed else None,
        ln0_scale=a["g0"] if embed else None,
        ln0_bias=a["b0"] if embed else None,
        wq=a["wq"], wk=a["wk"], wv=a["wv"], wo=a["wo"],
        ln_scale=a["g1"], ln_bias=a["b1"],
        n_heads=H, d_k=DK, d_v=DV, block_rows=4,
    )


@pytest.mark.parametrize("embed", [True, False])
def test_forward_matches_unfused(tensors, embed):
    o_ref, s_ref = _ref(tensors, embed)
    o_f, s_f = _fused(tensors, embed)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("embed", [True, False])
def test_gradients_match_unfused(tensors, embed):
    def loss(fn, a):
        o, s = fn(a, embed)
        return (o ** 2).sum() + jnp.sin(s).sum()

    g_ref = jax.grad(lambda a: loss(_ref, a))(tensors)
    g_f = jax.grad(lambda a: loss(_fused, a))(tensors)
    for name in tensors:
        np.testing.assert_allclose(
            np.asarray(g_f[name]), np.asarray(g_ref[name]),
            atol=2e-3, rtol=2e-3, err_msg=f"grad {name} (embed={embed})",
        )


def test_scalar_res_att_block1(tensors):
    a = tensors
    te = layer_norm(a["x"] + a["pos"][None, None], a["g0"], a["b0"])
    o_ref, s_ref = temporal_attention(
        te, 0.0, wq=a["wq"], wk=a["wk"], wv=a["wv"], wo=a["wo"],
        ln_scale=a["g1"], ln_bias=a["b1"], n_heads=H, d_k=DK, d_v=DV,
    )
    o_f, s_f = fused_temporal_attention(
        a["x"], jnp.zeros(()), pos=a["pos"], ln0_scale=a["g0"],
        ln0_bias=a["b0"], wq=a["wq"], wk=a["wk"], wv=a["wv"], wo=a["wo"],
        ln_scale=a["g1"], ln_bias=a["b1"], n_heads=H, d_k=DK, d_v=DV,
        block_rows=4,
    )
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref),
                               atol=1e-4, rtol=1e-4)


def test_model_apply_with_fused_tat(rng):
    """Full model forward with fuse_tat=True matches the default path."""
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
    got = apply(params, x, fuse_tat=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
