"""STGCN — the oldest heritage family (reference remnant
``model/__pycache__/stgcn.cpython-38.pyc``, SURVEY.md §2 C15; architecture is
the published IJCAI-2018 "Spatio-Temporal Graph Convolutional Networks",
re-implemented from the paper — no reference source exists).

Each ST-Conv block is the sandwich: gated temporal conv (GLU) → Chebyshev
graph conv (ReLU) → gated temporal conv → LayerNorm. The classic model
predicts a single step from the collapsed time axis; this framework's
contract is (B, N, T_pred), so the head is a per-node linear from the
remaining (C·T_rem) features to the full horizon (documented deviation).

x (B, N, F, T) → (B, N, num_for_predict). Kt=3 temporal kernels; two
ST-Conv blocks per ``nb_block`` pair are collapsed into ``nb_block`` blocks
here (each block already contains two temporal convs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dstagnn_drought_tpu.models import layers as L
from dstagnn_drought_tpu.models.dstagnn import ModelSpec
from dstagnn_drought_tpu.ops.cheb import cheb_conv
from dstagnn_drought_tpu.ops.gtu import conv2d_nchw
from dstagnn_drought_tpu.ops.graph import cheb_polynomials, scaled_laplacian
from dstagnn_drought_tpu.ops.nn import layer_norm

KT = 3  # temporal kernel width


def _glu_conv(x: jax.Array, p: dict, c_out: int) -> jax.Array:
    """Gated linear unit temporal conv with aligned residual:
    (P + x_aligned) ⊙ σ(Q). x: (B, C_in, N, T) → (B, c_out, N, T-KT+1)."""
    y = conv2d_nchw(x, p["w"], p["b"])  # (B, 2*c_out, N, T-KT+1)
    x_res = conv2d_nchw(x, p["res_w"])  # 1×1 channel alignment
    x_res = x_res[:, :, :, KT - 1 :]    # align time after the valid conv
    return (y[:, :c_out] + x_res) * jax.nn.sigmoid(y[:, c_out:])


def _init_glu(kg: L.KeyGen, c_in: int, c_out: int):
    return {
        "w": L.xavier_uniform(kg(), (2 * c_out, c_in, 1, KT)),
        "b": L.ref_uniform(kg(), (2 * c_out,)),
        "res_w": L.xavier_uniform(kg(), (c_out, c_in, 1, 1)),
    }


def init_params(key: jax.Array, spec: ModelSpec):
    kg = L.KeyGen(key)
    C_t, C_s, K = spec.nb_time_filter, spec.nb_chev_filter, spec.K
    blocks = []
    c_in, t = spec.in_channels, spec.len_input
    for _ in range(spec.nb_block):
        if t - 2 * (KT - 1) <= 0:
            break  # each block consumes 2·(KT−1) time steps
        blocks.append({
            "glu1": _init_glu(kg, c_in, C_t),
            "thetas": jnp.stack(
                [L.xavier_uniform(kg(), (C_t, C_s)) for _ in range(K)]
            ),
            "glu2": _init_glu(kg, C_s, C_t),
            "ln": L.layer_norm_params(kg, C_t),
        })
        c_in = C_t
        t -= 2 * (KT - 1)
    return {
        "blocks": blocks,
        "head": L.linear_params(kg, C_t * t, spec.num_for_predict),
    }


def apply(
    params,
    x: jax.Array,
    *,
    spec: ModelSpec,
    adj_pa=None,            # interface-compat; unused by this family
    cheb_polys: jax.Array,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    ell=None,
    bell_tiles=None,        # interface-compat; dstagnn-family only
    return_attention: bool = False,
):
    """STGCN forward: x (B, N, F, T) → (B, N, num_for_predict)."""
    if compute_dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        x = x.astype(compute_dtype)
        cheb_polys = cheb_polys.astype(compute_dtype)

    h = x.transpose(0, 2, 1, 3)  # (B, C, N, T)
    C_t, C_s = spec.nb_time_filter, spec.nb_chev_filter
    for bp in params["blocks"]:
        h = _glu_conv(h, bp["glu1"], C_t)
        g = cheb_conv(
            h.transpose(0, 2, 1, 3), cheb_polys=cheb_polys, thetas=bp["thetas"]
        )  # (B, N, C_s, T)
        h = _glu_conv(g.transpose(0, 2, 1, 3), bp["glu2"], C_t)
        h = layer_norm(
            h.transpose(0, 3, 2, 1), bp["ln"]["scale"], bp["ln"]["bias"]
        ).transpose(0, 3, 2, 1)

    B, C, N, T = h.shape
    feat = h.transpose(0, 2, 1, 3).reshape(B, N, C * T)
    out = feat @ params["head"]["w"] + params["head"]["b"]
    out = out.astype(jnp.float32)
    if return_attention:
        return out, []
    return out


def make_model(key, spec: ModelSpec, adj_merge, adj_pa):
    L_tilde = scaled_laplacian(jnp.asarray(adj_merge, jnp.float32))
    polys = cheb_polynomials(L_tilde, spec.K)
    params = init_params(key, spec)
    constants = {
        "cheb_polys": polys,
        "adj_pa": jnp.asarray(adj_pa, jnp.float32),
    }
    return params, constants
