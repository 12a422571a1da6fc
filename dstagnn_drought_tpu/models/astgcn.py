"""ASTGCN / MSTGCN — the reference's heritage model families, TPU-native.

The reference repo carries these only as compiled remnants
(``model/__pycache__/ASTGCN_*.pyc``, ``MSTGCN_r.pyc`` — SURVEY.md §2 C15);
the architectures are the published AAAI-2019 "Attention Based
Spatial-Temporal Graph Convolutional Networks" family, re-implemented here
from the paper as pure-functional JAX (no reference source exists to port).

Shapes follow the framework convention: x (B, N, F, T) → (B, N, T_pred).

* **ASTGCN block**: temporal attention (B,T,T) re-weights the time axis →
  spatial attention (B,N,N) modulates a K-order Chebyshev graph conv →
  width-3 temporal conv (padded, stride ``time_strides``) → 1×1 residual
  conv → ReLU → LayerNorm over channels.
* **MSTGCN block**: the same block with both attentions removed (plain
  Chebyshev conv) — exposed as the ``mstgcn`` family.

All matmuls are batched einsums (MXU-shaped); the per-timestep Python loops
of typical torch implementations are fully vectorized.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dstagnn_drought_tpu.models import layers as L
from dstagnn_drought_tpu.models.dstagnn import ModelSpec
from dstagnn_drought_tpu.ops.cheb import cheb_conv
from dstagnn_drought_tpu.ops.gtu import conv2d_nchw
from dstagnn_drought_tpu.ops.graph import cheb_polynomials, scaled_laplacian
from dstagnn_drought_tpu.ops.nn import layer_norm


# ---------------------------------------------------------------------------
# attention ops
# ---------------------------------------------------------------------------

def temporal_attention_matrix(x: jax.Array, p: dict) -> jax.Array:
    """(B, T, T) softmax-normalized temporal attention.

    E = Ve · σ((xᵀU1)U2 · (U3 x) + be), softmax over the source-time axis.
    x: (B, N, F, T).
    """
    lhs = jnp.einsum("bnft,n,fm->btm", x, p["u1"], p["u2"])  # (B, T, N)
    rhs = jnp.einsum("f,bnft->bnt", p["u3"], x)              # (B, N, T)
    prod = jnp.einsum("btn,bnu->btu", lhs, rhs)              # (B, T, T)
    e = jnp.einsum("tu,buv->btv", p["ve"], jax.nn.sigmoid(prod + p["be"]))
    return jax.nn.softmax(e, axis=1)


def spatial_attention_matrix(x: jax.Array, p: dict) -> jax.Array:
    """(B, N, N) softmax-normalized spatial attention.

    S = Vs · σ((x W1)W2 · (W3 x)ᵀ + bs), softmax over the source-node axis.
    x: (B, N, F, T).
    """
    lhs = jnp.einsum("bnft,t,fu->bnu", x, p["w1"], p["w2"])  # (B, N, T)
    rhs = jnp.einsum("f,bmft->btm", p["w3"], x)              # (B, T, N)
    prod = jnp.einsum("bnt,btm->bnm", lhs, rhs)              # (B, N, N)
    s = jnp.einsum("nm,bmj->bnj", p["vs"], jax.nn.sigmoid(prod + p["bs"]))
    return jax.nn.softmax(s, axis=1)


def cheb_conv_with_at(
    x: jax.Array, spatial_at: jax.Array, cheb_polys: jax.Array, thetas: jax.Array
) -> jax.Array:
    """Chebyshev conv modulated by one shared (B, N, N) attention map:
    out_j = ReLU(Σ_k ((T_k ⊙ S)ᵀ x) Θ_k). x: (B, N, C, T) → (B, N, C_out, T)."""
    B, N, C, T = x.shape
    A = cheb_polys[None] * spatial_at[:, None]  # (B, K, N, N)
    xm = x.reshape(B, N, C * T)
    agg = jnp.einsum("bkij,bim->bkjm", A, xm).reshape(B, A.shape[1], N, C, T)
    return jax.nn.relu(jnp.einsum("bkjct,kco->bjot", agg, thetas))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_block(
    kg: L.KeyGen, spec: ModelSpec, in_channels: int, t_in: int, *, attention: bool
):
    N, K = spec.num_of_vertices, spec.K
    C_s, C_t = spec.nb_chev_filter, spec.nb_time_filter
    p = {}
    if attention:
        p["tat"] = {
            "u1": L.ref_uniform(kg(), (N,)),
            "u2": L.xavier_uniform(kg(), (in_channels, N)),
            "u3": L.ref_uniform(kg(), (in_channels,)),
            "be": L.xavier_uniform(kg(), (t_in, t_in)),
            "ve": L.xavier_uniform(kg(), (t_in, t_in)),
        }
        p["sat"] = {
            "w1": L.ref_uniform(kg(), (t_in,)),
            "w2": L.xavier_uniform(kg(), (in_channels, t_in)),
            "w3": L.ref_uniform(kg(), (in_channels,)),
            "bs": L.xavier_uniform(kg(), (N, N)),
            "vs": L.xavier_uniform(kg(), (N, N)),
        }
    p["thetas"] = jnp.stack(
        [L.xavier_uniform(kg(), (in_channels, C_s)) for _ in range(K)]
    )
    p["time_conv"] = L.conv2d_params(kg, C_t, C_s, 1, 3)
    p["residual_conv"] = L.conv2d_params(kg, C_t, in_channels, 1, 1)
    p["ln"] = L.layer_norm_params(kg, C_t)
    return p


def init_params(key: jax.Array, spec: ModelSpec, *, attention: bool = True):
    kg = L.KeyGen(key)
    blocks = []
    c_in, t_in = spec.in_channels, spec.len_input
    for i in range(spec.nb_block):
        blocks.append(_init_block(kg, spec, c_in, t_in, attention=attention))
        c_in = spec.nb_time_filter
        if i == 0:
            t_in = t_in // spec.time_strides
    # final conv collapses channels at each time step; kernel (1, C_t)
    t_out = spec.len_input // spec.time_strides
    return {
        "blocks": blocks,
        "final_conv": L.conv2d_params(
            kg, spec.num_for_predict, t_out, 1, spec.nb_time_filter
        ),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _block_apply(p, x, spec: ModelSpec, *, stride: int, attention: bool):
    B, N, C, T = x.shape
    if attention:
        e_norm = temporal_attention_matrix(x, p["tat"])
        x_tat = jnp.einsum("bnct,btu->bncu", x, e_norm)
        s_norm = spatial_attention_matrix(x_tat, p["sat"])
        gcn = cheb_conv_with_at(x_tat, s_norm, p["_cheb"], p["thetas"])
    else:
        gcn = cheb_conv(x, cheb_polys=p["_cheb"], thetas=p["thetas"])

    # temporal conv, padding (0,1) → width preserved before stride
    g = gcn.transpose(0, 2, 1, 3)  # (B, C_s, N, T)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (1, 1)))
    time_out = conv2d_nchw(g, p["time_conv"]["w"], p["time_conv"]["b"],
                           stride=(1, stride))
    res = conv2d_nchw(x.transpose(0, 2, 1, 3), p["residual_conv"]["w"],
                      p["residual_conv"]["b"], stride=(1, stride))
    y = jax.nn.relu(res + time_out)  # (B, C_t, N, T')
    y = layer_norm(y.transpose(0, 3, 2, 1), p["ln"]["scale"], p["ln"]["bias"])
    return y.transpose(0, 2, 3, 1)  # (B, N, C_t, T')


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
    use_pallas: bool = False,   # dense family — no sparse/Pallas path
    ell=None,
    bell_tiles=None,        # interface-compat; dstagnn-family only
    return_attention: bool = False,
    attention: bool = True,
):
    """ASTGCN forward: x (B, N, F, T) → (B, N, num_for_predict)."""
    if compute_dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        x = x.astype(compute_dtype)
        cheb_polys = cheb_polys.astype(compute_dtype)

    for i, bp in enumerate(params["blocks"]):
        bp = dict(bp, _cheb=cheb_polys)
        stride = spec.time_strides if i == 0 else 1
        x = _block_apply(bp, x, spec, stride=stride, attention=attention)

    # final conv: (B, T', N, C_t) → (B, T_pred, N, 1) → (B, N, T_pred)
    out = conv2d_nchw(
        x.transpose(0, 3, 1, 2),
        params["final_conv"]["w"],
        params["final_conv"]["b"],
    )[:, :, :, -1]
    out = out.transpose(0, 2, 1).astype(jnp.float32)
    if return_attention:
        return out, []
    return out


def make_model(key, spec: ModelSpec, adj_merge, adj_pa, *, attention: bool = True):
    """(params, constants) with the standard framework factory signature."""
    L_tilde = scaled_laplacian(jnp.asarray(adj_merge, jnp.float32))
    polys = cheb_polynomials(L_tilde, spec.K)
    params = init_params(key, spec, attention=attention)
    constants = {
        "cheb_polys": polys,
        "adj_pa": jnp.asarray(adj_pa, jnp.float32),
    }
    return params, constants
