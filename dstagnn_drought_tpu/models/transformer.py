"""Temporal Transformer forecaster — the last heritage family remnant
(``model/__pycache__/Transformer_Torch.pyc``, SURVEY.md §2 C15; no source
survives in the reference, so this is a standard encoder-only temporal
transformer implemented fresh).

Per node: project the F input features of each timestep to ``d_model``, add a
learned positional embedding over T, run ``nb_block`` pre-LN encoder layers
(multi-head self-attention over the time axis + GELU MLP), then map the
flattened (T·d_model) encoding to the prediction horizon. Nodes are batch
dimensions — the graph structure is not used by this family (as in the
heritage model), which also makes it the natural strong non-graph baseline.

x (B, N, F, T) → (B, N, num_for_predict).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dstagnn_drought_tpu.models import layers as L
from dstagnn_drought_tpu.models.dstagnn import ModelSpec
from dstagnn_drought_tpu.ops.nn import dropout, layer_norm

_MLP_RATIO = 4


def _init_layer(kg: L.KeyGen, d: int, H: int, d_k: int):
    return {
        "ln1": L.layer_norm_params(kg, d),
        "wq": L.linear_params(kg, d, H * d_k, bias=False)["w"],
        "wk": L.linear_params(kg, d, H * d_k, bias=False)["w"],
        "wv": L.linear_params(kg, d, H * d_k, bias=False)["w"],
        "wo": L.linear_params(kg, H * d_k, d, bias=False)["w"],
        "ln2": L.layer_norm_params(kg, d),
        "mlp_in": L.linear_params(kg, d, _MLP_RATIO * d),
        "mlp_out": L.linear_params(kg, _MLP_RATIO * d, d),
    }


def init_params(key: jax.Array, spec: ModelSpec):
    kg = L.KeyGen(key)
    d = spec.d_model
    return {
        "in_proj": L.linear_params(kg, spec.in_channels, d),
        "pos": L.xavier_uniform(kg(), (spec.len_input, d)),
        "layers": [
            _init_layer(kg, d, spec.n_heads, spec.d_k)
            for _ in range(spec.nb_block)
        ],
        "ln_f": L.layer_norm_params(kg, d),
        "head": L.linear_params(kg, spec.len_input * d, spec.num_for_predict),
    }


def _mha(h: jax.Array, p: dict, H: int, d_k: int) -> jax.Array:
    """Self-attention over the time axis. h: (B*, T, d)."""
    BN, T, _ = h.shape
    q = (h @ p["wq"]).reshape(BN, T, H, d_k).transpose(0, 2, 1, 3)
    k = (h @ p["wk"]).reshape(BN, T, H, d_k).transpose(0, 2, 1, 3)
    v = (h @ p["wv"]).reshape(BN, T, H, d_k).transpose(0, 2, 1, 3)
    att = jax.nn.softmax(
        jnp.einsum("bhtd,bhud->bhtu", q, k) / jnp.sqrt(jnp.asarray(d_k, h.dtype)),
        axis=-1,
    )
    ctx = jnp.einsum("bhtu,bhud->bhtd", att, v)
    return ctx.transpose(0, 2, 1, 3).reshape(BN, T, H * d_k) @ p["wo"]


def apply(
    params,
    x: jax.Array,
    *,
    spec: ModelSpec,
    adj_pa=None,            # interface-compat; graph-free family
    cheb_polys=None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    ell=None,
    bell_tiles=None,        # interface-compat; dstagnn-family only
    return_attention: bool = False,
):
    """Transformer forward: x (B, N, F, T) → (B, N, num_for_predict)."""
    if compute_dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        x = x.astype(compute_dtype)

    B, N, F, T = x.shape
    h = x.transpose(0, 1, 3, 2).reshape(B * N, T, F)
    h = h @ params["in_proj"]["w"] + params["in_proj"]["b"]
    h = h + params["pos"][None]

    for lp in params["layers"]:
        if rng is not None:
            rng, k1, k2 = jax.random.split(rng, 3)
        else:
            k1 = k2 = None
        a = _mha(
            layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"]),
            lp, spec.n_heads, spec.d_k,
        )
        h = h + dropout(a, spec.dropout_rate, k1, deterministic)
        m = layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"])
        m = jax.nn.gelu(m @ lp["mlp_in"]["w"] + lp["mlp_in"]["b"])
        m = m @ lp["mlp_out"]["w"] + lp["mlp_out"]["b"]
        h = h + dropout(m, spec.dropout_rate, k2, deterministic)

    h = layer_norm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
    out = h.reshape(B * N, T * spec.d_model) @ params["head"]["w"] + params["head"]["b"]
    out = out.reshape(B, N, spec.num_for_predict).astype(jnp.float32)
    if return_attention:
        return out, []
    return out


def make_model(key, spec: ModelSpec, adj_merge, adj_pa):
    """Standard factory signature; the graph inputs only populate constants
    for interface uniformity (this family ignores them)."""
    params = init_params(key, spec)
    constants = {
        "cheb_polys": jnp.zeros((spec.K, 1, 1), jnp.float32),
        "adj_pa": jnp.asarray(adj_pa, jnp.float32),
    }
    return params, constants
