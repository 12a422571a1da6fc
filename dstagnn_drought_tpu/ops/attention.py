"""Attention primitives of the DSTAGNN family, as pure JAX functions.

Two attention flavours (reference: model/DSTAGNN_my.py:8-100):

  * **Temporal multi-head attention with score residuals** — attends over the
    time axis; the "embedding dim" is the number of vertices N (d_model = N,
    reference :210). The raw pre-softmax scores (with the previous block's
    scores added) are threaded to the next block (:37, :253, :273-275).

    Reference quirk replicated exactly: the softmax is over **axis 3 of the
    5-D (B, F, H, T_q, T_k) score tensor — the query axis** (reference :40,
    ``F.softmax(scores, dim=3)``), while the value contraction sums over the
    key axis. Parity requires normalizing over T_q, not T_k.

  * **Spatial attention scores** — Q/K projections only; emits raw
    (B, K, N, N) score maps (one "head" per Chebyshev order), no softmax and
    no value matmul (reference :8-22, :44-67). The softmax happens later,
    inside the attention-modulated Chebyshev convolution, over the
    source-node axis.

All contractions use einsum so XLA maps them onto the MXU as large batched
matmuls; no Python loops over heads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dstagnn_drought_tpu.ops.nn import layer_norm


def temporal_attention(
    x: jax.Array,
    res_att: jax.Array | float,
    *,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    wo: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    n_heads: int,
    d_k: int,
    d_v: int,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Temporal MHA with pre-softmax score residual.

    Args:
      x: (B, F, T, N) — tokens along T, token dim N (= d_model).
      res_att: previous block's raw scores (B, F, H, T, T), or 0.0 for block 1.
      wq/wk: (N, H*d_k), wv: (N, H*d_v), wo: (H*d_v, N) — no biases
        (reference :78-81, bias=False).
      mask: optional boolean (T, T) or broadcastable; True positions are
        filled with -1e9 pre-softmax (reference :39).

    Returns:
      (out, scores): out (B, F, T, N) after out-proj + residual + LayerNorm;
      scores (B, F, H, T, T) raw (pre-softmax, incl. res_att) for threading.
    """
    B, F, T, N = x.shape
    # One fused QKV projection: a single (N, H·(2d_k+d_v)) matmul instead of
    # three skinny ones — fewer dispatches, better MXU lane utilization, and
    # one fused dW matmul in the backward (the concat of the small weight
    # matrices is constant-folded per step). Parameters stay separate for
    # reference state_dict parity.
    qkv = jnp.einsum(
        "bftn,nh->bfth", x, jnp.concatenate([wq, wk, wv], axis=1)
    )
    q, k, v = (
        qkv[..., : n_heads * d_k].reshape(B, F, T, n_heads, d_k),
        qkv[..., n_heads * d_k : 2 * n_heads * d_k].reshape(B, F, T, n_heads, d_k),
        qkv[..., 2 * n_heads * d_k :].reshape(B, F, T, n_heads, d_v),
    )

    # (B, F, H, T_q, T_k)
    scores = jnp.einsum("bfqhd,bfkhd->bfhqk", q, k) / jnp.sqrt(
        jnp.asarray(d_k, x.dtype)
    )
    scores = scores + res_att
    if mask is not None:
        scores = jnp.where(mask, jnp.asarray(-1e9, scores.dtype), scores)

    # Reference quirk: softmax over the QUERY axis (dim=3 of the 5-D tensor,
    # model/DSTAGNN_my.py:40), contraction over the key axis.
    attn = jax.nn.softmax(scores, axis=3)
    context = jnp.einsum("bfhqk,bfkhd->bfqhd", attn, v).reshape(
        B, F, T, n_heads * d_v
    )
    out = jnp.einsum("bfth,hn->bftn", context, wo)
    out = layer_norm(out + x, ln_scale, ln_bias)
    return out, scores


def spatial_attention_scores(
    x: jax.Array,
    *,
    wq: jax.Array,
    wk: jax.Array,
    n_heads: int,
    d_k: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Raw spatial attention score maps (B, K, N, N).

    Args:
      x: (B, N, d_model) node embeddings.
      wq/wk: (d_model, K*d_k), no bias (reference :52-53).

    One head per Chebyshev order; no softmax here (reference :19-22).
    """
    B, N, _ = x.shape
    # Fused Q‖K projection — one (d_model, 2·K·d_k) matmul (see the temporal
    # attention note); this matmul pair is the single most expensive op pair
    # in the train-step profile (benchmarks/op_profile.py).
    qk = jnp.einsum("bnd,dh->bnh", x, jnp.concatenate([wq, wk], axis=1))
    q = qk[..., : n_heads * d_k].reshape(B, N, n_heads, d_k)
    k = qk[..., n_heads * d_k :].reshape(B, N, n_heads, d_k)
    scores = jnp.einsum("bihd,bjhd->bhij", q, k) / jnp.sqrt(jnp.asarray(d_k, x.dtype))
    if mask is not None:
        scores = jnp.where(mask, jnp.asarray(-1e9, scores.dtype), scores)
    return scores
