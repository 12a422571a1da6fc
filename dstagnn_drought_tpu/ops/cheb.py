"""Attention-modulated K-order Chebyshev graph convolution.

This is the framework's hot op — the reference implements it as a T×K Python
double loop of per-timestep (N,N)×(N,C) matmuls (reference:
model/DSTAGNN_my.py:117-133). Here the whole thing is a handful of einsums so
XLA tiles it onto the MXU as large batched matmuls; a fused Pallas kernel for
the softmax+mask+aggregate pipeline lives in ``ops/pallas/cheb_sat.py``.

Semantics replicated exactly (parity traps from SURVEY.md §7.4):
  * per-order attention bias: ``STAt[:,k] + adj_pa ⊙ mask_k`` where mask_k is
    a learnable dense (N,N) parameter (reference :126);
  * softmax over the **source-node axis** (dim=1 of (B,N,N), reference :127);
  * aggregation uses the transpose: out_j = Σ_i (T_k ⊙ att)[i,j] · x_i
    (reference :130, ``T_k_with_at.permute(0,2,1).matmul(graph_signal)``);
  * sum over orders k, then ReLU over the concatenated time axis (:131-133).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cheb_attention_matrix(
    spatial_attention: jax.Array,
    adj_pa: jax.Array,
    cheb_polys: jax.Array,
    masks: jax.Array,
) -> jax.Array:
    """The modulated aggregation operator A[b,k,i,j] = T_k[i,j]·softmax_i(S).

    Args:
      spatial_attention: (B, K, N, N) raw scores from spatial attention.
      adj_pa: (N, N) binarized STRG graph (reference lib/dataloader.py:11-15).
      cheb_polys: (K, N, N) Chebyshev stack.
      masks: (K, N, N) learnable per-order graph masks.
    """
    bias = adj_pa[None, :, :] * masks  # (K, N, N)
    scores = spatial_attention + bias[None]
    att = jax.nn.softmax(scores, axis=2)  # softmax over source axis i
    return cheb_polys[None] * att  # (B, K, N, N)


def cheb_conv_with_sat(
    x: jax.Array,
    spatial_attention: jax.Array,
    adj_pa: jax.Array,
    *,
    cheb_polys: jax.Array,
    masks: jax.Array,
    thetas: jax.Array,
) -> jax.Array:
    """Attention-modulated Chebyshev graph convolution.

    Args:
      x: (B, N, C_in, T) node signals.
      spatial_attention: (B, K, N, N).
      adj_pa: (N, N).
      cheb_polys: (K, N, N).
      masks: (K, N, N) learnable.
      thetas: (K, C_in, C_out) learnable filter weights.

    Returns:
      (B, N, C_out, T) — ReLU applied.
    """
    B, N, C, T = x.shape
    A = cheb_attention_matrix(spatial_attention, adj_pa, cheb_polys, masks)
    # Aggregate sources then mix channels: one batched (N,N)@(N,C*T) matmul
    # per (b,k) on the MXU.
    xm = x.reshape(B, N, C * T)
    agg = jnp.einsum("bkij,bim->bkjm", A, xm).reshape(B, A.shape[1], N, C, T)
    out = jnp.einsum("bkjct,kco->bjot", agg, thetas)
    return jax.nn.relu(out)


def cheb_conv(x: jax.Array, *, cheb_polys: jax.Array, thetas: jax.Array) -> jax.Array:
    """Plain K-order Chebyshev conv (reference model/DSTAGNN_my.py:135-160;
    present in the reference but not wired into the shipped model)."""
    B, N, C, T = x.shape
    xm = x.reshape(B, N, C * T)
    agg = jnp.einsum("kij,bim->bkjm", cheb_polys, xm).reshape(
        B, cheb_polys.shape[0], N, C, T
    )
    out = jnp.einsum("bkjct,kco->bjot", agg, thetas)
    return jax.nn.relu(out)
