"""Fused Pallas TPU kernel for the attention-modulated Chebyshev aggregation.

The hot op of the framework (reference hot loop: model/DSTAGNN_my.py:117-133;
ranked #1 in SURVEY.md §3.2): for every (batch b, order k)

    A[b,k] = T_k ⊙ softmax_i(STAt[b,k] + adj_pa ⊙ mask_k)      (column softmax)
    agg[b,k,j,:] = Σ_i A[b,k,i,j] · X[b,i,:]                    (Aᵀ @ X)

The XLA path (ops/cheb.py) materializes three (B,K,N,N) tensors in HBM
(biased scores, softmax, modulated A) before the matmul; this op is
bandwidth-bound at the shipped graph sizes. The kernel fuses bias-add →
column softmax → T_k-modulation → Aᵀ@X in VMEM so the only (B,K,N,N)-sized
HBM traffic is a single read of the raw scores:

  * no host-side padded copies — BlockSpecs index the raw arrays; boundary
    blocks arrive with garbage padding which the kernel masks via iota;
  * for N ≤ 1024 the T_k and bias planes sit whole in VMEM for the entire
    sweep of a Chebyshev order instead of being re-fetched per batch;
  * f32 column softmax on the VPU and a full-f32 MXU contraction (the op is
    bandwidth-bound, so the f32 matmul rate is not the limiter — measured).

Grid (K, B, J-tiles, M-tiles), m fastest: the X block index is constant
across j so Pallas re-uses the resident block; scores stream once.

Backward: custom VJP with manual einsum formulas (XLA) — softmax backward
over the source axis, recomputing the softmax from the saved inputs.
``cheb_conv_with_sat_pallas`` is a drop-in for ``ops.cheb.cheb_conv_with_sat``
and falls back to interpret mode off-TPU (used by the CPU tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
# Above this node count the (N, N) bias/T_k planes no longer fit in VMEM and
# are streamed as column stripes instead (re-fetched per batch element).
_RESIDENT_N = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(resident: bool):
    # The source (i) axis is never tiled — every block covers it whole — so
    # the softmax sees no padding garbage. Only the j/m tails of the *output*
    # carry garbage columns, and those are sliced off by the caller.
    def kernel(s_ref, bias_ref, t_ref, x_ref, o_ref):
        j = pl.program_id(2)
        tj = o_ref.shape[2]
        s = s_ref[0, 0]  # (N, TJ) f32
        if resident:
            sl = pl.ds(j * tj, tj)
            bias = bias_ref[0, :, sl]
            t_k = t_ref[0, :, sl]
        else:
            bias = bias_ref[0]
            t_k = t_ref[0]
        s = s + bias
        m = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=0, keepdims=True)
        a = t_k * (e / denom)  # (N, TJ)
        o_ref[0, 0] = jax.lax.dot_general(
            a, x_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_sat_aggregate(
    scores: jax.Array,   # (B, K, N, N) raw spatial attention, f32
    bias: jax.Array,     # (K, N, N)  = adj_pa ⊙ mask_k
    cheb: jax.Array,     # (K, N, N)  Chebyshev stack T_k
    x: jax.Array,        # (B, N, M)  node features (M = C·T flattened)
    interpret: bool = False,
) -> jax.Array:
    """agg[b,k,j,m] = Σ_i (T_k ⊙ softmax_i(scores+bias))[i,j] · x[b,i,m]."""
    B, K, N, _ = scores.shape
    M = x.shape[-1]
    TJ = min(128, _round_up(N, 8))
    TM = min(512, _round_up(M, 128))
    NJ = -(-N // TJ)
    NM = -(-M // TM)
    resident = N <= _RESIDENT_N

    # Pad the j (target-node) axis of the small per-order planes so stripe
    # slicing never runs off the edge; K·N² copy, not B·K·N².
    Jp = NJ * TJ
    bias_p = jnp.zeros((K, N, Jp), jnp.float32).at[:, :, :N].set(bias)
    cheb_p = jnp.zeros((K, N, Jp), jnp.float32).at[:, :, :N].set(cheb)

    if resident:
        bias_spec = pl.BlockSpec((1, N, Jp), lambda k, b, j, m: (k, 0, 0),
                                 memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((1, N, Jp), lambda k, b, j, m: (k, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, N, TJ), lambda k, b, j, m: (k, 0, j),
                                 memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((1, N, TJ), lambda k, b, j, m: (k, 0, j),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_kernel(resident),
        grid=(K, B, NJ, NM),
        in_specs=[
            pl.BlockSpec((1, 1, N, TJ), lambda k, b, j, m: (b, k, 0, j),
                         memory_space=pltpu.VMEM),
            bias_spec,
            t_spec,
            pl.BlockSpec((1, N, TM), lambda k, b, j, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TJ, TM), lambda k, b, j, m: (b, k, j, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, NJ * TJ, NM * TM), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N * NJ * TJ * NM * TM,
            bytes_accessed=4 * B * K * N * N + 2 * 2 * K * N * N
            + 4 * K * B * N * M + 4 * B * K * N * M,
            transcendentals=B * K * N * N,
        ),
        interpret=interpret,
    )(scores, bias_p, cheb_p, x)
    return out[:, :, :N, :M]


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _sat_aggregate(scores, bias, cheb, x):
    return fused_sat_aggregate(scores, bias, cheb, x, interpret=_auto_interpret())


def _sat_fwd(scores, bias, cheb, x):
    return _sat_aggregate(scores, bias, cheb, x), (scores, bias, cheb, x)


def _sat_bwd(res, g):
    scores, bias, cheb, x = res
    # recompute the softmax (cheap vs. saving (B,K,N,N) activations)
    sb = scores + bias[None]
    p = jax.nn.softmax(sb, axis=2)          # (B, K, i, j), softmax over i
    a = cheb[None] * p
    # dX[b,i,m] = Σ_{k,j} A[b,k,i,j] g[b,k,j,m]
    dx = jnp.einsum("bkij,bkjm->bim", a, g)
    # dA[b,k,i,j] = Σ_m x[b,i,m] g[b,k,j,m]
    da = jnp.einsum("bim,bkjm->bkij", x, g)
    dp = cheb[None] * da
    # softmax backward over axis i (per column j)
    dsb = p * (dp - jnp.sum(p * dp, axis=2, keepdims=True))
    dscores = dsb
    dbias = jnp.sum(dsb, axis=0)
    return dscores, dbias, None, dx  # cheb stack is a constant


_sat_aggregate.defvjp(_sat_fwd, _sat_bwd)


def cheb_conv_with_sat_pallas(
    x: jax.Array,
    spatial_attention: jax.Array,
    adj_pa: jax.Array,
    *,
    cheb_polys: jax.Array,
    masks: jax.Array,
    thetas: jax.Array,
) -> jax.Array:
    """Drop-in for ``ops.cheb.cheb_conv_with_sat`` with the fused kernel."""
    B, N, C, T = x.shape
    bias = adj_pa[None, :, :] * masks  # (K, N, N)
    agg = _sat_aggregate(
        spatial_attention.astype(jnp.float32),
        bias.astype(jnp.float32),
        cheb_polys.astype(jnp.float32),
        x.reshape(B, N, C * T).astype(jnp.float32),
    )
    agg = agg.reshape(B, thetas.shape[0], N, C, T)
    out = jnp.einsum("bkjct,kco->bjot", agg, thetas.astype(jnp.float32))
    return jax.nn.relu(out).astype(x.dtype)
