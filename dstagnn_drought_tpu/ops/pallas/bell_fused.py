"""Fused Pallas TPU kernel for the block-sparse (BELL) attention-modulated
Chebyshev aggregation — the sparse hot path at speed of light.

Why this kernel exists (measured, BENCH_NOTES.md): the XLA block-sparse path
materializes the gathered source blocks ``x[block_idx]`` —
(B, NJ, S, BS, C·T), ~480 MB at GAMBIA scale — plus several 6-D transposes,
and ends up *slower* than dense even though it does ~10× less math. The
dense path sits at the f32 matmul roofline, so the only way to cash in the
sparsity is to never materialize anything: this kernel streams one active
128×128 tile at a time through VMEM.

Per (batch b, head/order h, target tile j) the kernel loops over the active
source-block slots s (innermost grid dim) and maintains flash-attention
style online-softmax state in VMEM scratch:

    scores  = Q_S·K_Jᵀ/√d_k + bias_tile          (SDDMM on the MXU)
    masked  to the tile's true edge pattern (-inf elsewhere)
    m, d    running column max / denominator      (online softmax)
    acc    += (T_k ⊙ exp(scores−m))ᵀ · X_S        (SpMM on the MXU)

and writes ``acc / d`` on the last slot. The source block id for slot
(j, s) comes from scalar-prefetched ``block_idx`` feeding the BlockSpec
index maps — the DMA engine fetches exactly the needed Q/X/bias/cheb tiles.

Semantics match ``ops.block_sparse.block_sparse_cheb_conv_with_sat`` (and so
the ELL path): softmax over each target's true in-neighbourhood. Backward is
a custom VJP that recomputes the block softmax with the XLA block ops —
correct everywhere, not yet kernel-fused (the forward is the serving path).
Falls back to interpret mode off-TPU (used by the CPU tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dstagnn_drought_tpu.ops.block_sparse import BlockEllGraph

_NEG = -1e30


def _kernel(idx_ref, q_ref, k_ref, bias_ref, cheb_ref, pat_ref, x_ref,
            o_ref, m_sc, d_sc):
    s = pl.program_id(3)
    h = pl.program_id(4)
    ns = pl.num_programs(3)
    inv_sqrt_dk = 1.0 / (k_ref.shape[-1] ** 0.5)

    # Grid order (B, NJ, S, H), h innermost: the (BS, M) x block is resident
    # across all heads, and the (H, BS, M) output block is resident across
    # the whole (s, h) sweep of a target tile — the accumulator lives IN the
    # output block, so x is fetched once per active tile, not once per head.
    @pl.when(s == 0)
    def _():
        m_sc[h] = jnp.full_like(m_sc[h], _NEG)
        d_sc[h] = jnp.zeros_like(d_sc[h])
        o_ref[0, h] = jnp.zeros_like(o_ref[0, h])

    q = q_ref[0, 0]             # (BS, dk) — source block rows
    k = k_ref[0, 0]             # (BS, dk) — target tile rows
    pat = pat_ref[0, 0]         # (BS_src, BS_tgt) 0/1
    bias = bias_ref[0]          # (BS_src, BS_tgt)
    cheb = cheb_ref[0]          # (BS_src, BS_tgt)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_sqrt_dk + bias
    scores = jnp.where(pat > 0, scores, _NEG)

    mx = jnp.max(scores, axis=0, keepdims=True)       # (1, BS_tgt)
    m_prev = m_sc[h]
    m_new = jnp.maximum(m_prev, mx)
    scale = jnp.exp(m_prev - m_new)                   # (1, BS_tgt)
    e = jnp.exp(scores - m_new) * pat                 # exact zero off-pattern
    d_sc[h] = d_sc[h] * scale + jnp.sum(e, axis=0, keepdims=True)
    w = cheb * e                                      # (BS_src, BS_tgt)
    # the SpMM runs at the x dtype (bf16 under mixed-precision training —
    # double MXU rate, half the DMA); accumulation stays f32
    o_ref[0, h] = o_ref[0, h] * scale.T + jax.lax.dot_general(
        w.astype(x_ref.dtype), x_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),   # wᵀ @ x
        preferred_element_type=jnp.float32,
    )
    m_sc[h] = m_new

    @pl.when(s == ns - 1)
    def _():
        denom = jnp.maximum(d_sc[h], 1e-30).T         # (BS_tgt, 1)
        o_ref[0, h] = o_ref[0, h] / denom


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def bell_fused_forward(
    block_idx: jax.Array,  # (NJ, S) int32 — scalar-prefetched
    q: jax.Array,          # (B, H, Np, dk) Q rows (node axis padded)
    k: jax.Array,          # (B, H, Np, dk) K rows
    bias_p: jax.Array,     # (H, Np, Np) dense bias planes (padded)
    cheb_p: jax.Array,     # (H, Np, Np) dense Chebyshev planes (padded)
    pattern: jax.Array,    # (NJ, S, BS, BS) f32 0/1 (block_mask folded in)
    x: jax.Array,          # (B, Np, M) source features (padded; f32 or bf16)
    interpret: bool = False,
) -> jax.Array:
    """out[b,h,j,t,m] = Σ_s (T_k ⊙ softmax(scores))ᵀ · x over active tiles.

    Returns (B, H, NJ, BS, M) f32.
    """
    B, H, Np, dk = q.shape
    NJ, S = block_idx.shape
    BS = Np // NJ
    M = x.shape[-1]
    # Tile the feature axis so the resident (H, BS, TM) output block plus the
    # double-buffered x block stay within scoped VMEM (measured: H=3, BS=128,
    # TM=4608 OOMs the 16 MB budget).
    TM = M
    while H * BS * TM * 4 * 2 + 2 * BS * TM * 4 > 10 * 2**20:
        best = None
        for cand in range(TM - 128, 127, -128):
            if M % cand == 0:
                best = cand
                break
        if best is None:
            break
        TM = best
    NM = M // TM

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NJ, NM, S, H),
        in_specs=[
            pl.BlockSpec((1, 1, BS, dk),
                         lambda b, j, m, s, h, idx: (b, h, idx[j, s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BS, dk),
                         lambda b, j, m, s, h, idx: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BS, BS),
                         lambda b, j, m, s, h, idx: (h, idx[j, s], j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BS, BS),
                         lambda b, j, m, s, h, idx: (h, idx[j, s], j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BS, BS),
                         lambda b, j, m, s, h, idx: (j, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BS, TM),
                         lambda b, j, m, s, h, idx: (b, idx[j, s], m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, BS, TM),
                               lambda b, j, m, s, h, idx: (b, 0, j, m),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, 1, BS), jnp.float32),   # running max, per head
            pltpu.VMEM((H, 1, BS), jnp.float32),   # running denom, per head
        ],
    )
    nnz_tiles = int(NJ * S)
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Np, M), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * nnz_tiles * (BS * BS * dk + BS * BS * M),
            bytes_accessed=4 * B * H * nnz_tiles * (BS * dk + BS * BS * 2)
            + 4 * B * nnz_tiles * BS * M + 4 * B * H * NJ * BS * M,
            transcendentals=B * H * nnz_tiles * BS * BS,
        ),
        interpret=interpret,
    )(block_idx, q, k, bias_p, cheb_p, pattern, x)


# ---------------------------------------------------------------------------
# differentiable wrapper (XLA recompute backward)
# ---------------------------------------------------------------------------

def _xla_block_pieces(q, k, bias_p, cheb_p, pattern, block_idx):
    """Recompute block scores / softmax with plain XLA (backward helper)."""
    B, H, Np, dk = q.shape
    NJ, S = block_idx.shape
    BS = Np // NJ
    qb = q.reshape(B, H, NJ, BS, dk)
    kb = k.reshape(B, H, NJ, BS, dk)
    q_blocks = qb[:, :, block_idx]                     # (B, H, NJ, S, BS, dk)
    scores = jnp.einsum("bhjsad,bhjcd->bhjsac", q_blocks, kb) / jnp.sqrt(
        jnp.asarray(dk, q.dtype)
    )
    # bias/cheb tiles at (idx[j,s]·BS, j·BS); planes are dense (H, Np, Np)
    idx5 = block_idx[None, :, :, None, None].astype(jnp.int32)
    tiles = lambda plane: jnp.take_along_axis(
        plane.reshape(H, NJ, BS, NJ, BS).transpose(0, 3, 1, 2, 4), idx5, axis=2
    )  # (H, NJ, S, BS, BS)
    bias_tiles = tiles(bias_p)
    cheb_tiles = tiles(cheb_p)
    s_all = scores + bias_tiles[None]
    s_all = jnp.where(pattern[None, None] > 0, s_all, _NEG)
    # softmax over (s, a) per target column
    s2 = s_all.transpose(0, 1, 2, 5, 3, 4).reshape(B, H, NJ, BS, S * BS)
    att = jax.nn.softmax(s2, axis=-1).reshape(B, H, NJ, BS, S, BS)
    att = att.transpose(0, 1, 2, 4, 5, 3)  # (B, H, NJ, S, BS_src, BS_tgt)
    att = att * (pattern[None, None] > 0)
    return q_blocks, att, cheb_tiles


@jax.custom_vjp
def bell_aggregate(block_idx, q, k, bias_p, cheb_p, pattern, x):
    return bell_fused_forward(
        block_idx, q, k, bias_p, cheb_p, pattern, x,
        interpret=_auto_interpret(),
    )


def _fwd(block_idx, q, k, bias_p, cheb_p, pattern, x):
    out = bell_aggregate(block_idx, q, k, bias_p, cheb_p, pattern, x)
    return out, (block_idx, q, k, bias_p, cheb_p, pattern, x)


def _bwd(res, g):
    block_idx, q, k, bias_p, cheb_p, pattern, x = res
    B, H, Np, dk = q.shape
    NJ, S = block_idx.shape
    BS = Np // NJ
    M = x.shape[-1]
    q_blocks, att, cheb_tiles = _xla_block_pieces(
        q, k, bias_p, cheb_p, pattern, block_idx
    )
    A = cheb_tiles[None] * att                      # (B,H,NJ,S,BS_src,BS_tgt)
    xb = x.reshape(B, NJ, BS, M)
    x_blocks = xb[:, block_idx]                     # (B, NJ, S, BS, M)
    gb = g.reshape(B, H, NJ, BS, M)                 # (B, H, NJ, BS_tgt, M)
    dx_blocks = jnp.einsum("bhjsat,bhjtm->bjsam", A, gb)  # sum over heads
    dx = jnp.zeros_like(xb).at[:, block_idx].add(dx_blocks).reshape(B, Np, M)
    dA = jnp.einsum("bjsam,bhjtm->bhjsat", x_blocks, gb)
    datt = cheb_tiles[None] * dA
    # softmax backward per target column over the (s, a) neighbourhood
    dot = jnp.einsum("bhjsat,bhjsat->bhjt", att, datt)
    ds = att * (datt - dot[:, :, :, None, None, :])
    inv = 1.0 / jnp.sqrt(jnp.asarray(dk, q.dtype))
    kb = k.reshape(B, H, NJ, BS, dk)
    dq_blocks = jnp.einsum("bhjsat,bhjtd->bhjsad", ds, kb) * inv
    dq = (
        jnp.zeros((B, H, NJ, BS, dk), q.dtype)
        .at[:, :, block_idx].add(dq_blocks).reshape(B, H, Np, dk)
    )
    dk_ = jnp.einsum("bhjsat,bhjsad->bhjtd", ds, q_blocks).reshape(
        B, H, Np, dk
    ) * inv
    # scatter tile grads back to the dense planes
    ds_sum = ds.sum(axis=0)                          # (H, NJ, S, BS_src, BS_tgt)
    dbias_t = jnp.zeros((H, NJ, NJ, BS, BS), ds.dtype).at[
        :, jnp.arange(NJ)[:, None], block_idx
    ].add(ds_sum)                                    # (H, jt, sb, a, b)
    dbias_p = dbias_t.transpose(0, 2, 3, 1, 4).reshape(H, Np, Np)
    return None, dq, dk_, dbias_p, None, None, dx


bell_aggregate.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# model-facing wrapper
# ---------------------------------------------------------------------------

def bell_cheb_conv_with_sat_pallas(
    x: jax.Array,             # (B, N, C, T)
    emb: jax.Array,           # (B, N, d_model) spatial embeddings
    bell: BlockEllGraph,
    *,
    wq: jax.Array,
    wk: jax.Array,
    adj_pa: jax.Array,
    masks: jax.Array,
    cheb_polys: jax.Array,
    thetas: jax.Array,
    n_heads: int,
    d_k: int,
) -> jax.Array:
    """Fused SDDMM → neighbourhood softmax → modulated aggregation → Θ mix.

    Drop-in for the XLA BELL path (block scores + conv) inside the model.
    Returns (B, N, C_out, T), ReLU applied.
    """
    B, N, C, T = x.shape
    BS, NJ, NB = bell.block_size, bell.num_tiles, bell.num_tiles
    Np = bell.padded_nodes

    def pad_n(a, axis):
        extra = Np - a.shape[axis]
        if extra == 0:
            return a
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, extra)
        return jnp.pad(a, pad)

    f32 = jnp.float32
    qp = pad_n(
        jnp.einsum("bnd,dh->bnh", emb, wq).astype(f32).reshape(
            B, N, n_heads, d_k
        ), 1,
    )
    kp = pad_n(
        jnp.einsum("bnd,dh->bnh", emb, wk).astype(f32).reshape(
            B, N, n_heads, d_k
        ), 1,
    )
    q = qp.transpose(0, 2, 1, 3)   # (B, H, Np, dk)
    k = kp.transpose(0, 2, 1, 3)

    bias_p = pad_n(pad_n((adj_pa[None] * masks).astype(f32), 1), 2)
    cheb_p = pad_n(pad_n(cheb_polys.astype(f32), 1), 2)  # (H, Np, Np)
    pattern = (
        bell.pattern & bell.block_mask[:, :, None, None]
    ).astype(f32)
    # x keeps its compute dtype (bf16 halves the dominant DMA volume and
    # doubles the SpMM MXU rate; the kernel accumulates in f32)
    xm = pad_n(x.reshape(B, N, C * T), 1)                # (B, Np, M)

    agg = bell_aggregate(bell.block_idx, q, k, bias_p, cheb_p, pattern, xm)
    agg = agg[:, :, :N].reshape(B, n_heads, N, C, T)
    out = jnp.einsum("bkjct,kco->bjot", agg, thetas.astype(f32))
    return jax.nn.relu(out).astype(x.dtype)
