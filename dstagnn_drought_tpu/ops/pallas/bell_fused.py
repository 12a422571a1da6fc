"""Fused Pallas TPU kernel for the block-sparse (BELL) attention-modulated
Chebyshev aggregation — the sparse hot path at speed of light.

Why this kernel exists (measured, BENCH_NOTES.md): the XLA block-sparse path
materializes the gathered source blocks ``x[block_idx]`` —
(B, NJ, S, BS, C·T), ~480 MB at GAMBIA scale — plus several 6-D transposes,
and ends up *slower* than dense even though it does ~10× less math. The
dense path sits at the f32 matmul roofline, so the only way to cash in the
sparsity is to never materialize anything: this kernel streams one active
128×128 tile at a time through VMEM.

Design history (per-version measurements in BENCH_NOTES.md, "BELL kernel
progression"). The final design is the product of measured eliminations,
each attacking the dominant cost left by the previous one:

  * grid = (B, M-tiles, NJ) — ONE step per target tile, output block index
    is a pure grid coordinate (a scalar-driven output index defeats the
    pipeline emitter's block-residency tracking: +7 MB store/reload per
    step, measured in v3);
  * the slot loop is **statically unrolled** in chunks of ≤4 (a dynamic
    fori_loop serializes Mosaic's scheduling); slot validity is masking
    (scores → -1e30), not control flow;
  * a tile's slots are consecutive in the active list, so the pre-gathered
    q and bias+cheb slot operands arrive as ONE contiguous multi-slot DMA
    each (9 small DMAs/step measured ~30 µs of pure latency);
  * slots are folded into the SpMM contraction dim — one matmul per head
    per chunk, the f32 accumulator (VMEM scratch) is touched once;
  * the **Θ channel mix and ReLU run in the kernel epilogue**: the output
    is (B, Np, T·C_out) in the compute dtype — 3× smaller than the
    per-head (B, H, Np, M) f32 intermediate, whose XLA consumer einsum
    alone measured 3.8 ms at GAMBIA (more than the whole kernel). Two
    feature layouts (round 5): **t-major** (T blocks of C — Θ mixes within
    an M-tile) and **c-major** (C blocks of T — x enters as a plain
    reshape of the model's (B, N, C, T), the output reshapes straight to
    (B, N, Co, T), the Θ mix accumulates across channel M-tiles run as an
    internal double-buffered loop; the wrapper's ``layout="auto"`` picks
    c whenever the fused backward is active, 128 | Co·T, and the tiling
    fits VMEM at the compute dtype).

Two numerical tricks:

  * the **edge-pattern mask is folded into the bias plane** (off-pattern
    entries = -1e30) by one cheap XLA `where` before the call, so the
    kernel streams no pattern operand. Off-pattern columns of early slots
    may transiently accumulate garbage (their running max is still -1e30 so
    `exp` gives 1), but the first real edge rescales the accumulator by
    exp(-1e30 - m_real) = 0 exactly — and every real target column has a
    real edge because the graph includes self-loops
    (``BlockEllGraph.covered``; the wrapper refuses otherwise).
  * the SpMM runs at the x dtype (bf16 under mixed precision: double MXU
    rate, half DMA) with f32 accumulation.

Per slot s of target tile j the kernel computes, per head:

    scores  = Q_S·K_Jᵀ/√d_k + masked_bias_tile    (SDDMM on the MXU)
    m, d    running column max / denominator       (online softmax)
    acc    += (T_k ⊙ exp(scores−m))ᵀ · X_S         (SpMM on the MXU)

then finishes the tile with out = relu(Σ_h (acc_h/d_h) Θ_h).

Semantics match ``ops.block_sparse.block_sparse_cheb_conv_with_sat`` (and so
the ELL path): softmax over each target's true in-neighbourhood. Backward is
a custom VJP that recomputes the block softmax with XLA and scans over the
slot axis so the (B, NJ, S, BS, M) gathered source tensor (~1 GB at GAMBIA
scale) is never materialized — per-slot transients only. Shapes may be
rectangular (global sources × local targets) so the same code runs per-shard
under the node-partitioned path (parallel/bell_partition.py).
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

# c-major VMEM budget (module constant so tests can shrink it to force
# multi-M-tile grids in interpret mode)
C_VMEM_BUDGET = 12 * 2**20


def _make_kernel_single():
    """Single-chunk kernel (every tile's slots fit one chunk — the banded /
    RCM-ordered case). Grid is (batch-tile, target-tile, M-tile) with the
    M-tile innermost: the normalized modulated weights w = T_k ⊙ softmax are
    computed ONCE per target tile (at m == 0) and cached in scratch (bf16 —
    the SpMM dtype), so M-tiles redo only the SpMM and Θ mix. A batch tile
    is folded into each grid step to amortize the fixed per-step cost
    (scalar work, DMA latency, pipeline sync — measured ~8 µs).
    """

    def _kernel(start_ref, count_ref, src_ref,
                k_ref, th_ref, q_hbm, bc_hbm, x_hbm,
                o_ref,
                q_sc, bc_sc, x_sc, w_sc, sem):
        bb, j, mt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        BB, H, BS, dk = k_ref.shape[0], k_ref.shape[1], k_ref.shape[2], \
            k_ref.shape[3]
        SC, TM = x_sc.shape[0], x_sc.shape[-1]
        C, Co = th_ref.shape[-2], th_ref.shape[-1]
        nt = TM // C
        start = start_ref[j]
        count = count_ref[j]
        inv_sqrt_dk = 1.0 / (dk ** 0.5)
        window = pl.ds(start, SC)

        def xdma(u, bi):
            src = src_ref[start + u]
            return pltpu.make_async_copy(
                x_hbm.at[bb * BB + bi, pl.ds(src * BS, BS),
                         pl.ds(mt * TM, TM)],
                x_sc.at[u, bi], sem.at[u * BB + bi, 2])

        for u in range(SC):
            for bi in range(BB):
                xdma(u, bi).start()

        # weights are per-tile, not per-M-tile: build once, reuse for m > 0
        @pl.when(mt == 0)
        def _():
            bcdma = pltpu.make_async_copy(
                bc_hbm.at[window], bc_sc, sem.at[0, 0])

            def qdma(bi):
                return pltpu.make_async_copy(
                    q_hbm.at[bb * BB + bi, window], q_sc.at[bi],
                    sem.at[bi, 1])

            bcdma.start()
            for bi in range(BB):
                qdma(bi).start()
            bcdma.wait()
            for bi in range(BB):
                qdma(bi).wait()
            for bi in range(BB):
                for h in range(H):
                    k = k_ref[bi, h]               # (BS_tgt, dk) target rows
                    scores = []
                    for u in range(SC):
                        q = q_sc[bi, u, h * dk:(h + 1) * dk]  # (dk, BS_src)
                        s = jax.lax.dot_general(
                            q, k,
                            dimension_numbers=(((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) * inv_sqrt_dk + bc_sc[u, 0, h]  # -1e30 off-pattern
                        # slot validity (tail past this tile's count)
                        scores.append(jnp.where(u < count, s, _NEG))
                    mx = scores[0].max(axis=0, keepdims=True)
                    for s in scores[1:]:
                        mx = jnp.maximum(mx, s.max(axis=0, keepdims=True))
                    es = [jnp.exp(s - mx) for s in scores]
                    den = sum(e.sum(axis=0, keepdims=True) for e in es)
                    inv_d = 1.0 / jnp.maximum(den, 1e-30)   # (1, BS_tgt)
                    w_sc[bi, h] = jnp.concatenate(
                        [bc_sc[u, 1, h] * (es[u] * inv_d)
                         for u in range(SC)],
                        axis=0,
                    ).astype(w_sc.dtype)           # (SC·BS_src, BS_tgt)

        for u in range(SC):
            for bi in range(BB):
                xdma(u, bi).wait()

        for bi in range(BB):
            x_all = x_sc[:, bi].reshape(SC * BS, TM)
            out = None
            for h in range(H):
                agg = jax.lax.dot_general(
                    w_sc[bi, h], x_all,
                    dimension_numbers=(((0,), (0,)), ((), ())),   # wᵀ @ x
                    preferred_element_type=jnp.float32,
                )                                      # (BS_tgt, TM)
                # Θ mix via the transpose trick: Mosaic cannot split the
                # lane dim, so put C on the sublane axis (cheap relayouts)
                # and contract with ONE (Co, C) × (C, nt·BS) matmul.
                a2 = agg.T.reshape(nt, C, BS).transpose(1, 0, 2).reshape(
                    C, nt * BS
                )
                mix = jax.lax.dot_general(
                    th_ref[h], a2,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                      # (Co, nt·BS)
                out = mix if out is None else out + mix
            o_ref[bi] = jnp.maximum(
                out.reshape(Co, nt, BS).transpose(1, 0, 2).reshape(
                    nt * Co, BS
                ).T,
                0.0,
            ).astype(o_ref.dtype)

    return _kernel


def _make_kernel_chunked(n_chunks: int):
    """General kernel for graphs whose tiles need several slot chunks:
    online softmax across statically-unrolled chunks, f32 accumulator
    scratch, batch tile of 1. Slot validity inside a chunk is score
    masking; whole chunks are skipped with pl.when.
    """

    def _kernel(start_ref, count_ref, src_ref,
                k_ref, th_ref, q_hbm, bc_hbm, x_hbm,
                o_ref,
                q_sc, bc_sc, x_sc, acc_sc, m_sc, d_sc, sem):
        b, mt, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        H, BS, dk = k_ref.shape[1], k_ref.shape[2], k_ref.shape[3]
        SC, TM = x_sc.shape[0], x_sc.shape[-1]
        C, Co = th_ref.shape[-2], th_ref.shape[-1]
        start = start_ref[j]
        count = count_ref[j]
        inv_sqrt_dk = 1.0 / (dk ** 0.5)

        def chunk(c):
            base = c * SC
            window = pl.ds(start + base, SC)
            qdma = pltpu.make_async_copy(
                q_hbm.at[b, window], q_sc, sem.at[0, 0])
            bcdma = pltpu.make_async_copy(
                bc_hbm.at[window], bc_sc, sem.at[0, 1])

            def xdma(u):
                src = src_ref[start + base + u]
                return pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(src * BS, BS), pl.ds(mt * TM, TM)],
                    x_sc.at[u], sem.at[u, 2])

            qdma.start()
            bcdma.start()
            for u in range(SC):
                xdma(u).start()
            qdma.wait()
            bcdma.wait()
            for u in range(SC):
                xdma(u).wait()

            x_all = x_sc[:].reshape(SC * BS, TM)   # slots stacked on K dim
            for h in range(H):
                k = k_ref[0, h]                    # (BS_tgt, dk) target rows
                scores = []
                for u in range(SC):
                    q = q_sc[u, h * dk:(h + 1) * dk]       # (dk, BS_src)
                    s = jax.lax.dot_general(
                        q, k, dimension_numbers=(((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * inv_sqrt_dk + bc_sc[u, 0, h]   # -1e30 off-pattern
                    # whole-slot validity (chunk tail past the tile count)
                    scores.append(jnp.where(base + u < count, s, _NEG))
                mx = scores[0].max(axis=0, keepdims=True)
                for s in scores[1:]:
                    mx = jnp.maximum(mx, s.max(axis=0, keepdims=True))
                m_prev = m_sc[h]
                m_new = jnp.maximum(m_prev, mx)
                scale = jnp.exp(m_prev - m_new)        # (1, BS_tgt)
                es = [jnp.exp(s - m_new) for s in scores]
                d_sc[h] = d_sc[h] * scale + sum(
                    e.sum(axis=0, keepdims=True) for e in es
                )
                w = jnp.concatenate(
                    [bc_sc[u, 1, h] * es[u] for u in range(SC)], axis=0
                )                                      # (SC·BS_src, BS_tgt)
                contrib = jax.lax.dot_general(
                    w.astype(x_all.dtype), x_all,
                    dimension_numbers=(((0,), (0,)), ((), ())),   # wᵀ @ x
                    preferred_element_type=jnp.float32,
                )
                acc_sc[h] = acc_sc[h] * scale.T + contrib
                m_sc[h] = m_new

        m_sc[:] = jnp.full_like(m_sc, _NEG)
        d_sc[:] = jnp.zeros_like(d_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

        for c in range(n_chunks):
            if c == 0:
                chunk(0)                   # every tile has ≥1 slot (covered)
            else:
                pl.when(c * SC < count)(lambda c=c: chunk(c))

        # Θ mix + ReLU epilogue (transpose trick — see the single-chunk
        # kernel for why), one output write per grid step.
        nt = TM // C
        out = None
        for h in range(H):
            a = acc_sc[h] / jnp.maximum(d_sc[h], 1e-30).T   # (BS, TM)
            a2 = a.T.reshape(nt, C, BS).transpose(1, 0, 2).reshape(
                C, nt * BS
            )
            mix = jax.lax.dot_general(
                th_ref[h], a2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (Co, nt·BS)
            out = mix if out is None else out + mix
        o_ref[0] = jnp.maximum(
            out.reshape(Co, nt, BS).transpose(1, 0, 2).reshape(nt * Co, BS).T,
            0.0,
        ).astype(o_ref.dtype)

    return _kernel


def _make_kernel_single_c(T_len: int, NM: int):
    """c-major single-chunk kernel (round 5). Features are C blocks of T
    timesteps (M = C·T), so x enters the wrapper as a PLAIN RESHAPE of the
    model's (B, N, C, T) and the output lands directly reshapeable to
    (B, N, Co, T) — no kernel-boundary transposes (the round-4 profile's
    +4.5 ms bucket) and downstream fcmy/GTU keep their preferred layouts
    (+5.0 ms bucket). The SpMM emits aggᵀ (TM, BS) directly (contract
    dim0·dim0), killing the per-head agg.T relayout of the t-major
    epilogue.

    The channel M-tiles run as an INTERNAL statically-unrolled loop with
    double-buffered x DMAs — ONE grid step per (batch tile, target tile) —
    instead of an M grid axis: an M-tile covers a channel subset so the Θ
    mix needs all of them anyway, and folding them in cuts the per-grid-
    step fixed costs (~8 µs scalar/DMA/sync, the roofline table's named
    binding resource) by NM×. The Θ mix accumulates in f32 scratch; the
    output tile is written once, in output-channel groups so the epilogue
    relayout temps stay small."""

    def _kernel(start_ref, count_ref, src_ref,
                k_ref, th_ref, q_hbm, bc_hbm, x_hbm,
                o_ref,
                q_sc, bc_sc, x_sc, w_sc, mix_sc, sem):
        bb, j = pl.program_id(0), pl.program_id(1)
        BB, H, BS, dk = k_ref.shape
        SC, TM = x_sc.shape[1], x_sc.shape[-1]
        Co = th_ref.shape[-1]
        Ct = TM // T_len                  # channels covered per M-tile
        start = start_ref[j]
        count = count_ref[j]
        inv_sqrt_dk = 1.0 / (dk ** 0.5)
        window = pl.ds(start, SC)

        def xdma(mt, u, bi):
            src = src_ref[start + u]
            return pltpu.make_async_copy(
                x_hbm.at[bb * BB + bi, pl.ds(src * BS, BS),
                         pl.ds(mt * TM, TM)],
                x_sc.at[mt % 2, u, bi], sem.at[mt % 2, u * BB + bi, 2])

        for u in range(SC):
            for bi in range(BB):
                xdma(0, u, bi).start()

        # per-tile work while chunk 0 streams: weights + zeroed mix acc
        mix_sc[...] = jnp.zeros_like(mix_sc)
        bcdma = pltpu.make_async_copy(
            bc_hbm.at[window], bc_sc, sem.at[0, 0, 0])

        def qdma(bi):
            return pltpu.make_async_copy(
                q_hbm.at[bb * BB + bi, window], q_sc.at[bi],
                sem.at[0, bi, 1])

        bcdma.start()
        for bi in range(BB):
            qdma(bi).start()
        bcdma.wait()
        for bi in range(BB):
            qdma(bi).wait()
        for bi in range(BB):
            for h in range(H):
                k = k_ref[bi, h]               # (BS_tgt, dk) target rows
                scores = []
                for u in range(SC):
                    q = q_sc[bi, u, h * dk:(h + 1) * dk]  # (dk, BS_src)
                    s = jax.lax.dot_general(
                        q, k,
                        dimension_numbers=(((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * inv_sqrt_dk + bc_sc[u, 0, h]  # -1e30 off-pattern
                    scores.append(jnp.where(u < count, s, _NEG))
                mx = scores[0].max(axis=0, keepdims=True)
                for s in scores[1:]:
                    mx = jnp.maximum(mx, s.max(axis=0, keepdims=True))
                es = [jnp.exp(s - mx) for s in scores]
                den = sum(e.sum(axis=0, keepdims=True) for e in es)
                inv_d = 1.0 / jnp.maximum(den, 1e-30)   # (1, BS_tgt)
                w_sc[bi, h] = jnp.concatenate(
                    [bc_sc[u, 1, h] * (es[u] * inv_d)
                     for u in range(SC)],
                    axis=0,
                ).astype(w_sc.dtype)           # (SC·BS_src, BS_tgt)

        for mt in range(NM):
            if mt + 1 < NM:
                for u in range(SC):
                    for bi in range(BB):
                        xdma(mt + 1, u, bi).start()
            for u in range(SC):
                for bi in range(BB):
                    xdma(mt, u, bi).wait()
            for bi in range(BB):
                x_all = x_sc[mt % 2, :, bi].reshape(SC * BS, TM)
                for h in range(H):
                    aggT = jax.lax.dot_general(
                        x_all, w_sc[bi, h],
                        dimension_numbers=(((0,), (0,)), ((), ())),  # xᵀ·w
                        preferred_element_type=jnp.float32,
                    )                                  # (TM, BS_tgt)
                    a2 = aggT.reshape(Ct, T_len * BS)
                    th_s = th_ref[h, mt * Ct:(mt + 1) * Ct]   # (Ct, Co)
                    mix_sc[bi] += jax.lax.dot_general(
                        th_s, a2,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                  # (Co, T·BS)

        # epilogue in output-channel groups: (CoB, T·BS) → (CoB·T, BS) → ᵀ
        q_gran = 128 // _gcd(T_len, 128)
        CoB = q_gran
        while Co % (2 * CoB) == 0 and (2 * CoB) * T_len * BS * 4 <= 2**20:
            CoB *= 2
        for bi in range(BB):
            for c0 in range(0, Co, CoB):
                seg = mix_sc[bi, c0:c0 + CoB]          # (CoB, T·BS)
                o_ref[bi, :, c0 * T_len:(c0 + CoB) * T_len] = jnp.maximum(
                    seg.reshape(CoB * T_len, BS).T, 0.0
                ).astype(o_ref.dtype)

    return _kernel


def _make_kernel_chunked_c(n_chunks: int, T_len: int):
    """c-major chunked kernel: online softmax across slot chunks (as the
    t-major chunked kernel), aggᵀ accumulator (TM, BS) so the denominator
    broadcast rides the lane axis, Θ mix accumulated across M-tiles (mt is
    the innermost grid axis here, unlike the t-major chunked kernel)."""

    def _kernel(start_ref, count_ref, src_ref,
                k_ref, th_ref, q_hbm, bc_hbm, x_hbm,
                o_ref,
                q_sc, bc_sc, x_sc, acc_sc, m_sc, d_sc, mix_sc, sem):
        b, j, mt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        NM = pl.num_programs(2)
        H, BS, dk = k_ref.shape[1], k_ref.shape[2], k_ref.shape[3]
        SC, TM = x_sc.shape[0], x_sc.shape[-1]
        Co = th_ref.shape[-1]
        Ct = TM // T_len
        start = start_ref[j]
        count = count_ref[j]
        inv_sqrt_dk = 1.0 / (dk ** 0.5)

        def chunk(c):
            base = c * SC
            window = pl.ds(start + base, SC)
            qdma = pltpu.make_async_copy(
                q_hbm.at[b, window], q_sc, sem.at[0, 0])
            bcdma = pltpu.make_async_copy(
                bc_hbm.at[window], bc_sc, sem.at[0, 1])

            def xdma(u):
                src = src_ref[start + base + u]
                return pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(src * BS, BS), pl.ds(mt * TM, TM)],
                    x_sc.at[u], sem.at[u, 2])

            qdma.start()
            bcdma.start()
            for u in range(SC):
                xdma(u).start()
            qdma.wait()
            bcdma.wait()
            for u in range(SC):
                xdma(u).wait()

            x_all = x_sc[:].reshape(SC * BS, TM)
            for h in range(H):
                k = k_ref[0, h]
                scores = []
                for u in range(SC):
                    q = q_sc[u, h * dk:(h + 1) * dk]       # (dk, BS_src)
                    s = jax.lax.dot_general(
                        q, k, dimension_numbers=(((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * inv_sqrt_dk + bc_sc[u, 0, h]
                    scores.append(jnp.where(base + u < count, s, _NEG))
                mx = scores[0].max(axis=0, keepdims=True)
                for s in scores[1:]:
                    mx = jnp.maximum(mx, s.max(axis=0, keepdims=True))
                m_prev = m_sc[h]
                m_new = jnp.maximum(m_prev, mx)
                scale = jnp.exp(m_prev - m_new)            # (1, BS_tgt)
                es = [jnp.exp(s - m_new) for s in scores]
                d_sc[h] = d_sc[h] * scale + sum(
                    e.sum(axis=0, keepdims=True) for e in es
                )
                w = jnp.concatenate(
                    [bc_sc[u, 1, h] * es[u] for u in range(SC)], axis=0
                )                                          # (SC·BS, BS_tgt)
                contrib = jax.lax.dot_general(
                    x_all, w.astype(x_all.dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),   # xᵀ·w
                    preferred_element_type=jnp.float32,
                )                                          # (TM, BS_tgt)
                acc_sc[h] = acc_sc[h] * scale + contrib    # lane broadcast
                m_sc[h] = m_new

        m_sc[:] = jnp.full_like(m_sc, _NEG)
        d_sc[:] = jnp.zeros_like(d_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

        @pl.when(mt == 0)
        def _():
            mix_sc[...] = jnp.zeros_like(mix_sc)

        for c in range(n_chunks):
            if c == 0:
                chunk(0)
            else:
                pl.when(c * SC < count)(lambda c=c: chunk(c))

        for h in range(H):
            a = acc_sc[h] / jnp.maximum(d_sc[h], 1e-30)    # (TM, BS)
            a2 = a.reshape(Ct, T_len * BS)
            th_s = th_ref[h, pl.ds(mt * Ct, Ct)]
            mix_sc[0] += jax.lax.dot_general(
                th_s, a2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(mt == NM - 1)
        def _():
            o_ref[0] = jnp.maximum(
                mix_sc[0].reshape(Co * T_len, BS).T, 0.0
            ).astype(o_ref.dtype)

    return _kernel


def _resolve_interpret(interpret: bool | None) -> bool:
    """None = infer from the default backend. Callers that know the target
    platform differs from the default backend (e.g. a CPU-device mesh under a
    TPU plugin — the driver's multichip dry run) pass it explicitly through
    ``bell_block_out``'s static meta."""
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit,
                   static_argnames=("max_slots", "n_ch", "interpret",
                                    "layout"))
def bell_fused_forward(
    tile_start: jax.Array,  # (NJ,) int32 — scalar-prefetched slot offsets
    tile_count: jax.Array,  # (NJ,) int32 — active slots per target tile
    a_src: jax.Array,       # (A+SC-1,) int32 — flat source ids, tail-padded
    qg: jax.Array,          # (B, A+SC-1, H·dk, BS) pre-gathered Q slots
    k: jax.Array,           # (B, H, Np, dk) K rows
    bc: jax.Array,          # (A+SC-1, 2, H, BS, BS) [bias, cheb] per slot
    x: jax.Array,           # (B, Np, T·C) t-major / (B, Np, C·T) c-major
    thetas: jax.Array,      # (H, C, Co) channel-mix weights
    max_slots: int = 1,     # static: max active slots of any target tile
    n_ch: int = 1,          # static: C (channels per t block)
    interpret: bool = False,
    layout: str = "t",      # static: "t" (T blocks of C) | "c" (C blocks of T)
) -> jax.Array:
    """Fused SDDMM → neighbourhood softmax → SpMM → Θ mix → ReLU.

    Returns (B, Np, T·Co) t-major or (B, Np, Co·T) c-major in x's dtype.
    One grid step per (batch tile, M-tile, target tile). The c-major
    layout (round 5) removes every kernel-boundary feature transpose; its
    M-tiles cover channel subsets, so the Θ mix accumulates across M-tiles
    in scratch and each output tile is written once at the last M-tile.
    """
    if layout == "c":
        return _bell_fused_forward_c(
            tile_start, tile_count, a_src, qg, k, bc, x, thetas,
            max_slots=max_slots, n_ch=n_ch, interpret=interpret,
        )
    B, H, Np, dk = k.shape
    NJ = tile_start.shape[0]
    BS = Np // NJ
    M = x.shape[-1]
    C, Co = n_ch, thetas.shape[-1]
    A = a_src.shape[0]
    SC = min(max_slots, 4)                 # slots per statically-unrolled chunk
    n_chunks = -(-max_slots // SC)
    xb = 2 if x.dtype == jnp.bfloat16 else 4
    step = 128 * C // _gcd(128, C)         # M-tile must align lanes AND C

    def pick_tm(need, budget):
        """Largest M-tile whose VMEM footprint fits ``budget`` (divisor of M,
        aligned to lanes AND the channel count). None when no tile fits —
        callers must handle it rather than ship an over-budget tile to an
        opaque Mosaic VMEM OOM."""
        tm = M
        while need(tm) > budget:
            best = None
            for cand in range(tm - step, step - 1, -step):
                if M % cand == 0:
                    best = cand
                    break
            if best is None:
                return None
            tm = best
        return tm

    if n_chunks == 1:
        # single-chunk kernel: weights cached per tile (M-tile innermost),
        # batch tile folded into each grid step
        def need(bb):
            def f(tm):
                return (2 * bb * BS * (tm // C) * Co * xb   # output block
                        + SC * bb * BS * tm * xb            # x slot buffers
                        + SC * 2 * H * BS * BS * 4          # bias+cheb
                        + bb * H * SC * BS * BS * xb        # cached weights
                        + 3 * BS * tm * 4                   # epilogue temps
                        + 2 * SC * H * BS * BS * 4          # score temps
                        + bb * SC * H * dk * BS * 4)        # q slot buffers
            return f

        # grid steps = (B/BB)·NJ·(M/TM): minimize by maximizing BB·TM under
        # the VMEM budget (tie → larger TM: fewer, bigger x DMAs per step)
        BB, TM, best = None, None, 0
        for cand in range(1, min(B, 8) + 1):
            if B % cand:
                continue
            tm = pick_tm(need(cand), 9 * 2**20)
            if tm is not None and cand * tm > best:
                BB, TM, best = cand, tm, cand * tm
        if TM is None:
            raise ValueError(
                f"bell_fused_forward: no (batch-tile, M-tile) split of "
                f"M={M} (C={C}, SC={SC}, BS={BS}, H={H}) fits the 9 MiB "
                f"VMEM budget; reduce max_slots/block_size or use the XLA "
                f"BELL path."
            )
        NM = M // TM
        TMo = (TM // C) * Co
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B // BB, NJ, NM),        # M-tile innermost: w reused
            in_specs=[
                pl.BlockSpec((BB, H, BS, dk),
                             lambda b, j, m, start, count, src: (b, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C, Co),
                             lambda b, j, m, start, count, src: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),   # q slots
                pl.BlockSpec(memory_space=pltpu.HBM),   # bias+cheb tiles
                pl.BlockSpec(memory_space=pltpu.HBM),   # x
            ],
            out_specs=pl.BlockSpec((BB, BS, TMo),
                                   lambda b, j, m, start, count, src:
                                   (b, j, m),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BB, SC, H * dk, BS), jnp.float32),
                pltpu.VMEM((SC, 2, H, BS, BS), jnp.float32),
                pltpu.VMEM((SC, BB, BS, TM), x.dtype),
                pltpu.VMEM((BB, H, SC * BS, BS), x.dtype),  # cached weights
                pltpu.SemaphoreType.DMA((SC * BB, 3)),
            ],
        )
        kernel = _make_kernel_single()
        semantics = ("parallel", "arbitrary", "arbitrary")
    else:
        def need(tm):
            return (2 * BS * (tm // C) * Co * xb    # output block
                    + H * BS * tm * 4               # f32 accumulator
                    + SC * BS * tm * xb             # x slot buffers
                    + SC * 2 * H * BS * BS * 4      # bias+cheb buffers
                    + 2 * SC * H * BS * BS * 4      # score temps
                    + SC * H * dk * BS * 4)         # q slot buffers

        TM = pick_tm(need, 9 * 2**20)
        if TM is None:
            raise ValueError(
                f"bell_fused_forward (chunked): no M-tile split of M={M} "
                f"(C={C}, SC={SC}, BS={BS}, H={H}) fits the 9 MiB VMEM "
                f"budget; reduce max_slots/block_size or use the XLA BELL "
                f"path."
            )
        NM = M // TM
        TMo = (TM // C) * Co
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, NM, NJ),
            in_specs=[
                pl.BlockSpec((1, H, BS, dk),
                             lambda b, m, j, start, count, src: (b, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C, Co),
                             lambda b, m, j, start, count, src: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),   # q slots
                pl.BlockSpec(memory_space=pltpu.HBM),   # bias+cheb tiles
                pl.BlockSpec(memory_space=pltpu.HBM),   # x
            ],
            out_specs=pl.BlockSpec((1, BS, TMo),
                                   lambda b, m, j, start, count, src:
                                   (b, j, m),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((SC, H * dk, BS), jnp.float32),
                pltpu.VMEM((SC, 2, H, BS, BS), jnp.float32),
                pltpu.VMEM((SC, BS, TM), x.dtype),
                pltpu.VMEM((H, BS, TM), jnp.float32),
                pltpu.VMEM((H, 1, BS), jnp.float32),
                pltpu.VMEM((H, 1, BS), jnp.float32),
                pltpu.SemaphoreType.DMA((SC, 3)),
            ],
        )
        kernel = _make_kernel_chunked(n_chunks)
        semantics = ("parallel", "parallel", "arbitrary")

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Np, (M // C) * Co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * A * (BS * BS * dk + BS * BS * M),
            bytes_accessed=4 * B * A * H * (BS * dk + 2 * BS * BS)
            + xb * B * A * BS * M + xb * B * Np * (M // C) * Co,
            transcendentals=B * H * A * BS * BS,
        ),
        interpret=interpret,
    )(tile_start, tile_count, a_src, k, thetas, qg, bc, x)


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def c_channel_pad(C: int, T: int) -> int:
    """Smallest C' ≥ C with 128 | C'·T (the c-major lane-alignment rule:
    M = C·T and every M-tile is a whole number of T-long channel rows, so
    alignment must come from padding CHANNELS, with zero Θ rows)."""
    q = 128 // _gcd(T, 128)
    return -(-C // q) * q


def _pick_tm_c(M: int, T_len: int, need, budget: int):
    """Largest c-major M-tile: a divisor of M that is a whole number of
    channels (multiple of T_len) and lane-aligned (multiple of 128)."""
    C_tot = M // T_len
    cands = sorted(
        (ct * T_len for ct in range(1, C_tot + 1)
         if C_tot % ct == 0 and (ct * T_len) % 128 == 0),
        reverse=True,
    )
    for tm in cands:
        if need(tm) <= budget:
            return tm
    return None


def _c_need_single(BS, Mo, Co, T_len, SC, H, dk, xb):
    """VMEM-estimate closure for the single-chunk c kernel (shared by the
    spec builder and the wrapper's auto-layout feasibility probe)."""
    def need(bb):
        def f(tm):
            return (2 * bb * BS * Mo * xb         # output block
                    + bb * Co * T_len * BS * 4    # mix accumulator
                    + 2 * SC * bb * BS * tm * xb  # x double buffer
                    + SC * 2 * H * BS * BS * 4    # bias+cheb
                    + bb * H * SC * BS * BS * xb  # cached weights
                    + 2 * BS * tm * 4             # aggT/a2 temps
                    + 2 * SC * H * BS * BS * 4    # score temps
                    + bb * SC * H * dk * BS * 4)  # q slot buffers
        return f
    return need


def _c_need_chunked(BS, Mo, Co, T_len, SC, H, dk, xb):
    def need(tm):
        return (2 * BS * Mo * xb              # output block
                + Co * T_len * BS * 4         # mix accumulator
                + H * BS * tm * 4             # f32 aggT accumulator
                + SC * BS * tm * xb           # x slot buffers
                + SC * 2 * H * BS * BS * 4    # bias+cheb buffers
                + 2 * SC * H * BS * BS * 4    # score temps
                + SC * H * dk * BS * 4)       # q slot buffers
    return need


def c_layout_feasible(*, B, M, n_ch, Co, max_slots, BS, H, dk, xb):
    """True when the c-major forward has a valid (batch-tile, M-tile)
    split under the VMEM budget — the wrapper's auto-layout probe (e.g.
    f32 at GAMBIA-conf doubles every buffer and does NOT fit; bf16 does)."""
    T_len = M // n_ch
    if M % n_ch or (M % 128) or ((Co * T_len) % 128):
        return False
    SC = min(max_slots, 4)
    if -(-max_slots // SC) == 1:
        need = _c_need_single(BS, Co * T_len, Co, T_len, SC, H, dk, xb)
        return any(
            B % bb == 0
            and _pick_tm_c(M, T_len, need(bb), C_VMEM_BUDGET) is not None
            for bb in range(1, min(B, 8) + 1)
        )
    need = _c_need_chunked(BS, Co * T_len, Co, T_len, SC, H, dk, xb)
    return _pick_tm_c(M, T_len, need, C_VMEM_BUDGET) is not None


def _bell_fused_forward_c(
    tile_start, tile_count, a_src, qg, k, bc, x, thetas,
    *, max_slots: int, n_ch: int, interpret: bool,
):
    """c-major grid/spec builder for :func:`bell_fused_forward`."""
    B, H, Np, dk = k.shape
    NJ = tile_start.shape[0]
    BS = Np // NJ
    M = x.shape[-1]
    C, Co = n_ch, thetas.shape[-1]
    A = a_src.shape[0]
    T_len = M // C
    if M % C or (M % 128) or ((Co * T_len) % 128):
        raise ValueError(
            f"c-major layout needs 128 | M (= C·T = {M}) and "
            f"128 | Co·T (= {Co * T_len}); pad channels with c_channel_pad()."
        )
    SC = min(max_slots, 4)
    n_chunks = -(-max_slots // SC)
    xb = 2 if x.dtype == jnp.bfloat16 else 4
    Mo = Co * T_len
    budget = C_VMEM_BUDGET

    if n_chunks == 1:
        need = _c_need_single(BS, Mo, Co, T_len, SC, H, dk, xb)
        BB, TM, best = None, None, (0, 0)
        for cand in range(1, min(B, 8) + 1):
            if B % cand:
                continue
            tm = _pick_tm_c(M, T_len, need(cand), budget)
            # amortization first (bigger batch tile = fewer grid steps),
            # then bigger chunks (fewer, larger x DMAs)
            if tm is not None and (cand, tm) > best:
                BB, TM, best = cand, tm, (cand, tm)
        if TM is None:
            raise ValueError(
                f"bell_fused_forward (c-major): no (batch-tile, M-tile) "
                f"split of M={M} (C={C}, T={T_len}, SC={SC}, BS={BS}, "
                f"H={H}) fits the VMEM budget; use layout='t'."
            )
        NM = M // TM
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B // BB, NJ),
            in_specs=[
                pl.BlockSpec((BB, H, BS, dk),
                             lambda b, j, start, count, src: (b, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C, Co),
                             lambda b, j, start, count, src: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),   # q slots
                pl.BlockSpec(memory_space=pltpu.HBM),   # bias+cheb tiles
                pl.BlockSpec(memory_space=pltpu.HBM),   # x
            ],
            out_specs=pl.BlockSpec((BB, BS, Mo),
                                   lambda b, j, start, count, src: (b, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BB, SC, H * dk, BS), jnp.float32),
                pltpu.VMEM((SC, 2, H, BS, BS), jnp.float32),
                pltpu.VMEM((2, SC, BB, BS, TM), x.dtype),   # double buffer
                pltpu.VMEM((BB, H, SC * BS, BS), x.dtype),  # cached weights
                pltpu.VMEM((BB, Co, T_len * BS), jnp.float32),  # mix acc
                pltpu.SemaphoreType.DMA((2, SC * BB, 3)),
            ],
        )
        kernel = _make_kernel_single_c(T_len, NM)
        semantics = ("parallel", "arbitrary")
    else:
        need = _c_need_chunked(BS, Mo, Co, T_len, SC, H, dk, xb)
        TM = _pick_tm_c(M, T_len, need, budget)
        if TM is None:
            raise ValueError(
                f"bell_fused_forward (c-major chunked): no M-tile split of "
                f"M={M} (C={C}, T={T_len}, SC={SC}, BS={BS}, H={H}) fits "
                f"the VMEM budget; use layout='t'."
            )
        NM = M // TM
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, NJ, NM),
            in_specs=[
                pl.BlockSpec((1, H, BS, dk),
                             lambda b, j, m, start, count, src: (b, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C, Co),
                             lambda b, j, m, start, count, src: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),   # q slots
                pl.BlockSpec(memory_space=pltpu.HBM),   # bias+cheb tiles
                pl.BlockSpec(memory_space=pltpu.HBM),   # x
            ],
            out_specs=pl.BlockSpec((1, BS, Mo),
                                   lambda b, j, m, start, count, src:
                                   (b, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((SC, H * dk, BS), jnp.float32),
                pltpu.VMEM((SC, 2, H, BS, BS), jnp.float32),
                pltpu.VMEM((SC, BS, TM), x.dtype),
                pltpu.VMEM((H, TM, BS), jnp.float32),   # aggT accumulator
                pltpu.VMEM((H, 1, BS), jnp.float32),
                pltpu.VMEM((H, 1, BS), jnp.float32),
                pltpu.VMEM((1, Co, T_len * BS), jnp.float32),   # mix acc
                pltpu.SemaphoreType.DMA((SC, 3)),
            ],
        )
        kernel = _make_kernel_chunked_c(n_chunks, T_len)
        semantics = ("parallel", "arbitrary", "arbitrary")

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Np, Mo), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=14 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * A * (BS * BS * dk + BS * BS * M),
            bytes_accessed=4 * B * A * H * (BS * dk + 2 * BS * BS)
            + xb * B * A * BS * M + xb * B * Np * Mo,
            transcendentals=B * H * A * BS * BS,
        ),
        interpret=interpret,
    )(tile_start, tile_count, a_src, k, thetas, qg, bc, x)


# ---------------------------------------------------------------------------
# differentiable wrapper (XLA recompute backward)
# ---------------------------------------------------------------------------

def _plane_tiles(plane, block_idx, BS):
    """(H, Np_src, Np_tgt) dense plane → (H, NJ, S, BS, BS) tiles at the
    slot structure (tile (block_idx[j,s]·BS, j·BS) per slot)."""
    H = plane.shape[0]
    NI = plane.shape[1] // BS
    NJ = block_idx.shape[0]
    idx5 = block_idx[None, :, :, None, None].astype(jnp.int32)
    return jnp.take_along_axis(
        plane.reshape(H, NI, BS, NJ, BS).transpose(0, 3, 1, 2, 4),
        idx5, axis=2,
    )  # (H, NJ, S, BS, BS)


def _tiles_to_ns(tiles, tile_start, S):
    """(A, H, BS, BS) active-list tiles → (H, NJ, S, BS, BS) slot-organized.

    Slots past a tile's count read a NEIGHBOURING tile's values (the active
    list is target-ordered and contiguous) — garbage there is always masked
    downstream by ``pattern`` (padding slots are all-False)."""
    A = tiles.shape[0]
    idx = jnp.minimum(
        tile_start[:, None] + jnp.arange(S, dtype=tile_start.dtype)[None],
        A - 1,
    )                                       # (NJ, S)
    return jnp.moveaxis(tiles[idx], 2, 0)   # (H, NJ, S, BS, BS)


def _xla_block_pieces(q, k, bias_ns, cheb_ns, pattern, block_idx):
    """Recompute block scores / softmax with plain XLA (backward helper).

    ``bias_ns``/``cheb_ns`` are slot-organized tiles (H, NJ, S, BS, BS).
    Shapes may be rectangular: q covers ALL source rows (B, H, Np_src, dk)
    while k covers only the local target rows (B, H, Np_tgt, dk) — the
    node-partitioned path runs this per shard with global sources.
    """
    B, H, Np_src, dk = q.shape
    NJ, S = block_idx.shape
    BS = pattern.shape[-1]
    NI = Np_src // BS
    qb = q.reshape(B, H, NI, BS, dk)
    kb = k.reshape(B, H, NJ, BS, dk)
    q_blocks = qb[:, :, block_idx]                     # (B, H, NJ, S, BS, dk)
    scores = jnp.einsum("bhjsad,bhjcd->bhjsac", q_blocks, kb) / jnp.sqrt(
        jnp.asarray(dk, q.dtype)
    )
    s_all = scores + bias_ns[None]
    s_all = jnp.where(pattern[None, None] > 0, s_all, _NEG)
    # softmax over (s, a) per target column
    s2 = s_all.transpose(0, 1, 2, 5, 3, 4).reshape(B, H, NJ, BS, S * BS)
    att = jax.nn.softmax(s2, axis=-1).reshape(B, H, NJ, BS, S, BS)
    att = att.transpose(0, 1, 2, 4, 5, 3)  # (B, H, NJ, S, BS_src, BS_tgt)
    att = att * (pattern[None, None] > 0)
    return q_blocks, att


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def bell_block_out(meta, tile_start, tile_count, a_src, a_tgt, block_idx,
                   pattern, q, k, biasm_p, cheb_p, x, thetas,
                   active_slot=None, src_order=None, src_start=None,
                   src_count=None):
    """relu(Σ_h softmax-modulated aggregationₕ · Θₕ), t-major output.

    ``meta`` is the STATIC configuration (nondiff): a ``(max_out, interpret)``
    pair where ``max_out`` sizes the fused backward's dx loop (None → the XLA
    slot-scan VJP) and ``interpret`` pins Pallas interpret mode (None → infer
    from the default backend). A third element may name the feature layout
    ("t" default); the plane path is t-major only.

    Rectangular-aware: q/x/biasm_p/cheb_p cover all Np_src source rows while
    k (and the output) cover the Np_tgt = NJ·BS target rows described by the
    tile lists — identical when running unsharded, a strict subset per shard
    under the node-partitioned path.
    """
    _, interp_opt = meta[:2]
    B, H, Np_src, dk = q.shape
    NJ = tile_start.shape[0]
    BS = pattern.shape[-1]
    NI = Np_src // BS
    C = thetas.shape[1]
    max_slots = pattern.shape[1]
    SC = min(max_slots, 4)
    # pre-gather the per-slot operands (cheap XLA gathers vs the kernel's
    # HBM stream) and tail-pad so the kernel's fixed-size SC-slot DMA
    # window never runs out of bounds
    qt = q.transpose(0, 1, 3, 2).reshape(B, H * dk, NI, BS)
    qg = jnp.moveaxis(qt, 2, 1)[:, a_src]        # (B, A, H·dk, BS)

    def tiles(plane):  # (H, Np_src, Np_tgt) → (A, H, BS, BS) active slots
        p5 = plane.reshape(H, NI, BS, NJ, BS).transpose(1, 3, 0, 2, 4)
        return p5[a_src, a_tgt]

    bc = jnp.stack([tiles(biasm_p), tiles(cheb_p)], axis=1)
    pad = SC - 1
    if pad:
        a_src_p = jnp.pad(a_src, (0, pad))
        qg = jnp.pad(qg, ((0, 0), (0, pad), (0, 0), (0, 0)))
        bc = jnp.pad(bc, ((0, pad),) + ((0, 0),) * 4)
    else:
        a_src_p = a_src
    return bell_fused_forward(
        tile_start, tile_count, a_src_p, qg, k, bc, x, thetas,
        max_slots=max_slots, n_ch=C, interpret=_resolve_interpret(interp_opt),
    )


def _fwd(meta, tile_start, tile_count, a_src, a_tgt, block_idx, pattern,
         q, k, biasm_p, cheb_p, x, thetas,
         active_slot=None, src_order=None, src_start=None, src_count=None):
    out = bell_block_out(meta, tile_start, tile_count, a_src, a_tgt,
                         block_idx, pattern, q, k, biasm_p, cheb_p, x,
                         thetas, active_slot, src_order, src_start,
                         src_count)
    return out, (tile_start, tile_count, a_src, a_tgt, block_idx, pattern,
                 q, k, biasm_p, cheb_p, x, thetas, out,
                 active_slot, src_order, src_start, src_count)


def _bwd_core(max_out, interp_opt, tile_start, tile_count, a_src, a_tgt,
              block_idx, pattern, q, k, bias_ns, cheb_ns, x, thetas, out, g,
              active_slot, src_order, src_start, src_count):
    """Shared backward math for both the plane- and tile-resident wrappers.

    ``bias_ns``/``cheb_ns`` are slot-organized tiles (H, NJ, S, BS, BS).
    Returns (dq, dk_, ds_sum, dx, dthetas) with ds_sum the batch-summed
    pre-softmax score gradient (H, NJ, S, BS_src, BS_tgt) — the caller maps
    it to its bias representation (dense-plane scatter or active-tile
    gather)."""
    B, H, Np_src, dk = q.shape
    NJ, S = block_idx.shape
    BS = pattern.shape[-1]
    NI = Np_src // BS
    Np_tgt = NJ * BS
    M = x.shape[-1]
    C, Co = thetas.shape[1], thetas.shape[2]
    nt = M // C
    f32 = jnp.float32
    # ReLU + Θ-mix backward (t-major): g is (B, Np_tgt, nt·Co)
    gm = (jnp.asarray(g, f32) * (out > 0)).reshape(B, Np_tgt, nt, Co)
    q_blocks, att = _xla_block_pieces(
        q, k, bias_ns, cheb_ns, pattern, block_idx
    )
    cheb_tiles = cheb_ns

    if src_order is not None:
        # Fused backward (ops/pallas/bell_bwd.py): dA + dΘ stream per
        # active tile (K1); dx streams in SOURCE order so each grid step
        # owns its output block (K2) — no big gathers/scatters, and g_agg
        # is recomputed in-kernel so (B, H, Np, M) never materializes.
        from dstagnn_drought_tpu.ops.pallas.bell_bwd import (
            bell_bwd_dA_dtheta,
            bell_bwd_dx,
        )

        A_n = a_src.shape[0]
        interp = _resolve_interpret(interp_opt)
        w6 = cheb_tiles[None] * att            # (B,H,NJ,S,BS,BS)
        w_act = w6[:, :, a_tgt, active_slot].transpose(0, 2, 1, 3, 4)
        w_act = jnp.pad(
            w_act.astype(x.dtype),
            ((0, 0), (0, S), (0, 0), (0, 0), (0, 0)),
        )
        a_src_p = jnp.pad(a_src, (0, S))
        gm_k = gm.reshape(B, Np_tgt, nt * Co).astype(x.dtype)
        dA_act, dth = bell_bwd_dA_dtheta(
            tile_start, tile_count, a_src_p,
            thetas.astype(f32), gm_k, x, w_act,
            S_max=S, n_ch=C, interpret=interp,
        )
        dA = (
            jnp.zeros((B, H, NJ, S, BS, BS), f32)
            .at[:, :, a_tgt, active_slot]
            .set(dA_act[:, :A_n].transpose(0, 2, 1, 3, 4))
        )
        order_tgt = jnp.pad(a_tgt[src_order], (0, S))
        order_idx = jnp.pad(src_order, (0, S))
        dx = bell_bwd_dx(
            src_start, src_count, order_tgt, order_idx,
            thetas.astype(f32), gm_k, w_act,
            max_out=max_out, n_ch=C, np_src=Np_src,
            interpret=interp,
        ).astype(x.dtype)
        dthetas = dth.astype(thetas.dtype)
    else:
        # XLA fallback (node-partitioned path): scan over the slot axis so
        # the gathered per-slot x tensor x[:, block_idx] — (B, NJ, S, BS, M),
        # ~1 GB at GAMBIA — is never materialized.
        g_agg = jnp.einsum("bntO,hcO->bhntc", gm,
                           thetas.astype(f32)).reshape(B, H, Np_tgt, M)
        A6 = cheb_tiles[None] * att            # (B,H,NJ,S,BS_src,BS_tgt)
        xb = x.astype(f32).reshape(B, NI, BS, M)
        gb = g_agg.reshape(B, H, NJ, BS, M)    # (B, H, NJ, BS_tgt, M)
        gm5 = gm.reshape(B, NJ, BS, nt, Co)

        def slot_step(carry, inp):
            dxb, dth = carry
            idx_s, A_s = inp                # (NJ,), (B, H, NJ, BS, BS_tgt)
            x_s = xb[:, idx_s]              # (B, NJ, BS_src, M)
            dxb = dxb.at[:, idx_s].add(
                jnp.einsum("bhjat,bhjtm->bjam", A_s, gb)
            )
            agg_s = jnp.einsum("bhjat,bjam->bhjtm", A_s, x_s)
            dth = dth + jnp.einsum(
                "bhjtnc,bjtnO->hcO",
                agg_s.reshape(B, H, NJ, BS, nt, C), gm5,
            )
            dA_s = jnp.einsum("bjam,bhjtm->bhjat", x_s, gb)
            return (dxb, dth), dA_s

        (dxb, dth_acc), dA_slots = jax.lax.scan(
            slot_step,
            (jnp.zeros_like(xb), jnp.zeros((H, C, Co), f32)),
            (block_idx.T, jnp.moveaxis(A6, 3, 0)),
        )
        dx = dxb.reshape(B, Np_src, M).astype(x.dtype)
        dthetas = dth_acc.astype(thetas.dtype)
        dA = jnp.moveaxis(dA_slots, 0, 3)     # (B,H,NJ,S,BS,BS_tgt)

    datt = cheb_tiles[None] * dA
    # softmax backward per target column over the (s, a) neighbourhood
    dot = jnp.einsum("bhjsat,bhjsat->bhjt", att, datt)
    ds = att * (datt - dot[:, :, :, None, None, :])
    inv = 1.0 / jnp.sqrt(jnp.asarray(dk, q.dtype))
    kb = k.reshape(B, H, NJ, BS, dk)
    dq_blocks = jnp.einsum("bhjsat,bhjtd->bhjsad", ds, kb) * inv
    dq = (
        jnp.zeros((B, H, NI, BS, dk), q.dtype)
        .at[:, :, block_idx].add(dq_blocks).reshape(B, H, Np_src, dk)
    )
    dk_ = jnp.einsum("bhjsat,bhjsad->bhjtd", ds, q_blocks).reshape(
        B, H, Np_tgt, dk
    ) * inv
    ds_sum = ds.sum(axis=0)                  # (H, NJ, S, BS_src, BS_tgt)
    return dq, dk_, ds_sum, dx, dthetas


def _bwd(meta, res, g):
    (tile_start, tile_count, a_src, a_tgt, block_idx, pattern, q, k,
     bias_p, cheb_p, x, thetas, out,
     active_slot, src_order, src_start, src_count) = res
    max_out, interp_opt = meta[:2]
    BS = pattern.shape[-1]
    NJ, S = block_idx.shape
    NI = q.shape[2] // BS
    Np_src, Np_tgt = q.shape[2], NJ * BS
    bias_ns = _plane_tiles(bias_p, block_idx, BS)
    cheb_ns = _plane_tiles(cheb_p, block_idx, BS)
    dq, dk_, ds_sum, dx, dthetas = _bwd_core(
        max_out, interp_opt, tile_start, tile_count, a_src, a_tgt,
        block_idx, pattern, q, k, bias_ns, cheb_ns, x, thetas, out, g,
        active_slot, src_order, src_start, src_count,
    )
    # scatter tile grads back to the dense plane (dense-mask path)
    H = ds_sum.shape[0]
    dbias_t = jnp.zeros((H, NJ, NI, BS, BS), ds_sum.dtype).at[
        :, jnp.arange(NJ)[:, None], block_idx
    ].add(ds_sum)                            # (H, jt, sb, a, b)
    dbias_p = dbias_t.transpose(0, 2, 3, 1, 4).reshape(H, Np_src, Np_tgt)
    return (None, None, None, None, None, None,
            dq, dk_, dbias_p, None, dx, dthetas, None, None, None, None)


bell_block_out.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# tile-resident variant: masks live only on the active-tile support
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def bell_tiles_out(meta, tile_start, tile_count, a_src, a_tgt, block_idx,
                   pattern, q, k, bias_tiles, cheb_tiles, x, thetas,
                   active_slot=None, src_order=None, src_start=None,
                   src_count=None):
    """Tile-resident ``bell_block_out``: bias/cheb arrive as ACTIVE-LIST
    tiles (A, H, BS, BS) — bias already pattern-folded to -1e30 off-pattern —
    so no (H, Np, Np) plane is ever built, traced, transposed, or scattered
    into. This is what lets the learnable graph masks live only on the edge
    support (O(active tiles) parameters instead of O(K·N²)); see
    ``bell_cheb_conv_tiles``. ``meta`` = (max_out, interpret) or
    (max_out, interpret, layout) with layout ∈ {"t", "c"} — "c" requires
    the fused backward (max_out set and sorted source lists present).
    """
    _, interp_opt = meta[:2]
    layout = meta[2] if len(meta) > 2 else "t"
    B, H, Np_src, dk = q.shape
    BS = pattern.shape[-1]
    NI = Np_src // BS
    C = thetas.shape[1]
    max_slots = pattern.shape[1]
    SC = min(max_slots, 4)
    qt = q.transpose(0, 1, 3, 2).reshape(B, H * dk, NI, BS)
    qg = jnp.moveaxis(qt, 2, 1)[:, a_src]        # (B, A, H·dk, BS)
    bc = jnp.stack([bias_tiles, cheb_tiles], axis=1).astype(jnp.float32)
    pad = SC - 1
    if pad:
        a_src_p = jnp.pad(a_src, (0, pad))
        qg = jnp.pad(qg, ((0, 0), (0, pad), (0, 0), (0, 0)))
        bc = jnp.pad(bc, ((0, pad),) + ((0, 0),) * 4)
    else:
        a_src_p = a_src
    return bell_fused_forward(
        tile_start, tile_count, a_src_p, qg, k, bc, x, thetas,
        max_slots=max_slots, n_ch=C,
        interpret=_resolve_interpret(interp_opt), layout=layout,
    )


def _fwd_tiles(meta, tile_start, tile_count, a_src, a_tgt, block_idx,
               pattern, q, k, bias_tiles, cheb_tiles, x, thetas,
               active_slot=None, src_order=None, src_start=None,
               src_count=None):
    out = bell_tiles_out(meta, tile_start, tile_count, a_src, a_tgt,
                         block_idx, pattern, q, k, bias_tiles, cheb_tiles,
                         x, thetas, active_slot, src_order, src_start,
                         src_count)
    return out, (tile_start, tile_count, a_src, a_tgt, block_idx, pattern,
                 q, k, bias_tiles, cheb_tiles, x, thetas, out,
                 active_slot, src_order, src_start, src_count)


def _bwd_tiles(meta, res, g):
    (tile_start, tile_count, a_src, a_tgt, block_idx, pattern, q, k,
     bias_tiles, cheb_tiles, x, thetas, out,
     active_slot, src_order, src_start, src_count) = res
    max_out, interp_opt = meta[:2]
    layout = meta[2] if len(meta) > 2 else "t"
    if src_order is not None and max_out is not None:
        return _bwd_tiles_active(
            max_out, interp_opt, tile_start, tile_count, a_src, a_tgt,
            block_idx, pattern, q, k, bias_tiles, cheb_tiles, x, thetas,
            out, g, active_slot, src_order, src_start, src_count,
            layout=layout,
        )
    if layout == "c":
        raise ValueError(
            "c-major bell_tiles_out requires the fused backward "
            "(max_out set and sorted source lists present)."
        )
    S = block_idx.shape[1]
    A = a_src.shape[0]
    bias_ns = _tiles_to_ns(bias_tiles.astype(jnp.float32), tile_start, S)
    cheb_ns = _tiles_to_ns(cheb_tiles.astype(jnp.float32), tile_start, S)
    dq, dk_, ds_sum, dx, dthetas = _bwd_core(
        max_out, interp_opt, tile_start, tile_count, a_src, a_tgt,
        block_idx, pattern, q, k, bias_ns, cheb_ns, x, thetas, out, g,
        active_slot, src_order, src_start, src_count,
    )
    # active-list gather instead of a dense-plane scatter: slot position of
    # active index a within its target tile is a − tile_start[a_tgt[a]]
    slot = jnp.arange(A, dtype=tile_start.dtype) - tile_start[a_tgt]
    dbias_tiles = ds_sum[:, a_tgt, slot].transpose(1, 0, 2, 3)  # (A,H,BS,BS)
    return (None, None, None, None, None, None,
            dq, dk_, dbias_tiles.astype(bias_tiles.dtype), None, dx,
            dthetas, None, None, None, None)


def _bwd_tiles_active(max_out, interp_opt, tile_start, tile_count, a_src,
                      a_tgt, block_idx, pattern, q, k, bias_tiles,
                      cheb_tiles, x, thetas, out, g,
                      active_slot, src_order, src_start, src_count,
                      layout="t"):
    """Fused-kernel backward in ACTIVE-LIST organization.

    The slot-organized `_bwd_core` path pays a 51 MB scatter to route K1's
    per-active-slot dA back into (B, H, NJ, S, BS, BS) form, plus
    (NJ, S)-padded softmax-recompute/softmax-backward tensors and gathers
    between the two layouts (measured ~7.7 ms of unnamed backward
    dot_generals + scatter soup at GAMBIA). Here everything stays on the
    active list: the softmax recompute and its backward are per-active-tile
    batched matmuls/elementwise, cross-slot softmax reductions are
    ``segment_sum``/``segment_max`` over the target-sorted list (A → NJ,
    contiguous segments), dbias IS the per-active ds (no gather), and the
    only scatter-adds left are the small per-block dq/dk accumulations
    (A → NI/NJ on (BS, d_k) tiles).

    Shares the K1/K2 kernel contract with ``_bwd_core``'s fused branch but
    in a different (A-leading) organization; their numerical lockstep is
    pinned by tests/test_bell_tiles.py (tiles-vs-plane forward+grad parity
    routes one side through here and the other through _bwd_core) and by
    the on-hardware sparse_bench --check-tiles run (ADVICE r4)."""
    B, H, Np_src, dk = q.shape
    NJ, S = block_idx.shape
    BS = pattern.shape[-1]
    NI = Np_src // BS
    Np_tgt = NJ * BS
    M = x.shape[-1]
    C, Co = thetas.shape[1], thetas.shape[2]
    f32 = jnp.float32
    A = a_src.shape[0]
    seg_t = functools.partial(
        jax.ops.segment_sum, num_segments=NJ, indices_are_sorted=True,
    )
    # the cotangent stays FLAT (B, Np_tgt, M_out) — both kernels consume it
    # in whichever feature layout the forward produced
    gm_flat = jnp.asarray(g, f32) * (out > 0)

    # softmax recompute, per active tile. Everything lives A-LEADING
    # ((A, B, H, BS, BS)) so the cross-slot segment reductions and the
    # per-active elementwise chain need NO relayouts; the only two big
    # transposes left are at the K1 kernel boundary (its operand layout is
    # (B, A_pad, H, BS, BS)). The gathers hoist the cheap (NI/NJ)-leading
    # moveaxis of q/k (2 MB) instead of transposing 50 MB activations.
    qb = jnp.moveaxis(q.reshape(B, H, NI, BS, dk), 2, 0)   # (NI, B, H, ., .)
    kb = jnp.moveaxis(k.reshape(B, H, NJ, BS, dk), 2, 0)
    q_act = qb[a_src]                                   # (A, B, H, BS, dk)
    k_act = kb[a_tgt]
    inv = 1.0 / jnp.sqrt(jnp.asarray(dk, f32))
    s_act = jnp.einsum("abhsd,abhtd->abhst", q_act, k_act).astype(f32) \
        * inv + bias_tiles[:, None].astype(f32)
    pat_act = (pattern[a_tgt, active_slot] > 0)         # (A, BS, BS)
    mx_j = jax.ops.segment_max(
        s_act.max(axis=3), a_tgt, num_segments=NJ,
        indices_are_sorted=True,
    )                                                   # (NJ, B, H, BS_tgt)
    es = jnp.exp(s_act - mx_j[a_tgt][:, :, :, None, :])
    den_j = seg_t(es.sum(axis=3), a_tgt)
    inv_d = 1.0 / jnp.maximum(den_j, 1e-30)
    att = es * inv_d[a_tgt][:, :, :, None, :] \
        * pat_act[:, None, None, :, :]
    cheb_a = cheb_tiles[:, None].astype(f32)            # (A, 1, H, BS, BS)

    # fused kernels: K1 dA+dΘ (target order), K2 dx (source order)
    from dstagnn_drought_tpu.ops.pallas.bell_bwd import (
        bell_bwd_dA_dtheta,
        bell_bwd_dx,
    )

    interp = _resolve_interpret(interp_opt)
    w_act = jnp.moveaxis(att * cheb_a, 0, 1)            # (B, A, H, ., .)
    w_act = jnp.pad(
        w_act.astype(x.dtype), ((0, 0), (0, S), (0, 0), (0, 0), (0, 0))
    )
    a_src_p = jnp.pad(a_src, (0, S))
    gm_k = gm_flat.astype(x.dtype)
    dA_pad, dth = bell_bwd_dA_dtheta(
        tile_start, tile_count, a_src_p,
        thetas.astype(f32), gm_k, x, w_act, S_max=S, n_ch=C,
        interpret=interp, layout=layout,
    )
    dA_act = jnp.moveaxis(dA_pad[:, :A], 1, 0)          # (A, B, H, ., .)
    order_tgt = jnp.pad(a_tgt[src_order], (0, S))
    order_idx = jnp.pad(src_order, (0, S))
    dx = bell_bwd_dx(
        src_start, src_count, order_tgt, order_idx,
        thetas.astype(f32), gm_k, w_act,
        max_out=max_out, n_ch=C, np_src=Np_src, interpret=interp,
        layout=layout,
    ).astype(x.dtype)

    # softmax backward on the active list (A-leading throughout)
    datt = cheb_a * dA_act
    dot_j = seg_t((att * datt).sum(axis=3), a_tgt)
    ds = att * (datt - dot_j[a_tgt][:, :, :, None, :])
    dq_act = jnp.einsum("abhst,abhtd->abhsd", ds, k_act) * inv
    dq = jnp.moveaxis(
        jax.ops.segment_sum(dq_act, a_src, num_segments=NI), 0, 2
    ).reshape(B, H, Np_src, dk).astype(q.dtype)
    dk_act = jnp.einsum("abhst,abhsd->abhtd", ds, q_act) * inv
    dk_ = jnp.moveaxis(seg_t(dk_act, a_tgt), 0, 2) \
        .reshape(B, H, Np_tgt, dk).astype(k.dtype)
    dbias_tiles = ds.sum(axis=1)                        # (A, H, BS, BS)
    return (None, None, None, None, None, None,
            dq, dk_, dbias_tiles.astype(bias_tiles.dtype), None, dx,
            dth.astype(thetas.dtype), None, None, None, None)


bell_tiles_out.defvjp(_fwd_tiles, _bwd_tiles)


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
    Returns (B, N, C_out, T), ReLU applied. Requires a ``BlockEllGraph``
    built by ``block_ell_from_adjacency`` (for the active-tile list) on a
    graph where every target column has an in-edge (``include_self=True``,
    the model's configuration — see the module docstring for why).
    """
    if bell.active_src is None or bell.tile_start is None:
        raise ValueError(
            "bell_cheb_conv_with_sat_pallas needs the active-tile list; "
            "build the graph with block_ell_from_adjacency()."
        )
    if not bell.covered:
        raise ValueError(
            "the fused BELL kernel requires every target column to have at "
            "least one in-edge (use include_self=True)."
        )
    B, N, C, T = x.shape
    Np = bell.padded_nodes
    Co = thetas.shape[-1]

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
    # fold the edge-pattern mask into the bias plane: one XLA where() on the
    # (H, Np, Np) plane instead of an extra (BS, BS) kernel operand per slot
    biasm_p = jnp.where(bell.adj_bool[None], bias_p, _NEG)
    cheb_p = pad_n(pad_n(cheb_polys.astype(f32), 1), 2)  # (H, Np, Np)
    # x keeps its compute dtype (bf16 halves the dominant DMA volume and
    # doubles the SpMM MXU rate; the kernel accumulates in f32); t-major
    # layout so the in-kernel Θ mix stays within an M-tile
    xm = pad_n(x.transpose(0, 1, 3, 2).reshape(B, N, T * C), 1)
    # Mosaic requires HBM slices along the lane dim to be 128-aligned: pad
    # M = T·C up to a multiple of lcm(128, C) with zero t-blocks (e.g. the
    # GAMBIA first block: C=4, M=576 → 640). The fake t-blocks produce fake
    # output columns, sliced off below; their cotangent is zero.
    m_step = 128 * C // _gcd(128, C)
    M_pad = -(-(T * C) // m_step) * m_step
    if M_pad != T * C:
        xm = jnp.pad(xm, ((0, 0), (0, 0), (0, M_pad - T * C)))

    # meta (static) = (max outgoing tiles per source, interpret). max_out
    # sizes the fused backward's dx loop; None (no sorted lists) falls back
    # to the XLA VJP. The fused backward wins when the feature width
    # M = T·C is large (GAMBIA M=4608: 1.50× dense fwd+bwd; PEMS07 M=384:
    # the per-tile fixed costs lose to the XLA slot-scan — measured,
    # BENCH_NOTES round 3), so gate on M. Off-TPU (interpret) keep it ON so
    # tests cover the kernels.
    interp = _resolve_interpret(None)
    fused_bwd = (
        bell.src_order is not None and bell.max_src_blocks > 0
        and (T * C >= 1024 or interp)
    )
    out = bell_block_out(
        (bell.max_src_blocks if fused_bwd else None, None),
        bell.tile_start, bell.tile_count, bell.active_src, bell.active_tgt,
        bell.block_idx,
        (bell.pattern & bell.block_mask[:, :, None, None]).astype(f32),
        q, k, biasm_p, cheb_p, xm, thetas.astype(f32),
        bell.active_slot if fused_bwd else None,
        bell.src_order if fused_bwd else None,
        bell.src_start if fused_bwd else None,
        bell.src_count if fused_bwd else None,
    )
    # (B, Np, nt_pad·Co) t-major → drop fake t-blocks → (B, N, Co, T)
    return out[:, :N, : T * Co].reshape(B, N, T, Co).transpose(
        0, 1, 3, 2
    ).astype(x.dtype)


def bell_cheb_conv_tiles(
    x: jax.Array,             # (B, N, C, T)
    emb: jax.Array,           # (B, N, d_model) spatial embeddings
    bell: BlockEllGraph,
    *,
    wq: jax.Array,
    wk: jax.Array,
    mask_tiles: jax.Array,    # (A, K, BS, BS) learnable masks ON THE SUPPORT
    pattern_tiles: jax.Array,  # (A, BS, BS) bool — edge pattern per tile
    pa_tiles: jax.Array,      # (A, BS, BS) f32 — adj_pa values per tile
    cheb_tiles: jax.Array,    # (A, K, BS, BS) f32 — T_k values per tile
    thetas: jax.Array,
    n_heads: int,
    d_k: int,
    layout: str = "auto",
) -> jax.Array:
    """Tile-resident BELL spatial conv — the O(N·band) end-to-end path.

    Same semantics as :func:`bell_cheb_conv_with_sat_pallas`, but the
    learnable graph masks live ONLY on the active-tile support and adj_pa /
    Chebyshev values arrive as precomputed per-tile constants
    (``ops.block_sparse.build_bell_tile_constants``). Exact by the
    reference's own bias semantics — ``adj_pa ⊙ mask_k``
    (model/DSTAGNN_my.py:126) with adj_pa binarized (lib/dataloader.py:11-15)
    zeroes every off-support mask entry AND its gradient — while eliminating
    the dense (K, N, N) mask parameters (+3× Adam state) and every
    (H, Np, Np) plane build/transpose/scatter from the train step.

    ``layout`` ∈ {"auto", "c", "t"}: "c" (round 5) streams features as C
    blocks of T — x enters as a PLAIN RESHAPE of (B, N, C, T) (channels
    zero-padded when C·T is not lane-aligned, with zero Θ rows) and the
    output reshapes straight to (B, N, Co, T), removing every
    kernel-boundary transpose. "auto" picks "c" whenever the fused
    backward is active and the output is lane-aligned.
    """
    if bell.active_src is None or bell.tile_start is None:
        raise ValueError(
            "bell_cheb_conv_tiles needs the active-tile list; build the "
            "graph with block_ell_from_adjacency()."
        )
    if not bell.covered:
        raise ValueError(
            "the fused BELL kernel requires every target column to have at "
            "least one in-edge (use include_self=True)."
        )
    B, N, C, T = x.shape
    Np = bell.padded_nodes
    Co = thetas.shape[-1]

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

    # bias = adj_pa ⊙ mask at pattern entries, -1e30 elsewhere — all on the
    # active-tile support; the where() also zeroes off-pattern mask grads
    bias_t = jnp.where(
        pattern_tiles[:, None],
        (pa_tiles[:, None] * mask_tiles).astype(f32),
        jnp.asarray(_NEG, f32),
    )                               # (A, H, BS, BS)

    interp = _resolve_interpret(None)
    has_lists = bell.src_order is not None and bell.max_src_blocks > 0
    # t-major: the fused K1/K2 backward only beats the XLA slot-scan when
    # the feature width amortizes per-tile fixed costs (measured, round 3)
    fused_bwd = has_lists and (T * C >= 1024 or interp)
    if layout == "auto" and fused_bwd and (Co * T) % 128 == 0:
        # feasibility probe: fall back to t-major when the c-major forward
        # has no VMEM-feasible tiling at this dtype (e.g. f32 at
        # GAMBIA-conf doubles every buffer and does not fit; bf16 does)
        C_pad_probe = c_channel_pad(C, T)
        use_c = c_layout_feasible(
            B=B, M=C_pad_probe * T, n_ch=C_pad_probe, Co=Co,
            max_slots=int(bell.max_blocks), BS=bell.block_size,
            H=n_heads, dk=d_k,
            xb=2 if x.dtype == jnp.bfloat16 else 4,
        )
    else:
        use_c = layout == "c"
    if use_c:
        # c-major always runs the fused backward (no slot-scan variant)
        fused_bwd = has_lists
        if not fused_bwd:
            raise ValueError("layout='c' requires the fused backward "
                             "(sorted source lists on the BlockEllGraph).")
    th = thetas.astype(f32)
    if use_c:
        # c-major: x is a plain reshape; lane alignment comes from padding
        # CHANNELS (zero Θ rows → zero contribution and zero grads via the
        # pad VJP's slice), never from fake time blocks
        C_pad = c_channel_pad(C, T)
        x_cm = x if C_pad == C else jnp.pad(
            x, ((0, 0), (0, 0), (0, C_pad - C), (0, 0))
        )
        xm = pad_n(x_cm.reshape(B, N, C_pad * T), 1)
        if C_pad != C:
            th = jnp.pad(th, ((0, 0), (0, C_pad - C), (0, 0)))
    else:
        xm = pad_n(x.transpose(0, 1, 3, 2).reshape(B, N, T * C), 1)
        m_step = 128 * C // _gcd(128, C)
        M_pad = -(-(T * C) // m_step) * m_step
        if M_pad != T * C:
            xm = jnp.pad(xm, ((0, 0), (0, 0), (0, M_pad - T * C)))

    out = bell_tiles_out(
        (bell.max_src_blocks if fused_bwd else None, None,
         "c" if use_c else "t"),
        bell.tile_start, bell.tile_count, bell.active_src, bell.active_tgt,
        bell.block_idx,
        (bell.pattern & bell.block_mask[:, :, None, None]).astype(f32),
        q, k, bias_t, cheb_tiles.astype(f32), xm, th,
        bell.active_slot if fused_bwd else None,
        bell.src_order if fused_bwd else None,
        bell.src_start if fused_bwd else None,
        bell.src_count if fused_bwd else None,
    )
    if use_c:
        return out[:, :N].reshape(B, N, Co, T).astype(x.dtype)
    return out[:, :N, : T * Co].reshape(B, N, T, Co).transpose(
        0, 1, 3, 2
    ).astype(x.dtype)
