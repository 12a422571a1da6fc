"""Fused Pallas backward for the BELL attention-modulated Chebyshev conv.

Round-3 measurements (BENCH_NOTES "BELL kernel progression") put the fused
FORWARD at 1.77× dense at GAMBIA (bf16) but the train step at parity: the
XLA-recompute VJP pays ~3× the forward's matmul volume through gathers and
scatters. The backward's three big matmul families are

  dA   [per active tile]  x_src · g_aggᵀ          (SDDMM-like, contracts M)
  agg  [per active tile]  wᵀ · x_src → dΘ          (the forward SpMM again)
  dx   [per SOURCE tile]  Σ_targets w · g_agg      (transposed-graph SpMM)

where g_agg = (g ⊙ relu-mask) Θᵀ per head — recomputed IN-KERNEL per tile
from the (B, Np, nt·Co) cotangent, so the (B, H, Np, M) tensor (481 MB f32
at GAMBIA) never exists, and where w = T_k ⊙ softmax comes from one cheap
XLA recompute of the block softmax (the only XLA-side tensor is
(B, A, H, BS, BS), ~40 MB at GAMBIA).

Two kernels:
  * K1 ``bell_bwd_dA_dtheta`` — target-ordered (same active list as the
    forward): streams x and w slots, accumulates dA per slot across M-tiles
    (written back per active slot), and accumulates dΘ across the whole
    grid in a resident output block.
  * K2 ``bell_bwd_dx`` — SOURCE-ordered (``BlockEllGraph.src_order``):
    each grid step owns one dx output block and loops over that source's
    outgoing tiles, so dx needs no scatter at all.

The small grads (dq, dk, dbias — SDDMM-sized) and the softmax backward stay
in XLA; their tensors are (B, H, NJ, S, BS, BS)-sized, not M-sized.

Reference hot loop: /root/reference/model/DSTAGNN_my.py:117-133.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def _g_aggT(gm_tile, theta_h, C, Co, ntt, BS):
    """(BS, ntt·Co) cotangent tile → g_aggᵀ (TM, BS) for one head.

    Uses the forward epilogue's transpose trick (keep the big dim on lanes):
    Gm = rearrange(gm) (Co, ntt·BS); P = Θ_h · Gm (C, ntt·BS);
    g_aggᵀ[tb·C+c, t] = P[c, tb·BS+t].
    """
    gm_arr = gm_tile.T.reshape(ntt, Co, BS).transpose(1, 0, 2).reshape(
        Co, ntt * BS
    )
    p = jax.lax.dot_general(
        theta_h, gm_arr,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (C, ntt·BS)
    return p.reshape(C, ntt, BS).transpose(1, 0, 2).reshape(ntt * C, BS), \
        gm_arr


def _gm2_c(gm_tile, Co, T_len, BS):
    """c-major (BS, Co·T) cotangent tile → Gm2 (Co, T·BS) f32 — the shared
    operand of the c-major g_aggᵀ (Θ_h · Gm2) and dΘ (Agg2 · Gm2ᵀ)."""
    return gm_tile.T.astype(jnp.float32).reshape(Co, T_len * BS)


def _g_aggT_c(gm2, theta_h_slice, T_len, BS):
    """Gm2 (Co, T·BS) + Θ_h channel slice (Ct, Co) → g_aggᵀ (Ct·T, BS)."""
    p = jax.lax.dot_general(
        theta_h_slice, gm2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (Ct, T·BS)
    return p.reshape(p.shape[0] * T_len, BS)


def _make_k1_c(SC: int, n_chunks: int, S_max: int, T_len: int):
    """c-major K1 (dA + dΘ). Grid (B, NJ, NM), M innermost. The full
    (BS, Co·T) cotangent tile and its Gm2 rearrangement are built once per
    (b, j) at mt == 0 and persist in scratch across the channel M-tiles;
    dΘ rows for this M-tile's channels accumulate into the resident dΘ
    block at a dynamic row offset."""

    def kern(start_ref, count_ref, src_ref,
             th_ref, gm_hbm, x_hbm, w_hbm,
             dA_hbm, dth_ref,
             gm_sc, gm2_sc, x_sc, w_sc, dA_sc, agg_sc, sem):
        b, j, mt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        H, C, Co = th_ref.shape
        BS = x_sc.shape[-2]
        TM = x_sc.shape[-1]
        Ct = TM // T_len
        start = start_ref[j]
        count = count_ref[j]

        @pl.when((b == 0) & (j == 0) & (mt == 0))
        def _():
            dth_ref[...] = jnp.zeros_like(dth_ref)

        @pl.when(mt == 0)
        def _():
            dA_sc[...] = jnp.zeros_like(dA_sc)
            gmdma = pltpu.make_async_copy(
                gm_hbm.at[b, pl.ds(j * BS, BS)], gm_sc, sem.at[0, 0],
            )
            gmdma.start()
            gmdma.wait()
            gm2_sc[...] = _gm2_c(gm_sc[...], Co, T_len, BS)

        agg_sc[...] = jnp.zeros_like(agg_sc)
        gm2 = gm2_sc[...]
        gts = [
            _g_aggT_c(gm2, th_ref[h, pl.ds(mt * Ct, Ct)], T_len, BS)
            for h in range(H)
        ]

        def chunk(c):
            base = c * SC

            def xdma(u):
                src = src_ref[start + base + u]
                return pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(src * BS, BS), pl.ds(mt * TM, TM)],
                    x_sc.at[u], sem.at[u, 1],
                )

            wdma = pltpu.make_async_copy(
                w_hbm.at[b, pl.ds(start + base, SC)], w_sc, sem.at[0, 2],
            )
            wdma.start()
            for u in range(SC):
                xdma(u).start()
            wdma.wait()
            for u in range(SC):
                xdma(u).wait()
            for u in range(SC):
                valid = (base + u) < count
                x_u = x_sc[u]
                for h in range(H):
                    # dA[s] += x_s · g_aggᵀ  (BS_src, TM) × (TM, BS_tgt)
                    contrib = jax.lax.dot_general(
                        x_u, gts[h].astype(x_u.dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dA_sc[base + u, h] += jnp.where(valid, contrib, 0.0)
                    # agg += wᵀ · x_s  (BS_tgt, TM)
                    a_c = jax.lax.dot_general(
                        w_sc[u, h], x_u,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    agg_sc[h] += jnp.where(valid, a_c, 0.0)

        for c in range(n_chunks):
            if c == 0:
                chunk(0)
            else:
                pl.when(c * SC < count)(lambda c=c: chunk(c))

        # dΘ rows for this M-tile's channels:
        # dΘ[c0:c0+Ct] += Agg2 (Ct, T·BS) · Gm2ᵀ (T·BS, Co)
        for h in range(H):
            agg2 = agg_sc[h].T.reshape(Ct, T_len * BS)
            dth_ref[h, pl.ds(mt * Ct, Ct)] += jax.lax.dot_general(
                agg2, gm2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # write dA slots back at the last M-tile
        @pl.when(mt == pl.num_programs(2) - 1)
        def _():
            for s in range(S_max):
                @pl.when(s < count)
                def _(s=s):
                    out = pltpu.make_async_copy(
                        dA_sc.at[s], dA_hbm.at[b, start + s], sem.at[s, 1]
                    )
                    out.start()
                    out.wait()

    return kern


def _make_k2_c(SC: int, n_chunks: int, T_len: int):
    """c-major K2 (dx). Grid (B, NI, NM); per slot the FULL (BS, Co·T)
    cotangent tile of the target is streamed (all Co are needed for any
    channel subset) and rearranged once; g_aggᵀ per head is one matmul."""

    def kern(sstart_ref, scount_ref, order_tgt_ref, order_idx_ref,
             th_ref, gm_hbm, w_hbm,
             o_ref,
             gm_sc, w_sc, acc_sc, sem):
        b, i, mt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        H, C, Co = th_ref.shape
        BS = o_ref.shape[-2]
        TM = o_ref.shape[-1]
        Ct = TM // T_len
        sstart = sstart_ref[i]
        scount = scount_ref[i]
        acc_sc[...] = jnp.zeros_like(acc_sc)

        def slot(pos):
            jt = order_tgt_ref[sstart + pos]
            aidx = order_idx_ref[sstart + pos]
            gmdma = pltpu.make_async_copy(
                gm_hbm.at[b, pl.ds(jt * BS, BS)], gm_sc, sem.at[0, 0],
            )
            wdma = pltpu.make_async_copy(
                w_hbm.at[b, aidx], w_sc, sem.at[0, 1],
            )
            gmdma.start()
            wdma.start()
            gmdma.wait()
            wdma.wait()
            gm2 = _gm2_c(gm_sc[...], Co, T_len, BS)
            for h in range(H):
                gt_h = _g_aggT_c(
                    gm2, th_ref[h, pl.ds(mt * Ct, Ct)], T_len, BS
                )
                # dxᵀ += g_aggᵀ (TM, BS_tgt) · w_h (BS_src, BS_tgt)ᵀ
                acc_sc[...] += jax.lax.dot_general(
                    gt_h, w_sc[h].astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        def chunk(c):
            for u in range(SC):
                pos = c * SC + u
                pl.when(pos < scount)(lambda pos=pos: slot(pos))

        for c in range(n_chunks):
            if c == 0:
                chunk(0)
            else:
                pl.when(c * SC < scount)(lambda c=c: chunk(c))

        o_ref[0] = acc_sc[...].T.astype(o_ref.dtype)

    return kern


def _make_k1(SC: int, n_chunks: int, S_max: int, NM: int):
    """Target-ordered dA + dΘ kernel. Grid (B, NJ, NM), M innermost."""

    def kern(start_ref, count_ref, src_ref,
             th_ref, gm_hbm, x_hbm, w_hbm,
             dA_hbm, dth_ref,
             gm_sc, x_sc, w_sc, dA_sc, agg_sc, sem):
        b, j, mt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        H, C, Co = th_ref.shape
        BS = x_sc.shape[-2]
        TM = x_sc.shape[-1]
        ntt = TM // C
        GT = ntt * Co
        start = start_ref[j]
        count = count_ref[j]

        @pl.when((b == 0) & (j == 0) & (mt == 0))
        def _():
            dth_ref[...] = jnp.zeros_like(dth_ref)

        @pl.when(mt == 0)
        def _():
            dA_sc[...] = jnp.zeros_like(dA_sc)

        gmdma = pltpu.make_async_copy(
            gm_hbm.at[b, pl.ds(j * BS, BS), pl.ds(mt * GT, GT)],
            gm_sc, sem.at[0, 0],
        )
        gmdma.start()
        agg_sc[...] = jnp.zeros_like(agg_sc)
        gmdma.wait()
        gts = []
        gm_arr = None
        for h in range(H):
            gt_h, gm_arr = _g_aggT(
                gm_sc[...].astype(jnp.float32), th_ref[h], C, Co, ntt, BS
            )
            gts.append(gt_h)

        def chunk(c):
            base = c * SC

            def xdma(u):
                src = src_ref[start + base + u]
                return pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(src * BS, BS), pl.ds(mt * TM, TM)],
                    x_sc.at[u], sem.at[u, 1],
                )

            wdma = pltpu.make_async_copy(
                w_hbm.at[b, pl.ds(start + base, SC)], w_sc, sem.at[0, 2],
            )
            wdma.start()
            for u in range(SC):
                xdma(u).start()
            wdma.wait()
            for u in range(SC):
                xdma(u).wait()
            for u in range(SC):
                valid = (base + u) < count
                x_u = x_sc[u]
                for h in range(H):
                    # dA[s] += x_s · g_aggᵀ  (BS_src, TM) × (TM, BS_tgt)
                    contrib = jax.lax.dot_general(
                        x_u, gts[h].astype(x_u.dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dA_sc[base + u, h] += jnp.where(valid, contrib, 0.0)
                    # agg += wᵀ · x_s  (BS_tgt, TM)
                    a_c = jax.lax.dot_general(
                        w_sc[u, h], x_u,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    agg_sc[h] += jnp.where(valid, a_c, 0.0)

        for c in range(n_chunks):
            if c == 0:
                chunk(0)
            else:
                pl.when(c * SC < count)(lambda c=c: chunk(c))

        # dΘ_h += Agg_arr (C, ntt·BS) · Gm_arrᵀ (ntt·BS, Co)
        for h in range(H):
            agg_arr = agg_sc[h].T.reshape(ntt, C, BS).transpose(
                1, 0, 2
            ).reshape(C, ntt * BS)
            dth_ref[h] += jax.lax.dot_general(
                agg_arr, gm_arr,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # write dA slots back at the last M-tile
        @pl.when(mt == NM - 1)
        def _():
            for s in range(S_max):
                @pl.when(s < count)
                def _(s=s):
                    out = pltpu.make_async_copy(
                        dA_sc.at[s], dA_hbm.at[b, start + s], sem.at[s, 1]
                    )
                    out.start()
                    out.wait()

    return kern


@functools.partial(
    jax.jit, static_argnames=("S_max", "n_ch", "interpret", "layout")
)
def bell_bwd_dA_dtheta(
    tile_start, tile_count, a_src,   # (NJ,), (NJ,), (A_pad,) int32
    thetas,                          # (H, C, Co) f32
    gm,                              # (B, Np_tgt, nt·Co | Co·T) x-dtype
    x,                               # (B, Np_src, M) x-dtype
    w,                               # (B, A_pad, H, BS, BS) x-dtype
    *, S_max: int, n_ch: int, interpret: bool = False, layout: str = "t",
):
    """K1: per-active-slot dA (B, A_pad, H, BS, BS) f32 and dΘ (H, C, Co)."""
    if layout == "c":
        return _bell_bwd_dA_dtheta_c(
            tile_start, tile_count, a_src, thetas, gm, x, w,
            S_max=S_max, n_ch=n_ch, interpret=interpret,
        )
    B, A_pad, H, BS, _ = w.shape
    NJ = tile_start.shape[0]
    M = x.shape[-1]
    C, Co = n_ch, thetas.shape[-1]
    SC = min(S_max, 4)
    n_chunks = -(-S_max // SC)
    xb = 2 if x.dtype == jnp.bfloat16 else 4
    step = 128 * C // _gcd(128, C)

    def need(tm):
        ntt = tm // C
        return (BS * ntt * Co * 4                 # gm tile
                + SC * BS * tm * xb               # x slots
                + SC * H * BS * BS * xb           # w slots
                + S_max * H * BS * BS * 4         # dA accumulator
                + H * BS * tm * 4                 # agg accumulator
                + H * tm * BS * 4                 # g_aggT temps
                + 2 * Co * ntt * BS * 4)          # rearrange temps

    TM = M
    while need(TM) > 10 * 2**20:
        cand = None
        for c in range(TM - step, step - 1, -step):
            if M % c == 0:
                cand = c
                break
        if cand is None:
            raise ValueError(
                f"bell_bwd_dA_dtheta: no M-tile of M={M} fits VMEM "
                f"(S_max={S_max}, BS={BS}, H={H})"
            )
        TM = cand
    NM = M // TM
    GT = (TM // C) * Co

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, NJ, NM),
        in_specs=[
            pl.BlockSpec((H, C, Co),
                         lambda b, j, m, s, c, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # gm
            pl.BlockSpec(memory_space=pltpu.HBM),   # x
            pl.BlockSpec(memory_space=pltpu.HBM),   # w
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # dA
            pl.BlockSpec((H, C, Co),
                         lambda b, j, m, s, c, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # dΘ (resident)
        ],
        scratch_shapes=[
            pltpu.VMEM((BS, GT), gm.dtype),
            pltpu.VMEM((SC, BS, TM), x.dtype),
            pltpu.VMEM((SC, H, BS, BS), w.dtype),
            pltpu.VMEM((S_max, H, BS, BS), jnp.float32),
            pltpu.VMEM((H, BS, TM), jnp.float32),
            pltpu.SemaphoreType.DMA((max(SC, S_max), 3)),
        ],
    )
    return pl.pallas_call(
        _make_k1(SC, n_chunks, S_max, NM),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, A_pad, H, BS, BS), jnp.float32),
            jax.ShapeDtypeStruct((H, C, Co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(tile_start, tile_count, a_src, thetas, gm, x, w)


def _bell_bwd_dA_dtheta_c(
    tile_start, tile_count, a_src, thetas, gm, x, w,
    *, S_max: int, n_ch: int, interpret: bool,
):
    """c-major K1 spec builder (see :func:`bell_bwd_dA_dtheta`)."""
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        C_VMEM_BUDGET,
        _pick_tm_c,
    )

    B, A_pad, H, BS, _ = w.shape
    NJ = tile_start.shape[0]
    M = x.shape[-1]
    C, Co = n_ch, thetas.shape[-1]
    T_len = M // C
    GT = Co * T_len
    SC = min(S_max, 4)
    n_chunks = -(-S_max // SC)
    xb = 2 if x.dtype == jnp.bfloat16 else 4

    def need(tm):
        return (BS * GT * xb                      # gm tile (full Co·T)
                + Co * T_len * BS * 4             # Gm2 scratch (f32)
                + SC * BS * tm * xb               # x slots
                + SC * H * BS * BS * xb           # w slots
                + S_max * H * BS * BS * 4         # dA accumulator
                + H * BS * tm * 4                 # agg accumulator
                + H * tm * BS * 4                 # g_aggT temps
                + 2 * tm * BS * 4)                # agg2/dθ temps

    TM = _pick_tm_c(M, T_len, need, C_VMEM_BUDGET)
    if TM is None:
        raise ValueError(
            f"bell_bwd_dA_dtheta (c-major): no M-tile of M={M} fits VMEM "
            f"(S_max={S_max}, BS={BS}, H={H}); use layout='t'."
        )
    NM = M // TM

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, NJ, NM),
        in_specs=[
            pl.BlockSpec((H, C, Co),
                         lambda b, j, m, s, c, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # gm
            pl.BlockSpec(memory_space=pltpu.HBM),   # x
            pl.BlockSpec(memory_space=pltpu.HBM),   # w
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # dA
            pl.BlockSpec((H, C, Co),
                         lambda b, j, m, s, c, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # dΘ (resident)
        ],
        scratch_shapes=[
            pltpu.VMEM((BS, GT), gm.dtype),
            pltpu.VMEM((Co, T_len * BS), jnp.float32),
            pltpu.VMEM((SC, BS, TM), x.dtype),
            pltpu.VMEM((SC, H, BS, BS), w.dtype),
            pltpu.VMEM((S_max, H, BS, BS), jnp.float32),
            pltpu.VMEM((H, BS, TM), jnp.float32),
            pltpu.SemaphoreType.DMA((max(SC, S_max), 3)),
        ],
    )
    return pl.pallas_call(
        _make_k1_c(SC, n_chunks, S_max, T_len),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, A_pad, H, BS, BS), jnp.float32),
            jax.ShapeDtypeStruct((H, C, Co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=14 * 2**20,
        ),
        interpret=interpret,
    )(tile_start, tile_count, a_src, thetas, gm, x, w)


def _make_k2(SC: int, n_chunks: int):
    """Source-ordered dx kernel. Grid (B, NI, NM); each step OWNS one dx
    block — no scatter. Loops the source's outgoing slots; per slot
    recomputes the target's g_agg tile from gm and Θ."""

    def kern(sstart_ref, scount_ref, order_tgt_ref, order_idx_ref,
             th_ref, gm_hbm, w_hbm,
             o_ref,
             gm_sc, w_sc, acc_sc, sem):
        b, i, mt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        H, C, Co = th_ref.shape
        BS = o_ref.shape[-2]
        TM = o_ref.shape[-1]
        ntt = TM // C
        GT = ntt * Co
        sstart = sstart_ref[i]
        scount = scount_ref[i]
        acc_sc[...] = jnp.zeros_like(acc_sc)

        def slot(pos):
            jt = order_tgt_ref[sstart + pos]
            aidx = order_idx_ref[sstart + pos]
            gmdma = pltpu.make_async_copy(
                gm_hbm.at[b, pl.ds(jt * BS, BS), pl.ds(mt * GT, GT)],
                gm_sc, sem.at[0, 0],
            )
            wdma = pltpu.make_async_copy(
                w_hbm.at[b, aidx], w_sc, sem.at[0, 1],
            )
            gmdma.start()
            wdma.start()
            gmdma.wait()
            wdma.wait()
            for h in range(H):
                gt_h, _ = _g_aggT(
                    gm_sc[...].astype(jnp.float32), th_ref[h],
                    C, Co, ntt, BS,
                )
                # dxᵀ += g_aggᵀ (TM, BS_tgt) · w_h (BS_src, BS_tgt)ᵀ
                acc_sc[...] += jax.lax.dot_general(
                    gt_h, w_sc[h].astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        def chunk(c):
            for u in range(SC):
                pos = c * SC + u
                pl.when(pos < scount)(lambda pos=pos: slot(pos))

        for c in range(n_chunks):
            if c == 0:
                chunk(0)
            else:
                pl.when(c * SC < scount)(lambda c=c: chunk(c))

        o_ref[0] = acc_sc[...].T.astype(o_ref.dtype)

    return kern


@functools.partial(
    jax.jit, static_argnames=("max_out", "n_ch", "np_src", "interpret",
                              "layout")
)
def bell_bwd_dx(
    src_start, src_count,            # (NI,), (NI,) int32
    order_tgt, order_idx,            # (A_pad,), (A_pad,) int32
    thetas,                          # (H, C, Co) f32
    gm,                              # (B, Np_tgt, nt·Co | Co·T) x-dtype
    w,                               # (B, A_pad, H, BS, BS) x-dtype
    *, max_out: int, n_ch: int, np_src: int, interpret: bool = False,
    layout: str = "t",
):
    """K2: dx (B, Np_src, M) — transposed-graph SpMM, scatter-free."""
    if layout == "c":
        return _bell_bwd_dx_c(
            src_start, src_count, order_tgt, order_idx, thetas, gm, w,
            max_out=max_out, n_ch=n_ch, np_src=np_src, interpret=interpret,
        )
    B, A_pad, H, BS, _ = w.shape
    NI = src_start.shape[0]
    C, Co = n_ch, thetas.shape[-1]
    nt = gm.shape[-1] // Co
    M = nt * C
    SC = min(max_out, 4)
    n_chunks = -(-max_out // SC)
    xb = 2 if gm.dtype == jnp.bfloat16 else 4
    step = 128 * C // _gcd(128, C)

    def need(tm):
        ntt = tm // C
        return (BS * ntt * Co * xb                # gm tile
                + H * BS * BS * xb                # w slot
                + tm * BS * 4                     # dxᵀ accumulator
                + 2 * tm * BS * 4                 # out + g_aggT temps
                + 2 * Co * ntt * BS * 4)

    TM = M
    while need(TM) > 10 * 2**20:
        cand = None
        for c in range(TM - step, step - 1, -step):
            if M % c == 0:
                cand = c
                break
        if cand is None:
            raise ValueError(
                f"bell_bwd_dx: no M-tile of M={M} fits VMEM (BS={BS})"
            )
        TM = cand
    NM = M // TM
    GT = (TM // C) * Co

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, NI, NM),
        in_specs=[
            pl.BlockSpec((H, C, Co),
                         lambda b, i, m, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # gm
            pl.BlockSpec(memory_space=pltpu.HBM),   # w
        ],
        out_specs=pl.BlockSpec(
            (1, BS, TM), lambda b, i, m, *_: (b, i, m),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BS, GT), gm.dtype),
            pltpu.VMEM((H, BS, BS), w.dtype),
            pltpu.VMEM((TM, BS), jnp.float32),
            pltpu.SemaphoreType.DMA((1, 2)),
        ],
    )
    return pl.pallas_call(
        _make_k2(SC, n_chunks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, np_src, M), gm.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(src_start, src_count, order_tgt, order_idx, thetas, gm, w)


def _bell_bwd_dx_c(
    src_start, src_count, order_tgt, order_idx, thetas, gm, w,
    *, max_out: int, n_ch: int, np_src: int, interpret: bool,
):
    """c-major K2 spec builder (see :func:`bell_bwd_dx`)."""
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        C_VMEM_BUDGET,
        _pick_tm_c,
    )

    B, A_pad, H, BS, _ = w.shape
    NI = src_start.shape[0]
    C, Co = n_ch, thetas.shape[-1]
    T_len = gm.shape[-1] // Co
    M = C * T_len
    GT = Co * T_len
    SC = min(max_out, 4)
    n_chunks = -(-max_out // SC)
    xb = 2 if gm.dtype == jnp.bfloat16 else 4

    def need(tm):
        return (BS * GT * xb                  # gm tile (full Co·T)
                + Co * T_len * BS * 4         # Gm2 temp (f32)
                + H * BS * BS * xb            # w slot
                + tm * BS * 4                 # dxᵀ accumulator
                + 2 * tm * BS * 4)            # out + g_aggT temps

    TM = _pick_tm_c(M, T_len, need, C_VMEM_BUDGET)
    if TM is None:
        raise ValueError(
            f"bell_bwd_dx (c-major): no M-tile of M={M} fits VMEM "
            f"(BS={BS}); use layout='t'."
        )
    NM = M // TM

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, NI, NM),
        in_specs=[
            pl.BlockSpec((H, C, Co),
                         lambda b, i, m, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # gm
            pl.BlockSpec(memory_space=pltpu.HBM),   # w
        ],
        out_specs=pl.BlockSpec(
            (1, BS, TM), lambda b, i, m, *_: (b, i, m),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BS, GT), gm.dtype),
            pltpu.VMEM((H, BS, BS), w.dtype),
            pltpu.VMEM((TM, BS), jnp.float32),
            pltpu.SemaphoreType.DMA((1, 2)),
        ],
    )
    return pl.pallas_call(
        _make_k2_c(SC, n_chunks, T_len),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, np_src, M), gm.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=14 * 2**20,
        ),
        interpret=interpret,
    )(src_start, src_count, order_tgt, order_idx, thetas, gm, w)
