"""Fused Pallas TPU kernel for the DSTAGNN block's spatial middle.

Covers, in ONE forward kernel and ONE hand-written backward kernel
(reference model/DSTAGNN_my.py:232-236 + cheb_conv_withSAt :117-133):

    x_tat = pre_conv(TATout)            Conv2d(T→d_model, kernel (1,F))
    SEmx  = dropout(LayerNorm(x_tat + spatial pos-embedding))
    STAt  = Q.K^T/sqrt(d_k)             one fused QK projection, K heads
    att_k = softmax_i(STAt_k + adj_pa ⊙ mask_k)   (SOURCE-axis softmax)
    out   = relu( Σ_k (T_k ⊙ att_k)^T · X · Θ_k )

Design notes (why it's shaped this way):
  * The train step is bound by per-op overhead / tile-padding waste across
    hundreds of small ops (BENCH_NOTES.md). This kernel holds one batch
    row's entire spatial pipeline in VMEM: the N×d_model embedding, the
    K (N, N) score/attention planes, and the aggregation matmuls.
  * Θ_k is applied as a precomputed Kronecker factor W_k = kron(Θ_k, I_T)
    so both the channel mix and its backward are plain 2-D MXU matmuls in
    the (N, C·T) domain — no 3-D transposes inside the kernel. kron() is
    built outside the custom_vjp, so dΘ falls out of autodiff.
  * Dropout takes a precomputed 0/1 mask (generated with the same PRNG
    stream as the unfused path → bit-identical training semantics).
  * Weight/bias/pos gradients accumulate across grid steps in the backward
    kernel's outputs (TPU grids are sequential).
  * adj_pa ⊙ mask_k (the learnable graph-mask bias) is also precomputed
    outside, so dmasks = adj_pa ⊙ dbias comes from autodiff.

Off-TPU the wrapper runs in interpret mode (CPU tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _ln_fwd(z):
    mu = z.mean(axis=-1, keepdims=True)
    var = ((z - mu) ** 2).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    return (z - mu) * inv, inv


def _ln_bwd(g, x_hat, inv, gamma):
    gy = g * gamma
    m1 = gy.mean(axis=-1, keepdims=True)
    m2 = (gy * x_hat).mean(axis=-1, keepdims=True)
    return inv * (gy - m1 - x_hat * m2)


def _mm(a, b, contract, prefer=jnp.float32):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=prefer,
    )


def _recompute(tat, xm, dmask, pw, pb, pos, gs, bs, wqk, bias, cheb, wth,
               *, K, d_k, keep, mm_dtype):
    """Forward pieces for one batch row. Matmul operands run in ``mm_dtype``
    (the caller's activation dtype — bf16 doubles the MXU rate) with f32
    accumulation; LayerNorm/softmax statistics are f32.

    tat: (N, F·T); xm: (N, C·T); dmask: (N, d); pw: (F·T, d); pos: (N, d);
    wqk: (d, 2·K·d_k); bias/cheb: (K, N, N); wth: (K, C·T, Co·T).
    """
    md = mm_dtype
    x_tat = _mm(tat.astype(md), pw.astype(md), (((1,), (0,)))) + pb  # (N, d)
    xs_hat, inv_s = _ln_fwd(x_tat + pos)
    semx_pre = xs_hat * gs + bs
    semx = (semx_pre * dmask * (1.0 / keep)).astype(md)  # (N, d)
    qk = _mm(semx, wqk.astype(md), (((1,), (0,))))       # (N, 2·K·dk) f32
    inv_sqrt = 1.0 / (d_k ** 0.5)
    hk = K * d_k
    atts, aggs = [], []
    out = None
    xmm = xm.astype(md)
    for k in range(K):
        q_k = qk[:, k * d_k : (k + 1) * d_k].astype(md)
        k_k = qk[:, hk + k * d_k : hk + (k + 1) * d_k].astype(md)
        s = _mm(q_k, k_k, (((1,), (1,)))) * inv_sqrt + bias[k]   # (Ni, Nj)
        # softmax over the SOURCE axis i (rows), per target column j
        e = jnp.exp(s - s.max(axis=0, keepdims=True))
        colsum = e.sum(axis=0, keepdims=True)
        att = e / colsum
        A = (cheb[k] * att).astype(md)
        agg = _mm(A, xmm, (((0,), (0,))))              # A^T @ X → (Nj, C·T)
        o = _mm(agg.astype(md), wth[k].astype(md), (((1,), (0,))))
        out = o if out is None else out + o            # (Nj, Co·T)
        atts.append(att)
        aggs.append(agg)
    return x_tat, xs_hat, inv_s, semx_pre, semx, qk, atts, aggs, out


def _fwd_kernel(tat_ref, xm_ref, dmask_ref, pw_ref, pb_ref, pos_ref, gs_ref,
                bs_ref, wqk_ref, bias_ref, cheb_ref, wth_ref, out_ref,
                *, K, d_k, keep):
    f32 = jnp.float32
    *_, out = _recompute(
        tat_ref[0], xm_ref[0], dmask_ref[0].astype(f32),
        pw_ref[...], pb_ref[...].astype(f32)[0],
        pos_ref[...].astype(f32), gs_ref[...].astype(f32)[0],
        bs_ref[...].astype(f32)[0], wqk_ref[...],
        bias_ref[...].astype(f32), cheb_ref[...].astype(f32),
        wth_ref[...], K=K, d_k=d_k, keep=keep, mm_dtype=tat_ref.dtype,
    )
    out_ref[0] = jnp.maximum(out, 0.0).astype(out_ref.dtype)


def _bwd_kernel(tat_ref, xm_ref, dmask_ref, pw_ref, pb_ref, pos_ref, gs_ref,
                bs_ref, wqk_ref, bias_ref, cheb_ref, wth_ref, g_ref,
                dtat_ref, dxm_ref, dpw_ref, dpb_ref, dpos_ref, dgs_ref,
                dbs_ref, dwqk_ref, dbias_ref, dwth_ref,
                *, K, d_k, keep):
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dpw_ref[...] = jnp.zeros_like(dpw_ref)
        dpb_ref[...] = jnp.zeros_like(dpb_ref)
        dpos_ref[...] = jnp.zeros_like(dpos_ref)
        dgs_ref[...] = jnp.zeros_like(dgs_ref)
        dbs_ref[...] = jnp.zeros_like(dbs_ref)
        dwqk_ref[...] = jnp.zeros_like(dwqk_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dwth_ref[...] = jnp.zeros_like(dwth_ref)

    md = tat_ref.dtype
    tat = tat_ref[0]
    xm = xm_ref[0]
    dmask = dmask_ref[0].astype(f32)
    pw = pw_ref[...]
    pos = pos_ref[...].astype(f32)
    gs = gs_ref[...].astype(f32)[0]
    wqk = wqk_ref[...]
    bias = bias_ref[...].astype(f32)
    cheb = cheb_ref[...].astype(f32)
    wth = wth_ref[...]
    x_tat, xs_hat, inv_s, semx_pre, semx, qk, atts, aggs, out = _recompute(
        tat, xm, dmask, pw, pb_ref[...].astype(f32)[0], pos, gs,
        bs_ref[...].astype(f32)[0], wqk, bias, cheb, wth,
        K=K, d_k=d_k, keep=keep, mm_dtype=md,
    )
    g = g_ref[0].astype(f32) * (out > 0)               # relu bwd, (Nj, Co·T)
    gm = g.astype(md)

    inv_sqrt = 1.0 / (d_k ** 0.5)
    hk = K * d_k
    xmm = xm.astype(md)
    dxm = None
    dqk_parts_q, dqk_parts_k = [], []
    for k in range(K):
        agg = aggs[k].astype(md)
        att = atts[k]
        dwth_ref[k] += _mm(agg, gm, (((0,), (0,))))    # agg^T @ g
        dagg = _mm(gm, wth[k].astype(md), (((1,), (1,))))  # (Nj, C·T) f32
        daggm = dagg.astype(md)
        # agg = A^T @ xm  →  dA = xm @ dagg^T (built as (Ni, Nj)), dxm += A @ dagg
        dA = _mm(xmm, daggm, (((1,), (1,))))           # (Ni, Nj)
        A = (cheb[k] * att).astype(md)
        dxm_k = _mm(A, daggm, (((1,), (0,))))          # A @ dagg → (Ni, C·T)
        dxm = dxm_k if dxm is None else dxm + dxm_k
        datt = cheb[k] * dA
        # source-axis softmax bwd (columns normalized over rows)
        colsum = (att * datt).sum(axis=0, keepdims=True)
        ds = att * (datt - colsum)                     # (Ni, Nj)
        dbias_ref[k] += ds
        dsm = ds.astype(md)
        q_k = qk[:, k * d_k : (k + 1) * d_k].astype(md)
        k_k = qk[:, hk + k * d_k : hk + (k + 1) * d_k].astype(md)
        dq_k = _mm(dsm, k_k, (((1,), (0,)))) * inv_sqrt    # (Ni, dk)
        dk_k = _mm(dsm, q_k, (((0,), (0,)))) * inv_sqrt    # (Nj, dk)
        dqk_parts_q.append(dq_k)
        dqk_parts_k.append(dk_k)
    dqk = jnp.concatenate(dqk_parts_q + dqk_parts_k, axis=1)  # (N, 2·K·dk)
    dqkm = dqk.astype(md)

    dwqk_ref[...] += _mm(semx, dqkm, (((0,), (0,))))
    dsemx = _mm(dqkm, wqk.astype(md), (((1,), (1,))))
    dsemx_pre = dsemx * dmask * (1.0 / keep)
    dgs_ref[...] += (dsemx_pre * xs_hat).sum(axis=0)[None]
    dbs_ref[...] += dsemx_pre.sum(axis=0)[None]
    dse = _ln_bwd(dsemx_pre, xs_hat, inv_s, gs)
    dsem = dse.astype(md)
    dpos_ref[...] += dse
    dpb_ref[...] += dse.sum(axis=0)[None]
    dpw_ref[...] += _mm(tat.astype(md), dsem, (((0,), (0,))))
    dtat_ref[0] = _mm(dsem, pw.astype(md), (((1,), (1,)))).astype(dtat_ref.dtype)
    dxm_ref[0] = dxm.astype(dxm_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def _core(tat, xm, dmask, pw, pb, pos, gs, bs, wqk, bias, cheb, wth,
          K, d_k, keep, interpret):
    return _fwd_impl(tat, xm, dmask, pw, pb, pos, gs, bs, wqk, bias, cheb,
                     wth, K, d_k, keep, interpret)


def _specs(B, N, FT, CT, CoT, d, hk2, K, mask_rows):
    row3 = lambda i: (i, 0, 0)
    whole2 = lambda i: (0, 0)
    whole3 = lambda i: (0, 0, 0)
    return dict(
        tat=pl.BlockSpec((1, N, FT), row3, memory_space=pltpu.VMEM),
        xm=pl.BlockSpec((1, N, CT), row3, memory_space=pltpu.VMEM),
        dmask=pl.BlockSpec(
            (1, N, d),
            row3 if mask_rows else (lambda i: (0, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        pw=pl.BlockSpec((FT, d), whole2, memory_space=pltpu.VMEM),
        vec=pl.BlockSpec((1, d), whole2, memory_space=pltpu.VMEM),
        pos=pl.BlockSpec((N, d), whole2, memory_space=pltpu.VMEM),
        wqk=pl.BlockSpec((d, hk2), whole2, memory_space=pltpu.VMEM),
        plane=pl.BlockSpec((K, N, N), whole3, memory_space=pltpu.VMEM),
        wth=pl.BlockSpec((K, CT, CoT), whole3, memory_space=pltpu.VMEM),
        out=pl.BlockSpec((1, N, CoT), row3, memory_space=pltpu.VMEM),
    )


def _fwd_impl(tat, xm, dmask, pw, pb, pos, gs, bs, wqk, bias, cheb, wth,
              K, d_k, keep, interpret):
    B, N, FT = tat.shape
    CT = xm.shape[-1]
    CoT = wth.shape[-1]
    d = pos.shape[-1]
    hk2 = 2 * K * d_k
    sp = _specs(B, N, FT, CT, CoT, d, hk2, K, dmask.shape[0] == B)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, d_k=d_k, keep=keep),
        grid=(B,),
        in_specs=[sp["tat"], sp["xm"], sp["dmask"], sp["pw"], sp["vec"],
                  sp["pos"], sp["vec"], sp["vec"], sp["wqk"], sp["plane"],
                  sp["plane"], sp["wth"]],
        out_specs=sp["out"],
        out_shape=jax.ShapeDtypeStruct((B, N, CoT), tat.dtype),
        interpret=interpret,
    )(tat, xm, dmask, pw, pb[None], pos, gs[None], bs[None], wqk, bias,
      cheb, wth)


def _vjp_fwd(tat, xm, dmask, pw, pb, pos, gs, bs, wqk, bias, cheb, wth,
             K, d_k, keep, interpret):
    out = _core(tat, xm, dmask, pw, pb, pos, gs, bs, wqk, bias, cheb, wth,
                K, d_k, keep, interpret)
    return out, (tat, xm, dmask, pw, pb, pos, gs, bs, wqk, bias, cheb, wth)


def _vjp_bwd(K, d_k, keep, interpret, saved, g):
    tat, xm, dmask, pw, pb, pos, gs, bs, wqk, bias, cheb, wth = saved
    B, N, FT = tat.shape
    CT = xm.shape[-1]
    CoT = wth.shape[-1]
    d = pos.shape[-1]
    hk2 = 2 * K * d_k
    f32 = jnp.float32
    sp = _specs(B, N, FT, CT, CoT, d, hk2, K, dmask.shape[0] == B)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, d_k=d_k, keep=keep),
        grid=(B,),
        in_specs=[sp["tat"], sp["xm"], sp["dmask"], sp["pw"], sp["vec"],
                  sp["pos"], sp["vec"], sp["vec"], sp["wqk"], sp["plane"],
                  sp["plane"], sp["wth"], sp["out"]],
        out_specs=[sp["tat"], sp["xm"], sp["pw"], sp["vec"], sp["pos"],
                   sp["vec"], sp["vec"], sp["wqk"], sp["plane"], sp["wth"]],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, FT), tat.dtype),
            jax.ShapeDtypeStruct((B, N, CT), xm.dtype),
            jax.ShapeDtypeStruct((FT, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((N, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((d, hk2), f32),
            jax.ShapeDtypeStruct((K, N, N), f32),
            jax.ShapeDtypeStruct((K, CT, CoT), f32),
        ],
        interpret=interpret,
    )(tat, xm, dmask, pw, pb[None], pos, gs[None], bs[None], wqk, bias,
      cheb, wth, g)
    dtat, dxm, dpw, dpb, dpos, dgs, dbs, dwqk, dbias, dwth = outs
    cast = lambda a, like: a.astype(like.dtype)
    dmask_zero = jnp.zeros_like(dmask)
    return (
        cast(dtat, tat), cast(dxm, xm), dmask_zero, cast(dpw, pw),
        cast(dpb[0], pb), cast(dpos, pos), cast(dgs[0], gs),
        cast(dbs[0], bs), cast(dwqk, wqk), cast(dbias, bias),
        jnp.zeros_like(cheb), cast(dwth, wth),
    )


_core.defvjp(_vjp_fwd, _vjp_bwd)


def fused_spatial_middle(
    tat_out: jax.Array,       # (B, F, T, N) temporal-attention output
    x: jax.Array,             # (B, N, C, T) block input (graph signal)
    *,
    pre_w: jax.Array,         # (d_model, T, 1, F) torch Conv2d layout
    pre_b: jax.Array,         # (d_model,)
    pos: jax.Array,           # (N, d_model) spatial positional table
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wq: jax.Array,            # (d_model, K*d_k)
    wk: jax.Array,
    adj_pa: jax.Array,        # (N, N)
    masks: jax.Array,         # (K, N, N) learnable
    cheb_polys: jax.Array,    # (K, N, N)
    thetas: jax.Array,        # (K, C, C_out)
    K: int,
    d_k: int,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused spatial middle of a DSTAGNN block. Returns (B, N, C_out, T).

    Semantics match the unfused composition in models/dstagnn.py
    (_block_apply steps :232-236 of the reference) including dropout —
    the mask is drawn from ``dropout_key`` exactly like ops/nn.dropout.
    """
    B, F, T, N = tat_out.shape
    C = x.shape[2]
    d = pos.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # pre_conv weight → (F·T, d) with the (f, t) ordering of tat_flat
    pw = pre_w[:, :, 0, :].transpose(2, 1, 0).reshape(F * T, d)
    tat_flat = tat_out.reshape(B, F * T, N).transpose(0, 2, 1)  # (B, N, F·T)
    xm = x.reshape(B, N, C * T)
    wqk = jnp.concatenate([wq, wk], axis=1)
    bias = adj_pa[None] * masks                                  # (K, N, N)
    # Θ as a Kronecker factor: out = agg @ (Θ_k ⊗ I_T) keeps the channel mix
    # a single 2-D matmul in the (N, C·T) domain
    eye = jnp.eye(T, dtype=thetas.dtype)
    wth = jnp.einsum("kco,ts->kctos", thetas, eye).reshape(
        K, C * T, thetas.shape[-1] * T
    )
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = 1.0 - dropout_rate
        dmask = jax.random.bernoulli(
            dropout_key, p=keep, shape=(B, N, d)
        ).astype(tat_out.dtype)
    else:
        keep = 1.0
        dmask = jnp.ones((1, N, d), tat_out.dtype)
    out = _core(
        tat_flat, xm, dmask, pw, pre_b, pos, ln_scale, ln_bias, wqk,
        bias, cheb_polys, wth, K, d_k, keep, interpret,
    )
    return out.reshape(B, N, thetas.shape[-1], T)
