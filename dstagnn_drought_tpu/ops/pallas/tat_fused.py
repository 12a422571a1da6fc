"""Fused Pallas TPU kernel for the temporal-attention chain.

The DSTAGNN train step is a long tail of small ops, each 10-30x off
roofline because its shapes barely fill a TPU tile (T=12 lanes out of 128
everywhere in the temporal attention — see benchmarks/op_profile.py and
BENCH_NOTES.md). This kernel collapses the whole per-block chain

    [EmbedT: + pos, LayerNorm]              (block 1 only, F == 1)
    QKV projection (one fused matmul)
    scores = Q.K^T / sqrt(d_k) + res_att    (raw scores are an OUTPUT:
                                             threaded to the next block,
                                             reference model/DSTAGNN_my.py:37,253)
    softmax over the QUERY axis             (reference quirk, :40 — dim=3)
    context = attn . V
    out-projection + residual + LayerNorm

into ONE forward kernel and ONE hand-written backward kernel (custom_vjp),
each a few MXU matmuls over a (block_rows, T, N) tile held entirely in
VMEM. Weight/LN/pos gradients accumulate across grid steps in the backward
kernel's outputs (TPU grids are sequential, so in-output accumulation is
race-free).

Numerics: LayerNorm/softmax statistics in f32 (matching ops/nn.layer_norm,
eps=1e-5); matmuls take the caller's activation dtype with f32 accumulation.
Off-TPU the wrapper falls back to the plain XLA composition from
ops/attention.py — bitwise-identical semantics, used by the CPU tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _ln_fwd(z):
    """f32 LayerNorm pieces over the last axis: (x_hat, inv_std)."""
    mu = z.mean(axis=-1, keepdims=True)
    var = ((z - mu) ** 2).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    return (z - mu) * inv, inv


def _ln_bwd(g, x_hat, inv, gamma):
    """dz for out = gamma*x_hat + beta given upstream g (all f32)."""
    gy = g * gamma
    m1 = gy.mean(axis=-1, keepdims=True)
    m2 = (gy * x_hat).mean(axis=-1, keepdims=True)
    return inv * (gy - m1 - x_hat * m2)


def _bmm(a, b, contract):
    """Batched (leading dim) matmul, f32 accumulate — Mosaic supports at
    most ONE batch dim, so heads are a static Python loop in the callers."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _recompute(x, pos, g0, b0, wqkv, wo, res, *, n_heads, d_k, d_v, embed):
    """Shared forward recomputation (f32). Returns every piece the backward
    needs. x: (bb, T, N); per-head tensors are lists of (bb, T, d)."""
    bb, T, N = x.shape
    wqkv = wqkv.astype(jnp.float32)
    wo = wo.astype(jnp.float32)
    if embed:
        z0 = x + pos[None]
        x0_hat, inv0 = _ln_fwd(z0)
        te = x0_hat * g0 + b0
    else:
        x0_hat = inv0 = None
        te = x
    qkv = jax.lax.dot_general(
        te.reshape(bb * T, N), wqkv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    hk = n_heads * d_k
    # per-head lane-aligned slices of the fused projection
    q = [qkv[:, h * d_k : (h + 1) * d_k].reshape(bb, T, d_k)
         for h in range(n_heads)]
    k = [qkv[:, hk + h * d_k : hk + (h + 1) * d_k].reshape(bb, T, d_k)
         for h in range(n_heads)]
    v = [qkv[:, 2 * hk + h * d_v : 2 * hk + (h + 1) * d_v].reshape(bb, T, d_v)
         for h in range(n_heads)]
    s = jnp.stack(
        [_bmm(q[h], k[h], ((2,), (2,))) for h in range(n_heads)], axis=1
    ) * (1.0 / (d_k ** 0.5)) + res                     # (bb, H, Tq, Tk)
    # reference quirk: softmax over the QUERY axis (dim=3 of the 5-D scores)
    e = jnp.exp(s - s.max(axis=2, keepdims=True))
    attn = e / e.sum(axis=2, keepdims=True)
    ctx = jnp.concatenate(
        [_bmm(attn[:, h], v[h], ((2,), (1,))).reshape(bb * T, d_v)
         for h in range(n_heads)], axis=1,
    )                                                  # (bb*T, H*d_v)
    o1 = jax.lax.dot_general(
        ctx, wo,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bb, T, N)
    return te, qkv, q, k, v, s, attn, ctx, o1, x0_hat, inv0


def _fwd_kernel(x_ref, pos_ref, g0_ref, b0_ref, wqkv_ref, wo_ref, g1_ref,
                b1_ref, res_ref, out_ref, sc_ref, *, n_heads, d_k, d_v, embed):
    f32 = jnp.float32
    x = x_ref[...].astype(f32)
    te, _, _, _, _, s, attn, ctx, o1, _, _ = _recompute(
        x, pos_ref[...].astype(f32), g0_ref[...].astype(f32)[0],
        b0_ref[...].astype(f32)[0], wqkv_ref[...], wo_ref[...],
        res_ref[...].astype(f32),
        n_heads=n_heads, d_k=d_k, d_v=d_v, embed=embed,
    )
    sc_ref[...] = s.astype(sc_ref.dtype)
    x1_hat, _ = _ln_fwd(o1 + te)
    out = x1_hat * g1_ref[...].astype(f32)[0] + b1_ref[...].astype(f32)[0]
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, pos_ref, g0_ref, b0_ref, wqkv_ref, wo_ref, g1_ref,
                b1_ref, res_ref, go_ref, gs_ref,
                dx_ref, dres_ref, dpos_ref, dg0_ref, db0_ref, dwqkv_ref,
                dwo_ref, dg1_ref, db1_ref, *, n_heads, d_k, d_v, embed):
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dpos_ref[...] = jnp.zeros_like(dpos_ref)
        dg0_ref[...] = jnp.zeros_like(dg0_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    x = x_ref[...].astype(f32)
    g0 = g0_ref[...].astype(f32)[0]
    g1 = g1_ref[...].astype(f32)[0]
    wqkv = wqkv_ref[...].astype(f32)
    wo = wo_ref[...].astype(f32)
    te, qkv, q, k, v, s, attn, ctx, o1, x0_hat, inv0 = _recompute(
        x, pos_ref[...].astype(f32), g0, b0_ref[...].astype(f32)[0],
        wqkv, wo, res_ref[...].astype(f32),
        n_heads=n_heads, d_k=d_k, d_v=d_v, embed=embed,
    )
    bb, T, N = x.shape
    hk, hv = n_heads * d_k, n_heads * d_v

    g_out = go_ref[...].astype(f32)
    g_sc = gs_ref[...].astype(f32)

    # LayerNorm 1 backward
    x1_hat, inv1 = _ln_fwd(o1 + te)
    dg1_ref[...] += (g_out * x1_hat).sum(axis=(0, 1))[None]
    db1_ref[...] += g_out.sum(axis=(0, 1))[None]
    g_ypre = _ln_bwd(g_out, x1_hat, inv1, g1)

    # out-projection backward
    g_o1f = g_ypre.reshape(bb * T, N)
    dwo_ref[...] += jax.lax.dot_general(
        ctx, g_o1f, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    g_ctx_f = jax.lax.dot_general(
        g_o1f, wo, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                   # (bb*T, H*d_v)
    g_ctx = [
        g_ctx_f[:, h * d_v : (h + 1) * d_v].reshape(bb, T, d_v)
        for h in range(n_heads)
    ]

    # attention backward (softmax over the query axis), per head
    g_attn = jnp.stack(
        [_bmm(g_ctx[h], v[h], ((2,), (2,))) for h in range(n_heads)], axis=1
    )                                                   # (bb, H, Tq, Tk)
    dot = (attn * g_attn).sum(axis=2, keepdims=True)
    ds = attn * (g_attn - dot) + g_sc
    dres_ref[...] = ds.astype(dres_ref.dtype)
    inv_sqrt = 1.0 / (d_k ** 0.5)
    g_q = [_bmm(ds[:, h], k[h], ((2,), (1,))) * inv_sqrt
           for h in range(n_heads)]                     # (bb, Tq, d_k)
    g_k = [_bmm(ds[:, h], q[h], ((1,), (1,))) * inv_sqrt
           for h in range(n_heads)]                     # (bb, Tk, d_k)
    g_v = [_bmm(attn[:, h], g_ctx[h], ((1,), (1,)))
           for h in range(n_heads)]                     # (bb, Tk, d_v)

    # fused QKV backward
    g_qkv = jnp.concatenate(
        [g.reshape(bb * T, -1) for g in (*g_q, *g_k, *g_v)], axis=1,
    )
    dwqkv_ref[...] += jax.lax.dot_general(
        te.reshape(bb * T, N), g_qkv,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    g_te = jax.lax.dot_general(
        g_qkv, wqkv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(bb, T, N) + g_ypre  # + residual branch

    if embed:
        dg0_ref[...] += (g_te * x0_hat).sum(axis=(0, 1))[None]
        db0_ref[...] += g_te.sum(axis=(0, 1))[None]
        g_z0 = _ln_bwd(g_te, x0_hat, inv0, g0)
        dpos_ref[...] += g_z0.sum(axis=0)
        dx_ref[...] = g_z0.astype(dx_ref.dtype)
    else:
        dx_ref[...] = g_te.astype(dx_ref.dtype)


def _pad_rows(a, rows):
    extra = rows - a.shape[0]
    if extra == 0:
        return a
    return jnp.pad(a, [(0, extra)] + [(0, 0)] * (a.ndim - 1))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14)
)
def _tat_core(x, pos, g0, b0, wqkv, wo, g1, b1, res,
              n_heads, d_k, d_v, embed, block_rows, interpret):
    """x: (BF, T, N); res: (BF, H, T, T). Returns (out, scores)."""
    return _tat_fwd_impl(
        x, pos, g0, b0, wqkv, wo, g1, b1, res,
        n_heads, d_k, d_v, embed, block_rows, interpret,
    )


def _specs(bb, T, N, H, hk, hv):
    row = lambda i: (i, 0, 0)
    whole2 = lambda i: (0, 0)
    return dict(
        x=pl.BlockSpec((bb, T, N), row, memory_space=pltpu.VMEM),
        pos=pl.BlockSpec((T, N), whole2, memory_space=pltpu.VMEM),
        vec=pl.BlockSpec((1, N), whole2, memory_space=pltpu.VMEM),
        wqkv=pl.BlockSpec((N, 2 * hk + hv), whole2, memory_space=pltpu.VMEM),
        wo=pl.BlockSpec((hv, N), whole2, memory_space=pltpu.VMEM),
        res=pl.BlockSpec((bb, H, T, T), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
    )


def _tat_fwd_impl(x, pos, g0, b0, wqkv, wo, g1, b1, res,
                  n_heads, d_k, d_v, embed, block_rows, interpret):
    BF, T, N = x.shape
    hk, hv = n_heads * d_k, n_heads * d_v
    bb = min(block_rows, BF)
    rows = -(-BF // bb) * bb
    xp, resp = _pad_rows(x, rows), _pad_rows(res, rows)
    sp = _specs(bb, T, N, n_heads, hk, hv)
    out, sc = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_heads=n_heads, d_k=d_k, d_v=d_v, embed=embed
        ),
        grid=(rows // bb,),
        in_specs=[sp["x"], sp["pos"], sp["vec"], sp["vec"], sp["wqkv"],
                  sp["wo"], sp["vec"], sp["vec"], sp["res"]],
        out_specs=[sp["x"], sp["res"]],
        out_shape=[
            jax.ShapeDtypeStruct((rows, T, N), x.dtype),
            jax.ShapeDtypeStruct((rows, n_heads, T, T), x.dtype),
        ],
        interpret=interpret,
    )(xp, pos, g0[None], b0[None], wqkv, wo, g1[None], b1[None], resp)
    return out[:BF], sc[:BF]


def _tat_vjp_fwd(x, pos, g0, b0, wqkv, wo, g1, b1, res,
                 n_heads, d_k, d_v, embed, block_rows, interpret):
    out = _tat_core(x, pos, g0, b0, wqkv, wo, g1, b1, res,
                    n_heads, d_k, d_v, embed, block_rows, interpret)
    return out, (x, pos, g0, b0, wqkv, wo, g1, b1, res)


def _tat_vjp_bwd(n_heads, d_k, d_v, embed, block_rows, interpret, saved, g):
    x, pos, g0, b0, wqkv, wo, g1, b1, res = saved
    g_out, g_sc = g
    BF, T, N = x.shape
    hk, hv = n_heads * d_k, n_heads * d_v
    bb = min(block_rows, BF)
    rows = -(-BF // bb) * bb
    sp = _specs(bb, T, N, n_heads, hk, hv)
    f32 = jnp.float32
    dx, dres, dpos, dg0, db0, dwqkv, dwo, dg1, db1 = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_heads=n_heads, d_k=d_k, d_v=d_v, embed=embed
        ),
        grid=(rows // bb,),
        in_specs=[sp["x"], sp["pos"], sp["vec"], sp["vec"], sp["wqkv"],
                  sp["wo"], sp["vec"], sp["vec"], sp["res"],
                  sp["x"], sp["res"]],
        out_specs=[sp["x"], sp["res"], sp["pos"], sp["vec"], sp["vec"],
                   sp["wqkv"], sp["wo"], sp["vec"], sp["vec"]],
        out_shape=[
            jax.ShapeDtypeStruct((rows, T, N), x.dtype),
            jax.ShapeDtypeStruct((rows, n_heads, T, T), res.dtype),
            jax.ShapeDtypeStruct((T, N), f32),
            jax.ShapeDtypeStruct((1, N), f32),
            jax.ShapeDtypeStruct((1, N), f32),
            jax.ShapeDtypeStruct((N, 2 * hk + hv), f32),
            jax.ShapeDtypeStruct((hv, N), f32),
            jax.ShapeDtypeStruct((1, N), f32),
            jax.ShapeDtypeStruct((1, N), f32),
        ],
        interpret=interpret,
    )(_pad_rows(x, rows), pos, g0[None], b0[None], wqkv, wo, g1[None],
      b1[None], _pad_rows(res, rows), _pad_rows(g_out, rows),
      _pad_rows(g_sc, rows))
    cast = lambda a, like: a.astype(like.dtype)
    return (
        cast(dx[:BF], x), cast(dpos, pos), cast(dg0[0], g0), cast(db0[0], b0),
        cast(dwqkv, wqkv), cast(dwo, wo), cast(dg1[0], g1), cast(db1[0], b1),
        cast(dres[:BF], res),
    )


_tat_core.defvjp(_tat_vjp_fwd, _tat_vjp_bwd)


def fused_temporal_attention(
    x: jax.Array,
    res_att: jax.Array | float,
    *,
    pos: jax.Array | None,
    ln0_scale: jax.Array | None,
    ln0_bias: jax.Array | None,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    wo: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    n_heads: int,
    d_k: int,
    d_v: int,
    block_rows: int = 16,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused [EmbedT +] temporal MHA [+ residual LN] (see module docstring).

    Args mirror ``ops.attention.temporal_attention`` with the optional EmbedT
    pieces folded in: x is the RAW block input (B, F, T, N) (pre-embedding
    when ``pos`` is given — reference model/DSTAGNN_my.py:227-231).

    Returns (out, scores): out (B, F, T, N), scores (B, F, H, T, T) raw.
    """
    B, F, T, N = x.shape
    embed = pos is not None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not embed:
        pos = jnp.zeros((T, N), x.dtype)
        ln0_scale = jnp.ones((N,), x.dtype)
        ln0_bias = jnp.zeros((N,), x.dtype)
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    if isinstance(res_att, (int, float)) or getattr(res_att, "ndim", 0) == 0:
        res4 = jnp.zeros((B * F, n_heads, T, T), x.dtype)
    else:
        res4 = jnp.broadcast_to(
            res_att, (B, F, n_heads, T, T)
        ).reshape(B * F, n_heads, T, T).astype(x.dtype)
    out, sc = _tat_core(
        x.reshape(B * F, T, N), pos, ln0_scale, ln0_bias, wqkv, wo,
        ln_scale, ln_bias, res4,
        n_heads, d_k, d_v, embed, block_rows, interpret,
    )
    return out.reshape(B, F, T, N), sc.reshape(B, F, n_heads, T, T)
