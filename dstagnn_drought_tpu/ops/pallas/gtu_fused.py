"""Fused Pallas kernel for the GTU temporal stack: 3 gated (1,k) convs →
time-axis concat → fcmy linear, in ONE pass over x.

Reference semantics: model/DSTAGNN_my.py:184-197 (GTU: Conv2d(C→2C,
kernel (1,k)), tanh ⊙ sigmoid gate) and :255-264 (torch cat of the k=3/5/7
branches along time + ``fcmy`` Linear(3T-12 → T)).

Why a kernel: the round-3 im2col formulation materializes the window
tensor ``cols`` (B, N, T_out, k·C) in HBM — ~233 MB bf16 per conv at
GAMBIA (N=2139, T=144, C=32) — and its autodiff backward re-reads it and
splits the concat, measured ~25 ms of the 71-78 ms GAMBIA train step
(op_profile --gambia: the unnamed ``cols @ w2`` backward dot_general,
the concatenate-backward ``split``, and the fcmy einsum pair). The fused
kernel reads x ONCE per tile, builds the windows in VMEM as lane-
concatenated sublane rolls, runs the three convs as (rows, k·C)·(k·C, 2C)
matmuls, gates on the VPU, applies fcmy per conv as one
(rows', T_out)·(T_out, T) matmul, and writes only the (B, N, C, T)
result — HBM traffic drops from ~2.3 GB to ~160 MB per step.

Layout contract (all static):
  x, out: (B, N, C, T) — the model's native block layout; the kernel
  transposes to rows=(b, n, t) lanes=C for the C-contraction and to
  rows=(b, n, c) lanes=T for the fcmy contraction, entirely in VMEM.
  Requires T % 16 == 0 and C % 16 == 0 (value-reshape tile alignment for
  both f32 and bf16) and time_strides == 1; callers fall back to the XLA
  im2col path otherwise (ops/gtu.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KS = (3, 5, 7)
TAPS = sum(KS)  # 15


def _resolve_interpret(interpret: bool | None) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _windows(xt, C, max_k):
    """(R, C) rows=(…, t) → (R, max_k·C) lane-concat of sublane rolls.

    Row r of roll -kk holds x rows r+kk (wrapping); wrapped rows only feed
    output positions t ≥ T_out that nothing ever reads.
    """
    R = xt.shape[0]
    parts = [xt]
    for kk in range(1, max_k):
        # upward shift by kk ≡ non-negative roll by R - kk
        parts.append(pltpu.roll(xt, shift=R - kk, axis=0))
    return jnp.concatenate(parts, axis=1)


def _gate(y, C):
    return jnp.tanh(y[:, :C]) * jax.nn.sigmoid(y[:, C:])


def _make_fwd(B, NT, C, T):
    R = B * NT * T  # (b, n, t) row count
    T_outs = [T - k + 1 for k in KS]

    def kern(x_ref, wc_ref, bc_ref, wfc_ref, bfc_ref, o_ref,
             gated_sc, acc_sc):
        x = x_ref[...]                                     # (B, NT, C, T)
        dt = x.dtype
        xt = x.transpose(0, 1, 3, 2).reshape(R, C)         # rows (b, n, t)
        cols = _windows(xt, C, KS[-1])                     # (R, 7C)
        # fcmy bias: out[(b,n,c), t] starts at bfc[t]
        acc_sc[...] = jnp.broadcast_to(
            bfc_ref[...].astype(jnp.float32), (B * NT * C, T)
        )
        row0 = 0
        off = 0
        for ki, k in enumerate(KS):
            T_out = T_outs[ki]
            w_k = wc_ref[row0:row0 + k * C, :].astype(dt)  # (k·C, 2C)
            y = jax.lax.dot_general(
                cols[:, :k * C], w_k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bc_ref[ki, :].astype(jnp.float32)[None, :]
            g = _gate(y, C)                                # (R, C) f32
            # rows (b,n,t) → rows (b,n,c), lanes T_out, for the fcmy matmul
            g4 = g.reshape(B, NT, T, C)[:, :, :T_out, :]
            gated_sc[:, :, :, :T_out] = g4.transpose(0, 1, 3, 2).astype(dt)
            w_fc = wfc_ref[off:off + T_out, :].astype(dt)  # (T_out, T)
            acc_sc[...] += jax.lax.dot_general(
                gated_sc[...].reshape(B * NT * C, T)[:, :T_out], w_fc,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            row0 += k * C
            off += T_out
        o_ref[...] = acc_sc[...].reshape(B, NT, C, T).astype(o_ref.dtype)

    return kern


def _make_bwd(B, NT, C, T):
    R = B * NT * T
    R2 = B * NT * C
    T_outs = [T - k + 1 for k in KS]
    M3 = sum(T_outs)

    def kern(x_ref, g_ref, wc_ref, bc_ref, wfc_ref,
             dx_ref, dwc_ref, dbc_ref, dwfc_ref, dbfc_ref,
             pad_sc):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            dwc_ref[...] = jnp.zeros_like(dwc_ref)
            dbc_ref[...] = jnp.zeros_like(dbc_ref)
            dwfc_ref[...] = jnp.zeros_like(dwfc_ref)
            dbfc_ref[...] = jnp.zeros_like(dbfc_ref)

        x = x_ref[...]
        dt = x.dtype
        xt = x.transpose(0, 1, 3, 2).reshape(R, C)
        cols = _windows(xt, C, KS[-1])
        g2 = g_ref[...].reshape(R2, T)                     # rows (b, n, c)
        dbfc_ref[...] += jnp.sum(g2, axis=0,
                                 keepdims=True).astype(jnp.float32)
        dxt = jnp.zeros((R, C), jnp.float32)
        row0 = 0
        off = 0
        for ki, k in enumerate(KS):
            T_out = T_outs[ki]
            kC = k * C
            w_k = wc_ref[row0:row0 + kC, :].astype(dt)
            # recompute pre-activations (residual-free backward)
            y = jax.lax.dot_general(
                cols[:, :kC], w_k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bc_ref[ki, :].astype(jnp.float32)[None, :]
            th = jnp.tanh(y[:, :C])
            sg = jax.nn.sigmoid(y[:, C:])
            # dWfc rows [off:off+T_out] += gatedᵀ · g  (contract rows)
            g4 = (th * sg).reshape(B, NT, T, C)[:, :, :T_out, :]
            pad_sc[:, :, :, :T_out] = g4.transpose(0, 1, 3, 2).astype(dt)
            gated2 = pad_sc[...].reshape(R2, T)[:, :T_out]
            dwfc_ref[off:off + T_out, :] += jax.lax.dot_general(
                gated2, g2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # d(gated) through fcmy: dg2 (R2, T_out) rows (b, n, c); route
            # back to rows (b, n, t) via pad_sc with a ZERO tail (t ≥ T_out
            # cotangents must vanish — they also kill the roll wraparound)
            w_fc = wfc_ref[off:off + T_out, :].astype(dt)
            dg2 = jax.lax.dot_general(
                g2, w_fc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (R2, T_out)
            pad_sc[:, :, :, T_out:] = jnp.zeros(
                (B, NT, C, T - T_out), dt
            )
            pad_sc[:, :, :, :T_out] = dg2.reshape(
                B, NT, C, T_out
            ).astype(dt)
            dgated = pad_sc[...].transpose(0, 1, 3, 2).reshape(R, C) \
                .astype(jnp.float32)
            dp = dgated * sg * (1.0 - th * th)
            dq = dgated * th * sg * (1.0 - sg)
            dY = jnp.concatenate([dp, dq], axis=1)         # (R, 2C) f32
            dbc_ref[ki, :] += jnp.sum(dY, axis=0)
            dYc = dY.astype(dt)
            dwc_ref[row0:row0 + kC, :] += jax.lax.dot_general(
                cols[:, :kC], dYc,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for kk in range(k):
                d_tap = jax.lax.dot_general(
                    dYc, w_k[kk * C:(kk + 1) * C, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # (R, C)
                dxt += d_tap if kk == 0 else pltpu.roll(
                    d_tap, shift=kk, axis=0
                )
            row0 += kC
            off += T_out
        dx_ref[...] = dxt.reshape(B, NT, T, C).transpose(
            0, 1, 3, 2
        ).astype(dx_ref.dtype)

    return kern


def _pick_nt(B, N, T, C):
    """Node-tile size: target ~48·144 rows per grid step, VMEM-bounded."""
    target_rows = 48 * 144
    nt = max(1, target_rows // max(B * T, 1))
    return min(nt, max(N, 1))


def _pad_n(a, Np):
    if a.shape[1] == Np:
        return a
    pad = [(0, 0)] * a.ndim
    pad[1] = (0, Np - a.shape[1])
    return jnp.pad(a, pad)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(x, wc, bc, wfc, bfc2, interpret=False):
    B, Np, C, T = x.shape
    NT = _pick_nt(B, Np, T, C)
    Np2 = -(-Np // NT) * NT
    x = _pad_n(x, Np2)
    NB = Np2 // NT
    M3 = wfc.shape[0]
    out = pl.pallas_call(
        _make_fwd(B, NT, C, T),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((B, NT, C, T), lambda j: (0, j, 0, 0)),
            pl.BlockSpec((TAPS * C, 2 * C), lambda j: (0, 0)),
            pl.BlockSpec((len(KS), 2 * C), lambda j: (0, 0)),
            pl.BlockSpec((M3, T), lambda j: (0, 0)),
            pl.BlockSpec((1, T), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, NT, C, T), lambda j: (0, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np2, C, T), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, NT, C, T), x.dtype),            # gated, c-major
            pltpu.VMEM((B * NT * C, T), jnp.float32),      # fcmy accumulator
        ],
        interpret=interpret,
    )(x, wc, bc, wfc, bfc2)
    return out[:, :Np]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(x, g, wc, bc, wfc, interpret=False):
    B, Np, C, T = x.shape
    NT = _pick_nt(B, Np, T, C)
    Np2 = -(-Np // NT) * NT
    x = _pad_n(x, Np2)
    g = _pad_n(g, Np2)
    NB = Np2 // NT
    M3 = wfc.shape[0]
    f32 = jnp.float32
    dx, dwc, dbc, dwfc, dbfc = pl.pallas_call(
        _make_bwd(B, NT, C, T),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((B, NT, C, T), lambda j: (0, j, 0, 0)),
            pl.BlockSpec((B, NT, C, T), lambda j: (0, j, 0, 0)),
            pl.BlockSpec((TAPS * C, 2 * C), lambda j: (0, 0)),
            pl.BlockSpec((len(KS), 2 * C), lambda j: (0, 0)),
            pl.BlockSpec((M3, T), lambda j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((B, NT, C, T), lambda j: (0, j, 0, 0)),
            pl.BlockSpec((TAPS * C, 2 * C), lambda j: (0, 0)),
            pl.BlockSpec((len(KS), 2 * C), lambda j: (0, 0)),
            pl.BlockSpec((M3, T), lambda j: (0, 0)),
            pl.BlockSpec((1, T), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np2, C, T), x.dtype),
            jax.ShapeDtypeStruct((TAPS * C, 2 * C), f32),
            jax.ShapeDtypeStruct((len(KS), 2 * C), f32),
            jax.ShapeDtypeStruct((M3, T), f32),
            jax.ShapeDtypeStruct((1, T), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, NT, C, T), x.dtype),            # pad/transpose
        ],
        interpret=interpret,
    )(x, g, wc, bc, wfc)
    return dx[:, :Np], dwc, dbc, dwfc, dbfc


def _pack(w3, b3, w5, b5, w7, b7, wfc):
    """OIHW conv weights → kernel operand layouts."""
    ws = []
    for w in (w3, w5, w7):
        k = w.shape[-1]
        C = w.shape[1]
        ws.append(w[:, :, 0, :].transpose(2, 1, 0).reshape(k * C, -1))
    wc = jnp.concatenate(ws, axis=0).astype(jnp.float32)   # (15C, 2C)
    bc = jnp.stack([b3, b5, b7]).astype(jnp.float32)       # (3, 2C)
    return wc, bc, wfc.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gtu_fcmy(interpret, x, w3, b3, w5, b5, w7, b7, wfc, bfc):
    """Fused 3-GTU → concat → fcmy. x (B, N, C, T) → (B, N, C, T).

    Matches ``concat([gtu_k(x) for k in (3,5,7)], -1) @ wfc + bfc`` with
    the model's (B, C, N, T) axes swapped to (B, N, C, T); time_strides=1.
    ``interpret`` None resolves from the default backend.
    """
    wc, bc, wfc = _pack(w3, b3, w5, b5, w7, b7, wfc)
    return _fwd_call(x, wc, bc, wfc, bfc.reshape(1, -1).astype(jnp.float32),
                     interpret=_resolve_interpret(interpret))


def _vjp_fwd(interpret, x, w3, b3, w5, b5, w7, b7, wfc, bfc):
    out = gtu_fcmy(interpret, x, w3, b3, w5, b5, w7, b7, wfc, bfc)
    return out, (x, w3, b3, w5, b5, w7, b7, wfc)


def _vjp_bwd(interpret, res, g):
    x, w3, b3, w5, b5, w7, b7, wfc = res
    wc, bc, wfc_p = _pack(w3, b3, w5, b5, w7, b7, wfc)
    dx, dwc, dbc, dwfc, dbfc = _bwd_call(
        x, g, wc, bc, wfc_p, interpret=_resolve_interpret(interpret)
    )
    C = x.shape[2]
    dws, dbs = [], []
    row0 = 0
    for ki, k in enumerate(KS):
        dwk = dwc[row0:row0 + k * C, :]                    # (k·C, 2C)
        dws.append(
            dwk.reshape(k, C, 2 * C).transpose(2, 1, 0)[:, :, None, :]
            .astype(w3.dtype)
        )
        dbs.append(dbc[ki].astype(b3.dtype))
        row0 += k * C
    return (dx, dws[0], dbs[0], dws[1], dbs[1], dws[2], dbs[2],
            dwfc.astype(wfc.dtype), dbfc.reshape(-1).astype(wfc.dtype))


gtu_fcmy.defvjp(_vjp_fwd, _vjp_bwd)


def supported(C: int, T: int, time_strides: int) -> bool:
    """Static gate for the fused path (wrapper falls back to ops/gtu.py)."""
    return time_strides == 1 and T >= 48 and T % 16 == 0 and C % 16 == 0
