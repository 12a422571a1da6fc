"""Fused Pallas kernel for the GTU temporal stack: the three gated (1,k)
convs + time-axis concat in ONE pass over x, transpose-free.

Reference semantics: model/DSTAGNN_my.py:184-197 (GTU: Conv2d(C→2C,
kernel (1,k)), tanh ⊙ sigmoid gate) and :255-264 (torch cat of the k=3/5/7
branches along time; the ``fcmy`` Linear(3T-12 → T) stays in XLA — it is
one clean matmul).

STATUS (round 4): **measured negative — OPT-IN ONLY** (``fuse_gtu =
true``; the config default resolves off). Best variant (this one): 29.2
ms fwd+bwd per GAMBIA block vs 18.5 ms for the XLA im2col path it meant
to replace (BENCH_NOTES "Fused GTU kernel study"). The op's contractions
are C=32-granular in every formulation tried — K=32 tap matmuls, K=k·C
window matmuls with a 64-wide output, or 4-row lane-packed W with ≥4×
zero-block waste — so MXU utilization caps near 25% and the saved HBM
traffic (~1.2 GB of im2col windows per conv set) never pays for the lost
matmul efficiency. Kept as working, parity-tested machinery for future
shapes where C is MXU-wide.

Design (the best of three measured variants): on the row-major
(b·n·t, C) view, tap kk of every conv consumes the SAME sublane-shifted
x, so the whole stack is Σ_kk shift(x, kk) · W_kk with W_kk (C, 3·2C)
holding that tap's columns for all three convs — seven accumulating MXU
matmuls, no im2col tensor, no lane concat (v2's (rows, 7C) VMEM window
buffer cost 1.85 ms to build; v1 additionally paid (C, T) transposes and
per-node fcmy matmuls, 6-8% of roofline). Output columns are grouped
[all p | all q], so the tanh ⊙ sigmoid gate runs ONCE on (rows, 3C)-wide
data (per-conv 32-lane gates cost 1.5 ms in v1/v2).

Layout contract: the caller supplies x as (B, N, C, T) and gets
(B, N, 3T-12, C) — time before channels, ready for the fcmy contraction;
the wrapper does the single XLA (C, T)→(T, C) transpose on each side
(HBM-roofline cheap). Requires T % 16 == 0 and C % 16 == 0 (value-reshape
tile alignment for f32 and bf16) and time_strides == 1; ``supported()``
gates the model path, which otherwise falls back to the XLA im2col
(ops/gtu.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KS = (3, 5, 7)
KMAX = KS[-1]
NC = len(KS)  # convs


def _resolve_interpret(interpret: bool | None) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _shift_up(v, kk):
    """Rows r ← v rows r+kk, zero tail (static sublane slice + pad; the
    zero rows only feed output positions t ≥ T_out that nothing reads)."""
    if kk == 0:
        return v
    return jnp.concatenate(
        [v[kk:], jnp.zeros((kk,) + v.shape[1:], v.dtype)], axis=0
    )


def _shift_down(v, kk):
    """Rows r ← v rows r-kk, zero head — the transpose of :func:`_shift_up`
    (zero rows stand in for cotangents of unread positions, which are
    identically zero)."""
    if kk == 0:
        return v
    return jnp.concatenate(
        [jnp.zeros((kk,) + v.shape[1:], v.dtype), v[:-kk]], axis=0
    )


def _make_fwd(G, C, T):
    """Grid step = G (b, n) groups; rows (G·T, C) in, (G, 3T-12, C) out."""
    T_outs = [T - k + 1 for k in KS]
    W = 2 * NC * C  # fat output width: [p: 3C | q: 3C]

    def kern(xt_ref, wr_ref, br_ref, o_ref):
        dt = xt_ref.dtype
        x = xt_ref[...]
        y = br_ref[...].astype(jnp.float32)                # (1, W) bias row
        for kk in range(KMAX):
            w_kk = wr_ref[kk * C:(kk + 1) * C, :].astype(dt)
            y = y + jax.lax.dot_general(
                _shift_up(x, kk), w_kk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        gall = jnp.tanh(y[:, :NC * C]) * jax.nn.sigmoid(y[:, NC * C:])
        off = 0
        for ki, T_out in enumerate(T_outs):
            o_ref[:, off:off + T_out, :] = gall[
                :, ki * C:(ki + 1) * C
            ].reshape(G, T, C)[:, :T_out, :].astype(o_ref.dtype)
            off += T_out

    return kern


def _make_bwd(G, C, T):
    R = G * T
    T_outs = [T - k + 1 for k in KS]
    W = 2 * NC * C

    def kern(xt_ref, g_ref, wr_ref, br_ref,
             dx_ref, dwr_ref, dbr_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            dwr_ref[...] = jnp.zeros_like(dwr_ref)
            dbr_ref[...] = jnp.zeros_like(dbr_ref)

        dt = xt_ref.dtype
        x = xt_ref[...]
        y = br_ref[...].astype(jnp.float32)
        for kk in range(KMAX):
            w_kk = wr_ref[kk * C:(kk + 1) * C, :].astype(dt)
            y = y + jax.lax.dot_general(
                _shift_up(x, kk), w_kk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        th = jnp.tanh(y[:, :NC * C]).astype(dt)
        sg = jax.nn.sigmoid(y[:, NC * C:]).astype(dt)
        # cotangent rows (b,n,t) per conv, zero tail t ≥ T_out (kills both
        # the unread positions and the shift wraparound), lane-packed to 3C
        zrow = jnp.zeros((G, KMAX - 1, C), dt)
        dgall = jnp.concatenate([
            jnp.concatenate(
                [g_ref[:, off:off + T_out, :], zrow[:, :T - T_out]], axis=1
            ).reshape(R, C)
            for off, T_out in zip(
                [sum(T_outs[:i]) for i in range(NC)], T_outs
            )
        ], axis=1)                                         # (R, 3C)
        one = jnp.asarray(1.0, dt)
        dP = dgall * sg * (one - th * th)
        dQ = dgall * th * sg * (one - sg)
        dY = jnp.concatenate([dP, dQ], axis=1)             # (R, W) dt
        dbr_ref[...] += jnp.sum(dY, axis=0,
                                dtype=jnp.float32)[None, :]
        dxt = jnp.zeros((R, C), jnp.float32)
        for kk in range(KMAX):
            dwr_ref[kk * C:(kk + 1) * C, :] += jax.lax.dot_general(
                _shift_up(x, kk), dY,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            w_kk = wr_ref[kk * C:(kk + 1) * C, :].astype(dt)
            dxt += _shift_down(jax.lax.dot_general(
                dY, w_kk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ), kk)
        dx_ref[...] = dxt.astype(dx_ref.dtype)

    return kern


def _pick_g(BN, T):
    """(b, n) groups per grid step: target ~7k rows, capped at the total
    group count (the caller pads B·N up to a multiple of G)."""
    return max(1, min((7 * 1024) // max(T, 1), BN))


_COMPILER = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _fwd_call(xt, wr, br, T, interpret=False):
    """xt (BN·T, C) → gated concat (BN, 3T-12, C)."""
    BNT, C = xt.shape
    BN = BNT // T
    G = _pick_g(BN, T)
    BN2 = -(-BN // G) * G
    if BN2 != BN:
        xt = jnp.pad(xt, ((0, (BN2 - BN) * T), (0, 0)))
    M3 = sum(T - k + 1 for k in KS)
    W = 2 * NC * C
    out = pl.pallas_call(
        _make_fwd(G, C, T),
        grid=(BN2 // G,),
        in_specs=[
            pl.BlockSpec((G * T, C), lambda j: (j, 0)),
            pl.BlockSpec((KMAX * C, W), lambda j: (0, 0)),
            pl.BlockSpec((1, W), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G, M3, C), lambda j: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BN2, M3, C), xt.dtype),
        compiler_params=_COMPILER,
        interpret=interpret,
    )(xt, wr, br)
    return out[:BN]


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _bwd_call(xt, g, wr, br, T, interpret=False):
    """g (BN, 3T-12, C) cotangent → (dxt (BN·T, C), dwr, dbr)."""
    BNT, C = xt.shape
    BN = BNT // T
    G = _pick_g(BN, T)
    BN2 = -(-BN // G) * G
    if BN2 != BN:
        xt = jnp.pad(xt, ((0, (BN2 - BN) * T), (0, 0)))
        g = jnp.pad(g, ((0, BN2 - BN), (0, 0), (0, 0)))
    M3 = sum(T - k + 1 for k in KS)
    W = 2 * NC * C
    f32 = jnp.float32
    dxt, dwr, dbr = pl.pallas_call(
        _make_bwd(G, C, T),
        grid=(BN2 // G,),
        in_specs=[
            pl.BlockSpec((G * T, C), lambda j: (j, 0)),
            pl.BlockSpec((G, M3, C), lambda j: (j, 0, 0)),
            pl.BlockSpec((KMAX * C, W), lambda j: (0, 0)),
            pl.BlockSpec((1, W), lambda j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G * T, C), lambda j: (j, 0)),
            pl.BlockSpec((KMAX * C, W), lambda j: (0, 0)),
            pl.BlockSpec((1, W), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BN2 * T, C), xt.dtype),
            jax.ShapeDtypeStruct((KMAX * C, W), f32),
            jax.ShapeDtypeStruct((1, W), f32),
        ],
        compiler_params=_COMPILER,
        interpret=interpret,
    )(xt, g, wr, br)
    return dxt[:BN * T], dwr, dbr


def _pack(w3, b3, w5, b5, w7, b7):
    """OIHW conv weights → tap-row operands.

    ``wr`` (7·C, 6C): rows [kk·C:(kk+1)·C] hold tap kk's input-channel
    weights for all three convs, columns grouped [p: conv0 C | conv1 C |
    conv2 C | q: same] (torch GTU: first C output channels gate p, last C
    gate q). Taps a conv doesn't have stay zero. ``br`` (1, 6C) likewise.
    """
    C = w3.shape[1]
    W = 2 * NC * C
    wr = jnp.zeros((KMAX * C, W), jnp.float32)
    br = jnp.zeros((1, W), jnp.float32)
    for ki, (w, b) in enumerate(((w3, b3), (w5, b5), (w7, b7))):
        k = KS[ki]
        wp = w[:C, :, 0, :].astype(jnp.float32)            # (C, C, k)
        wq = w[C:, :, 0, :].astype(jnp.float32)
        for kk in range(k):
            wr = wr.at[kk * C:(kk + 1) * C,
                       ki * C:(ki + 1) * C].set(wp[:, :, kk].T)
            wr = wr.at[kk * C:(kk + 1) * C,
                       (NC + ki) * C:(NC + ki + 1) * C].set(wq[:, :, kk].T)
        br = br.at[0, ki * C:(ki + 1) * C].set(b[:C].astype(jnp.float32))
        br = br.at[0, (NC + ki) * C:(NC + ki + 1) * C].set(
            b[C:].astype(jnp.float32))
    return wr, br


def _unpack_grads(dwr, dbr, C, dtype):
    """(dwr, dbr) → per-conv OIHW (2C, C, 1, k) grads + (2C,) bias grads,
    discarding the zero-tap columns a conv doesn't have."""
    dws, dbs = [], []
    for ki, k in enumerate(KS):
        dw = jnp.zeros((2 * C, C, 1, k), dtype)
        for kk in range(k):
            blk = dwr[kk * C:(kk + 1) * C]
            dw = dw.at[:C, :, 0, kk].set(
                blk[:, ki * C:(ki + 1) * C].T.astype(dtype))
            dw = dw.at[C:, :, 0, kk].set(
                blk[:, (NC + ki) * C:(NC + ki + 1) * C].T.astype(dtype))
        dws.append(dw)
        dbs.append(jnp.concatenate([
            dbr[0, ki * C:(ki + 1) * C],
            dbr[0, (NC + ki) * C:(NC + ki + 1) * C],
        ]).astype(dtype))
    return dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gtu_cat(interpret, x, w3, b3, w5, b5, w7, b7):
    """Fused 3-GTU → time concat. x (B, N, C, T) → (B, N, 3T-12, C).

    Matches ``concat([gtu_k(x) for k in (3,5,7)], time)`` with the time
    axis moved before channels (the fcmy matmul contracts it next);
    time_strides must be 1. ``interpret`` None = infer from backend.
    """
    B, N, C, T = x.shape
    wr, br = _pack(w3, b3, w5, b5, w7, b7)
    xt = x.transpose(0, 1, 3, 2).reshape(B * N * T, C)
    out = _fwd_call(xt, wr, br, T,
                    interpret=_resolve_interpret(interpret))
    return out.reshape(B, N, sum(T - k + 1 for k in KS), C)


def _vjp_fwd(interpret, x, w3, b3, w5, b5, w7, b7):
    out = gtu_cat(interpret, x, w3, b3, w5, b5, w7, b7)
    return out, (x, w3, b3, w5, b5, w7, b7)


def _vjp_bwd(interpret, res, g):
    x, w3, b3, w5, b5, w7, b7 = res
    B, N, C, T = x.shape
    wr, br = _pack(w3, b3, w5, b5, w7, b7)
    xt = x.transpose(0, 1, 3, 2).reshape(B * N * T, C)
    M3 = sum(T - k + 1 for k in KS)
    dxt, dwr, dbr = _bwd_call(
        xt, g.reshape(B * N, M3, C), wr, br, T,
        interpret=_resolve_interpret(interpret),
    )
    dx = dxt.reshape(B, N, T, C).transpose(0, 1, 3, 2)
    dws, dbs = _unpack_grads(dwr, dbr, C, w3.dtype)
    return (dx, dws[0], dbs[0], dws[1], dbs[1], dws[2], dbs[2])


gtu_cat.defvjp(_vjp_fwd, _vjp_bwd)


def gtu_fcmy(interpret, x, w3, b3, w5, b5, w7, b7, wfc, bfc):
    """Fused GTU tail: kernel taps+gate+concat, XLA fcmy matmul.

    x (B, N, C, T) → (B, N, C, T); drop-in for the model's
    gtu/concat/fcmy segment in (B, N, C, T) space.
    """
    gc = gtu_cat(interpret, x, w3, b3, w5, b5, w7, b7)
    return (
        jnp.einsum("bnmc,mt->bnct", gc, wfc.astype(gc.dtype))
        + bfc.astype(gc.dtype)[None, None, None, :]
    )


def supported(C: int, T: int, time_strides: int) -> bool:
    """Static gate for the fused path (wrapper falls back to ops/gtu.py)."""
    return time_strides == 1 and T >= 48 and T % 16 == 0 and C % 16 == 0
