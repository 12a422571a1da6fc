"""Gated Temporal convolution Unit (GTU).

tanh(p) ⊙ sigmoid(q) over a width-k valid conv along time
(reference: model/DSTAGNN_my.py:184-197 — Conv2d(C → 2C, kernel (1,k),
stride (1, time_strides)); first C output channels gate p, last C gate q).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def conv2d_nchw(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: tuple[int, int] = (1, 1),
) -> jax.Array:
    """Valid 2-D convolution, NCHW activations / OIHW weights (torch layout)."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


# T at or above this switches the GTU to the im2col matmul formulation.
# Measured on v5e (fwd+bwd, bf16, 3 GTUs): at GAMBIA shapes (T=144,
# N=2139) im2col runs 15.7 ms vs 26.1 ms for conv_general (NCHW and NHWC
# identical) — XLA's TPU conv is ~1.7× off the matmul for (1,k) kernels at
# long T. At PEMS shapes (T=12) im2col measured ~2% SLOWER (the window
# concatenate outweighs the friendlier dW matmul), so short T keeps the
# conv. BENCH_NOTES.md round 3.
_IM2COL_MIN_T = 48


def gtu(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    in_channels: int,
    time_strides: int = 1,
) -> jax.Array:
    """Gated temporal conv. x: (B, C, N, T); w: (2C, C, 1, k); b: (2C,).

    Returns (B, C, N, (T-k)//time_strides + 1).
    """
    if x.shape[-1] >= _IM2COL_MIN_T:
        y = _conv_im2col(x, w, b, time_strides)
    else:
        y = conv2d_nchw(x, w, b, stride=(1, time_strides))
    p = y[:, :in_channels]
    q = y[:, in_channels:]
    return jnp.tanh(p) * jax.nn.sigmoid(q)


def gtu_bnct(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    in_channels: int,
    time_strides: int = 1,
) -> jax.Array:
    """GTU in (B, N, C, T) space (round 5): same im2col matmul as
    :func:`gtu`, but the activation never visits (B, C, N, T) — only the
    innermost two axes swap for the window stack. Removes the model-level
    layout round trip (B,N,C,T) → (B,C,N,T) → (B,N,T,C) that cost ~2 ms/step
    per direction at GAMBIA, and lets the tiles path's layout-pinned Pallas
    output feed the temporal tail directly.

    Returns (B, N, T_out, C) — time-major for the downstream concat + fcmy
    (the ``bnmc,mt->bnct`` einsum, same as the fused-GTU epilogue).
    """
    B, N, C, T = x.shape
    k = w.shape[-1]
    s = time_strides
    T_out = (T - k) // s + 1
    xt = x.transpose(0, 1, 3, 2)                       # (B, N, T, C)
    cols = jnp.concatenate(
        [xt[:, :, kk: kk + (T_out - 1) * s + 1: s] for kk in range(k)],
        axis=-1,
    )                                                  # (B, N, T_out, k·C)
    w2 = w[:, :, 0, :].transpose(2, 1, 0).reshape(k * C, -1).astype(x.dtype)
    y = cols @ w2 + b.astype(x.dtype)                  # (B, N, T_out, 2C)
    p = y[..., :in_channels]
    q = y[..., in_channels:]
    return jnp.tanh(p) * jax.nn.sigmoid(q)


def _conv_im2col(x, w, b, time_strides):
    """(1, k) valid conv as ONE matmul over stacked time windows.

    x (B, C, N, T) NCHW, w (2C, C, 1, k) OIHW → (B, 2C, N, T_out). The
    stacked window axis gives a k·C contraction dim (vs C alone), which the
    MXU tiles far better than XLA's conv lowering at long T. (A hand-written
    full-correlation backward was measured 9 ms/step SLOWER at GAMBIA scale
    than autodiff of this formulation — the padded-cotangent im2col
    materializes k× the cotangent volume; autodiff's split+add is cheaper.)
    """
    B, C, N, T = x.shape
    k = w.shape[-1]
    s = time_strides
    T_out = (T - k) // s + 1
    xt = x.transpose(0, 2, 3, 1)                       # (B, N, T, C)
    cols = jnp.concatenate(
        [xt[:, :, kk: kk + (T_out - 1) * s + 1: s] for kk in range(k)],
        axis=-1,
    )                                                  # (B, N, T_out, k·C)
    w2 = w[:, :, 0, :].transpose(2, 1, 0).reshape(k * C, -1).astype(x.dtype)
    y = cols @ w2 + b.astype(x.dtype)                  # (B, N, T_out, 2C)
    return y.transpose(0, 3, 1, 2)
