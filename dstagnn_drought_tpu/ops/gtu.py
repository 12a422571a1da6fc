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

    Note: an im2col + single-matmul variant was measured ~2% SLOWER end to
    end than conv_general on v5e at these shapes (the window stack's
    concatenate outweighs the friendlier dW matmul) — keep the conv.
    """
    y = conv2d_nchw(x, w, b, stride=(1, time_strides))
    p = y[:, :in_channels]
    q = y[:, in_channels:]
    return jnp.tanh(p) * jax.nn.sigmoid(q)
