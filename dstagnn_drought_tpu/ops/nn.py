"""Small neural-net primitives shared across ops and models."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis (torch ``nn.LayerNorm`` semantics, eps=1e-5).

    Statistics are computed in float32 regardless of input dtype to keep
    bfloat16 activations numerically stable on TPU.
    """
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def dropout(x: jax.Array, rate: float, key: jax.Array | None, deterministic: bool) -> jax.Array:
    """Inverted dropout matching torch ``nn.Dropout`` (scale by 1/(1-p) at train)."""
    if deterministic or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def per_sample_smooth_l1(
    pred: jax.Array, target: jax.Array, beta: float = 1.0
) -> jax.Array:
    """Per-sample Huber (SmoothL1) loss: (B,) elementwise means over each
    leading-axis sample. Single source of truth for the Huber kernel — the
    mean-reduced criterion and the scan-compiled eval runner both build on
    it, so a beta change cannot drift between them."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return loss.reshape(loss.shape[0], -1).mean(axis=1)


def smooth_l1_loss(
    pred: jax.Array,
    target: jax.Array,
    beta: float = 1.0,
    sample_weights: jax.Array | None = None,
) -> jax.Array:
    """torch ``nn.SmoothL1Loss`` (mean reduction, beta=1) — the reference's
    training criterion (train_DSTAGNN_my.py:132).

    ``sample_weights`` (B,) masks padded samples out of the reduction: the
    batch plan pads the final batch to a static shape, and without the mask
    the padding samples would be silently over-weighted in every epoch.
    With all-ones weights this is exactly the unweighted elementwise mean
    (every sample has the same element count).
    """
    if sample_weights is None:
        diff = jnp.abs(pred - target)
        return jnp.where(
            diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta
        ).mean()
    per_sample = per_sample_smooth_l1(pred, target, beta)
    w = sample_weights.astype(per_sample.dtype)
    return (per_sample * w).sum() / jnp.maximum(w.sum(), 1.0)
