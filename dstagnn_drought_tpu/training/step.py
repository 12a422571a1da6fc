"""Jitted train / eval steps.

The reference's hot loop syncs with the host every batch (``loss.item()``,
prints, a spurious pre-step ``optimizer_step(barrier=True)`` — reference
train_DSTAGNN_my.py:147-162, a known anti-pattern). Here one jit-compiled
function does gather-batch → forward → Huber loss → backward → Adam update
entirely on device, with donated buffers; losses stay on device and are only
read at epoch boundaries.

Criterion: SmoothL1 (Huber, beta=1) like the reference (train:132).
Optimizer: Adam with torch-default betas/eps (train:133 / optax.adam).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from dstagnn_drought_tpu.models.dstagnn import ModelSpec, apply
from dstagnn_drought_tpu.ops.nn import per_sample_smooth_l1, smooth_l1_loss
from dstagnn_drought_tpu.parallel.sharding import constrain_batch


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def make_train_step(
    spec: ModelSpec,
    optimizer: optax.GradientTransformation,
    *,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    mesh=None,
    shard_nodes: bool = True,
    apply_fn=apply,
):
    """Returns step(params, opt_state, rng, x_full, y_full, idx) →
    (params, opt_state, rng, loss). x_full/y_full are the device-resident
    split arrays; idx is the (B,) batch index vector."""

    def loss_fn(params, x, y, rng, constants, weights=None):
        pred = apply_fn(
            params, x,
            spec=spec,
            adj_pa=constants["adj_pa"],
            cheb_polys=constants["cheb_polys"],
            deterministic=False,
            rng=rng,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            ell=constants.get("ell"),
            bell_tiles=constants.get("bell_tiles"),
        )
        return smooth_l1_loss(pred, y, sample_weights=weights)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng, x_full, y_full, idx, constants, weights=None):
        x = constrain_batch(x_full[idx], mesh, shard_nodes)
        y = constrain_batch(y_full[idx], mesh, shard_nodes)
        rng, sub = jax.random.split(rng)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, sub, constants, weights
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    return step


def make_checked_train_step(
    spec: ModelSpec,
    optimizer: optax.GradientTransformation,
    *,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    mesh=None,
    shard_nodes: bool = True,
    apply_fn=apply,
):
    """Sanitizer variant of :func:`make_train_step` (SURVEY.md §5 "race
    detection / sanitizers" row): the whole batch step — forward, loss,
    backward, Adam — runs under ``jax.experimental.checkify`` with float
    (NaN/inf) and index (out-of-bounds) checks inserted at every op, so a
    numerical fault raises a LOCALIZED error naming the failing primitive
    and source line instead of a NaN surfacing epochs later.

    Returns step(...) → (err, (params, opt_state, rng, loss)); call
    ``err.throw()`` on the host. Orders of magnitude slower than the scan
    epoch runner — a debugging mode, enabled with ``TrainingConfig.debug``.
    """
    from jax.experimental import checkify

    def loss_fn(params, x, y, rng, constants, weights=None):
        pred = apply_fn(
            params, x,
            spec=spec,
            adj_pa=constants["adj_pa"],
            cheb_polys=constants["cheb_polys"],
            deterministic=False,
            rng=rng,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            ell=constants.get("ell"),
            bell_tiles=constants.get("bell_tiles"),
        )
        return smooth_l1_loss(pred, y, sample_weights=weights)

    def raw_step(params, opt_state, rng, x_full, y_full, idx, constants,
                 weights=None):
        x = constrain_batch(x_full[idx], mesh, shard_nodes)
        y = constrain_batch(y_full[idx], mesh, shard_nodes)
        rng, sub = jax.random.split(rng)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, x, y, sub, constants, weights
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    checked = checkify.checkify(
        raw_step, errors=checkify.float_checks | checkify.index_checks
    )
    return jax.jit(checked)


def make_epoch_runner(
    spec: ModelSpec,
    optimizer: optax.GradientTransformation,
    *,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    mesh=None,
    shard_nodes: bool = True,
    apply_fn=apply,
):
    """Whole-epoch training as ONE jitted program: ``lax.scan`` over the
    batch-index plan, carrying (params, opt_state, rng). A single dispatch
    per epoch — no per-step host round trips at all (the reference syncs
    with the host every batch, train_DSTAGNN_my.py:147-162).

    Returns run(params, opt_state, rng, x_full, y_full, idx_plan, constants)
    → (params, opt_state, rng, losses) with losses shaped (num_batches,).
    """

    def loss_fn(params, x, y, rng, constants, weights):
        pred = apply_fn(
            params, x,
            spec=spec,
            adj_pa=constants["adj_pa"],
            cheb_polys=constants["cheb_polys"],
            deterministic=False,
            rng=rng,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            ell=constants.get("ell"),
            bell_tiles=constants.get("bell_tiles"),
        )
        return smooth_l1_loss(pred, y, sample_weights=weights)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, rng, x_full, y_full, idx_plan, constants,
            weight_plan=None):
        if weight_plan is None:
            weight_plan = jnp.ones(idx_plan.shape, jnp.float32)

        def body(carry, batch):
            idx, w = batch
            params, opt_state, rng = carry
            x = constrain_batch(x_full[idx], mesh, shard_nodes)
            y = constrain_batch(y_full[idx], mesh, shard_nodes)
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x, y, sub, constants, w
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss

        (params, opt_state, rng), losses = jax.lax.scan(
            body, (params, opt_state, rng), (idx_plan, weight_plan)
        )
        return params, opt_state, rng, losses

    return run


def make_eval_step(
    spec: ModelSpec,
    *,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    mesh=None,
    shard_nodes: bool = True,
    apply_fn=apply,
):
    """Returns eval(params, x_full, y_full, idx) → (pred, loss)."""

    @jax.jit
    def eval_step(params, x_full, y_full, idx, constants):
        x = constrain_batch(x_full[idx], mesh, shard_nodes)
        y = y_full[idx]
        pred = apply_fn(
            params, x,
            spec=spec,
            adj_pa=constants["adj_pa"],
            cheb_polys=constants["cheb_polys"],
            deterministic=True,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            ell=constants.get("ell"),
            bell_tiles=constants.get("bell_tiles"),
        )
        return pred, smooth_l1_loss(pred, y)

    return eval_step


def make_eval_runner(
    spec: ModelSpec,
    *,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    mesh=None,
    shard_nodes: bool = True,
    apply_fn=apply,
):
    """Whole-split evaluation as ONE jitted program: ``lax.scan`` over the
    batch-index plan (the per-batch dispatch variant syncs with the host once
    per batch — the same anti-pattern the train loop avoids).

    Returns run(params, x_full, y_full, idx_plan, constants) →
    (preds (nb, B, ...), per_sample_loss (nb, B)). Padded rows are included;
    the caller slices to the true sample count and masks the loss mean.
    """

    @jax.jit
    def run(params, x_full, y_full, idx_plan, constants):
        def body(_, idx):
            x = constrain_batch(x_full[idx], mesh, shard_nodes)
            y = y_full[idx]
            pred = apply_fn(
                params, x,
                spec=spec,
                adj_pa=constants["adj_pa"],
                cheb_polys=constants["cheb_polys"],
                deterministic=True,
                compute_dtype=compute_dtype,
                use_pallas=use_pallas,
                ell=constants.get("ell"),
            bell_tiles=constants.get("bell_tiles"),
            )
            per_sample = per_sample_smooth_l1(pred.astype(jnp.float32), y)
            return None, (pred, per_sample)

        _, (preds, losses) = jax.lax.scan(body, None, idx_plan)
        return preds, losses

    return run


def tree_size_bytes(tree: Any) -> int:
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "size")
    )
