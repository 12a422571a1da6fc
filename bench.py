"""Benchmark harness — PEMS08-scale training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: PEMS08 training epochs/hour (full jitted train step —
forward + backward + Adam — at the reference's batch size 64,
configurations/PEMS08_dstagnn.conf). The reference publishes no benchmark
numbers (BASELINE.md), so the baseline is measured empirically from the
reference PyTorch model on this machine's CPU (no GPU / torch_xla here):
4999 ms/step @ batch 64 → 4.29 epochs/hr (see BENCH_NOTES.md for
methodology). vs_baseline = ours / reference-empirical.

Steps per epoch uses the real PEMS08 train-split size: 17856 raw steps →
~10700 windowed training samples → 168 batches of 64.
"""
from __future__ import annotations

import json
import time

import numpy as np

# Empirical reference baseline (see module docstring / BENCH_NOTES.md).
REFERENCE_CPU_EPOCHS_PER_HOUR = 4.286
PEMS08_TRAIN_SAMPLES = 10700
BATCH = 64


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model
    from dstagnn_drought_tpu.training.step import make_optimizer

    spec = ModelSpec(
        num_of_vertices=170, len_input=12, num_for_predict=12, num_of_d=1,
        nb_block=4, in_channels=1, K=3, nb_chev_filter=32, nb_time_filter=32,
        d_model=512, d_k=32, n_heads=3,
    )
    rng = np.random.default_rng(0)
    N = spec.num_of_vertices
    A = (rng.random((N, N)) < 0.05).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.01).astype(np.float32)
    np.fill_diagonal(pa, 1)

    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)

    n_total = 4 * BATCH
    x_full = jnp.asarray(rng.normal(size=(n_total, N, 1, 12)), jnp.float32)
    y_full = jnp.asarray(rng.normal(size=(n_total, N, 12)), jnp.float32)

    # bfloat16 compute, fp32 params/loss — measured to track the fp32 loss
    # trajectory to 3 decimals on this model (BENCH_NOTES.md). The whole
    # epoch (168 steps) runs as ONE lax.scan dispatch, as real training does,
    # so host/tunnel dispatch latency doesn't pollute the measurement.
    from dstagnn_drought_tpu.training.step import make_epoch_runner

    runner = make_epoch_runner(spec, optimizer, compute_dtype=jnp.bfloat16)
    # dropout rng on the TPU hardware bit generator (the trainer default,
    # config.prng_impl) — threefry costs ~17% of the step at this scale
    key = jax.random.key(1, impl="rbg")
    steps_per_epoch = -(-PEMS08_TRAIN_SAMPLES // BATCH)
    idx_plan = jnp.asarray(
        (np.arange(steps_per_epoch * BATCH) % n_total)
        .reshape(steps_per_epoch, BATCH)
        .astype(np.int32)
    )

    # warmup / compile
    params, opt_state, key, losses = runner(
        params, opt_state, key, x_full, y_full, idx_plan, consts
    )
    jax.block_until_ready(losses)

    EPOCHS = 3
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        params, opt_state, key, losses = runner(
            params, opt_state, key, x_full, y_full, idx_plan, consts
        )
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / (EPOCHS * steps_per_epoch)

    epochs_per_hour = 3600.0 / (dt * steps_per_epoch)

    # BASELINE.json north-star counter: edges/s/chip. The dense path
    # aggregates every (src, dst) pair per Chebyshev order, timestep, sample
    # and block: nnz = N²·nb_block (training = fwd+bwd+Adam per edge).
    from dstagnn_drought_tpu.training.profiling import throughput

    tp = throughput(
        step_seconds=dt, batch_size=BATCH,
        nnz=N * N * spec.nb_block, K=spec.K, T=spec.len_input,
    )
    print(
        json.dumps(
            {
                "metric": "PEMS08_train_epochs_per_hour",
                "value": round(epochs_per_hour, 2),
                "unit": "epochs/hr (batch 64, 1 chip, full jitted fwd+bwd+Adam)",
                "vs_baseline": round(
                    epochs_per_hour / REFERENCE_CPU_EPOCHS_PER_HOUR, 2
                ),
                "edges_per_s_per_chip": round(tp["edges_per_s_per_chip"]),
                "windows_per_s": round(tp["windows_per_s"], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
