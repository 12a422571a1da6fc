"""Benchmark harness — training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "gambia"}.

Headline metric: PEMS08 training epochs/hour (full jitted train step —
forward + backward + Adam — at the reference's batch size 64,
configurations/PEMS08_dstagnn.conf). The reference publishes no benchmark
numbers (BASELINE.md), so the baseline is measured empirically from the
reference PyTorch model on this machine's CPU (no GPU / torch_xla here):
4999 ms/step @ batch 64 → 4.29 epochs/hr (see BENCH_NOTES.md for
methodology). vs_baseline = ours / reference-empirical.

Steps per epoch uses the real PEMS08 train-split size: 17856 raw steps →
~10700 windowed training samples → 168 batches of 64.

The "gambia" object adds the flagship drought configuration (N=2139,
T=144→12, the repo's namesake) for the dense and tile-resident-BELL
spatial paths, with the north-star edges/s/chip counter in BOTH
conventions: "stag_nnz" counts only the aggregated sparse-support edges
(nnz(merged graph)+N, per Chebyshev order/timestep/sample/block — what the
sparse path actually computes), and "dense_count" counts N² pairs (what
the dense einsum computes). The two are separate labeled fields so sparse-
path gains are visible instead of being flattened by a dense-edge count.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Empirical reference baseline (see module docstring / BENCH_NOTES.md).
REFERENCE_CPU_EPOCHS_PER_HOUR = 4.286
PEMS08_TRAIN_SAMPLES = 10700
BATCH = 64

# Analytic plausibility floor (VERDICT r4 #1). Round 4's recorded headline
# (12 µs/step) was a synchronization escape on the experimental 'axon'
# platform: jax.block_until_ready returned before the device finished, so
# the harness timed dispatch, not compute. Guard: a full train step
# (fwd+bwd+Adam) cannot run faster than its matmul FLOPs at the chip's
# bf16 peak. Peak per benchmarks/roofline.py: 197 Tflop/s (TPU v5e).
PEAK_BF16_FLOPS = 197e12


def _step_flop_floor(spec, batch):
    """Lower bound on matmul FLOPs for one train step (fwd+bwd ≈ 3× fwd).

    Counts only the three dominant matmul families per block (temporal
    attention QKV+scores+context, the dense K-order Chebyshev aggregation,
    and the pre_conv/GTU channel mixes); everything omitted only raises
    the true floor, so `flops/PEAK` is a strict minimum step time.
    """
    N, T, K = spec.num_of_vertices, spec.len_input, spec.K
    dm, dk, H = spec.d_model, spec.d_k, spec.n_heads
    C = spec.nb_chev_filter
    per_block = (
        2 * T * N * (3 * H * dk)          # TAt QKV projections (d_model=N)
        + 2 * H * T * T * dk * 2          # scores + context
        + 2 * N * T * dm                  # pre_conv T→d_model
        + 2 * N * (3 * K * dk) * dm       # SAt QKV projections
        + 2 * K * N * N * dk              # SAt scores
        + 2 * K * T * N * N * C           # cheb aggregation (dense path)
        + 2 * K * T * N * C * C           # Θ mix
        + 2 * N * T * C * (2 * C) * 3     # GTU convs (3 kernels)
    )
    fwd = batch * (spec.nb_block * per_block + 2 * N * spec.nb_block * T * C * 128)
    return 3 * fwd  # fwd + bwd (≈2× fwd), Adam excluded (pure extra)


def main(run_gambia: bool = True):
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

    # warmup / compile. Sync via a HOST READ of the loss vector, not
    # jax.block_until_ready: round 4's recorded headline was 40× above the
    # chip's physical peak because block_until_ready failed to fence on the
    # experimental 'axon' platform (VERDICT r4 weak #1). np.asarray forces
    # a D2H copy of the computed values — the same sync that kept the
    # GAMBIA rows correct (training/loop.py train_epoch's float() read).
    params, opt_state, key, losses = runner(
        params, opt_state, key, x_full, y_full, idx_plan, consts
    )
    loss_check = float(np.asarray(losses)[-1])

    EPOCHS = 3
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        params, opt_state, key, losses = runner(
            params, opt_state, key, x_full, y_full, idx_plan, consts
        )
        loss_check = float(np.asarray(losses)[-1])  # host-read fence
    dt = (time.perf_counter() - t0) / (EPOCHS * steps_per_epoch)

    # Plausibility guard: refuse to report a step time below the model's
    # analytic matmul-FLOP floor at the chip's bf16 peak.
    floor_s = _step_flop_floor(spec, BATCH) / PEAK_BF16_FLOPS
    if dt < floor_s:
        raise RuntimeError(
            f"measured step time {dt*1e6:.1f} µs is below the analytic "
            f"FLOP floor {floor_s*1e6:.1f} µs — the timing fence did not "
            f"hold (synchronization escape); refusing to report. "
            f"last loss read: {loss_check}"
        )
    if not np.isfinite(loss_check):
        raise RuntimeError(f"non-finite loss {loss_check} — bench invalid")

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
                "gambia": _gambia_rows() if run_gambia else "skipped (--no-gambia)",
            }
        )
    )


def _gambia_rows(epochs: int = 3):
    """Flagship GAMBIA rows (dense + tile-resident BELL), small-N dict.

    Runs two full 3-epoch GAMBIA trainings — a deliberate cost: these rows
    are the round's sparse-vs-dense evidence at the namesake configuration
    and the driver records them in BENCH_r{N}.json. Skippable for quick
    local runs with --no-gambia.
    """
    import os
    import traceback

    bench_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks")
    sys.path.insert(0, bench_dir)
    try:
        import gambia_bench as gb
        import jax

        from dstagnn_drought_tpu.config import (
            Config,
            DataConfig,
            TrainingConfig,
        )
        from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
        from dstagnn_drought_tpu.training.loop import Trainer
        from dstagnn_drought_tpu.training.profiling import throughput

        sig, coords = gb.synth_drought()
        A = gb.grid_adjacency(coords)
        rng = np.random.default_rng(1)
        N = gb.N
        pa = (rng.random((N, N)) < 0.01).astype(np.float32)
        np.fill_diagonal(pa, 1)
        x_tr, y_tr, x_va, y_va, x_te, y_te, mean, std = gb.windows(sig)
        ds = ArrayDataset(
            train=Split(x_tr, y_tr), val=Split(x_va, y_va),
            test=Split(x_te, y_te), mean=mean, std=std,
        )
        nnz = int((np.maximum(A, pa) != 0).sum() + N)
        out = {"N": N, "batch": gb.BATCH}
        for label, path_sparse in (("dense", False), ("bell_tiles", True)):
            cfg = Config(
                data=DataConfig(num_of_vertices=N, len_input=gb.T_IN,
                                num_for_predict=gb.T_PRED,
                                dataset_name="GAMBIA_SYN",
                                points_per_hour=12),
                training=TrainingConfig(
                    in_channels=gb.F, nb_block=2, n_heads=2, K=2, d_k=32,
                    d_model=64, nb_chev_filter=32, nb_time_filter=32,
                    batch_size=gb.BATCH, epochs=epochs, learning_rate=1e-4,
                    num_of_hours=12, compute_dtype="bfloat16",
                    sparse=path_sparse,
                    sparse_format="bell", use_pallas=path_sparse,
                    mask_format="tiles" if path_sparse else "dense",
                ),
            ).validate()
            trainer = Trainer(
                cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                experiments_root=os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "benchmarks", "gambia_runs"),
            )
            n_batches = -(-len(x_tr) // gb.BATCH)
            trainer.train_epoch(0)  # compile epoch
            t0 = time.perf_counter()
            for e in range(1, epochs):
                trainer.train_epoch(e)
            steady = (time.perf_counter() - t0) / max(epochs - 1, 1)
            step_s = steady / n_batches
            nb = cfg.training.nb_block
            tp_s = throughput(step_seconds=step_s, batch_size=gb.BATCH,
                              nnz=nnz * nb, K=cfg.training.K, T=gb.T_IN)
            tp_d = throughput(step_seconds=step_s, batch_size=gb.BATCH,
                              nnz=N * N * nb, K=cfg.training.K, T=gb.T_IN)
            out[label] = {
                "ms_per_step": round(step_s * 1e3, 2),
                "epochs_per_hour": round(3600 / steady, 1),
                "edges_per_s_per_chip_stag_nnz": round(
                    tp_s["edges_per_s_per_chip"]),
                "edges_per_s_per_chip_dense_count": round(
                    tp_d["edges_per_s_per_chip"]),
            }
        return out
    except Exception as e:  # keep the headline line intact on any failure
        traceback.print_exc(file=sys.stderr)
        return {"error": f"{type(e).__name__}: {e}"}
    finally:
        try:
            sys.path.remove(bench_dir)
        except ValueError:
            pass


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--no-gambia", action="store_true",
        help="skip the two GAMBIA flagship trainings (quick headline only)",
    )
    main(run_gambia=not ap.parse_args().no_gambia)
