"""Profiling subsystem: trace produces artifacts, StepTimer/throughput math."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.training.profiling import StepTimer, throughput, trace


def test_trace_writes_artifacts(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        x.block_until_ready()
    files = [
        os.path.join(dp, f) for dp, _, fs in os.walk(logdir) for f in fs
    ]
    assert files, "profiler trace produced no files"


def test_step_timer_mean():
    t = StepTimer(drop_first=True)
    t.start()
    for _ in range(3):
        t.fence(jnp.zeros(()), steps=2)
    assert len(t.samples) == 2
    assert t.mean_step_seconds() > 0


def test_throughput_counters():
    out = throughput(
        step_seconds=0.01, batch_size=64, nnz=290, K=3, T=12, n_chips=1
    )
    assert out["windows_per_s"] == pytest.approx(6400)
    assert out["edges_per_s_per_chip"] == pytest.approx(290 * 3 * 12 * 64 / 0.01)


def test_trainer_epoch_under_trace(tmp_path):
    """An epoch dispatch runs correctly inside a profiler trace region (the
    --profile train-CLI path)."""
    import jax

    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model
    from dstagnn_drought_tpu.training.step import make_epoch_runner, make_optimizer

    spec = ModelSpec(
        num_of_vertices=6, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=2, nb_chev_filter=4, nb_time_filter=4,
        d_model=8, d_k=4, n_heads=2,
    )
    rng = np.random.default_rng(0)
    A = np.eye(6, dtype=np.float32)
    A[0, 1] = A[1, 0] = 1
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, A)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    runner = make_epoch_runner(spec, opt)
    x = jnp.asarray(rng.normal(size=(8, 6, 1, 12)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(8, 6, 4)), jnp.float32)
    idx = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)

    logdir = str(tmp_path / "prof")
    with trace(logdir):
        params, opt_state, key, losses = runner(
            params, opt_state, jax.random.PRNGKey(1), x, y, idx, consts
        )
        jax.block_until_ready(losses)
    assert np.all(np.isfinite(np.asarray(losses)))
    assert os.path.isdir(logdir)


def test_metric_logger_tensorboard(tmp_path):
    """TensorBoard scalars land in event files alongside the JSONL."""
    from dstagnn_drought_tpu.training.logger import MetricLogger

    tb = str(tmp_path / "tb")
    lg = MetricLogger(str(tmp_path / "m.jsonl"), quiet=True, tensorboard_dir=tb)
    lg.log("epoch", epoch=0, train_loss=1.5, val_loss=2.0)
    lg.log("epoch", epoch=1, train_loss=1.0, val_loss=1.8)
    lg.log("test", loss=0.9, mae=1.1)
    lg.close()
    files = os.listdir(tb)
    assert any("tfevents" in f for f in files), files
