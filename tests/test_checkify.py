"""Sanitizer (checkify) debug mode: a seeded numerical fault must raise a
localized error at the offending batch instead of surfacing as a NaN loss
epochs later (SURVEY.md §5 sanitizers row)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
from dstagnn_drought_tpu.training.loop import Trainer


def _toy(rng, N=8, F=1, n=16, nan_sample=None):
    x = rng.normal(size=(n, N, F, 12)).astype(np.float32)
    if nan_sample is not None:
        x[nan_sample, 0, 0, 0] = np.nan
    y = np.repeat(
        x[:, :, -1, :].mean(axis=2, keepdims=True), 6, axis=2
    ).astype(np.float32)
    sp = lambda s: Split(x[s], y[s])
    return ArrayDataset(
        train=sp(slice(0, 8)), val=sp(slice(8, 12)), test=sp(slice(12, 16)),
        mean=np.zeros((1, 1, F, 1)), std=np.ones((1, 1, F, 1)),
    )


def _cfg(N, F, name):
    return Config(
        data=DataConfig(num_of_vertices=N, len_input=12, num_for_predict=6,
                        dataset_name=name),
        training=TrainingConfig(
            in_channels=F, nb_block=1, n_heads=2, K=2, d_k=4, d_model=8,
            nb_chev_filter=4, nb_time_filter=4, batch_size=4,
            epochs=1, learning_rate=3e-3, debug=True,
        ),
    ).validate()


def graphs(rng, N):
    A = (rng.random((N, N)) < 0.3).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.2).astype(np.float32)
    return A, pa


def test_debug_mode_trains_clean_data(tmp_path):
    rng = np.random.default_rng(0)
    N, F = 8, 1
    A, pa = graphs(rng, N)
    ds = _toy(rng, N, F)
    tr = Trainer(_cfg(N, F, "CHK_OK"), dataset=ds, adj_merge=A, adj_pa=pa,
                 experiments_root=str(tmp_path))
    assert tr.checked_step is not None
    loss = tr.train_epoch(0)
    assert np.isfinite(loss)


def test_debug_mode_localizes_seeded_nan(tmp_path):
    rng = np.random.default_rng(1)
    N, F = 8, 1
    A, pa = graphs(rng, N)
    ds = _toy(rng, N, F, nan_sample=3)  # one poisoned training sample
    tr = Trainer(_cfg(N, F, "CHK_NAN"), dataset=ds, adj_merge=A, adj_pa=pa,
                 experiments_root=str(tmp_path))
    with pytest.raises(checkify.JaxRuntimeError, match="nan"):
        tr.train_epoch(0)
