"""NaN-recovery policy (SURVEY.md §5 failure detection): rollback restores
the last good checkpoint and halves the LR; abort raises."""
import numpy as np
import pytest

from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split


def _cfg(N, policy, max_rollbacks=2):
    return Config(
        data=DataConfig(num_of_vertices=N, len_input=12, num_for_predict=4,
                        dataset_name="NANTOY"),
        training=TrainingConfig(
            in_channels=1, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=4, learning_rate=3e-3, nan_policy=policy,
            max_rollbacks=max_rollbacks,
        ),
    ).validate()


def _dataset(rng, N, n=16):
    def split(k):
        return Split(rng.normal(size=(k, N, 1, 12)).astype(np.float32),
                     rng.normal(size=(k, N, 4)).astype(np.float32))
    return ArrayDataset(train=split(n), val=split(8), test=split(8),
                        mean=np.zeros(1), std=np.ones(1))


def _graphs(rng, N):
    A = (rng.random((N, N)) < 0.3).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.2).astype(np.float32)
    return A, pa


@pytest.mark.parametrize("policy", ["abort", "rollback"])
def test_nan_policy(tmp_path, policy):
    from dstagnn_drought_tpu.training.loop import Trainer

    rng = np.random.default_rng(0)
    N = 12
    A, pa = _graphs(rng, N)
    tr = Trainer(_cfg(N, policy), dataset=_dataset(rng, N),
                 adj_merge=A, adj_pa=pa,
                 experiments_root=str(tmp_path / policy))

    # run one clean epoch so a good checkpoint exists
    orig_train_epoch = type(tr).train_epoch
    loss0 = orig_train_epoch(tr, 0)
    assert np.isfinite(loss0)
    tr.epoch = 1
    import dstagnn_drought_tpu.training.checkpoint as ckpt

    ckpt.save_checkpoint(tr.run_dir, 0, params=tr.params,
                         opt_state=tr.opt_state, rng=tr.rng, metadata={})

    # next epoch produces a NaN once, then behaves
    calls = {"n": 0}

    def flaky_epoch(self, epoch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FloatingPointError("injected NaN")
        return orig_train_epoch(self, epoch)

    type(tr).train_epoch = flaky_epoch
    try:
        if policy == "abort":
            with pytest.raises(FloatingPointError):
                tr.run(epochs=3)
        else:
            result = tr.run(epochs=3)
            assert tr._rollbacks == 1
            assert tr._lr_scale == 0.5
            assert np.isfinite(result["test_loss"])
    finally:
        type(tr).train_epoch = orig_train_epoch


def test_rollback_without_checkpoint_aborts(tmp_path):
    from dstagnn_drought_tpu.training.loop import Trainer

    rng = np.random.default_rng(1)
    N = 12
    A, pa = _graphs(rng, N)
    tr = Trainer(_cfg(N, "rollback"), dataset=_dataset(rng, N),
                 adj_merge=A, adj_pa=pa,
                 experiments_root=str(tmp_path / "nockpt"))
    orig = type(tr).train_epoch

    def always_nan(self, epoch):
        raise FloatingPointError("injected NaN")

    type(tr).train_epoch = always_nan
    try:
        with pytest.raises(FloatingPointError, match="no checkpoint"):
            tr.run(epochs=2)
    finally:
        type(tr).train_epoch = orig
