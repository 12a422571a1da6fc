"""CLI end-to-end: prepare_data → train → evaluate on a tiny synthetic set,
through the same ``main()`` entry points a user invokes."""
import numpy as np
import pytest

from dstagnn_drought_tpu.cli import evaluate, prepare_data, stag_gen, train


@pytest.fixture(scope="module")
def toy_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("toyproj")
    rng = np.random.default_rng(0)
    N, T_total, F = 12, 200, 1
    sig = np.cumsum(rng.normal(0, 0.3, (T_total, N, F)), axis=0) + 10
    np.savez(root / "TOY.npz", data=sig)

    # dense ring adjacency (non-PEMS datasets use the dense-CSV loader)
    adj = np.zeros((N, N))
    for i in range(N):
        adj[i, (i + 1) % N] = adj[(i + 1) % N, i] = 1
    np.fill_diagonal(adj, 1)  # loader subtracts identity
    np.savetxt(root / "TOY_adj.csv", adj, delimiter=",")

    stag_gen.main([
        "--input", str(root / "TOY.npz"), "--dataset", "TOY",
        "--sparsity", "0.2", "--method", "fast", "--out-dir", str(root),
    ])

    conf = f"""[Data]
adj_filename = {root}/TOY_adj.csv
graph_signal_matrix_filename = {root}/TOY.npz
stag_filename = {root}/stag_020_TOY.csv
strg_filename = {root}/strg_020_TOY.csv
num_of_vertices = {N}
points_per_hour = 1
num_for_predict = 12
len_input = 12
dataset_name = TOY

[Training]
in_channels = 1
nb_block = 2
n_heads = 2
K = 2
d_k = 8
d_model = 16
nb_chev_filter = 8
nb_time_filter = 8
batch_size = 16
graph = AG
model_name = dstagnn
num_of_weeks = 0
num_of_days = 0
num_of_hours = 1
start_epoch = 0
epochs = 2
learning_rate = 0.005
"""
    (root / "TOY.conf").write_text(conf)
    return root


def test_cli_pipeline(toy_project, capsys):
    root = toy_project
    prepare_data.main(["--config", str(root / "TOY.conf")])
    assert (root / "TOY_r1_d0_w0_dstagnn.npz").exists()

    result = train.main([
        "--config", str(root / "TOY.conf"),
        "--experiments-root", str(root / "exp"),
    ])
    assert result["best_epoch"] >= 0
    out = capsys.readouterr().out
    assert "horizon" in out and "all" in out

    report = evaluate.main([
        "--config", str(root / "TOY.conf"),
        "--experiments-root", str(root / "exp"),
    ])
    assert len(report["per_horizon"]) == 12
    # training on a random-walk toy should at least beat wild predictions
    assert report["overall"]["rmse"] < 50


def test_train_resume_flag(toy_project):
    root = toy_project
    result = train.main([
        "--config", str(root / "TOY.conf"),
        "--experiments-root", str(root / "exp"),
        "--resume", "--epochs", "3",
    ])
    assert result["best_epoch"] >= 0
