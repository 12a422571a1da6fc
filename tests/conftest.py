"""Test environment: 8 virtual CPU devices so mesh/sharding tests run in CI
without TPU hardware (SURVEY.md §4 "distributed without a cluster")."""
import os

# Must be set before jax is imported anywhere in the test process. Force cpu:
# the ambient environment may pin JAX_PLATFORMS to a remote TPU plugin, which
# would route every tiny test compile over the device tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient TPU plugin overrides JAX_PLATFORMS at import time; the config
# update below is what actually pins the tests to (virtual 8-device) CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: this box has 2 cores and XLA:CPU compiles are
# the dominant test cost; repeat runs hit the cache.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_path():
    """Puts the read-only reference repo on sys.path for golden-value tests."""
    import sys

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
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

    from dstagnn_drought_tpu.cli import stag_gen

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
