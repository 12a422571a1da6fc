"""Loader parity against the REAL shipped PEMS04 artifacts.

The reference repo ships actual graph files — the edge list
``data/PEMS04/PEMS04.csv`` and the STAG/STRG matrices
``stag_001_PEMS04.csv`` / ``strg_001_PEMS04.csv`` — the exact inputs of
``lib/utils1.py:92-145`` (get_adjacency_matrix2) and
``lib/dataloader.py:5-15`` (load_weighted_adjacency_matrix / load_PA).
These tests parse them through our loaders (both the numpy and the native
C++ CSV path) and assert the reference conventions hold against ground
truth, instead of only synthetic fixtures.

Facts about the shipped files (independently verified with pandas):
  * the edge list is a headered ``from,to,cost`` CSV with 340 DIRECTED
    edges (the reference's connectivity branch does NOT symmetrize —
    the ``A[j, i] = 1`` line is commented out, lib/utils1.py:137);
  * the stag/strg matrices are HEADERLESS dense CSVs (pandas
    ``header=None``), 307×307;
  * the shipped stag has exactly 3 nonzeros per row and the shipped strg 4
    per row with a full diagonal — they were produced by an earlier
    sequential generator (SURVEY.md §3.4 defect note), so their supports
    differ; the loaders must preserve each file as-is, not "fix" them.
"""
import os

import numpy as np
import pytest

BASE = "/root/reference/data/PEMS04"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference PEMS04 artifacts not present"
)

N = 307


def _pandas_dense(path):
    import pandas as pd

    return pd.read_csv(path, header=None).to_numpy()


def test_edge_list_real_file():
    from dstagnn_drought_tpu.data.adjacency import edge_list_adjacency

    A = edge_list_adjacency(os.path.join(BASE, "PEMS04.csv"), N)
    assert A.shape == (N, N)
    assert A.dtype == np.float32
    # independent parse: header line + 340 edge rows
    with open(os.path.join(BASE, "PEMS04.csv")) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "from,to,cost"
    edges = [tuple(map(int, ln.split(",")[:2])) for ln in lines[1:]]
    assert len(edges) == 340
    assert int(A.sum()) == len(set(edges)) == 340
    for i, j in edges[:20]:
        assert A[i, j] == 1
    # directed, like get_adjacency_matrix2's connectivity branch
    i, j = edges[0]
    assert A[j, i] == 0 and not (A == A.T).all()


def test_edge_list_id_remap_real_file(tmp_path):
    """The id-remap branch (symmetrized) against the real edge list."""
    from dstagnn_drought_tpu.data.adjacency import edge_list_adjacency

    # id file: identity mapping written the way the reference expects
    # (one raw node id per line; line number = remapped index)
    idf = tmp_path / "ids.txt"
    idf.write_text("\n".join(str(i) for i in range(N)))
    A = edge_list_adjacency(os.path.join(BASE, "PEMS04.csv"), N, str(idf))
    assert (A == A.T).all()  # this branch symmetrizes
    A_dir = edge_list_adjacency(os.path.join(BASE, "PEMS04.csv"), N)
    assert ((A > 0) == ((A_dir + A_dir.T) > 0)).all()


@pytest.mark.parametrize("use_native", [False, True])
def test_stag_strg_real_files(monkeypatch, use_native):
    import dstagnn_drought_tpu.data.native as native
    from dstagnn_drought_tpu.data.adjacency import (
        load_stag_adjacency,
        load_strg_adjacency,
    )

    if use_native and not native.native_available():
        pytest.skip("native CSV parser not built")
    if not use_native:
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_checked", True)

    stag = load_stag_adjacency(os.path.join(BASE, "stag_001_PEMS04.csv"), N)
    strg = load_strg_adjacency(os.path.join(BASE, "strg_001_PEMS04.csv"))
    # ground truth: the reference parses with pd.read_csv(header=None) > 0
    np.testing.assert_array_equal(
        stag, np.float64(_pandas_dense(
            os.path.join(BASE, "stag_001_PEMS04.csv")) > 0)
    )
    np.testing.assert_array_equal(
        strg, np.float64(_pandas_dense(
            os.path.join(BASE, "strg_001_PEMS04.csv")) > 0)
    )
    assert stag.shape == strg.shape == (N, N)
    assert set(np.unique(stag)) <= {0.0, 1.0}
    assert set(np.unique(strg)) <= {0.0, 1.0}
    # shipped-file structure: per-row top-k sparsification
    assert (stag.sum(axis=1) == 3).all()
    assert (strg.sum(axis=1) == 4).all()
    assert (np.diag(strg) == 1).all()
    assert int(stag.sum()) == 921 and int(strg.sum()) == 1228


def test_real_graphs_feed_the_model_path():
    """C6 integration: scaled Laplacian + Chebyshev polynomials on the real
    aware graph are finite and correctly normalized (lib/utils.py:149-203
    semantics)."""
    import jax.numpy as jnp

    from dstagnn_drought_tpu.data.adjacency import load_stag_adjacency
    from dstagnn_drought_tpu.ops.graph import (
        cheb_polynomials,
        scaled_laplacian,
    )

    stag = load_stag_adjacency(os.path.join(BASE, "stag_001_PEMS04.csv"), N)
    merged = np.maximum(stag, stag.T)  # symmetrize for the spectral op
    Lt = scaled_laplacian(jnp.asarray(merged, jnp.float32))
    polys = cheb_polynomials(Lt, 3)
    assert polys.shape == (3, N, N)
    assert bool(jnp.isfinite(polys).all())
    # T_0 = I
    np.testing.assert_allclose(np.asarray(polys[0]), np.eye(N), atol=1e-6)
    # eigenvalues of L̃ in [-1, 1] up to power-iteration tolerance
    ev = np.linalg.eigvalsh(np.asarray(Lt))
    assert ev.min() >= -1.01 and ev.max() <= 1.01
