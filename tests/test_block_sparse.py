"""Block-ELL sparse path: construction invariants, RCM permutation, and
numerical agreement with the edge-list (ELL) path on the same graph."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.block_sparse import (
    BlockEllGraph,
    block_ell_from_adjacency,
    block_sparse_cheb_conv_with_sat,
    block_sparse_spatial_attention_scores,
    gather_block_values,
    rcm_permutation,
)
from dstagnn_drought_tpu.ops.sparse import (
    ell_from_adjacency,
    gather_edge_values,
    sparse_cheb_conv_with_sat,
    sparse_spatial_attention_scores,
)


def local_graph(N, radius=3, seed=0):
    """Spatially local random digraph (banded) — the STAG-like structure."""
    rng = np.random.default_rng(seed)
    A = np.zeros((N, N), np.float32)
    for j in range(N):
        lo, hi = max(0, j - radius), min(N, j + radius + 1)
        for i in range(lo, hi):
            if rng.random() < 0.6:
                A[i, j] = 1
    return A


def test_block_ell_construction():
    N, BS = 20, 8
    A = local_graph(N)
    bell = block_ell_from_adjacency(A, block_size=BS)
    assert bell.padded_nodes == 24 and bell.num_tiles == 3
    # every true edge is present in some active tile's pattern
    Afull = (A != 0) | np.eye(N, dtype=bool)
    idx = np.asarray(bell.block_idx)
    msk = np.asarray(bell.block_mask)
    pat = np.asarray(bell.pattern)
    covered = np.zeros((bell.padded_nodes, bell.padded_nodes), bool)
    for j in range(bell.num_tiles):
        for s in range(bell.max_blocks):
            if msk[j, s]:
                sb = idx[j, s]
                covered[sb * BS:(sb + 1) * BS, j * BS:(j + 1) * BS] |= pat[j, s]
    np.testing.assert_array_equal(covered[:N, :N], Afull)
    assert not covered[N:].any() and not covered[:, N:].any()


def test_covered_reflects_max_blocks_truncation():
    """``covered`` must be computed from the truncated slot structure the
    kernels actually visit, not the full adjacency: a target column whose
    only in-edges live in truncated-away source blocks is uncovered."""
    N, BS = 16, 8
    A = np.zeros((N, N), np.float32)
    # every target column has an in-edge in the full graph: targets 0..7
    # from block 0, targets 8..15 ONLY from block 0 (source rows 0..7)
    A[0, :] = 1.0
    # give target tile 1 a second active source block whose edges hit only
    # SOME of its columns, so slot truncation to S=1 keeps the wrong block
    A[8, 8] = 1.0
    bell_full = block_ell_from_adjacency(A, block_size=BS,
                                         include_self=False)
    assert bell_full.covered
    # truncate to one slot per tile: tile 1 keeps source block 0 only if it
    # sorts first — either way some real column loses all its in-edges when
    # only one of its two source blocks survives... construct explicitly:
    bell_trunc = block_ell_from_adjacency(A, block_size=BS,
                                          include_self=False, max_blocks=1)
    # tile 1 keeps source block 0 (lowest id); its columns 8..15 are covered
    # by row 0 — but check the invariant programmatically instead
    kept = np.asarray(bell_trunc.pattern & np.asarray(
        bell_trunc.block_mask)[:, :, None, None])
    col_cov = kept.any(axis=(1, 2)).reshape(-1)[:N]
    assert bell_trunc.covered == bool(col_cov.all())


def test_covered_false_when_truncation_drops_only_edges():
    """Explicit case: truncation drops the only in-edges of a real column →
    covered must flip to False (it used to stay True, computed from the
    full adjacency)."""
    N, BS = 16, 8
    A = np.zeros((N, N), np.float32)
    A[0, :8] = 1.0    # tile-0 targets from block 0
    A[0, 8] = 1.0     # tile-1 target 8 from block 0 (many edges)
    A[1, 8] = 1.0
    A[9, 9:16] = 1.0  # tile-1 targets 9..15 ONLY from block 1 (fewer tiles'
    #                   worth of edges, but block id sorts AFTER block 0)
    bell = block_ell_from_adjacency(A, block_size=BS, include_self=False,
                                    max_blocks=1)
    # slot list for tile 1 truncated to [block 0] → columns 9..15 lost all
    # in-edges in the visited structure
    assert not bell.covered
    full = block_ell_from_adjacency(A, block_size=BS, include_self=False)
    assert full.covered


def test_rcm_reduces_active_blocks():
    # two interleaved communities: awful banding as given, good after RCM
    rng = np.random.default_rng(1)
    N = 64
    A = np.zeros((N, N), np.float32)
    for c in range(2):
        nodes = np.arange(c, N, 2)  # evens / odds
        for i in nodes:
            for j in nodes:
                if rng.random() < 0.4:
                    A[i, j] = 1
    perm = rcm_permutation(A)
    assert sorted(perm.tolist()) == list(range(N))
    Ap = A[np.ix_(perm, perm)]
    before = block_ell_from_adjacency(A, block_size=16)
    after = block_ell_from_adjacency(Ap, block_size=16)
    n_before = int(np.asarray(before.block_mask).sum())
    n_after = int(np.asarray(after.block_mask).sum())
    assert n_after < n_before


def test_bell_scores_match_ell():
    N, BS, H, dk, dm = 20, 8, 3, 4, 16
    A = local_graph(N)
    bell = block_ell_from_adjacency(A, block_size=BS)
    ell = ell_from_adjacency(A)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, N, dm)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dm, H * dk)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(dm, H * dk)), jnp.float32)

    s_bell = block_sparse_spatial_attention_scores(
        x, bell, wq=wq, wk=wk, n_heads=H, d_k=dk
    )
    s_ell = sparse_spatial_attention_scores(
        x, ell, wq=wq, wk=wk, n_heads=H, d_k=dk
    )
    # compare at true edges: ELL (b,h,j,e) ↔ BELL (b,h,jt,s,a,b')
    idx = np.asarray(bell.block_idx)
    sb_np = np.asarray(s_bell)
    se_np = np.asarray(s_ell)
    eidx = np.asarray(ell.indices)
    emask = np.asarray(ell.mask)
    checked = 0
    for j in range(N):
        jt, b = divmod(j, BS)
        for e in range(ell.max_degree):
            if not emask[j, e]:
                continue
            i = eidx[j, e]
            sbk, a = divmod(int(i), BS)
            s_slots = np.nonzero(idx[jt] == sbk)[0]
            s_slot = int(s_slots[0])
            np.testing.assert_allclose(
                sb_np[:, :, jt, s_slot, a, b], se_np[:, :, j, e],
                rtol=1e-5, atol=1e-5,
            )
            checked += 1
    assert checked > 30


def test_bell_conv_matches_ell_conv():
    N, BS, K, C, T, dm, dk = 20, 8, 3, 4, 6, 16, 4
    A = local_graph(N)
    bell = block_ell_from_adjacency(A, block_size=BS)
    ell = ell_from_adjacency(A)
    rng = np.random.default_rng(3)

    x = jnp.asarray(rng.normal(size=(2, N, C, T)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, N, dm)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
    cheb = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, 5)) * 0.1, jnp.float32)

    s_ell = sparse_spatial_attention_scores(emb, ell, wq=wq, wk=wk,
                                            n_heads=K, d_k=dk)
    out_ell = sparse_cheb_conv_with_sat(
        x, s_ell, ell,
        cheb_edges=gather_edge_values(cheb, ell),
        bias_edges=gather_edge_values(bias, ell),
        thetas=thetas,
    )

    s_bell = block_sparse_spatial_attention_scores(emb, bell, wq=wq, wk=wk,
                                                   n_heads=K, d_k=dk)
    out_bell = block_sparse_cheb_conv_with_sat(
        x, s_bell, bell,
        cheb_blocks=gather_block_values(cheb, bell),
        bias_blocks=gather_block_values(bias, bell),
        thetas=thetas,
    )
    np.testing.assert_allclose(
        np.asarray(out_bell), np.asarray(out_ell), rtol=2e-4, atol=2e-4
    )


def test_gather_block_values_roundtrip():
    N, BS = 20, 8
    A = local_graph(N, seed=5)
    bell = block_ell_from_adjacency(A, block_size=BS)
    rng = np.random.default_rng(6)
    dense = jnp.asarray(rng.normal(size=(2, N, N)), jnp.float32)
    blocks = np.asarray(gather_block_values(dense, bell))
    idx = np.asarray(bell.block_idx)
    d = np.zeros((2, bell.padded_nodes, bell.padded_nodes), np.float32)
    d[:, :N, :N] = np.asarray(dense)
    for j in range(bell.num_tiles):
        for s in range(bell.max_blocks):
            sb = idx[j, s]
            np.testing.assert_allclose(
                blocks[:, j, s],
                d[:, sb * BS:(sb + 1) * BS, j * BS:(j + 1) * BS],
            )


def test_model_bell_forward_matches_ell():
    """The model's sparse dispatch: BlockEllGraph and EllGraph agree."""
    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, apply, make_model
    from dstagnn_drought_tpu.ops.sparse import ell_from_adjacency

    N = 20
    spec = ModelSpec(
        num_of_vertices=N, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=3, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    A = local_graph(N, seed=7)
    A = np.maximum(A, A.T)
    pa = (np.random.default_rng(8).random((N, N)) < 0.2).astype(np.float32)
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(2, N, 1, 12)), jnp.float32
    )
    kw = dict(spec=spec, adj_pa=consts["adj_pa"],
              cheb_polys=consts["cheb_polys"], deterministic=True)
    out_ell = apply(params, x, ell=ell_from_adjacency(A), **kw)
    out_bell = apply(params, x, ell=block_ell_from_adjacency(A, block_size=8),
                     **kw)
    np.testing.assert_allclose(
        np.asarray(out_bell), np.asarray(out_ell), rtol=2e-4, atol=2e-4
    )


def test_trainer_bell_mode(tmp_path):
    """sparse_format=bell end-to-end through the Trainer."""
    from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
    from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
    from dstagnn_drought_tpu.training.loop import Trainer

    rng = np.random.default_rng(10)
    N = 20
    cfg = Config(
        data=DataConfig(num_of_vertices=N, len_input=12, num_for_predict=4,
                        dataset_name="BELL_TOY"),
        training=TrainingConfig(
            in_channels=1, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=2, learning_rate=3e-3, sparse=True, sparse_format="bell",
            block_size=8,
        ),
    ).validate()
    A = np.maximum(local_graph(N, seed=11), local_graph(N, seed=11).T)
    pa = (rng.random((N, N)) < 0.2).astype(np.float32)

    def split(k):
        return Split(
            rng.normal(size=(k, N, 1, 12)).astype(np.float32),
            rng.normal(size=(k, N, 4)).astype(np.float32),
        )

    ds = ArrayDataset(train=split(24), val=split(8), test=split(8),
                      mean=np.zeros(1), std=np.ones(1))
    tr = Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                 experiments_root=str(tmp_path / "exp"))
    res = tr.run()
    assert np.isfinite(res["test_loss"])
    assert res["best_epoch"] >= 0


def test_trainer_rcm_reorders_and_reports_original_order(tmp_path):
    """rcm=True: a shuffled banded graph is re-banded internally (fewer
    active BELL tiles), training runs, and predictions/metrics come back in
    the ORIGINAL node order."""
    from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
    from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
    from dstagnn_drought_tpu.training.loop import Trainer

    rng = np.random.default_rng(0)
    N, F, BS = 32, 1, 8
    banded = local_graph(N, radius=2, seed=3)
    banded = np.maximum(banded, banded.T)
    shuffle = rng.permutation(N)
    A = banded[np.ix_(shuffle, shuffle)]     # same graph, scrambled ids
    pa = (rng.random((N, N)) < 0.2).astype(np.float32)

    n = 32
    x = rng.normal(size=(n, N, F, 12)).astype(np.float32)
    y = np.repeat(
        x[:, :, -1, :].mean(axis=2, keepdims=True), 6, axis=2
    ).astype(np.float32)
    sp = lambda s: Split(x[s], y[s])
    ds = ArrayDataset(
        train=sp(slice(0, 24)), val=sp(slice(24, 28)), test=sp(slice(28, 32)),
        mean=np.zeros((1, 1, F, 1)), std=np.ones((1, 1, F, 1)),
    )

    def cfg(rcm):
        return Config(
            data=DataConfig(num_of_vertices=N, len_input=12,
                            num_for_predict=6, dataset_name=f"RCM_{rcm}"),
            training=TrainingConfig(
                in_channels=F, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
                nb_chev_filter=8, nb_time_filter=8, batch_size=8,
                epochs=2, learning_rate=3e-3, sparse=True,
                sparse_format="bell", block_size=BS, rcm=rcm,
            ),
        ).validate()

    tr_plain = Trainer(cfg(False), dataset=ds, adj_merge=A, adj_pa=pa,
                       experiments_root=str(tmp_path / "plain"))
    tr_rcm = Trainer(cfg(True), dataset=ds, adj_merge=A, adj_pa=pa,
                     experiments_root=str(tmp_path / "rcm"))
    # banded structure recovered: strictly fewer active tiles
    assert tr_rcm.constants["ell"].num_active < \
        tr_plain.constants["ell"].num_active
    res = tr_rcm.run()
    assert np.isfinite(res["test_loss"])
    pred, _ = tr_rcm.evaluate("test")
    assert pred.shape == (4, N, 6) and np.isfinite(pred).all()
    # internal graph really is the RCM-permuted one
    p = tr_rcm._perm
    assert p is not None and not np.array_equal(p, np.arange(N))
