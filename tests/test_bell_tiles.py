"""Tile-resident learnable masks (mask_format='tiles'): exactness vs the
dense-mask BELL path, init alignment, and trainer integration.

The reference's spatial bias is ``adj_pa ⊙ mask_k``
(model/DSTAGNN_my.py:126) with adj_pa a binarized graph
(lib/dataloader.py:11-15), so dense-mask entries off the edge support have
identically zero gradient and never contribute — storing masks only on the
BELL active-tile support is exact, and these tests prove it numerically:
same forward, same gradients (tile grads = gathered dense grads).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.block_sparse import (
    active_tile_values,
    block_ell_from_adjacency,
    build_bell_tile_constants,
)

BS = 8


def _setup(seed=0, n=29, K=2, C=4, T=8, B=2, d_model=12, d_k=4):
    rng = np.random.default_rng(seed)
    A = (rng.random((n, n)) < 0.25).astype(np.float32)
    np.fill_diagonal(A, 0)
    bell = block_ell_from_adjacency(A, block_size=BS)
    pa = ((rng.random((n, n)) < 0.5) & (A > 0)).astype(np.float32)
    np.fill_diagonal(pa, 1)
    # adj_pa support ⊆ bell support (pattern includes self-loops + A)
    cheb = rng.normal(size=(K, n, n)).astype(np.float32)
    masks = rng.normal(size=(K, n, n)).astype(np.float32)
    thetas = rng.normal(size=(K, C, 3)).astype(np.float32) * 0.3
    wq = rng.normal(size=(d_model, K * d_k)).astype(np.float32) * 0.3
    wk = rng.normal(size=(d_model, K * d_k)).astype(np.float32) * 0.3
    x = rng.normal(size=(B, n, C, T)).astype(np.float32)
    emb = rng.normal(size=(B, n, d_model)).astype(np.float32)
    return A, bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k


def test_tiles_match_dense_forward_and_grads():
    (A, bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k) = _setup()
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        bell_cheb_conv_tiles,
        bell_cheb_conv_with_sat_pallas,
    )

    tiles = build_bell_tile_constants(bell, pa, cheb)
    mask_tiles = jnp.asarray(active_tile_values(masks, bell))  # (A,K,BS,BS)

    def dense_fn(masks, x, emb, thetas, wq, wk):
        out = bell_cheb_conv_with_sat_pallas(
            x, emb, bell, wq=wq, wk=wk, adj_pa=jnp.asarray(pa),
            masks=masks, cheb_polys=jnp.asarray(cheb), thetas=thetas,
            n_heads=K, d_k=d_k,
        )
        return (out * jnp.cos(out)).sum(), out

    def tile_fn(mask_tiles, x, emb, thetas, wq, wk):
        out = bell_cheb_conv_tiles(
            x, emb, bell, wq=wq, wk=wk, mask_tiles=mask_tiles,
            pattern_tiles=tiles["pattern_tiles"],
            pa_tiles=tiles["pa_tiles"], cheb_tiles=tiles["cheb_tiles"],
            thetas=thetas, n_heads=K, d_k=d_k,
        )
        return (out * jnp.cos(out)).sum(), out

    (ld, out_d), gd = jax.value_and_grad(
        dense_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(jnp.asarray(masks), jnp.asarray(x), jnp.asarray(emb),
      jnp.asarray(thetas), jnp.asarray(wq), jnp.asarray(wk))
    (lt, out_t), gt = jax.value_and_grad(
        tile_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(mask_tiles, jnp.asarray(x), jnp.asarray(emb),
      jnp.asarray(thetas), jnp.asarray(wq), jnp.asarray(wk))

    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(lt), float(ld), rtol=1e-5)
    # activation / weight grads identical
    for a, b, name in [
        (gt[1], gd[1], "x"), (gt[2], gd[2], "emb"),
        (gt[3], gd[3], "thetas"), (gt[4], gd[4], "wq"), (gt[5], gd[5], "wk"),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )
    # mask grads: tile grads = dense grads gathered at the active tiles
    dmask_gathered = active_tile_values(np.asarray(gd[0]), bell)
    np.testing.assert_allclose(
        np.asarray(gt[0]), dmask_gathered, rtol=2e-4, atol=2e-5
    )
    # ... and dense mask grads are ZERO off the adj_pa⊙pattern support —
    # the exactness argument for dropping them
    support = np.zeros_like(masks, dtype=bool)
    Ap = np.asarray(bell.adj_bool)[: masks.shape[1], : masks.shape[2]]
    support[:] = (pa > 0) & Ap
    off = np.asarray(gd[0])[~support]
    np.testing.assert_allclose(off, 0.0, atol=1e-7)


def test_tiles_slot_scan_vjp_matches_fused():
    """The tile path's XLA slot-scan VJP (no source-sorted lists) agrees
    with its fused K1/K2 backward."""
    (A, bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k) = _setup(3)
    from dstagnn_drought_tpu.ops.pallas.bell_fused import bell_tiles_out

    tiles = build_bell_tile_constants(bell, pa, cheb)
    mask_tiles = jnp.asarray(active_tile_values(masks, bell))
    bias_t = jnp.where(
        tiles["pattern_tiles"][:, None],
        tiles["pa_tiles"][:, None] * mask_tiles, -1e30
    )
    B, n = x.shape[0], x.shape[1]
    C, T = x.shape[2], x.shape[3]
    Np = bell.padded_nodes

    def proj(w):
        e = jnp.einsum("bnd,dh->bnh", jnp.asarray(emb), w)
        e = jnp.pad(e, ((0, 0), (0, Np - n), (0, 0)))
        return e.reshape(B, Np, K, d_k).transpose(0, 2, 1, 3)

    q, k_ = proj(jnp.asarray(wq)), proj(jnp.asarray(wk))
    xm = jnp.pad(
        jnp.asarray(x).transpose(0, 1, 3, 2).reshape(B, n, T * C),
        ((0, 0), (0, Np - n), (0, 0)),
    )
    pat = (bell.pattern & bell.block_mask[:, :, None, None]).astype(
        jnp.float32
    )

    def f(lists, bias_t, q, k_, xm):
        out = bell_tiles_out(
            (bell.max_src_blocks if lists else None, True),
            bell.tile_start, bell.tile_count, bell.active_src,
            bell.active_tgt, bell.block_idx, pat, q, k_, bias_t,
            tiles["cheb_tiles"], xm, jnp.asarray(thetas),
            bell.active_slot if lists else None,
            bell.src_order if lists else None,
            bell.src_start if lists else None,
            bell.src_count if lists else None,
        )
        return (out * jnp.sin(out)).sum()

    g_fused = jax.grad(lambda *a: f(True, *a), argnums=(0, 1, 2, 3))(
        bias_t, q, k_, xm
    )
    g_scan = jax.grad(lambda *a: f(False, *a), argnums=(0, 1, 2, 3))(
        bias_t, q, k_, xm
    )
    for a, b, name in zip(g_fused, g_scan, ["bias", "q", "k", "x"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_init_key_stream_alignment():
    """bell=None vs bell=graph init: tile masks get the dense xavier bound
    and everything else keeps its shape/dtype (the host KeyGen is one
    sequential stream, so exact bit-parity across branches is not a goal)."""
    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, init_params

    rng = np.random.default_rng(1)
    n = 20
    A = (rng.random((n, n)) < 0.3).astype(np.float32)
    bell = block_ell_from_adjacency(A, block_size=BS)
    spec = ModelSpec(
        num_of_vertices=n, len_input=12, num_for_predict=4, num_of_d=1,
        nb_block=2, in_channels=1, K=2, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    pd = init_params(jax.random.PRNGKey(7), spec)
    pt = init_params(jax.random.PRNGKey(7), spec, bell=bell)
    assert "mask_tiles" in pt["blocks"][0]["cheb"]
    assert pt["blocks"][0]["cheb"]["mask_tiles"].shape == (
        bell.num_active, 2, BS, BS
    )

    # same tree structure apart from the mask leaf; same shapes everywhere
    def shapes(p, drop):
        return jax.tree.map(
            lambda a: a.shape,
            {
                "blocks": [
                    {k: v for k, v in b.items() if k != "cheb"}
                    | {"thetas": b["cheb"]["thetas"]}
                    for b in p["blocks"]
                ],
                "final_conv": p["final_conv"], "final_fc": p["final_fc"],
            },
        )

    assert shapes(pd, "masks") == shapes(pt, "mask_tiles")
    # mask init distribution: dense xavier bound
    b = float(np.sqrt(6.0 / (n + n)))
    mt = np.asarray(pt["blocks"][0]["cheb"]["mask_tiles"])
    assert np.abs(mt).max() <= b and np.abs(mt).max() > 0.5 * b


def test_trainer_mask_tiles_end_to_end(tmp_path):
    from dstagnn_drought_tpu.config import (
        Config,
        DataConfig,
        TrainingConfig,
    )
    from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
    from dstagnn_drought_tpu.training.loop import Trainer

    rng = np.random.default_rng(5)
    N, F = 24, 1
    A = (rng.random((N, N)) < 0.2).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = ((rng.random((N, N)) < 0.5) & ((A + np.eye(N)) > 0)).astype(
        np.float32
    )
    np.fill_diagonal(pa, 1)
    n = 32
    x = rng.normal(size=(n, N, F, 12)).astype(np.float32)
    y = np.repeat(
        x[:, :, -1, :].mean(axis=2, keepdims=True), 6, axis=2
    ).astype(np.float32)
    sp = lambda s: Split(x[s], y[s])
    ds = ArrayDataset(
        train=sp(slice(0, 24)), val=sp(slice(24, 28)),
        test=sp(slice(28, 32)),
        mean=np.zeros((1, 1, F, 1)), std=np.ones((1, 1, F, 1)),
    )
    cfg = Config(
        data=DataConfig(num_of_vertices=N, len_input=12, num_for_predict=6,
                        dataset_name="TILES_TOY"),
        training=TrainingConfig(
            in_channels=F, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=2, learning_rate=3e-3,
            sparse=True, sparse_format="bell", block_size=BS,
            mask_format="tiles",
        ),
    ).validate()
    tr = Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                 experiments_root=str(tmp_path))
    assert "mask_tiles" in tr.params["blocks"][0]["cheb"]
    assert "bell_tiles" in tr.constants
    # nothing O(N²) on device: the dense constants are placeholders
    assert tr.constants["adj_pa"].shape == (1, 1)
    assert tr.constants["cheb_polys"].shape == (2, 1, 1)
    res = tr.run()
    assert np.isfinite(res["test_loss"])
    # checkpoint → resume restores tile params
    tr2 = Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                  experiments_root=str(tmp_path))
    assert tr2.resume()
    np.testing.assert_array_equal(
        np.asarray(tr2.params["blocks"][0]["cheb"]["mask_tiles"]).shape,
        np.asarray(tr.params["blocks"][0]["cheb"]["mask_tiles"]).shape,
    )


def test_mask_format_validation():
    from dstagnn_drought_tpu.config import (
        Config,
        DataConfig,
        TrainingConfig,
    )

    with pytest.raises(ValueError, match="mask_format"):
        Config(
            data=DataConfig(num_of_vertices=8, len_input=12),
            training=TrainingConfig(mask_format="tiles"),
        ).validate()
