"""Partitioned tile-resident BELL (targeted block halo + per-shard fused
backward): numerical parity with the single-device tile path, routing-table
sanity, halo-volume accounting, and trainer integration on a virtual mesh.
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

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

BS = 8


def _setup(seed=0, n=29, K=2, C=4, T=8, B=4, d_model=12, d_k=4):
    rng = np.random.default_rng(seed)
    A = (rng.random((n, n)) < 0.25).astype(np.float32)
    np.fill_diagonal(A, 0)
    bell = block_ell_from_adjacency(A, block_size=BS)
    pa = ((rng.random((n, n)) < 0.5) & (A > 0)).astype(np.float32)
    np.fill_diagonal(pa, 1)
    cheb = rng.normal(size=(K, n, n)).astype(np.float32)
    masks = rng.normal(size=(K, n, n)).astype(np.float32)
    thetas = rng.normal(size=(K, C, 3)).astype(np.float32) * 0.3
    wq = rng.normal(size=(d_model, K * d_k)).astype(np.float32) * 0.3
    wk = rng.normal(size=(d_model, K * d_k)).astype(np.float32) * 0.3
    x = rng.normal(size=(B, n, C, T)).astype(np.float32)
    emb = rng.normal(size=(B, n, d_model)).astype(np.float32)
    return A, bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k


def test_plan_routing_and_stats():
    from dstagnn_drought_tpu.parallel.bell_partition import (
        build_bell_tile_shard_plan,
    )

    (A, bell, pa, cheb, *_r) = _setup()
    plan = build_bell_tile_shard_plan(bell, 4, pa, cheb)
    assert plan.num_shards == 4 and plan.block_size == BS
    # every referenced compact id maps back to the right global block via
    # the routing tables
    NJ_loc = plan.tiles_per_shard
    for r in range(4):
        for i in range(plan.ns_true[r]):
            flat = plan.recv_map[r, i]
            o, h = flat // plan.h_max, flat % plan.h_max
            g = o * NJ_loc + plan.send_idx[o, r, h]
            # compact id i on shard r must be block g: check via a_src —
            # find an active entry with compact id i and verify its tile
            # pattern equals the global pattern of (g, its target)
        # compact ids are 0..ns_true-1 exactly
        used = plan.a_src[r][: plan.a_true[r]]
        assert used.max() < plan.ns_true[r]
    stats = plan.halo_stats()
    assert stats["referenced_blocks"] <= stats["all_gather_blocks"]
    assert stats["volume_vs_all_gather"] <= 1.0
    # pack_active inverts the per-shard segmenting
    vals = np.arange(bell.num_active, dtype=np.float32)
    packed = plan.pack_active(vals, fill=-1)
    got = []
    for r in range(4):
        seg = packed[r][: plan.a_true[r]]
        got.extend(seg[seg >= 0])
    np.testing.assert_array_equal(np.sort(np.asarray(got)), vals)


@pytest.mark.parametrize("fused_bwd", [True, False])
def test_partitioned_tiles_matches_single_device(fused_bwd):
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        bell_cheb_conv_tiles,
    )
    from dstagnn_drought_tpu.parallel.bell_partition import (
        build_bell_tile_shard_plan,
        partitioned_bell_tiles_conv,
    )
    from dstagnn_drought_tpu.parallel.mesh import make_mesh

    (A, bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k) = _setup()
    mesh = make_mesh(2, 4)
    plan = build_bell_tile_shard_plan(bell, 4, pa, cheb)
    tiles = build_bell_tile_constants(bell, pa, cheb)
    mask_tiles = jnp.asarray(active_tile_values(masks, bell))
    mask_part = jnp.asarray(plan.pack_active(np.asarray(mask_tiles)))

    def single(mask_tiles, x, emb, thetas, wq, wk):
        out = bell_cheb_conv_tiles(
            x, emb, bell, wq=wq, wk=wk, mask_tiles=mask_tiles,
            pattern_tiles=tiles["pattern_tiles"],
            pa_tiles=tiles["pa_tiles"], cheb_tiles=tiles["cheb_tiles"],
            thetas=thetas, n_heads=K, d_k=d_k,
        )
        return (out * jnp.cos(out)).sum(), out

    def part(mask_part, x, emb, thetas, wq, wk):
        out = partitioned_bell_tiles_conv(
            mesh, emb, x, plan, mask_tiles=mask_part, thetas=thetas,
            wq=wq, wk=wk, n_heads=K, d_k=d_k, fused_bwd=fused_bwd,
        )
        return (out * jnp.cos(out)).sum(), out

    args = (jnp.asarray(x), jnp.asarray(emb), jnp.asarray(thetas),
            jnp.asarray(wq), jnp.asarray(wk))
    (ls, out_s), gs = jax.value_and_grad(
        single, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(mask_tiles, *args)
    (lp, out_p), gp = jax.value_and_grad(
        part, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(mask_part, *args)

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    for a, b, name in [
        (gp[1], gs[1], "x"), (gp[2], gs[2], "emb"), (gp[3], gs[3], "thetas"),
        (gp[4], gs[4], "wq"), (gp[5], gs[5], "wk"),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name
        )
    # mask grads: partitioned layout = packed single-device layout
    np.testing.assert_allclose(
        np.asarray(gp[0]),
        plan.pack_active(np.asarray(gs[0])),
        rtol=3e-4, atol=3e-5,
    )


def test_trainer_partitioned_tiles(tmp_path):
    from dstagnn_drought_tpu.config import (
        Config,
        DataConfig,
        TrainingConfig,
    )
    from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
    from dstagnn_drought_tpu.training.loop import Trainer

    rng = np.random.default_rng(5)
    N, F = 32, 1
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
                        dataset_name="PTILES_TOY"),
        training=TrainingConfig(
            in_channels=F, nb_block=2, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=8, nb_time_filter=8, batch_size=8,
            epochs=2, learning_rate=3e-3,
            sparse=True, sparse_format="bell", block_size=BS,
            mask_format="tiles", data_axis=2, graph_axis=4,
        ),
    ).validate()
    tr = Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=pa,
                 experiments_root=str(tmp_path))
    mt = tr.params["blocks"][0]["cheb"]["mask_tiles"]
    assert mt.ndim == 5 and mt.shape[0] == 4
    assert not mt.sharding.is_fully_replicated  # sharded over 'graph'
    res = tr.run()
    assert np.isfinite(res["test_loss"])


def test_check_vma_suppression_is_still_required():
    """Pins check_vma=False on the partitioned shard_maps (VERDICT r4 #8 /
    ADVICE): the pallas_call inside the shard_map produces an out_shape
    with no varying-mesh-axes annotation, so jax's vma check REJECTS the
    otherwise-correct program. This test builds the same shard_map with
    check_vma=True and asserts it still fails to run — when a jax upgrade
    makes this pass, this test fails, signalling that the suppression in
    make_partitioned_bell_tiles_conv / make_partitioned_bell_conv can be
    dropped."""
    from dstagnn_drought_tpu.parallel.bell_partition import (
        build_bell_tile_shard_plan,
        make_partitioned_bell_tiles_conv,
        partitioned_bell_tiles_conv,
    )
    from dstagnn_drought_tpu.parallel.mesh import make_mesh

    (A, bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k) = _setup(11)
    mesh = make_mesh(2, 4)
    plan = build_bell_tile_shard_plan(bell, 4, pa, cheb)
    mask_tiles = jnp.asarray(
        plan.pack_active(active_tile_values(masks, bell))
    )

    import dstagnn_drought_tpu.parallel.bell_partition as bp

    orig = bp.make_partitioned_bell_tiles_conv

    def strict(*a, **kw):
        kw["check_vma"] = True
        return orig(*a, **kw)

    bp.make_partitioned_bell_tiles_conv = strict
    try:
        with pytest.raises(Exception):
            out = partitioned_bell_tiles_conv(
                mesh, jnp.asarray(emb), jnp.asarray(x), plan,
                mask_tiles=mask_tiles, thetas=jnp.asarray(thetas),
                wq=jnp.asarray(wq), wk=jnp.asarray(wk),
                n_heads=K, d_k=d_k,
            )
            jax.block_until_ready(out)
    finally:
        bp.make_partitioned_bell_tiles_conv = orig


@pytest.mark.parametrize("fused_bwd", [True, False])
def test_overlap_partitioned_matches_single_device(fused_bwd):
    """Halo/compute-OVERLAP variant (local-source tiles run without any
    data dependence on the all_to_all): same numbers as the single-device
    tile path, forward and every gradient."""
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        bell_cheb_conv_tiles,
    )
    from dstagnn_drought_tpu.parallel.bell_partition import (
        build_bell_tile_shard_plan,
        build_overlap_lists,
        partitioned_bell_tiles_conv_overlap,
    )
    from dstagnn_drought_tpu.parallel.mesh import make_mesh

    (A, bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k) = _setup(4)
    mesh = make_mesh(2, 4)
    plan = build_bell_tile_shard_plan(bell, 4, pa, cheb)
    ov = build_overlap_lists(plan)
    # the split must cover every tile exactly once
    NJ_loc = plan.tiles_per_shard
    for r in range(4):
        seen = sorted(
            list(ov.tilesA[r][: ov.n_localA[r]])
            + list(ov.tilesB[r][: NJ_loc - ov.n_localA[r]])
        )
        assert seen == list(range(NJ_loc))
    tiles = build_bell_tile_constants(bell, pa, cheb)
    mask_tiles = jnp.asarray(active_tile_values(masks, bell))
    mask_part = jnp.asarray(plan.pack_active(np.asarray(mask_tiles)))

    def single(mask_tiles, x, emb, thetas, wq, wk):
        out = bell_cheb_conv_tiles(
            x, emb, bell, wq=wq, wk=wk, mask_tiles=mask_tiles,
            pattern_tiles=tiles["pattern_tiles"],
            pa_tiles=tiles["pa_tiles"], cheb_tiles=tiles["cheb_tiles"],
            thetas=thetas, n_heads=K, d_k=d_k, layout="t",
        )
        return (out * jnp.cos(out)).sum(), out

    def parted(mask_part, x, emb, thetas, wq, wk):
        out = partitioned_bell_tiles_conv_overlap(
            mesh, emb, x, plan, ov, mask_tiles=mask_part, thetas=thetas,
            wq=wq, wk=wk, n_heads=K, d_k=d_k, fused_bwd=fused_bwd,
        )
        return (out * jnp.cos(out)).sum(), out

    args = (jnp.asarray(x), jnp.asarray(emb), jnp.asarray(thetas),
            jnp.asarray(wq), jnp.asarray(wk))
    (ls, out_s), gs = jax.value_and_grad(
        single, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(mask_tiles, *args)
    (lp, out_p), gp = jax.value_and_grad(
        parted, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(mask_part, *args)

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(lp), float(ls), rtol=2e-5)
    for a, b, name in zip(gp[1:], gs[1:], ["x", "emb", "thetas", "wq", "wk"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name
        )
    # mask grads: per-shard layout vs single-device active list
    gm_single_part = plan.pack_active(np.asarray(gs[0]))
    np.testing.assert_allclose(
        np.asarray(gp[0]), gm_single_part, rtol=3e-4, atol=3e-5
    )


@pytest.mark.parametrize("overlap", [False, True])
def test_partitioned_c_layout_matches_single_device(overlap):
    """Partitioned tile path with the c-major kernels (layout auto-picked
    when 128 | Co·T): parity with the single-device c path, both wrappers."""
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        bell_cheb_conv_tiles,
    )
    from dstagnn_drought_tpu.parallel.bell_partition import (
        _tiles_use_c_layout,
        build_bell_tile_shard_plan,
        build_overlap_lists,
        partitioned_bell_tiles_conv,
        partitioned_bell_tiles_conv_overlap,
    )
    from dstagnn_drought_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    n, K, C, T, B, d_model, d_k, Co = 29, 2, 4, 8, 4, 12, 4, 16
    A = (rng.random((n, n)) < 0.25).astype(np.float32)
    np.fill_diagonal(A, 0)
    bell = block_ell_from_adjacency(A, block_size=BS)
    pa = ((rng.random((n, n)) < 0.5) & (A > 0)).astype(np.float32)
    np.fill_diagonal(pa, 1)
    cheb = rng.normal(size=(K, n, n)).astype(np.float32)
    masks = rng.normal(size=(K, n, n)).astype(np.float32)
    thetas = jnp.asarray(rng.normal(size=(K, C, Co)).astype(np.float32) * 0.3)
    wq = jnp.asarray(rng.normal(size=(d_model, K * d_k)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(d_model, K * d_k)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, n, C, T)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(B, n, d_model)).astype(np.float32))

    mesh = make_mesh(2, 4)
    plan = build_bell_tile_shard_plan(bell, 4, pa, cheb)
    assert _tiles_use_c_layout("auto", x, thetas, plan, K, d_k, True)
    tiles = build_bell_tile_constants(bell, pa, cheb)
    mask_tiles = jnp.asarray(active_tile_values(masks, bell))
    mask_part = jnp.asarray(plan.pack_active(np.asarray(mask_tiles)))

    def single(mask_tiles, x):
        out = bell_cheb_conv_tiles(
            x, emb, bell, wq=wq, wk=wk, mask_tiles=mask_tiles,
            pattern_tiles=tiles["pattern_tiles"],
            pa_tiles=tiles["pa_tiles"], cheb_tiles=tiles["cheb_tiles"],
            thetas=thetas, n_heads=K, d_k=d_k, layout="c",
        )
        return (out * jnp.cos(out)).sum(), out

    if overlap:
        ov = build_overlap_lists(plan)

        def parted(mask_part, x):
            out = partitioned_bell_tiles_conv_overlap(
                mesh, emb, x, plan, ov, mask_tiles=mask_part,
                thetas=thetas, wq=wq, wk=wk, n_heads=K, d_k=d_k,
            )
            return (out * jnp.cos(out)).sum(), out
    else:
        def parted(mask_part, x):
            out = partitioned_bell_tiles_conv(
                mesh, emb, x, plan, mask_tiles=mask_part, thetas=thetas,
                wq=wq, wk=wk, n_heads=K, d_k=d_k,
            )
            return (out * jnp.cos(out)).sum(), out

    (ls, out_s), gs = jax.value_and_grad(single, argnums=(0, 1),
                                         has_aux=True)(mask_tiles, x)
    (lp, out_p), gp = jax.value_and_grad(parted, argnums=(0, 1),
                                         has_aux=True)(mask_part, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                               rtol=3e-4, atol=3e-5)
    gm_single_part = plan.pack_active(np.asarray(gs[0]))
    np.testing.assert_allclose(np.asarray(gp[0]), gm_single_part,
                               rtol=3e-4, atol=3e-5)
