"""Parity of the fused GTU→concat→fcmy Pallas kernel (interpret mode on
CPU) against the XLA composition it replaces (ops/gtu.py + einsum).

Reference semantics: model/DSTAGNN_my.py:184-197 (GTU) and :255-264
(concat + fcmy linear).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.ops.gtu import gtu
from dstagnn_drought_tpu.ops.pallas.gtu_fused import gtu_fcmy, supported


def _xla_ref(x_bnct, w3, b3, w5, b5, w7, b7, wfc, bfc, C):
    """The model's existing path, in (B, C, N, T) space."""
    X = x_bnct.transpose(0, 2, 1, 3)
    g = [gtu(X, w, b, in_channels=C, time_strides=1)
         for w, b in ((w3, b3), (w5, b5), (w7, b7))]
    tc = jnp.concatenate(g, axis=-1)
    tc = jnp.einsum("bcnm,mt->bcnt", tc, wfc) + bfc
    return tc.transpose(0, 2, 1, 3)


def _make(seed, B=2, N=10, C=16, T=48, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    a = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, dtype)
    x = a(B, N, C, T)
    ws = {k: (a(2 * C, C, 1, k), a(2 * C)) for k in (3, 5, 7)}
    M3 = 3 * T - 12
    wfc, bfc = a(M3, T), a(T)
    return x, ws, wfc, bfc


def test_supported_gate():
    assert supported(32, 144, 1)
    assert not supported(32, 144, 2)   # strides
    assert not supported(32, 12, 1)    # short T keeps the conv path
    assert not supported(5, 144, 1)    # C tile alignment
    assert not supported(32, 50, 1)    # T tile alignment


@pytest.mark.parametrize("shape", [(2, 10, 16, 48), (1, 3, 32, 64)])
def test_forward_parity(shape):
    B, N, C, T = shape
    x, ws, wfc, bfc = _make(0, B, N, C, T)
    (w3, b3), (w5, b5), (w7, b7) = ws[3], ws[5], ws[7]
    ref = _xla_ref(x, w3, b3, w5, b5, w7, b7, wfc, bfc, C)
    out = gtu_fcmy(True, x, w3, b3, w5, b5, w7, b7, wfc, bfc)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-4)


def test_grad_parity():
    B, N, C, T = 2, 7, 16, 48
    x, ws, wfc, bfc = _make(1, B, N, C, T)
    (w3, b3), (w5, b5), (w7, b7) = ws[3], ws[5], ws[7]
    args = (x, w3, b3, w5, b5, w7, b7, wfc, bfc)
    names = ("x", "w3", "b3", "w5", "b5", "w7", "b7", "wfc", "bfc")

    # non-trivial cotangent: weighted sum-of-squares
    rng = np.random.default_rng(2)
    wgt = jnp.asarray(rng.normal(size=(B, N, C, T)), jnp.float32)

    def loss(f):
        return lambda *a: jnp.sum(wgt * f(*a) ** 2)

    ref_fn = lambda *a: _xla_ref(*a, C)
    pal_fn = lambda *a: gtu_fcmy(True, *a)
    g_ref = jax.grad(loss(ref_fn), argnums=tuple(range(9)))(*args)
    g_pal = jax.grad(loss(pal_fn), argnums=tuple(range(9)))(*args)
    for gr, gp, nm in zip(g_ref, g_pal, names):
        gr, gp = np.asarray(gr), np.asarray(gp)
        assert gr.shape == gp.shape, nm
        scale = max(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(gp / scale, gr / scale, rtol=0,
                                   atol=3e-5, err_msg=nm)


def test_bf16_forward_close_to_f32():
    B, N, C, T = 2, 5, 16, 48
    x, ws, wfc, bfc = _make(3, B, N, C, T)
    (w3, b3), (w5, b5), (w7, b7) = ws[3], ws[5], ws[7]
    f32 = gtu_fcmy(True, x, w3, b3, w5, b5, w7, b7, wfc, bfc)
    cast = lambda a: a.astype(jnp.bfloat16)
    b16 = gtu_fcmy(True, *map(cast, (x, w3, b3, w5, b5, w7, b7, wfc, bfc)))
    assert b16.dtype == jnp.bfloat16
    rel = np.abs(np.asarray(b16, np.float32) - np.asarray(f32)).max()
    assert rel / max(np.abs(np.asarray(f32)).max(), 1e-6) < 0.05


def test_model_apply_parity():
    """Full DSTAGNN forward with fuse_gtu matches the standard path
    (T=48 so the XLA path is the im2col formulation)."""
    from dstagnn_drought_tpu.models.dstagnn import (
        ModelSpec,
        apply,
        make_model,
    )

    rng = np.random.default_rng(7)
    N, T = 12, 48
    spec = ModelSpec(
        num_of_vertices=N, len_input=T, num_for_predict=4, num_of_d=2,
        nb_block=2, in_channels=2, K=2, nb_chev_filter=16,
        nb_time_filter=16, d_model=16, d_k=8, n_heads=2,
    )
    A = (rng.random((N, N)) < 0.4).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.3).astype(np.float32)
    np.fill_diagonal(pa, 1)
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    x = jnp.asarray(rng.normal(size=(3, N, 2, T)), jnp.float32)
    kw = dict(spec=spec, adj_pa=consts["adj_pa"],
              cheb_polys=consts["cheb_polys"], deterministic=True)
    ref = apply(params, x, **kw)
    fused = apply(params, x, fuse_gtu=True, **kw)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=0, atol=5e-4)

    # gradients through the full model agree too
    def loss(fn_kw):
        return lambda p: jnp.sum(apply(p, x, **fn_kw, **kw) ** 2)

    g_ref = jax.grad(loss({}))(params)
    g_fus = jax.grad(loss({"fuse_gtu": True}))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = jax.tree.leaves(g_fus)
    for (path, gr), gp in zip(flat_r, flat_f):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = max(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(
            gp / scale, gr / scale, rtol=0, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_unsupported_shapes_fall_back(monkeypatch):
    """fuse_gtu=True on shapes the kernel can't take (stride>1, unaligned
    C/T) must produce the UNFUSED path's numbers, not wrong results or a
    Pallas tile error (ADVICE r4: supported() was never consulted)."""
    from dstagnn_drought_tpu.models.dstagnn import (
        ModelSpec,
        apply,
        make_model,
    )
    import dstagnn_drought_tpu.ops.pallas.gtu_fused as gf

    def _boom(*a, **k):  # the fused kernel must never be entered
        raise AssertionError("gtu_fcmy called on unsupported shapes")

    monkeypatch.setattr(gf, "gtu_fcmy", _boom)

    rng = np.random.default_rng(11)
    N, T = 12, 24  # T=24 < 48 → unsupported
    spec = ModelSpec(
        num_of_vertices=N, len_input=T, num_for_predict=4, num_of_d=2,
        nb_block=2, in_channels=2, K=2, nb_chev_filter=16,
        nb_time_filter=16, d_model=16, d_k=8, n_heads=2,
    )
    A = (rng.random((N, N)) < 0.4).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.3).astype(np.float32)
    np.fill_diagonal(pa, 1)
    params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
    x = jnp.asarray(rng.normal(size=(2, N, 2, T)), jnp.float32)
    kw = dict(spec=spec, adj_pa=consts["adj_pa"],
              cheb_polys=consts["cheb_polys"], deterministic=True)
    ref = apply(params, x, **kw)
    fused = apply(params, x, fuse_gtu=True, **kw)  # silently falls back
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=0, atol=0)


def test_trainer_rejects_unsupported_fuse_gtu(tmp_path):
    """Trainer raises a clear ValueError when fuse_gtu=true is configured
    on shapes the fused kernel can't take (ADVICE r4)."""
    from dstagnn_drought_tpu.config import (
        Config,
        DataConfig,
        TrainingConfig,
    )
    from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
    from dstagnn_drought_tpu.training.loop import Trainer

    rng = np.random.default_rng(3)
    N, T = 8, 12  # T=12 unsupported (needs T >= 48)
    cfg = Config(
        data=DataConfig(num_of_vertices=N, len_input=T, num_for_predict=4,
                        dataset_name="TOY", points_per_hour=1),
        training=TrainingConfig(
            in_channels=1, nb_block=1, n_heads=2, K=2, d_k=8, d_model=16,
            nb_chev_filter=16, nb_time_filter=16, batch_size=2, epochs=1,
            learning_rate=1e-3, num_of_hours=T, fuse_gtu=True,
        ),
    ).validate()
    x = rng.normal(size=(4, N, 1, T)).astype(np.float32)
    y = rng.normal(size=(4, N, 4)).astype(np.float32)
    ds = ArrayDataset(train=Split(x, y), val=Split(x, y), test=Split(x, y),
                      mean=np.zeros((1, 1, 1, 1), np.float32),
                      std=np.ones((1, 1, 1, 1), np.float32))
    A = np.eye(N, dtype=np.float32)
    A[0, 1] = A[1, 0] = 1
    with pytest.raises(ValueError, match="fuse_gtu"):
        Trainer(cfg, dataset=ds, adj_merge=A, adj_pa=np.eye(N, dtype=np.float32),
                experiments_root=str(tmp_path))
