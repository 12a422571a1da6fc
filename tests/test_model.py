"""Model construction / forward shape / jit tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.models.dstagnn import (
    ModelSpec,
    apply,
    init_params,
    make_model,
)

TINY = ModelSpec(
    num_of_vertices=16, len_input=12, num_for_predict=5, num_of_d=1,
    nb_block=2, in_channels=1, K=3, nb_chev_filter=8, nb_time_filter=8,
    d_model=24, d_k=8, n_heads=2,
)


def tiny_graphs(rng, n=16):
    A = (rng.random((n, n)) < 0.3).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((n, n)) < 0.2).astype(np.float32)
    return A, pa


def test_forward_shapes_and_jit(rng):
    A, pa = tiny_graphs(rng)
    params, consts = make_model(jax.random.PRNGKey(0), TINY, A, pa)
    x = jnp.asarray(rng.normal(size=(3, 16, 1, 12)), jnp.float32)

    fwd = jax.jit(
        lambda p, x: apply(p, x, spec=TINY, adj_pa=consts["adj_pa"],
                           cheb_polys=consts["cheb_polys"])
    )
    out = fwd(params, x)
    assert out.shape == (3, 16, 5)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # deterministic under jit
    np.testing.assert_array_equal(np.asarray(fwd(params, x)), np.asarray(out))


def test_forward_multichannel_fixed_residual(rng):
    """in_channels != nb_time_filter runs here (the reference crashes on this
    configuration — model/DSTAGNN_my.py:247-252, GAMBIA config)."""
    spec = ModelSpec(
        num_of_vertices=10, len_input=12, num_for_predict=4, num_of_d=4,
        nb_block=2, in_channels=4, K=2, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )
    A, pa = tiny_graphs(rng, 10)
    params, consts = make_model(jax.random.PRNGKey(1), spec, A, pa)
    x = jnp.asarray(rng.normal(size=(2, 10, 4, 12)), jnp.float32)
    out = apply(params, x, spec=spec, adj_pa=consts["adj_pa"],
                cheb_polys=consts["cheb_polys"])
    assert out.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dropout_train_vs_eval(rng):
    A, pa = tiny_graphs(rng)
    params, consts = make_model(jax.random.PRNGKey(2), TINY, A, pa)
    x = jnp.asarray(rng.normal(size=(2, 16, 1, 12)), jnp.float32)
    kw = dict(spec=TINY, adj_pa=consts["adj_pa"], cheb_polys=consts["cheb_polys"])
    out_eval = apply(params, x, deterministic=True, **kw)
    out_train = apply(params, x, deterministic=False,
                      rng=jax.random.PRNGKey(3), **kw)
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))
    # same rng → identical train-mode output
    out_train2 = apply(params, x, deterministic=False,
                       rng=jax.random.PRNGKey(3), **kw)
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(out_train2))


def test_bfloat16_compute(rng):
    A, pa = tiny_graphs(rng)
    params, consts = make_model(jax.random.PRNGKey(4), TINY, A, pa)
    x = jnp.asarray(rng.normal(size=(2, 16, 1, 12)), jnp.float32)
    out32 = apply(params, x, spec=TINY, adj_pa=consts["adj_pa"],
                  cheb_polys=consts["cheb_polys"])
    outbf = apply(params, x, spec=TINY, adj_pa=consts["adj_pa"],
                  cheb_polys=consts["cheb_polys"], compute_dtype=jnp.bfloat16)
    assert outbf.dtype == jnp.float32  # cast back for loss/metrics
    # bf16 forward should track fp32 loosely
    err = np.abs(np.asarray(out32) - np.asarray(outbf)).mean()
    scale = np.abs(np.asarray(out32)).mean() + 1e-6
    assert err / scale < 0.2


def test_init_matches_reference_scheme():
    params = init_params(jax.random.PRNGKey(0), TINY)
    for leaf in jax.tree_util.tree_leaves(params):
        a = np.asarray(leaf)
        if a.ndim <= 1:
            # reference init loop: U(0,1) for vectors/scalars
            assert a.min() >= 0.0 and a.max() <= 1.0
        else:
            assert np.abs(a).max() <= 1.0  # xavier bound << 1 here


def test_grad_flows(rng):
    A, pa = tiny_graphs(rng)
    params, consts = make_model(jax.random.PRNGKey(5), TINY, A, pa)
    x = jnp.asarray(rng.normal(size=(2, 16, 1, 12)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(2, 16, 5)), jnp.float32)

    def loss(p):
        out = apply(p, x, spec=TINY, adj_pa=consts["adj_pa"],
                    cheb_polys=consts["cheb_polys"])
        return jnp.mean((out - y) ** 2)

    grads = jax.grad(loss)(params)
    flat = {
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path): g
        for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]
    }
    for name, g in flat.items():
        assert np.isfinite(np.asarray(g)).all(), name
        # Structurally-unused params (they exist in the reference too and get
        # no grad there either): embed_t and residual_conv in blocks >= 1,
        # where F == nb_time_filter takes the identity-residual/no-embedding
        # paths (model/DSTAGNN_my.py:229-230,251).
        unused = not name.startswith("blocks/0") and (
            "embed_t" in name or "residual_conv" in name
        )
        gsum = float(jnp.abs(g).sum())
        if unused:
            assert gsum == 0, f"{name} expected structurally unused"
        else:
            assert gsum > 0, f"{name} got zero gradient"


def test_gtu_im2col_matches_conv():
    """The long-T im2col GTU formulation is numerically identical to the
    conv_general one (same weights, strides, gating)."""
    import importlib

    G = importlib.import_module("dstagnn_drought_tpu.ops.gtu")

    rng = np.random.default_rng(0)
    for k, s, T in ((3, 1, 60), (5, 1, 50), (7, 2, 49)):
        B, C, N = 2, 6, 9
        x = jnp.asarray(rng.normal(size=(B, C, N, T)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(2 * C, C, 1, k)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.normal(size=(2 * C,)) * 0.1, jnp.float32)
        ref = G.conv2d_nchw(x, w, b, stride=(1, s))
        got = G._conv_im2col(x, w, b, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # the public gtu() picks im2col above the threshold
        out = G.gtu(x, w, b, in_channels=C, time_strides=s)
        refg = jnp.tanh(ref[:, :C]) * jax.nn.sigmoid(ref[:, C:])
        np.testing.assert_allclose(np.asarray(out), np.asarray(refg),
                                   rtol=2e-5, atol=2e-5)
