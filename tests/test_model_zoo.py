"""Heritage model families (SURVEY.md §2 C15: astgcn / mstgcn / stgcn —
pyc-only remnants in the reference, re-implemented from the papers):
registry resolution, forward shapes, jit + grad health, and a short training
run through the shared Trainer machinery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstagnn_drought_tpu.models import ModelSpec, get_family

FAMILIES = ["astgcn", "mstgcn", "stgcn", "transformer"]


def tiny_spec(N=10, T=12):
    return ModelSpec(
        num_of_vertices=N, len_input=T, num_for_predict=6, num_of_d=1,
        nb_block=2, in_channels=1, K=3, nb_chev_filter=8, nb_time_filter=8,
        d_model=16, d_k=8, n_heads=2,
    )


def ring_adj(N):
    A = np.zeros((N, N), np.float32)
    for i in range(N):
        A[i, (i + 1) % N] = A[(i + 1) % N, i] = 1
    return A


@pytest.fixture(scope="module")
def setup():
    spec = tiny_spec()
    A = ring_adj(spec.num_of_vertices)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, spec.num_of_vertices, 1, spec.len_input)),
                    jnp.float32)
    return spec, A, x


def test_registry_rejects_unknown():
    with pytest.raises(ValueError, match="unknown model family"):
        get_family("transformer9000")


def test_registry_resolves_dstagnn():
    fam = get_family("DSTAGNN")
    assert hasattr(fam, "make_model") and hasattr(fam, "apply")


@pytest.mark.parametrize("name", FAMILIES)
def test_forward_shape_and_jit(name, setup):
    spec, A, x = setup
    fam = get_family(name)
    params, consts = fam.make_model(jax.random.PRNGKey(0), spec, A, A)

    fn = jax.jit(
        lambda p, x: fam.apply(
            p, x, spec=spec, adj_pa=consts["adj_pa"],
            cheb_polys=consts["cheb_polys"], deterministic=True,
        )
    )
    out = fn(params, x)
    assert out.shape == (4, spec.num_of_vertices, spec.num_for_predict)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", FAMILIES)
def test_gradients_finite_and_nonzero(name, setup):
    spec, A, x = setup
    fam = get_family(name)
    params, consts = fam.make_model(jax.random.PRNGKey(1), spec, A, A)

    def loss(p):
        out = fam.apply(
            p, x, spec=spec, adj_pa=consts["adj_pa"],
            cheb_polys=consts["cheb_polys"], deterministic=True,
        )
        return jnp.mean(out**2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_mstgcn_is_astgcn_without_attention(setup):
    spec, A, _ = setup
    m = get_family("mstgcn")
    params, _ = m.make_model(jax.random.PRNGKey(0), spec, A, A)
    assert "tat" not in params["blocks"][0] and "sat" not in params["blocks"][0]


@pytest.mark.parametrize("name", ["astgcn", "stgcn", "transformer"])
def test_family_trains_through_epoch_runner(name, setup):
    """The shared scan epoch runner trains any family; loss decreases."""
    import optax

    from dstagnn_drought_tpu.training.step import make_epoch_runner, make_optimizer

    spec, A, _ = setup
    fam = get_family(name)
    params, consts = fam.make_model(jax.random.PRNGKey(2), spec, A, A)
    opt = make_optimizer(5e-3)
    opt_state = opt.init(params)
    runner = make_epoch_runner(spec, opt, apply_fn=fam.apply)

    rng = np.random.default_rng(3)
    n, N, T = 32, spec.num_of_vertices, spec.len_input
    base = rng.normal(size=(n, N, 1, T)).astype(np.float32)
    x_full = jnp.asarray(base)
    # learnable mapping: target = mean over time of the input, tiled
    y_full = jnp.asarray(
        np.repeat(base.mean(axis=(2, 3), keepdims=True)[:, :, 0],
                  spec.num_for_predict, axis=2)
    )
    idx_plan = jnp.asarray(np.arange(n, dtype=np.int32).reshape(4, 8))

    key = jax.random.PRNGKey(0)
    first = last = None
    for _ in range(6):
        params, opt_state, key, losses = runner(
            params, opt_state, key, x_full, y_full, idx_plan, consts
        )
        if first is None:
            first = float(jnp.mean(losses))
        last = float(jnp.mean(losses))
    assert np.isfinite(last)
    assert last < first, f"{name}: loss {first} → {last} did not decrease"
