"""North-star parity test: identical weights → allclose activations vs the
reference PyTorch model on CPU (SURVEY.md §4 "Parity").

The reference model is imported from the read-only mount and used only to
produce golden outputs; its weights are injected into our JAX model via
``import_torch_state_dict``.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dstagnn_drought_tpu.models.dstagnn import (
    ModelSpec,
    apply,
    import_torch_state_dict,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_model_and_inputs(reference_path):
    from model.DSTAGNN_my import make_model as ref_make_model

    rng = np.random.default_rng(7)
    N, T, T_pred, K, H = 16, 12, 5, 3, 2
    spec = ModelSpec(
        num_of_vertices=N, len_input=T, num_for_predict=T_pred, num_of_d=1,
        nb_block=2, in_channels=1, K=K, nb_chev_filter=8, nb_time_filter=8,
        d_model=24, d_k=8, n_heads=H,
    )
    A = (rng.random((N, N)) < 0.3).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.25).astype(np.float64)

    torch.manual_seed(0)
    net = ref_make_model(
        "cpu", 1, spec.nb_block, 1, K, spec.nb_chev_filter, spec.nb_time_filter,
        1, A, pa, A, T_pred, T, N, spec.d_model, spec.d_k, spec.d_v, H,
    )
    net.eval()
    x = rng.normal(size=(3, N, 1, T)).astype(np.float32)
    return net, spec, pa, x


def test_forward_parity(ref_model_and_inputs):
    net, spec, pa, x = ref_model_and_inputs
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()

    params = import_torch_state_dict(net.state_dict(), spec)
    # use the reference's exact Chebyshev constants to isolate model parity
    polys = jnp.stack([
        jnp.asarray(t.numpy()) for t in net.BlockList[0].cheb_conv_SAt.cheb_polynomials
    ])
    out = apply(
        params, jnp.asarray(x), spec=spec,
        adj_pa=jnp.asarray(pa, jnp.float32), cheb_polys=polys,
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=2e-4)


def test_training_trajectory_parity(ref_model_and_inputs):
    """Few-step loss-curve tracking vs the reference (SURVEY.md §4): same
    weights, same data, SmoothL1 + Adam on both sides → per-step losses
    agree. Dropout disabled on both sides (eval-mode reference / our
    deterministic flag) so the trajectories are comparable."""
    import optax

    from dstagnn_drought_tpu.ops.nn import smooth_l1_loss
    from dstagnn_drought_tpu.training.step import make_optimizer

    net, spec, pa, x = ref_model_and_inputs
    rng = np.random.default_rng(11)
    y = rng.normal(size=(x.shape[0], spec.num_of_vertices,
                         spec.num_for_predict)).astype(np.float32)
    lr = 1e-3
    steps = 5

    # ---- reference side (fresh copy of the weights) ----
    import copy

    ref_net = copy.deepcopy(net)
    ref_net.eval()  # dropout off; grads still flow
    criterion = torch.nn.SmoothL1Loss()
    opt = torch.optim.Adam(ref_net.parameters(), lr=lr)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    ref_losses = []
    for _ in range(steps):
        opt.zero_grad()
        loss = criterion(ref_net(xt), yt)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    # ---- our side, same initial weights ----
    params = import_torch_state_dict(net.state_dict(), spec)
    polys = jnp.stack([
        jnp.asarray(t.numpy())
        for t in net.BlockList[0].cheb_conv_SAt.cheb_polynomials
    ])
    consts = dict(adj_pa=jnp.asarray(pa, jnp.float32), cheb_polys=polys)
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(params)

    def loss_fn(p):
        pred = apply(p, jnp.asarray(x), spec=spec, deterministic=True,
                     **consts)
        return smooth_l1_loss(pred, jnp.asarray(y))

    our_losses = []
    for _ in range(steps):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-4)
    # trajectories must actually move (guard against vacuous agreement)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_parity_is_sensitive(ref_model_and_inputs):
    """Guard against vacuous parity: perturbing one weight must change output."""
    net, spec, pa, x = ref_model_and_inputs
    params = import_torch_state_dict(net.state_dict(), spec)
    polys = jnp.stack([
        jnp.asarray(t.numpy()) for t in net.BlockList[0].cheb_conv_SAt.cheb_polynomials
    ])
    kw = dict(spec=spec, adj_pa=jnp.asarray(pa, jnp.float32), cheb_polys=polys)
    base = np.asarray(apply(params, jnp.asarray(x), **kw))
    params["blocks"][0]["tat"]["wq"] = params["blocks"][0]["tat"]["wq"] + 0.05
    pert = np.asarray(apply(params, jnp.asarray(x), **kw))
    assert not np.allclose(base, pert, atol=2e-4)
