"""c-major (C blocks of T) feature layout for the tile-resident BELL path
(round 5): forward/grad parity against the t-major layout, which is itself
pinned against the dense-mask path (test_bell_tiles.py).

The c-major layout exists to remove kernel-boundary transposes: x enters as
a plain reshape of (B, N, C, T) (channels zero-padded for lane alignment,
with zero Θ rows) and the output reshapes straight to (B, N, Co, T).
Numerics must be IDENTICAL up to matmul association order.
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


def _setup(seed=0, n=29, K=2, C=4, T=8, B=2, d_model=12, d_k=4, Co=16,
           density=0.25):
    rng = np.random.default_rng(seed)
    A = (rng.random((n, n)) < density).astype(np.float32)
    np.fill_diagonal(A, 0)
    bell = block_ell_from_adjacency(A, block_size=BS)
    pa = ((rng.random((n, n)) < 0.5) & (A > 0)).astype(np.float32)
    np.fill_diagonal(pa, 1)
    cheb = rng.normal(size=(K, n, n)).astype(np.float32)
    masks = rng.normal(size=(K, n, n)).astype(np.float32)
    thetas = rng.normal(size=(K, C, Co)).astype(np.float32) * 0.3
    wq = rng.normal(size=(d_model, K * d_k)).astype(np.float32) * 0.3
    wk = rng.normal(size=(d_model, K * d_k)).astype(np.float32) * 0.3
    x = rng.normal(size=(B, n, C, T)).astype(np.float32)
    emb = rng.normal(size=(B, n, d_model)).astype(np.float32)
    return bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k


def _run(layout, setup):
    bell, pa, cheb, masks, thetas, wq, wk, x, emb, K, d_k = setup
    from dstagnn_drought_tpu.ops.pallas.bell_fused import bell_cheb_conv_tiles

    tiles = build_bell_tile_constants(bell, pa, cheb)
    mask_tiles = jnp.asarray(active_tile_values(masks, bell))

    def f(mask_tiles, x, emb, thetas, wq, wk):
        out = bell_cheb_conv_tiles(
            x, emb, bell, wq=wq, wk=wk, mask_tiles=mask_tiles,
            pattern_tiles=tiles["pattern_tiles"],
            pa_tiles=tiles["pa_tiles"], cheb_tiles=tiles["cheb_tiles"],
            thetas=thetas, n_heads=K, d_k=d_k, layout=layout,
        )
        return (out * jnp.cos(out)).sum(), out

    (loss, out), grads = jax.value_and_grad(
        f, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(mask_tiles, jnp.asarray(x), jnp.asarray(emb), jnp.asarray(thetas),
      jnp.asarray(wq), jnp.asarray(wk))
    return loss, out, grads


def _assert_match(setup):
    lt, out_t, gt = _run("t", setup)
    lc, out_c, gc = _run("c", setup)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_t),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(lc), float(lt), rtol=2e-5)
    for a, b, name in zip(gc, gt, ["mask", "x", "emb", "thetas", "wq", "wk"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_c_layout_matches_t_single_chunk():
    """Sparse graph (≤4 slots/tile → single-chunk kernel), C=4 pads to 16."""
    _assert_match(_setup())


def test_c_layout_matches_t_chunked():
    """Dense-ish graph on 80 nodes: tiles need >4 slots → the chunked
    online-softmax kernel, still c-major."""
    _assert_match(_setup(seed=2, n=80, density=0.6, B=1))


def test_c_layout_multi_m_tile(monkeypatch):
    """Force NM > 1 (channel M-tiles) so the cross-M-tile Θ-mix
    accumulation and the K1/K2 full-cotangent reads are exercised."""
    import dstagnn_drought_tpu.ops.pallas.bell_fused as bf

    orig = bf._pick_tm_c

    def tiny(M, T_len, need, budget):
        tm = orig(M, T_len, need, budget)
        if tm is not None and M > 128 and M % 128 == 0:
            return 128  # smallest aligned tile → NM = M // 128 ≥ 2
        return tm

    monkeypatch.setattr(bf, "_pick_tm_c", tiny)
    # C=32, T=8 → M=256 → NM=2; distinct seed/shape so the jit cache from
    # other tests (traced with the real picker) cannot alias this trace
    _assert_match(_setup(seed=7, n=31, C=32, Co=16, T=8, d_model=16))


def test_c_layout_requires_alignment():
    """Explicit layout='c' with a misaligned output raises (wrapper pads
    input channels but output alignment must hold: 128 | Co·T)."""
    setup = _setup(seed=3, Co=3)  # Co·T = 24
    with pytest.raises(ValueError, match="c-major|128"):
        _run("c", setup)


def test_auto_picks_c_only_when_aligned():
    """layout='auto' must silently keep t-major when Co·T is unaligned
    (same numbers as layout='t')."""
    setup = _setup(seed=4, Co=3)
    lt, out_t, _ = _run("t", setup)
    la, out_a, _ = _run("auto", setup)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_t),
                               rtol=0, atol=0)
