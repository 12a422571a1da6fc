"""Sparse-path microbench: dense vs ELL vs BELL for one model block
(spatial attention + modulated Chebyshev aggregation) at real graph scales.

Run on the TPU (default env) or CPU (JAX_PLATFORMS=cpu). Prints one JSON
line per (shape, path). The BELL numbers depend on graph locality: pass
--radius to control the banded-graph neighbourhood (STAG graphs built from
spatial data are local; ``rcm_permutation`` makes them banded).

Usage: python benchmarks/sparse_bench.py [--shapes gambia,pems07] [--radius 12]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # name: (N, B, d_model, K, d_k, C, T)
    "gambia": (2139, 4, 512, 3, 32, 32, 144),
    # the exact reference GAMBIA config (configurations/GAMBIA_dstagnn.conf:
    # d_model=64, K=2, d_k=32) — "gambia" above is the heavier d_model-512
    # variant kept for cross-round comparability
    "gambia_conf": (2139, 4, 64, 2, 32, 32, 144),
    "pems07": (883, 12, 512, 3, 32, 32, 12),
    "toy": (256, 4, 64, 3, 16, 8, 12),
}


def banded_graph(N, radius, density=0.6, seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((N, N), np.float32)
    for j in range(N):
        lo, hi = max(0, j - radius), min(N, j + radius + 1)
        nbrs = rng.random(hi - lo) < density
        A[lo:hi, j] = nbrs
    return A


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="toy")
    ap.add_argument("--radius", type=int, default=12)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--paths", default="dense,ell,bell,bell_pallas",
                    help="comma list of paths to run")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 activations (mixed-precision path)")
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd (grads w.r.t. activations AND "
                         "weights — the training cost) instead of fwd only")
    ap.add_argument("--check-tiles", action="store_true",
                    help="numerical parity of the TILE-RESIDENT path "
                         "(active-list masks + active-list fused backward) "
                         "against the XLA BELL path with dense masks "
                         "gathered to the same support")
    ap.add_argument("--check", action="store_true",
                    help="numerical parity on the CURRENT backend: compare "
                         "bell_pallas against the XLA BELL path (fwd + "
                         "grads) instead of timing — validates the Mosaic-"
                         "compiled kernels, incl. chunked slots, on real "
                         "hardware at real shapes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from dstagnn_drought_tpu.ops.attention import spatial_attention_scores
    from dstagnn_drought_tpu.ops.block_sparse import (
        block_ell_from_adjacency,
        block_sparse_cheb_conv_with_sat,
        block_sparse_spatial_attention_scores,
        gather_block_values,
    )
    from dstagnn_drought_tpu.ops.cheb import cheb_conv_with_sat
    from dstagnn_drought_tpu.ops.sparse import (
        ell_from_adjacency,
        gather_edge_values,
        sparse_cheb_conv_with_sat,
        sparse_spatial_attention_scores,
    )

    for name in args.shapes.split(","):
        N, B, dm, K, dk, C, T = SHAPES[name]
        rng = np.random.default_rng(0)
        A = banded_graph(N, args.radius)
        ell = ell_from_adjacency(A)
        bell = block_ell_from_adjacency(A, block_size=128)
        nnz = int((A != 0).sum() + N)
        # fraction of the full block grid that is active (the BELL work ratio)
        frac_active = float(
            np.asarray(bell.block_mask).sum() / bell.num_tiles**2
        )

        act_dt = jnp.bfloat16 if args.bf16 else jnp.float32
        emb = jnp.asarray(rng.normal(size=(B, N, dm)), act_dt)
        x = jnp.asarray(rng.normal(size=(B, N, C, T)), act_dt)
        wq = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
        wk = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
        cheb = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
        adj_pa = jnp.asarray((rng.random((N, N)) < 0.01), jnp.float32)
        masks = jnp.asarray(rng.normal(size=(K, N, N)), jnp.float32)
        thetas = jnp.asarray(rng.normal(size=(K, C, C)) * 0.1, jnp.float32)

        def dense_block(emb, x, masks, thetas, wq, wk):
            s = spatial_attention_scores(emb, wq=wq, wk=wk, n_heads=K, d_k=dk)
            return cheb_conv_with_sat(
                x, s, adj_pa, cheb_polys=cheb, masks=masks, thetas=thetas
            )

        def ell_block(emb, x, masks, thetas, wq, wk):
            s = sparse_spatial_attention_scores(
                emb, ell, wq=wq, wk=wk, n_heads=K, d_k=dk
            )
            return sparse_cheb_conv_with_sat(
                x, s, ell,
                cheb_edges=gather_edge_values(cheb, ell),
                bias_edges=gather_edge_values(adj_pa[None] * masks, ell),
                thetas=thetas,
            )

        def bell_block(emb, x, masks, thetas, wq, wk):
            s = block_sparse_spatial_attention_scores(
                emb, bell, wq=wq, wk=wk, n_heads=K, d_k=dk
            )
            return block_sparse_cheb_conv_with_sat(
                x, s, bell,
                cheb_blocks=gather_block_values(cheb, bell),
                bias_blocks=gather_block_values(adj_pa[None] * masks, bell),
                thetas=thetas,
            )

        from dstagnn_drought_tpu.ops.pallas.bell_fused import (
            bell_cheb_conv_with_sat_pallas,
        )

        def bell_pallas_block(emb, x, masks, thetas, wq, wk):
            return bell_cheb_conv_with_sat_pallas(
                x, emb, bell, wq=wq, wk=wk, adj_pa=adj_pa, masks=masks,
                cheb_polys=cheb, thetas=thetas, n_heads=K, d_k=dk,
            )

        if args.check_tiles:
            # tile-resident path (mask_format='tiles': active-list masks +
            # the active-list fused backward) vs the XLA BELL path with
            # DENSE masks gathered to the same support — validates the
            # Mosaic-compiled kernels AND the segment-organized backward on
            # real hardware. Exact by the bias = adj_pa ⊙ mask semantics:
            # off-support entries contribute nothing in either path.
            from dstagnn_drought_tpu.ops.block_sparse import (
                build_bell_tile_constants,
            )
            from dstagnn_drought_tpu.ops.pallas.bell_fused import (
                bell_cheb_conv_tiles,
            )

            consts_t = build_bell_tile_constants(
                bell, np.asarray(adj_pa), np.asarray(cheb)
            )
            BS = bell.block_size
            A_n = int(bell.active_src.shape[0])
            # tile masks gathered from the SAME dense masks the XLA ref uses
            Np = bell.num_tiles * BS
            masks_p = np.zeros((K, Np, Np), np.float32)
            masks_p[:, :N, :N] = np.asarray(masks, np.float32)
            m5 = masks_p.reshape(K, bell.num_tiles, BS, bell.num_tiles,
                                 BS).transpose(1, 3, 0, 2, 4)
            mask_tiles = jnp.asarray(
                m5[np.asarray(bell.active_src), np.asarray(bell.active_tgt)]
            )

            def tiles_fn(emb, x, mask_tiles, thetas, wq, wk):
                return bell_cheb_conv_tiles(
                    x, emb, bell, wq=wq, wk=wk, mask_tiles=mask_tiles,
                    pattern_tiles=consts_t["pattern_tiles"],
                    pa_tiles=consts_t["pa_tiles"],
                    cheb_tiles=consts_t["cheb_tiles"],
                    thetas=thetas, n_heads=K, d_k=dk,
                )

            ref_fn = jax.jit(bell_block)
            argsr = (emb, x, masks, thetas, wq, wk)
            argst = (emb, x, mask_tiles, thetas, wq, wk)
            ref_o = np.asarray(ref_fn(*argsr), np.float32)
            til_o = np.asarray(jax.jit(tiles_fn)(*argst), np.float32)
            scale = max(np.abs(ref_o).max(), 1e-6)
            fwd_rel = float(np.abs(til_o - ref_o).max() / scale)

            def loss(f):
                return lambda *a: jnp.sum(f(*a) ** 2)

            g_ref = jax.jit(jax.grad(loss(bell_block),
                                     argnums=tuple(range(6))))(*argsr)
            g_til = jax.jit(jax.grad(loss(tiles_fn),
                                     argnums=tuple(range(6))))(*argst)
            # map the reference's dense-mask grad onto the tile support
            gm_p = np.zeros((K, Np, Np), np.float32)
            gm_p[:, :N, :N] = np.asarray(g_ref[2], np.float32)
            gm5 = gm_p.reshape(K, bell.num_tiles, BS, bell.num_tiles,
                               BS).transpose(1, 3, 0, 2, 4)
            g_ref = list(g_ref)
            g_ref[2] = gm5[np.asarray(bell.active_src),
                           np.asarray(bell.active_tgt)]
            rels = {}
            for gr, gp, nm in zip(g_ref, g_til,
                                  ("emb", "x", "mask_tiles", "thetas",
                                   "wq", "wk")):
                gr = np.asarray(gr, np.float32)
                gp = np.asarray(gp, np.float32)
                rels[nm] = float(
                    np.abs(gp - gr).max() / max(np.abs(gr).max(), 1e-6)
                )
            print(json.dumps({
                "shape": name, "mode": "check_tiles",
                "max_slots": int(bell.max_blocks), "n_active": A_n,
                "fused_bwd": bool(T * C >= 1024
                                  or jax.default_backend() != "tpu"),
                "fwd_max_rel": round(fwd_rel, 6),
                "grad_max_rel": {k: round(v, 6) for k, v in rels.items()},
                "dtype": str(act_dt.__name__),
                "backend": jax.default_backend(),
            }))
            continue

        if args.check:
            S = int(bell.max_blocks)
            ref_fn = jax.jit(bell_block)
            pal_fn = jax.jit(bell_pallas_block)
            argsv = (emb, x, masks, thetas, wq, wk)
            ref_o = np.asarray(ref_fn(*argsv), np.float32)
            pal_o = np.asarray(pal_fn(*argsv), np.float32)
            scale = max(np.abs(ref_o).max(), 1e-6)
            fwd_rel = float(np.abs(pal_o - ref_o).max() / scale)

            def loss(f):
                return lambda *a: jnp.sum(f(*a) ** 2)

            g_ref = jax.jit(jax.grad(loss(bell_block),
                                     argnums=tuple(range(6))))(*argsv)
            g_pal = jax.jit(jax.grad(loss(bell_pallas_block),
                                     argnums=tuple(range(6))))(*argsv)
            rels = {}
            for gr, gp, nm in zip(g_ref, g_pal,
                                  ("emb", "x", "masks", "thetas",
                                   "wq", "wk")):
                gr = np.asarray(gr, np.float32)
                gp = np.asarray(gp, np.float32)
                rels[nm] = float(
                    np.abs(gp - gr).max() / max(np.abs(gr).max(), 1e-6)
                )
            print(json.dumps({
                "shape": name, "mode": "check", "max_slots": S,
                "chunked": S > 4, "fwd_max_rel": round(fwd_rel, 6),
                "grad_max_rel": {k: round(v, 6) for k, v in rels.items()},
                "dtype": str(act_dt.__name__),
                "backend": jax.default_backend(),
            }))
            continue

        wanted = set(args.paths.split(","))
        for path, base in (("dense", dense_block), ("ell", ell_block),
                           ("bell", bell_block),
                           ("bell_pallas", bell_pallas_block)):
            if path not in wanted:
                continue
            if args.grad:
                def train_like(emb, x, masks, thetas, wq, wk, _f=base):
                    return jnp.sum(_f(emb, x, masks, thetas, wq, wk) ** 2)

                fn = jax.jit(jax.grad(train_like, argnums=(0, 1, 2, 3, 4, 5)))
            else:
                fn = jax.jit(base)
            ms = timeit(fn, emb, x, masks, thetas, wq, wk,
                        iters=args.iters) * 1e3
            # north-star counter: aggregated edge contributions per second
            # (nnz · K · T · B per block application; ×3 for fwd+bwd ≈ 2×fwd)
            edge_mult = 3.0 if args.grad else 1.0
            edges_per_s = nnz * K * T * B * edge_mult / (ms * 1e-3)
            print(json.dumps({
                "shape": name, "path": path,
                "mode": "fwd+bwd" if args.grad else "fwd",
                "ms": round(ms, 3),
                "N": N, "B": B, "nnz": nnz,
                "E": int(ell.max_degree),
                "bell_active_frac": round(frac_active, 3),
                "edges_per_s_per_chip": round(edges_per_s),
                "dtype": str(act_dt.__name__),
                "backend": jax.default_backend(),
            }))


if __name__ == "__main__":
    main()
