"""Whole-block fusion question (round-2 op profile: the dense train step is
a long tail of ~600 small ops; single-chain fusion measured neutral). This
harness measures the full scan-epoch train step with the two existing fused
Pallas kernels enabled separately and TOGETHER — per block that replaces the
temporal-attention chain AND the spatial middle with one kernel each, the
closest thing to whole-block mega-fusion short of fusing the GTU tail.

Prints one JSON line per config. PEMS08 shapes (the headline bench config).

Usage: python benchmarks/fusion_bench.py [--epochs 2] [--bf16]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 64
STEPS = 168  # PEMS08 train batches per epoch (bench.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--f32", action="store_true",
                    help="float32 compute (default bfloat16, the trained "
                         "configuration)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, apply, make_model
    from dstagnn_drought_tpu.training.step import (
        make_epoch_runner,
        make_optimizer,
    )

    spec = ModelSpec(
        num_of_vertices=170, len_input=12, num_for_predict=12, num_of_d=1,
        nb_block=4, in_channels=1, K=3, nb_chev_filter=32, nb_time_filter=32,
        d_model=512, d_k=32, n_heads=3,
    )
    rng = np.random.default_rng(0)
    N = spec.num_of_vertices
    A = (rng.random((N, N)) < 0.05).astype(np.float32)
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.01).astype(np.float32)
    np.fill_diagonal(pa, 1)
    optimizer = make_optimizer(1e-4)
    cdt = jnp.float32 if args.f32 else jnp.bfloat16

    n_total = 4 * BATCH
    x_full = jnp.asarray(rng.normal(size=(n_total, N, 1, 12)), jnp.float32)
    y_full = jnp.asarray(rng.normal(size=(n_total, N, 12)), jnp.float32)
    idx_plan = jnp.asarray(
        (np.arange(STEPS * BATCH) % n_total).reshape(STEPS, BATCH)
        .astype(np.int32)
    )

    for name, kw in (
        ("baseline", {}),
        ("fuse_tat", dict(fuse_tat=True)),
        ("fuse_spatial", dict(fuse_spatial=True)),
        ("fuse_both", dict(fuse_tat=True, fuse_spatial=True)),
    ):
        params, consts = make_model(jax.random.PRNGKey(0), spec, A, pa)
        opt_state = optimizer.init(params)
        apply_fn = functools.partial(apply, **kw) if kw else apply
        runner = make_epoch_runner(
            spec, optimizer, compute_dtype=cdt, apply_fn=apply_fn
        )
        key = jax.random.key(1, impl="rbg")
        t0 = time.perf_counter()
        params, opt_state, key, losses = runner(
            params, opt_state, key, x_full, y_full, idx_plan, consts
        )
        jax.block_until_ready(losses)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            params, opt_state, key, losses = runner(
                params, opt_state, key, x_full, y_full, idx_plan, consts
            )
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / (args.epochs * STEPS)
        print(json.dumps({
            "config": name, "ms_per_step": round(dt * 1e3, 3),
            "epochs_per_hour": round(3600 / (dt * STEPS), 1),
            "compile_s": round(compile_s, 1),
            "final_loss": round(float(losses[-1]), 4),
            "dtype": "float32" if args.f32 else "bfloat16",
            "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
