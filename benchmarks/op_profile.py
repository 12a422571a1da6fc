"""Op-level profile of the flagship train step (PEMS08 scale by default).

Captures a ``jax.profiler`` trace of a few jitted train steps and prints the
top device ops by self time (via the xprof/tensorboard-plugin-profile
converter, available in this image). This is the measurement loop behind the
kernel-optimization work — BENCH_NOTES.md records the findings.

Usage: python benchmarks/op_profile.py [--steps 5] [--top 25] [--use-pallas]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--use-pallas", action="store_true")
    ap.add_argument("--bfloat16", action="store_true", default=True)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes (CPU smoke test of the tooling)")
    ap.add_argument("--gambia", action="store_true",
                    help="GAMBIA config (N=2139, T=144, sparse BELL path)")
    ap.add_argument("--dense", action="store_true",
                    help="with --gambia: profile the dense spatial path")
    ap.add_argument("--tiles", action="store_true",
                    help="with --gambia: tile-resident masks (mask_format="
                         "'tiles')")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model
    from dstagnn_drought_tpu.training.step import make_optimizer, make_train_step

    if args.tiny:
        spec = ModelSpec(
            num_of_vertices=12, len_input=12, num_for_predict=4, num_of_d=1,
            nb_block=2, in_channels=1, K=2, nb_chev_filter=8, nb_time_filter=8,
            d_model=16, d_k=8, n_heads=2,
        )
    else:
        spec = ModelSpec(
            num_of_vertices=170, len_input=12, num_for_predict=12, num_of_d=1,
            nb_block=4, in_channels=1, K=3, nb_chev_filter=32, nb_time_filter=32,
            d_model=512, d_k=32, n_heads=3,
        )
    if args.gambia:
        spec = ModelSpec(
            num_of_vertices=2139, len_input=144, num_for_predict=12,
            num_of_d=4, nb_block=2, in_channels=4, K=2, nb_chev_filter=32,
            nb_time_filter=32, d_model=64, d_k=32, n_heads=2,
        )
    rng = np.random.default_rng(0)
    N = spec.num_of_vertices
    if args.gambia:
        # banded raster-like adjacency (the GAMBIA grid structure)
        A = np.zeros((N, N), np.float32)
        for j in range(N):
            lo, hi = max(0, j - 23), min(N, j + 24)
            A[lo:hi, j] = 1.0
    else:
        A = (rng.random((N, N)) < 0.05).astype(np.float32)
        A = np.maximum(A, A.T); np.fill_diagonal(A, 0); A[0, 1] = A[1, 0] = 1
    pa = (rng.random((N, N)) < 0.01).astype(np.float32); np.fill_diagonal(pa, 1)

    bell = None
    if args.gambia and not args.dense:
        from dstagnn_drought_tpu.ops.block_sparse import (
            block_ell_from_adjacency,
        )

        bell = block_ell_from_adjacency(A, block_size=128)
    params, consts = make_model(
        jax.random.PRNGKey(0), spec, A, pa,
        bell=bell if args.tiles else None,
    )
    if bell is not None:
        consts = dict(consts, ell=bell)
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    step = make_train_step(
        spec, opt,
        compute_dtype=jnp.bfloat16 if args.bfloat16 else jnp.float32,
        use_pallas=args.use_pallas or (args.gambia and not args.dense),
    )
    B = 8 if args.tiny else (4 if args.gambia else 64)
    F_in = spec.in_channels
    T_in = spec.len_input
    x_full = jnp.asarray(rng.normal(size=(4 * B, N, F_in, T_in)), jnp.float32)
    y_full = jnp.asarray(
        rng.normal(size=(4 * B, N, spec.num_for_predict)), jnp.float32
    )
    idx = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(1)

    # warmup/compile outside the trace
    params, opt_state, key, loss = step(params, opt_state, key, x_full, y_full, idx, consts)
    jax.block_until_ready(loss)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="opprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            params, opt_state, key, loss = step(
                params, opt_state, key, x_full, y_full, idx, consts
            )
        jax.block_until_ready(loss)

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    from xprof.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data(paths, "framework_op_stats", {"tqx": "out:csv"})
    rows = json.loads(data.decode() if isinstance(data, bytes) else data)[0]["rows"]

    parsed = []
    for r in rows:
        c = [cell["v"] for cell in r["c"]]
        parsed.append({
            "side": c[1], "type": c[2], "op": str(c[3])[:80],
            "self_us": float(c[7]), "device_pct": c[9],
        })
    device_rows = [p for p in parsed if p["side"] == "Device"] or parsed
    print(f"# top {args.top} ops by self time over {args.steps} steps "
          f"(backend={jax.default_backend()}, pallas={args.use_pallas}, "
          f"device_rows={len(device_rows)})")
    for p in device_rows[: args.top]:
        print(json.dumps({
            "op": p["op"], "type": p["type"],
            "self_us_per_step": round(p["self_us"] / args.steps, 1),
            "device_pct": p["device_pct"],
        }))


if __name__ == "__main__":
    main()
