"""Speed-of-light accounting for the hot Pallas kernels (VERDICT r3 #5).

For each kernel at GAMBIA-conf and PEMS07 shapes: analytic HBM bytes moved
+ MXU flops → model time = max(bytes/BW, flops/peak), vs measured wall
time on the chip. Prints one JSON line per (shape, kernel) with a
pct_of_roofline column and the binding resource.

Peaks (TPU v5e, 1 chip): 197 Tflop/s bf16 MXU, 819 GB/s HBM. The model
charges only compulsory traffic (each operand once per documented re-read
of the kernel's streaming schedule) — padding waste and VMEM-side copies
are excluded, so pct_of_roofline is a strict upper bound on headroom.

Kernels: fused tile-resident BELL forward (ops/pallas/bell_fused.py),
K1 dA+dΘ and K2 dx backward (ops/pallas/bell_bwd.py), fused GTU temporal
tail fwd/bwd (ops/pallas/gtu_fused.py).

Usage: python benchmarks/roofline.py [--iters 20]
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

BW = 819e9          # HBM bytes/s
PEAK_BF16 = 197e12  # MXU flop/s
PEAK_F32 = 49e12    # MXU f32 ~1/4 of bf16 on v5e

# (N, B, d_model, K, d_k, C, Co, T)
SHAPES = {
    "gambia_conf": (2139, 4, 64, 2, 32, 32, 32, 144),
    "pems07": (883, 12, 512, 3, 32, 32, 32, 12),
}


def banded_graph(n, radius):
    A = np.zeros((n, n), np.float32)
    for off in range(1, radius + 1):
        idx = np.arange(n - off)
        A[idx, idx + off] = 1
        A[idx + off, idx] = 1
    return A


CHAIN = 8  # kernel calls chained inside ONE dispatch — the device tunnel
#            adds 2-100 ms of per-dispatch latency, so naive per-call
#            timing at the few-ms scale measures the tunnel, not the kernel


def timeit(fn, *args, iters=20):
    """Mean per-call seconds of ``fn`` with dispatch amortized: CHAIN
    sequential data-dependent calls per jit dispatch, minus the measured
    cost of the chaining glue itself (a full-array perturb pass)."""
    import jax
    import jax.numpy as jnp

    def chained(do_call):
        def run(*a):
            a = list(a)
            s = jnp.float32(0)
            for _ in range(CHAIN):
                if do_call:
                    out = fn(*a)
                    first = jax.tree.leaves(out)[0]
                else:
                    first = a[0]
                s = s + first.reshape(-1)[0].astype(jnp.float32)
                a[0] = a[0] * (1 + 1e-30 * s).astype(a[0].dtype)
            return s
        return jax.jit(run)

    def measure(run):
        out = run(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (iters * CHAIN)

    t_with = measure(chained(True))
    t_glue = measure(chained(False))
    return max(t_with - t_glue, 1e-9)


def report(shape, kernel, meas_s, flops, bytes_, peak):
    t_flops = flops / peak
    t_bytes = bytes_ / BW
    model = max(t_flops, t_bytes)
    # sub-harness-resolution measurements (the chained-glue subtraction
    # bottoms out around ~0.1 ms) are reported without a bogus percentage
    resolvable = meas_s > 1e-4
    print(json.dumps({
        "shape": shape, "kernel": kernel,
        "measured_ms": round(meas_s * 1e3, 3) if resolvable else
        "<0.1 (below harness resolution)",
        "model_ms": round(model * 1e3, 3),
        "pct_of_roofline": round(100 * model / meas_s, 1)
        if resolvable else None,
        "binding": "MXU" if t_flops >= t_bytes else "HBM",
        "gflops": round(flops / 1e9, 1),
        "mbytes": round(bytes_ / 1e6, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--radius", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from dstagnn_drought_tpu.ops.block_sparse import (
        block_ell_from_adjacency,
        build_bell_tile_constants,
    )
    from dstagnn_drought_tpu.ops.graph import cheb_polynomials, scaled_laplacian
    from dstagnn_drought_tpu.ops.pallas.bell_bwd import (
        bell_bwd_dA_dtheta,
        bell_bwd_dx,
    )
    from dstagnn_drought_tpu.ops.pallas.bell_fused import bell_cheb_conv_tiles
    from dstagnn_drought_tpu.ops.pallas.gtu_fused import _bwd_call, _fwd_call

    dt = jnp.bfloat16
    xb = 2
    peak = PEAK_BF16

    for name, (N, B, dm, K, dk, C, Co, T) in SHAPES.items():
        rng = np.random.default_rng(0)
        A = banded_graph(N, args.radius)
        bell = block_ell_from_adjacency(A, block_size=128)
        pa = (rng.random((N, N)) < 0.01).astype(np.float32)
        np.fill_diagonal(pa, 1)
        polys = cheb_polynomials(
            scaled_laplacian(jnp.asarray(A, jnp.float32)), K
        )
        consts = build_bell_tile_constants(bell, pa, np.asarray(polys))
        BS = bell.block_size
        A_n = int(bell.active_src.shape[0])
        NJ = int(bell.tile_start.shape[0])
        Np = NJ * BS
        M = T * C
        nt = T
        H = K

        emb = jnp.asarray(rng.normal(size=(B, N, dm)), dt)
        x = jnp.asarray(rng.normal(size=(B, N, C, T)), dt)
        wq = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
        wk = jnp.asarray(rng.normal(size=(dm, K * dk)), jnp.float32)
        thetas = jnp.asarray(rng.normal(size=(K, C, Co)) * 0.1, jnp.float32)
        mask_tiles = jnp.asarray(
            rng.normal(size=(A_n, K, BS, BS)), jnp.float32
        )

        fwd = jax.jit(lambda e_, x_: bell_cheb_conv_tiles(
            x_, e_, bell, wq=wq, wk=wk, mask_tiles=mask_tiles,
            pattern_tiles=consts["pattern_tiles"],
            pa_tiles=consts["pa_tiles"], cheb_tiles=consts["cheb_tiles"],
            thetas=thetas, n_heads=K, d_k=dk,
        ))
        t_fwd = timeit(fwd, emb, x, iters=args.iters)
        fl = (2 * B * H * A_n * BS * BS * dk          # SDDMM scores
              + 2 * B * H * A_n * BS * BS * M         # SpMM
              + 2 * B * H * NJ * BS * C * Co * nt)    # Θ mix
        by = (B * A_n * BS * M * xb                   # x per active slot
              + B * A_n * H * dk * BS * 4             # q slots (f32)
              + A_n * 2 * H * BS * BS * 4             # bias+cheb tiles
              + B * NJ * H * BS * dk * 4              # k
              + B * NJ * BS * nt * Co * xb)           # out
        report(name, "bell_fused_fwd", t_fwd, fl, by, peak)

        # K1 / K2 operands at the shapes _bwd_core passes
        S_max = int(bell.max_blocks)
        A_pad = A_n + S_max
        gm = jnp.asarray(rng.normal(size=(B, Np, nt * Co)), dt)
        xp = jnp.pad(x.reshape(B, N, C * T), ((0, 0), (0, Np - N), (0, 0)))
        w_act = jnp.asarray(
            rng.normal(size=(B, A_pad, H, BS, BS)), dt
        )
        a_src_p = jnp.pad(jnp.asarray(bell.active_src), (0, S_max))
        # layout per call: "c" (C blocks of T — what the model's auto layout
        # uses at fused-backward shapes) vs "t"; both rows reported when the
        # shape admits c (128 | C·T and 128 | Co·T)
        layouts = ["t"]
        if (C * T) % 128 == 0 and (Co * T) % 128 == 0:
            layouts.append("c")
        k1 = {lay: jax.jit(functools.partial(
            lambda gm_, x_, w_, lay: bell_bwd_dA_dtheta(
                bell.tile_start, bell.tile_count, a_src_p,
                thetas, gm_, x_, w_, S_max=S_max, n_ch=C, layout=lay,
            ), lay=lay)) for lay in layouts}
        NM = 1  # M-tile count (M fits one tile at these shapes)
        fl = (2 * B * H * A_n * BS * BS * M * 2       # dA SDDMM + agg SpMM
              + 2 * B * NJ * H * Co * M * BS)         # g_aggT rearrange
        by = (B * Np * nt * Co * xb                   # gm once
              + B * A_n * BS * M * xb                 # x slots
              + B * A_n * H * BS * BS * xb * NM       # w slots
              + B * A_pad * H * BS * BS * 4)          # dA out (f32)
        for lay in layouts:
            t_k1 = timeit(k1[lay], gm, xp, w_act, iters=args.iters)
            report(name, f"bell_bwd_K1[{lay}]", t_k1, fl, by, peak)

        order_tgt = jnp.pad(
            jnp.asarray(bell.active_tgt)[jnp.asarray(bell.src_order)],
            (0, S_max))
        order_idx = jnp.pad(jnp.asarray(bell.src_order), (0, S_max))
        max_out = int(bell.max_src_blocks)
        k2 = {lay: jax.jit(functools.partial(
            lambda gm_, w_, lay: bell_bwd_dx(
                bell.src_start, bell.src_count, order_tgt, order_idx,
                thetas, gm_, w_, max_out=max_out, n_ch=C, np_src=Np,
                layout=lay,
            ), lay=lay)) for lay in layouts}
        fl = (2 * B * H * A_n * BS * BS * M           # w·g_agg SpMM
              + 2 * B * A_n * H * Co * M * BS / C * C)  # g_aggT per tile
        by = (B * A_n * BS * nt * Co * xb             # gm per visited tile
              + B * A_n * H * BS * BS * xb
              + B * Np * M * 4)                       # dx out (f32 acc)
        for lay in layouts:
            t_k2 = timeit(k2[lay], gm, w_act, iters=args.iters)
            report(name, f"bell_bwd_K2_dx[{lay}]", t_k2, fl, by, peak)

        # GTU taps+gate+concat kernel (only defined for the long-T shapes)
        if T >= 48 and T % 16 == 0 and C % 16 == 0:
            M3 = 3 * T - 12
            wr = jnp.asarray(rng.normal(size=(7 * C, 6 * C)), jnp.float32)
            br = jnp.asarray(rng.normal(size=(1, 6 * C)), jnp.float32)
            xt = jnp.asarray(rng.normal(size=(B * N * T, C)), dt)
            g = jnp.asarray(rng.normal(size=(B * N, M3, C)), dt)
            gfwd = jax.jit(lambda x_: _fwd_call(x_, wr, br, T))
            t_g = timeit(gfwd, xt, iters=args.iters)
            # tap-row matmuls include the zero-tap columns: 7·C·6C per row
            fl = 2 * B * N * T * (7 * C) * (6 * C)
            by = (B * N * T * C + B * N * M3 * C) * xb  # xt in, concat out
            report(name, "gtu_cat_fwd", t_g, fl, by, peak)

            gbwd = jax.jit(lambda x_, g_: _bwd_call(x_, g_, wr, br, T))
            t_gb = timeit(gbwd, xt, g, iters=args.iters)
            fl = 2 * B * N * T * (7 * C) * (6 * C) * 3  # recompute+dW+dx
            by = (2 * B * N * T * C + B * N * M3 * C) * xb
            report(name, "gtu_cat_bwd", t_gb, fl, by, peak)


if __name__ == "__main__":
    main()
