"""GAMBIA end-to-end at full scale: on-device STAG generation + model
training at N=2139, T=144→12 — the drought configuration the repo is named
for (/root/reference/configurations/GAMBIA_dstagnn.conf:6-10, data shape
noted at /root/reference/data/STAG_gen.py:71).

The reference repo ships no GAMBIA raw data; the benchmark synthesizes a
drought-like field at the exact shapes (T=287 monthly steps, N=2139 grid
pixels, F=4 features) over a Gambia-like raster strip, so every cost is
shape-realistic: 2,286,591 Sinkhorn node pairs for STAG, (B=4, N=2139,
F=4, T=144) training windows.

Prints one JSON line per stage:
  stag          on-device log-domain Sinkhorn STAG (data/stag.py)
  train_<path>  epoch timing for the chosen spatial path

Usage: python benchmarks/gambia_bench.py [--paths bell_pallas,dense]
                                         [--epochs 2] [--stag]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_X, N_Y = 93, 23  # 93·23 = 2139 pixels, a Gambia-like raster strip
N = N_X * N_Y
T_TOTAL = 287
F = 4
T_IN, T_PRED = 144, 12
BATCH = 4


def set_scale(k: int):
    """--scale k: k× longer raster strip (N = k·2139) — the node-axis
    scaling sweep. Dense cost grows O(N²), BELL O(N·band)."""
    global N_X, N
    N_X = 93 * k
    N = N_X * N_Y


def synth_drought(seed=0):
    """(T, N, F) smooth seasonal field + spatially-correlated anomalies."""
    rng = np.random.default_rng(seed)
    gx, gy = np.meshgrid(np.arange(N_X), np.arange(N_Y), indexing="ij")
    coords = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float32)
    t = np.arange(T_TOTAL)[:, None]
    season = np.sin(2 * np.pi * t / 12.0 + coords[None, :, 0] / N_X * 2)
    out = np.empty((T_TOTAL, N, F), np.float32)
    for f in range(F):
        a = rng.normal(size=(T_TOTAL, N)).astype(np.float32) * 0.3
        # cheap spatial smoothing on the grid
        a = a.reshape(T_TOTAL, N_X, N_Y)
        a = (a + np.roll(a, 1, 1) + np.roll(a, -1, 1)
             + np.roll(a, 1, 2) + np.roll(a, -1, 2)) / 5.0
        out[..., f] = 10 + 3 * season * (0.5 + 0.5 * f / F) + a.reshape(
            T_TOTAL, N
        )
    return out, coords


def grid_adjacency(coords):
    """4-neighbour grid adjacency — banded under row-major pixel order, the
    structure the BELL path exploits (a real GAMBIA raster is the same)."""
    A = np.zeros((N, N), np.float32)
    idx = lambda x, y: x * N_Y + y
    for x in range(N_X):
        for y in range(N_Y):
            i = idx(x, y)
            if x + 1 < N_X:
                A[i, idx(x + 1, y)] = A[idx(x + 1, y), i] = 1
            if y + 1 < N_Y:
                A[i, idx(x, y + 1)] = A[idx(x, y + 1), i] = 1
    return A


def windows(sig):
    """Hour-dependency windows at num_of_hours=12, points_per_hour=12
    (reference GAMBIA conf: len_input=144 = 12·12, predict 12)."""
    xs, ys = [], []
    for label in range(T_IN, T_TOTAL - T_PRED + 1):
        xs.append(sig[label - T_IN:label])
        ys.append(sig[label:label + T_PRED, :, 0])
    x = np.stack(xs).transpose(0, 2, 3, 1)      # (S, N, F, T)
    y = np.stack(ys).transpose(0, 2, 1)         # (S, N, T_pred)
    n = len(x)
    n_tr, n_va = int(n * 0.6), int(n * 0.2)
    mean = x[:n_tr].mean(axis=(0, 1, 3), keepdims=True)
    std = x[:n_tr].std(axis=(0, 1, 3), keepdims=True) + 1e-8
    xn = (x - mean) / std
    return (xn[:n_tr], y[:n_tr], xn[n_tr:n_tr + n_va], y[n_tr:n_tr + n_va],
            xn[n_tr + n_va:], y[n_tr + n_va:], mean, std)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", default="bell_pallas")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--stag", action="store_true",
                    help="also time on-device STAG generation (2.29M pairs)")
    ap.add_argument("--stag-iters", type=int, default=100)
    ap.add_argument("--scale", type=int, default=1,
                    help="k× longer raster strip (N = k·2139)")
    args = ap.parse_args()
    if args.scale != 1:
        set_scale(args.scale)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    sig, coords = synth_drought()
    A = grid_adjacency(coords)

    if args.stag:
        from dstagnn_drought_tpu.data.stag import sparsify, sta_matrix

        t0 = time.perf_counter()
        sta = sta_matrix(sig, eps=0.01, num_iters=args.stag_iters,
                         block_size=4096)
        dt = time.perf_counter() - t0
        stag, _ = sparsify(np.asarray(sta), 0.01, "reference")
        pairs = N * (N - 1) // 2
        print(json.dumps({
            "stage": "stag", "seconds": round(dt, 2), "pairs": pairs,
            "pairs_per_s": round(pairs / dt),
            "iters": args.stag_iters,
            "backend": jax.default_backend(),
        }))
        pa = stag.astype(np.float32)
    else:
        rng = np.random.default_rng(1)
        pa = (rng.random((N, N)) < 0.01).astype(np.float32)
        np.fill_diagonal(pa, 1)

    x_tr, y_tr, x_va, y_va, x_te, y_te, mean, std = windows(sig)

    from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
    from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
    from dstagnn_drought_tpu.training.loop import Trainer

    ds = ArrayDataset(
        train=Split(x_tr, y_tr), val=Split(x_va, y_va),
        test=Split(x_te, y_te), mean=mean, std=std,
    )
    nnz = int((np.maximum(A, pa) != 0).sum() + N)
    for path in args.paths.split(","):
        sparse = path != "dense"
        cfg = Config(
            data=DataConfig(num_of_vertices=N, len_input=T_IN,
                            num_for_predict=T_PRED, dataset_name="GAMBIA_SYN",
                            points_per_hour=12),
            training=TrainingConfig(
                # reference GAMBIA conf [Training]: 16-23
                in_channels=F, nb_block=2, n_heads=2, K=2, d_k=32,
                d_model=64, nb_chev_filter=32, nb_time_filter=32,
                batch_size=BATCH, epochs=args.epochs, learning_rate=1e-4,
                num_of_hours=12, compute_dtype="bfloat16",
                sparse=sparse,
                sparse_format="bell" if "bell" in path else "ell",
                use_pallas="pallas" in path,
                # "bell_tiles": masks on the active-tile support — no dense
                # (K, N, N) params/Adam state, no plane prep in the step
                mask_format="tiles" if "tiles" in path else "dense",
                remat="remat" in path,
                # "xgtu" token: disable the fused GTU kernel (A/B baseline)
                fuse_gtu=False if "xgtu" in path else "auto",
            ),
        ).validate()
        t0 = time.perf_counter()
        trainer = Trainer(
            cfg, dataset=ds, adj_merge=A, adj_pa=pa,
            experiments_root=os.path.join(REPO, "benchmarks", "gambia_runs"),
        )
        setup_s = time.perf_counter() - t0
        n_batches = -(-len(x_tr) // BATCH)
        t0 = time.perf_counter()
        loss0 = trainer.train_epoch(0)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for e in range(1, args.epochs):
            loss = trainer.train_epoch(e)
        steady = (time.perf_counter() - t0) / max(args.epochs - 1, 1)
        step_s = steady / n_batches
        from dstagnn_drought_tpu.training.profiling import throughput

        tp = throughput(step_seconds=step_s, batch_size=BATCH,
                        nnz=nnz * cfg.training.nb_block,
                        K=cfg.training.K, T=T_IN)
        print(json.dumps({
            "stage": f"train_{path}", "epoch_seconds": round(steady, 2),
            "ms_per_step": round(step_s * 1e3, 2),
            "epochs_per_hour": round(3600 / steady, 1),
            "compile_epoch_seconds": round(compile_s, 1),
            "setup_seconds": round(setup_s, 1),
            "first_epoch_loss": round(float(loss0), 4),
            "edges_per_s_per_chip": round(tp["edges_per_s_per_chip"]),
            "n_train": len(x_tr), "batches_per_epoch": n_batches, "N": N,
            "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
