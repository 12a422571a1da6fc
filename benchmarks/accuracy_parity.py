"""Accuracy north-star harness: full-length training of the reference torch
model (CPU) and this framework (TPU/CPU) on the SAME synthetic PEMS08-scale
dataset, reporting per-horizon MAE/RMSE/MAPE side by side.

The reference repo ships no raw PEMS data and publishes no numbers
(BASELINE.md), so the comparison runs on a seeded synthetic dataset with real
spatio-temporal structure (diurnal profiles + graph-diffused AR noise) at
exact PEMS08 shapes (N=170, T=12→12, reference configurations/
PEMS08_dstagnn.conf). Both sides see identical windows, splits,
normalization, graphs, loss (SmoothL1), optimizer (Adam 1e-4) and schedule;
metrics come from the same horizon_report code.

Modes (run independently so the slow torch side can run in the background):
  --side data    generate + save the dataset/graphs
  --side ref     train the reference torch model (CPU), save metrics
  --side jax     train this framework, save metrics (--sparse for the
                 BELL tile-resident spatial path)
  --side traj    50-step identical-weights loss-trajectory parity at
                 PEMS08 shapes (VERDICT round-1 item 1)
  --side report  merge result JSONs into a markdown table

``--graphs pems04`` (round 5, VERDICT r4 #5) swaps the synthetic graphs
for the REAL shipped PEMS04 artifacts — the directed 340-edge list
``/root/reference/data/PEMS04/PEMS04.csv`` and the genuine
``stag_001_PEMS04.csv`` / ``strg_001_PEMS04.csv`` STAG/STRG matrices
(reference load path train_DSTAGNN_my.py:63-73, PEMS04 conf graph='AG' →
adj_merge = binarized STAG, adj_pa = binarized STRG) — at N=307 with
synthetic signals diffused over the real graph (no signals are shipped).
Result files gain a ``_pems04real`` suffix.

Reference training-loop semantics mirrored: epoch loop with shuffled batches,
per-epoch validation, best-val checkpointing, final test with best weights
(/root/reference/train_DSTAGNN_my.py:141-191).
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

N_NODES = 170           # rebound by --graphs pems04 (N=307)
SUFFIX = ""             # "_pems04real" under --graphs pems04
T_IN = 12
T_PRED = 12
STEPS_PER_DAY = 288  # 5-minute bins
N_DAYS = 7
BATCH = 64
LR = 1e-4
SEED = 2024


# ---------------------------------------------------------------------------
# synthetic PEMS08-scale dataset
# ---------------------------------------------------------------------------

def make_graph(rng: np.random.Generator):
    """Random geometric road-network-like graph: nodes on the unit square,
    symmetric k-nearest-neighbour edges."""
    coords = rng.random((N_NODES, 2))
    d2 = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    k = 3
    nbrs = np.argsort(d2, axis=1)[:, :k]
    A = np.zeros((N_NODES, N_NODES), np.float32)
    rows = np.repeat(np.arange(N_NODES), k)
    A[rows, nbrs.reshape(-1)] = 1.0
    A = np.maximum(A, A.T)
    return A, coords


def make_signal(rng: np.random.Generator, A: np.ndarray) -> np.ndarray:
    """(T_total, N, 1) traffic-like series: per-node diurnal profile plus a
    graph-diffused AR(1) latent, so the target is genuinely predictable from
    the spatio-temporal context."""
    T_total = STEPS_PER_DAY * N_DAYS
    t = np.arange(T_total)
    base = rng.uniform(120, 320, N_NODES)
    amp = rng.uniform(40, 140, N_NODES)
    phase = rng.uniform(-0.5, 0.5, N_NODES)
    diurnal = base[None, :] + amp[None, :] * np.maximum(
        0.0, np.sin(2 * np.pi * (t[:, None] / STEPS_PER_DAY - 0.25 + phase[None, :]))
    )
    # graph-diffused AR(1) latent
    deg = A.sum(1, keepdims=True)
    P = A / np.maximum(deg, 1.0)
    latent = np.zeros((T_total, N_NODES))
    z = rng.normal(0, 1, N_NODES)
    for i in range(T_total):
        z = 0.75 * z + 0.20 * (P @ z) + rng.normal(0, 0.35, N_NODES)
        latent[i] = z
    sig = diurnal + 25.0 * latent
    return np.clip(sig, 1.0, None)[:, :, None].astype(np.float64)


def load_real_pems04_graphs():
    """The shipped PEMS04 graph artifacts through our loaders (validated
    against ground truth in tests/test_real_pems04.py). Returns
    (adj_merge, adj_pa): the reference trains PEMS04 with graph='AG' so
    adj_merge is the binarized STAG (lib/dataloader.py:5-9) and adj_pa the
    binarized STRG (load_PA, lib/dataloader.py:11-15)."""
    from dstagnn_drought_tpu.data.adjacency import (
        load_stag_adjacency,
        load_strg_adjacency,
    )

    base = "/root/reference/data/PEMS04"
    adj_merge = load_stag_adjacency(os.path.join(base, "stag_001_PEMS04.csv"))
    adj_pa = load_strg_adjacency(os.path.join(base, "strg_001_PEMS04.csv"))
    return adj_merge.astype(np.float32), adj_pa.astype(np.float32)


def build_dataset(out_dir: str):
    from dstagnn_drought_tpu.data.stag import fast_sta_matrix, sparsify
    from dstagnn_drought_tpu.data.windowing import read_and_generate_dataset

    rng = np.random.default_rng(SEED)
    if SUFFIX:  # real PEMS04 graphs; synthetic signals diffused over them
        adj_merge, adj_pa = load_real_pems04_graphs()
        A_diff = np.maximum(adj_merge, adj_merge.T)
        signal = make_signal(rng, A_diff)
        d = read_and_generate_dataset(
            "synth_PEMS04.npz", 0, 0, 1, T_PRED, points_per_hour=T_IN,
            data=signal,
        )
        np.savez_compressed(
            os.path.join(out_dir, f"parity_dataset{SUFFIX}.npz"),
            train_x=d["train"]["x"].astype(np.float32),
            train_y=d["train"]["target"].astype(np.float32),
            val_x=d["val"]["x"].astype(np.float32),
            val_y=d["val"]["target"].astype(np.float32),
            test_x=d["test"]["x"].astype(np.float32),
            test_y=d["test"]["target"].astype(np.float32),
            mean=d["stats"]["_mean"], std=d["stats"]["_std"],
            adj=adj_merge, stag=adj_pa,
        )
        print(
            f"real-PEMS04 dataset: train={d['train']['x'].shape} "
            f"adj_merge_nnz={int(adj_merge.sum())} "
            f"adj_pa_nnz={int(adj_pa.sum())}"
        )
        return
    A, coords = make_graph(rng)
    signal = make_signal(rng, A)

    # the real STAG pipeline on the synthetic series (fast variant; the
    # spatial gate uses the geometric coordinates, cutoff in graph units)
    sta = fast_sta_matrix(signal, coords * 10.0, max_distance=3.0)
    stag_bin, _ = sparsify(sta, sparsity=0.05, order="similar")

    d = read_and_generate_dataset(
        "synth_PEMS08.npz", 0, 0, 1, T_PRED, points_per_hour=T_IN, data=signal
    )
    np.savez_compressed(
        os.path.join(out_dir, "parity_dataset.npz"),
        train_x=d["train"]["x"].astype(np.float32),
        train_y=d["train"]["target"].astype(np.float32),
        val_x=d["val"]["x"].astype(np.float32),
        val_y=d["val"]["target"].astype(np.float32),
        test_x=d["test"]["x"].astype(np.float32),
        test_y=d["test"]["target"].astype(np.float32),
        mean=d["stats"]["_mean"], std=d["stats"]["_std"],
        adj=A, stag=stag_bin.astype(np.float32),
    )
    print(
        f"dataset: train={d['train']['x'].shape} val={d['val']['x'].shape} "
        f"test={d['test']['x'].shape} stag_nnz={int(stag_bin.sum())}"
    )


def load_dataset(out_dir: str):
    return np.load(os.path.join(out_dir, f"parity_dataset{SUFFIX}.npz"))


def batch_plan(n: int, batch: int, rng: np.random.Generator | None):
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    nb = n // batch  # drop remainder on the torch side for simplicity;
    return order[: nb * batch].reshape(nb, batch)


# ---------------------------------------------------------------------------
# reference (torch, CPU)
# ---------------------------------------------------------------------------

def run_ref(out_dir: str, epochs: int):
    import torch

    torch.set_num_threads(max(1, os.cpu_count() - 1))
    sys.path.insert(0, "/root/reference")
    from model.DSTAGNN_my import make_model as ref_make_model

    from dstagnn_drought_tpu.training.metrics import horizon_report

    f = load_dataset(out_dir)
    adj, stag = f["adj"], f["stag"]
    torch.manual_seed(SEED)
    net = ref_make_model(
        "cpu", 1, 4, 1, 3, 32, 32, 1, adj, stag.astype(np.float64), adj,
        T_PRED, T_IN, N_NODES, 512, 32, 32, 3,
    )
    criterion = torch.nn.SmoothL1Loss()
    opt = torch.optim.Adam(net.parameters(), lr=LR)

    xs = {s: torch.from_numpy(f[f"{s}_x"]) for s in ("train", "val", "test")}
    ys = {s: torch.from_numpy(f[f"{s}_y"]) for s in ("train", "val", "test")}

    def eval_split(s):
        net.eval()
        losses, preds = [], []
        with torch.no_grad():
            idxs = batch_plan(len(xs[s]), BATCH, None)
            for b in idxs:
                out = net(xs[s][b])
                losses.append(float(criterion(out, ys[s][b])))
                preds.append(out.numpy())
            rem = len(xs[s]) - idxs.size
            if rem:
                out = net(xs[s][-rem:])
                losses.append(float(criterion(out, ys[s][-rem:])))
                preds.append(out.numpy())
        return float(np.mean(losses)), np.concatenate(preds, 0)

    best_val, best_state, best_epoch = np.inf, None, -1
    rng = np.random.default_rng(SEED)
    hist = []
    for e in range(epochs):
        net.train()
        t0 = time.time()
        losses = []
        for b in batch_plan(len(xs["train"]), BATCH, rng):
            opt.zero_grad()
            loss = criterion(net(xs["train"][b]), ys["train"][b])
            loss.backward()
            opt.step()
            losses.append(float(loss))
        val_loss, _ = eval_split("val")
        tr = float(np.mean(losses))
        hist.append({"epoch": e, "train_loss": tr, "val_loss": val_loss,
                     "seconds": round(time.time() - t0, 1)})
        print(json.dumps(hist[-1]), flush=True)
        if val_loss < best_val:
            best_val, best_epoch = val_loss, e
            best_state = {k: v.detach().clone() for k, v in net.state_dict().items()}

    if best_state is not None:
        net.load_state_dict(best_state)
    test_loss, pred = eval_split("test")
    report = horizon_report(f["test_y"], pred, null_val=0)
    result = {
        "side": "reference-torch-cpu", "epochs": epochs,
        "best_epoch": best_epoch, "best_val": best_val,
        "test_loss": test_loss, "report": report, "history": hist,
    }
    with open(os.path.join(out_dir, f"result_ref{SUFFIX}.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print("ref overall:", report["overall"])


# ---------------------------------------------------------------------------
# ours (JAX)
# ---------------------------------------------------------------------------

def run_jax(out_dir: str, epochs: int, compute_dtype: str = "bfloat16",
            sparse: bool = False):
    from dstagnn_drought_tpu.config import Config, DataConfig, TrainingConfig
    from dstagnn_drought_tpu.data.dataset import ArrayDataset, Split
    from dstagnn_drought_tpu.training.loop import Trainer

    f = load_dataset(out_dir)
    ds = ArrayDataset(
        train=Split(f["train_x"], f["train_y"]),
        val=Split(f["val_x"], f["val_y"]),
        test=Split(f["test_x"], f["test_y"]),
        mean=f["mean"], std=f["std"],
    )
    cfg = Config(
        data=DataConfig(num_of_vertices=N_NODES, len_input=T_IN,
                        num_for_predict=T_PRED, dataset_name="SYNTH08",
                        points_per_hour=T_IN),
        training=TrainingConfig(
            in_channels=1, nb_block=4, n_heads=3, K=3, d_k=32, d_model=512,
            nb_chev_filter=32, nb_time_filter=32, batch_size=BATCH,
            epochs=epochs, learning_rate=LR, seed=SEED,
            compute_dtype=compute_dtype,
            sparse=sparse, sparse_format="bell" if sparse else "ell",
            use_pallas=sparse, mask_format="tiles" if sparse else "dense",
        ),
    ).validate()
    t0 = time.time()
    trainer = Trainer(
        cfg, dataset=ds, adj_merge=np.asarray(f["adj"], np.float32),
        adj_pa=np.asarray(f["stag"], np.float32),
        experiments_root=os.path.join(out_dir, "jax_runs"),
    )
    out = trainer.run()
    wall = time.time() - t0
    path_tag = "-bell-tiles" if sparse else ""
    result = {
        "side": f"dstagnn_drought_tpu-{compute_dtype}{path_tag}",
        "epochs": epochs,
        "best_epoch": out["best_epoch"], "best_val": out["best_val"],
        "test_loss": out["test_loss"], "report": out["report"],
        "wall_seconds": round(wall, 1),
    }
    name = f"result_jax{'_sparse' if sparse else ''}{SUFFIX}.json"
    with open(os.path.join(out_dir, name), "w") as fh:
        json.dump(result, fh, indent=1)
    print("jax overall:", out["report"]["overall"], f"wall={wall:.0f}s")


# ---------------------------------------------------------------------------
# 50-step identical-weights trajectory parity at PEMS08 shapes
# ---------------------------------------------------------------------------

def run_traj(out_dir: str, steps: int = 50, batch: int = 16):
    import torch

    torch.set_num_threads(max(1, os.cpu_count() - 1))
    sys.path.insert(0, "/root/reference")
    import jax
    import jax.numpy as jnp
    import optax
    from model.DSTAGNN_my import make_model as ref_make_model

    from dstagnn_drought_tpu.models.dstagnn import (
        ModelSpec, apply, import_torch_state_dict,
    )
    from dstagnn_drought_tpu.ops.nn import smooth_l1_loss
    from dstagnn_drought_tpu.training.step import make_optimizer

    f = load_dataset(out_dir)
    adj, stag = f["adj"], f["stag"]
    x = f["train_x"][:batch]
    y = f["train_y"][:batch]

    torch.manual_seed(SEED)
    net = ref_make_model(
        "cpu", 1, 4, 1, 3, 32, 32, 1, adj, stag.astype(np.float64), adj,
        T_PRED, T_IN, N_NODES, 512, 32, 32, 3,
    )
    net.eval()  # dropout off on both sides so trajectories are comparable
    criterion = torch.nn.SmoothL1Loss()
    opt = torch.optim.Adam(net.parameters(), lr=LR)
    spec = ModelSpec(
        num_of_vertices=N_NODES, len_input=T_IN, num_for_predict=T_PRED,
        num_of_d=1, nb_block=4, in_channels=1, K=3, nb_chev_filter=32,
        nb_time_filter=32, d_model=512, d_k=32, n_heads=3,
    )
    params = import_torch_state_dict(net.state_dict(), spec)
    polys = jnp.stack([
        jnp.asarray(t.numpy())
        for t in net.BlockList[0].cheb_conv_SAt.cheb_polynomials
    ])
    consts = dict(adj_pa=jnp.asarray(stag, jnp.float32), cheb_polys=polys)

    # ---- torch trajectory ----
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    ref_losses = []
    t0 = time.time()
    for _ in range(steps):
        opt.zero_grad()
        loss = criterion(net(xt), yt)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))
    t_ref = time.time() - t0

    # ---- our trajectory, same initial weights ----
    optimizer = make_optimizer(LR)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = apply(p, jnp.asarray(x), spec=spec, deterministic=True,
                         **consts)
            return smooth_l1_loss(pred, jnp.asarray(y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        our_losses.append(float(loss))
    t_jax = time.time() - t0

    rel = np.abs(np.asarray(our_losses) - np.asarray(ref_losses)) / np.asarray(
        ref_losses
    )
    result = {
        "steps": steps, "batch": batch,
        "ref_losses": ref_losses, "jax_losses": our_losses,
        "max_rel_dev": float(rel.max()), "final_rel_dev": float(rel[-1]),
        "ref_seconds": round(t_ref, 1), "jax_seconds": round(t_jax, 1),
    }
    with open(os.path.join(out_dir, "result_traj.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(
        f"trajectory parity over {steps} steps @ PEMS08 shapes: "
        f"max rel dev {rel.max():.2e}, final {rel[-1]:.2e} "
        f"(loss {ref_losses[-1]:.4f} ref vs {our_losses[-1]:.4f} jax)"
    )


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

def run_report(out_dir: str):
    rows = []
    for name in (f"result_ref{SUFFIX}.json", f"result_jax{SUFFIX}.json",
                 f"result_jax_sparse{SUFFIX}.json"):
        p = os.path.join(out_dir, name)
        if not os.path.exists(p):
            print(f"missing {p}")
            continue
        with open(p) as fh:
            rows.append(json.load(fh))
    print("| side | epochs | best val | test MAE | RMSE | MAPE % |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        o = r["report"]["overall"]
        print(
            f"| {r['side']} | {r['epochs']} | {r['best_val']:.4f} "
            f"| {o['mae']:.3f} | {o['rmse']:.3f} | {o['mape']:.3f} |"
        )
    for r in rows:
        per = r["report"]["per_horizon"]
        h = " ".join(f"{p['mae']:.2f}" for p in per)
        print(f"per-horizon MAE ({r['side']}): {h}")
    p = os.path.join(out_dir, "result_traj.json")
    if os.path.exists(p):
        with open(p) as fh:
            t = json.load(fh)
        print(
            f"trajectory parity: {t['steps']} steps, max rel dev "
            f"{t['max_rel_dev']:.2e}, final {t['final_rel_dev']:.2e}"
        )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", required=True,
                    choices=["data", "ref", "jax", "traj", "report"])
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--graphs", choices=["synth", "pems04"], default="synth")
    ap.add_argument("--sparse", action="store_true",
                    help="jax side: BELL tile-resident spatial path")
    ap.add_argument("--out-dir", default=os.path.join(REPO, "benchmarks",
                                                      "parity_runs"))
    args = ap.parse_args(argv)
    if args.graphs == "pems04":
        global N_NODES, SUFFIX
        N_NODES = 307
        SUFFIX = "_pems04real"
    os.makedirs(args.out_dir, exist_ok=True)
    if args.side == "data":
        build_dataset(args.out_dir)
    elif args.side == "ref":
        run_ref(args.out_dir, args.epochs)
    elif args.side == "jax":
        run_jax(args.out_dir, args.epochs, sparse=args.sparse)
    elif args.side == "traj":
        run_traj(args.out_dir, steps=args.steps)
    else:
        run_report(args.out_dir)


if __name__ == "__main__":
    main()
