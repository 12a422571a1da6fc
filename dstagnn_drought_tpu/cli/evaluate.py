"""Evaluation CLI — the reference's ``predict_and_save_results_mstgcn`` path
(lib/utils1.py:434-506) as a standalone command: load a checkpoint, predict a
split, dump predictions npz, print the per-horizon MAE/RMSE/MAPE table.

Usage:
    python -m dstagnn_drought_tpu.cli.evaluate --config <conf> [--split test]
        [--checkpoint path/epoch_N.params.npz]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from dstagnn_drought_tpu.config import load_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a trained DSTAGNN")
    parser.add_argument("--config", required=True)
    parser.add_argument("--split", choices=("train", "val", "test"), default="test")
    parser.add_argument("--checkpoint", default=None,
                        help="explicit checkpoint; default: latest in run dir")
    parser.add_argument("--experiments-root", default="myexperiments")
    parser.add_argument("--export-attention", action="store_true",
                        help="dump per-block spatial attention for one sample "
                             "(npz + CSV + heatmap PNG; the reference's legacy "
                             "Excel/heatmap export, lib/utils.py:552-589)")
    parser.add_argument("--attention-sample", type=int, default=24,
                        help="sample index for --export-attention "
                             "(reference grabs batch 24)")
    args = parser.parse_args(argv)

    cfg = load_config(args.config)

    from dstagnn_drought_tpu.training import checkpoint as ckpt
    from dstagnn_drought_tpu.training.loop import Trainer
    from dstagnn_drought_tpu.training.metrics import horizon_report

    trainer = Trainer(cfg, experiments_root=args.experiments_root)
    path = args.checkpoint or ckpt.latest_checkpoint(trainer.run_dir)
    if path is None:
        raise SystemExit(f"no checkpoint found under {trainer.run_dir}")
    params, _, _, meta = ckpt.restore_checkpoint(path, params_template=trainer.params)
    import jax

    trainer.params = jax.device_put(params)
    print(f"loaded {path} (epoch {meta.get('epoch', '?')})")

    pred, loss = trainer.evaluate(args.split)
    target = getattr(trainer.dataset, args.split).target
    report = horizon_report(target, pred, null_val=0)

    out = os.path.join(
        trainer.run_dir, f"output_epoch_{meta.get('epoch', 0)}_{args.split}.npz"
    )
    np.savez(out, prediction=pred, data_target_tensor=target)
    print(f"loss: {loss:.4f}; predictions saved to {out}")
    print(f"{'horizon':>7} {'MAE':>8} {'RMSE':>8} {'MAPE%':>8}")
    for row in report["per_horizon"]:
        print(f"{row['horizon']:>7} {row['mae']:>8.2f} {row['rmse']:>8.2f} "
              f"{row['mape']:>8.2f}")
    o = report["overall"]
    print(f"{'all':>7} {o['mae']:>8.2f} {o['rmse']:>8.2f} {o['mape']:>8.2f}")

    if args.export_attention:
        maps = trainer.attention_maps(args.split, args.attention_sample)
        att_npz = os.path.join(trainer.run_dir, f"attention_{args.split}.npz")
        np.savez(att_npz, **{f"block_{i}": m for i, m in enumerate(maps)})
        # head-0 map of the first block as CSV (reference exported Excel;
        # openpyxl isn't a dependency here so CSV is the tabular format)
        head0 = maps[0][0]
        csv_path = os.path.join(trainer.run_dir, f"attention_{args.split}.csv")
        np.savetxt(csv_path, head0, delimiter=",")
        png_path = os.path.join(trainer.run_dir, f"attention_{args.split}.png")
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 5))
            im = ax.imshow(head0, cmap="viridis", aspect="auto")
            ax.set_xlabel("target node")
            ax.set_ylabel("source node")
            fig.colorbar(im, ax=ax)
            fig.savefig(png_path, dpi=120, bbox_inches="tight")
            plt.close(fig)
        except Exception as exc:  # matplotlib optional — CSV/npz still written
            print(f"heatmap skipped: {exc}")
            png_path = None
        print(f"attention maps: {att_npz} {csv_path}"
              + (f" {png_path}" if png_path else ""))
    return report


if __name__ == "__main__":
    main()
