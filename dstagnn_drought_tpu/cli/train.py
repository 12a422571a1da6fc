"""Training CLI — the reference's ``train_DSTAGNN_my.py`` equivalent.

Usage:
    python -m dstagnn_drought_tpu.cli.train --config configurations/PEMS08_dstagnn.conf

Differences from the reference entry point (train_DSTAGNN_my.py):
  * parallelism is a jax.sharding Mesh (``--data-axis``/``--graph-axis``)
    instead of xmp.spawn 8-process forking, with properly sharded sampling;
  * ``--resume`` performs a true resume (params + optimizer state + epoch)
    instead of the reference's cosmetic ``start_epoch`` offset;
  * metrics land in ``<run_dir>/metrics.jsonl``; the final test prints the
    per-horizon MAE/RMSE/MAPE table the reference's report utilities produce.
"""
from __future__ import annotations

import argparse

from dstagnn_drought_tpu.config import load_config


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train DSTAGNN (TPU-native)")
    parser.add_argument(
        "--config", default="configurations/PEMS04_dstagnn.conf",
        help="reference-format INI config path",
    )
    parser.add_argument("--epochs", type=int, default=None,
                        help="override [Training] epochs")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in the run dir")
    parser.add_argument("--experiments-root", default="myexperiments")
    parser.add_argument("--data-axis", type=int, default=None,
                        help="mesh axis size for data parallelism")
    parser.add_argument("--graph-axis", type=int, default=None,
                        help="mesh axis size for node (graph) partitioning")
    parser.add_argument("--bfloat16", action="store_true",
                        help="bfloat16 compute (params stay fp32)")
    parser.add_argument("--use-pallas", action="store_true",
                        help="fused Pallas kernels on the Chebyshev-attention path")
    parser.add_argument("--tensorboard", action="store_true",
                        help="write TensorBoard scalars to <run_dir>/tb "
                             "alongside metrics.jsonl")
    parser.add_argument("--profile", metavar="LOGDIR", default=None,
                        help="write a jax.profiler trace of the first epoch "
                             "(view in TensorBoard/Perfetto)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host init (jax.distributed) before mesh "
                             "construction; auto-detected from coordinator env")
    args = parser.parse_args(argv)

    if args.distributed:
        from dstagnn_drought_tpu.parallel.mesh import maybe_initialize_distributed

        maybe_initialize_distributed()

    cfg = load_config(args.config)
    if args.bfloat16:
        cfg.training.compute_dtype = "bfloat16"
    if args.use_pallas:
        cfg.training.use_pallas = True
    if args.tensorboard:
        cfg.training.tensorboard = True

    mesh = None
    if args.data_axis or args.graph_axis:
        from dstagnn_drought_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_axis, args.graph_axis)
        cfg.training.data_axis = mesh.shape["data"]
        cfg.training.graph_axis = mesh.shape["graph"]

    from dstagnn_drought_tpu.training.loop import Trainer

    trainer = Trainer(cfg, mesh=mesh, experiments_root=args.experiments_root)
    if args.resume:
        trainer.resume()
    if args.profile:
        from dstagnn_drought_tpu.training.profiling import trace

        with trace(args.profile):
            loss = trainer.train_epoch(trainer.epoch)
        trainer.logger.log("profile", logdir=args.profile, epoch=trainer.epoch,
                           train_loss=loss)
        trainer.epoch += 1
    result = trainer.run(args.epochs)

    print(f"\nbest epoch: {result['best_epoch']}  val loss: {result['best_val']:.4f}")
    print(f"{'horizon':>7} {'MAE':>8} {'RMSE':>8} {'MAPE%':>8}")
    for row in result["report"]["per_horizon"]:
        print(f"{row['horizon']:>7} {row['mae']:>8.2f} {row['rmse']:>8.2f} "
              f"{row['mape']:>8.2f}")
    o = result["report"]["overall"]
    print(f"{'all':>7} {o['mae']:>8.2f} {o['rmse']:>8.2f} {o['mape']:>8.2f}")
    return result


if __name__ == "__main__":
    main()
