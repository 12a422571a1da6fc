"""STAG construction CLI — equivalent of the reference's ``data/STAG_gen.py``
(exact OT) and ``data/fast_STAG_gen.py`` (PCA approximation), on device.

Usage:
    python -m dstagnn_drought_tpu.cli.stag_gen --input data.npz --dataset GAMBIA
    python -m dstagnn_drought_tpu.cli.stag_gen --input data.npz --dataset GAMBIA --method fast
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from dstagnn_drought_tpu.data.stag import generate_stag


def main(argv=None):
    parser = argparse.ArgumentParser(description="STA-graph generator (TPU)")
    parser.add_argument("--input", required=True, help="raw signal .npz path")
    parser.add_argument("--dataset", required=True, help="dataset name tag")
    parser.add_argument("--sparsity", type=float, default=0.01)
    parser.add_argument("--method", choices=("sinkhorn", "fast"), default="sinkhorn")
    parser.add_argument("--order", choices=("reference", "similar"), default="reference",
                        help="row-selection semantics; see data/stag.py docstring")
    parser.add_argument("--eps", type=float, default=0.01,
                        help="Sinkhorn entropic regularization")
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--block-size", type=int, default=4096,
                        help="node pairs per device batch")
    parser.add_argument("--out-dir", default=None,
                        help="output directory (default: alongside the input)")
    args = parser.parse_args(argv)

    with np.load(args.input) as f:
        data = f["data"]
    if data.ndim == 4:
        data = data.squeeze(axis=2)
    out_dir = args.out_dir or os.path.dirname(os.path.abspath(args.input))

    t0 = time.time()
    sta, A, R, (a_path, r_path) = generate_stag(
        data, args.dataset, out_dir,
        sparsity=args.sparsity, method=args.method, order=args.order,
        eps=args.eps, num_iters=args.iters, block_size=args.block_size,
        progress=True,
    )
    print(f"done in {(time.time() - t0) / 60:.1f} min")
    print(f"STA matrix: {sta.shape}; edges/row: {A.sum(1).mean():.1f}")
    print(f"wrote {a_path}\nwrote {r_path}")


if __name__ == "__main__":
    main()
