"""Halo exchange-volume evidence for the targeted block halo (VERDICT r4 #4).

For the GAMBIA flagship graph (N=2139, grid adjacency, RCM-ordered,
block 128) and graph-axis sizes {2, 4, 8}: how many source blocks the
targeted ``all_to_all`` actually moves (referenced / remote) versus what a
naive ``all_gather`` of all source rows would move — the justification of
the routing-table exchange in ``parallel/bell_partition.py``.

North star: BASELINE.json "boundary all-to-all overlapped with neighborhood
aggregation". This script prints one JSON line per shard count; the same
numbers are printed by ``__graft_entry__.dryrun_multichip`` for its dryrun
graph. CPU-only (plan construction is host-side numpy).

Usage: python benchmarks/halo_volume.py [--shards 2 4 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--block-size", type=int, default=128)
    args = ap.parse_args()

    # plan construction is host-side; never touch the TPU tunnel (an
    # explicit assignment — the ambient env pins JAX_PLATFORMS=axon)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax.numpy as jnp

    import gambia_bench as gb
    from dstagnn_drought_tpu.ops.block_sparse import (
        block_ell_from_adjacency,
        rcm_permutation,
    )
    from dstagnn_drought_tpu.ops.graph import (
        cheb_polynomials,
        scaled_laplacian,
    )
    from dstagnn_drought_tpu.parallel.bell_partition import (
        build_bell_tile_shard_plan,
        build_overlap_lists,
    )

    _, coords = gb.synth_drought()
    A = gb.grid_adjacency(coords)
    N = A.shape[0]
    perm = rcm_permutation(A)
    A = A[np.ix_(perm, perm)]
    rng = np.random.default_rng(1)
    pa = (rng.random((N, N)) < 0.01).astype(np.float32)
    np.fill_diagonal(pa, 1)
    bell = block_ell_from_adjacency(A, block_size=args.block_size)
    K = 2
    polys = np.asarray(
        cheb_polynomials(scaled_laplacian(jnp.asarray(A, jnp.float32)), K)
    )
    for P in args.shards:
        plan = build_bell_tile_shard_plan(bell, P, pa, polys)
        stats = plan.halo_stats()
        # overlap split: tiles whose sources are all local run WHILE the
        # exchange is in flight; only sublist B's referenced blocks are
        # EXPOSED (waited on before any of its compute starts)
        ov = build_overlap_lists(plan)
        hidden = stats["referenced_blocks"] - sum(ov.exposed_blocks)
        stats.update(
            {"N": N, "block_size": args.block_size, "rcm": True,
             "local_source_tiles": sum(ov.n_localA),
             "halo_dependent_tiles": stats["blocks_total"]
             - sum(ov.n_localA),
             "exposed_blocks": sum(ov.exposed_blocks),
             "hidden_blocks": hidden,
             "exposed_bytes_per_feature_col": sum(ov.exposed_blocks)
             * args.block_size}
        )
        print(json.dumps(stats))


if __name__ == "__main__":
    main()
