"""Device meshes for the framework's two parallel axes.

The reference's entire parallelism story is 8-way torch_xla data parallelism
via ``xmp.spawn`` + AllReduce in ``xm.optimizer_step`` (reference:
train_DSTAGNN_my.py:158,194-197) — with the defect that every replica iterates
the full dataset (no DistributedSampler). Here parallelism is a
``jax.sharding.Mesh`` with two named axes:

  * ``'data'``  — batch (time-window) parallelism; GSPMD inserts the gradient
    AllReduce exactly where torch_xla's optimizer_step did, but with properly
    sharded sampling.
  * ``'graph'`` — node-axis partitioning (this workload's analogue of
    sequence parallelism: the scaling dimension is N, not T — SURVEY.md §5);
    spatial attention and Chebyshev aggregation shard over node blocks.

On a multi-host pod slice, call ``jax.distributed.initialize()`` before
building the mesh; ICI carries the 'graph' halo traffic, DCN the 'data'
gradient reduction.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host runtime init (the reference's ``xmp.spawn`` analogue at pod
    scale — reference train_DSTAGNN_my.py:194-197, SURVEY.md §2.3).

    Explicit arguments win; otherwise initialize only when the standard
    coordinator env vars (JAX_COORDINATOR_ADDRESS / cloud-TPU metadata) are
    present, so single-host runs never pay the rendezvous. Returns True when
    ``jax.distributed.initialize`` was called.
    """
    import os

    if jax.process_count() > 1:  # already initialized
        return False
    explicit = coordinator_address is not None
    if not explicit and not (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    ):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def factor_devices(n: int, graph_axis: int | None = None) -> tuple[int, int]:
    """Choose (data, graph) axis sizes for n devices.

    With no explicit request: put up to 4 ways on 'graph' (node partitioning
    scales best over ICI for the big-N datasets), rest on 'data'.
    """
    if graph_axis is not None:
        if n % graph_axis:
            raise ValueError(f"graph_axis={graph_axis} must divide device count {n}")
        return n // graph_axis, graph_axis
    g = 1
    for cand in (4, 2):
        if n % cand == 0 and n >= cand:
            g = cand
            break
    return n // g, g


def make_mesh(
    data_axis: int | None = None,
    graph_axis: int | None = None,
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis is not None and graph_axis is not None:
        if data_axis * graph_axis != n:
            raise ValueError(
                f"data_axis*graph_axis = {data_axis * graph_axis} != {n} devices"
            )
        d, g = data_axis, graph_axis
    else:
        d, g = factor_devices(n, graph_axis)
    mesh_devices = np.asarray(devices).reshape(d, g)
    return Mesh(mesh_devices, axis_names=("data", "graph"))
