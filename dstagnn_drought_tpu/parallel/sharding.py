"""NamedSharding helpers and in-model sharding constraints."""
from __future__ import annotations

import logging

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, shard_nodes: bool = True) -> NamedSharding:
    """Sharding for (B, N, ...) batches: batch over 'data', nodes over 'graph'."""
    if shard_nodes:
        return NamedSharding(mesh, P("data", "graph"))
    return NamedSharding(mesh, P("data"))


def tat_tp_shardings(params, mesh: Mesh):
    """Tensor-parallel placement for the temporal-attention projections.

    d_model = num_of_vertices in this architecture (reference
    model/DSTAGNN_my.py:69-100,210), so the TAt ``Linear(N → H·d_k)`` /
    ``Linear(H·d_v → N)`` pairs are the largest parameters at large graphs
    (GAMBIA N=2139). This shards their head-projection dim over the existing
    'graph' axis (folded TP — no extra mesh axis): wq/wk/wv split on the
    output H·d dim, wo on its input H·d dim; GSPMD then computes each
    projection as a fully sharded matmul (contract N, psum) with the qkv /
    context activations sharded on h, and inserts the AllReduce after the
    out-projection. Everything else stays replicated.

    Returns a pytree of NamedShardings matching ``params`` (suitable for
    ``jax.device_put``; apply the same tree to the Adam state). A TAt weight
    whose head dim is not divisible by the 'graph' axis is placed replicated
    — that fallback is LOGGED (once per call, with the shapes involved) so
    `tp = true` on an incompatible mesh is never a silent no-op; use
    :func:`tp_report` for a programmatic sharded/fallback accounting.
    """
    col = NamedSharding(mesh, P(None, "graph"))   # (N, H·d) split on heads
    row = NamedSharding(mesh, P("graph", None))   # (H·d, N) split on input
    repl = NamedSharding(mesh, P())

    g = mesh.shape["graph"]
    fallbacks: list[str] = []

    def place(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "tat" in keys:
            name = keys[-1]
            if name in ("wq", "wk", "wv"):
                if leaf.shape[-1] % g == 0:
                    return col
                fallbacks.append(f"{name}{tuple(leaf.shape)}")
            elif name == "wo":
                if leaf.shape[0] % g == 0:
                    return row
                fallbacks.append(f"{name}{tuple(leaf.shape)}")
        return repl

    tree = jax.tree_util.tree_map_with_path(place, params)
    if fallbacks:
        logger.warning(
            "tat_tp_shardings: %d TAt weights fell back to REPLICATED "
            "placement (head dim not divisible by graph axis %d): %s — "
            "tensor parallelism is a no-op for these.",
            len(fallbacks), g, ", ".join(sorted(set(fallbacks))),
        )
    return tree


def tp_report(params, mesh: Mesh) -> dict:
    """Per-device parameter-byte accounting for :func:`tat_tp_shardings`.

    Returns {'sharded_tat_bytes', 'replicated_tat_bytes', 'total_bytes',
    'per_device_bytes_tp', 'per_device_bytes_replicated', 'fallback': bool}.
    TAt weights that shard divide their bytes by the 'graph' axis size;
    everything else is replicated on every device.
    """
    g = mesh.shape["graph"]
    sh_tree = tat_tp_shardings(params, mesh)
    sharded = repl = 0

    def acc(leaf, sh):
        nonlocal sharded, repl
        n = leaf.size * leaf.dtype.itemsize
        if sh.is_fully_replicated:
            repl += n
        else:
            sharded += n

    jax.tree.map(acc, params, sh_tree)
    total = sharded + repl
    return {
        "sharded_tat_bytes": sharded,
        "replicated_bytes": repl,
        "total_bytes": total,
        "per_device_bytes_tp": repl + sharded // g,
        "per_device_bytes_replicated": total,
        "fallback": sharded == 0,
    }


def constrain_batch(x: jax.Array, mesh: Mesh | None, shard_nodes: bool = True):
    """Constrain a (B, N, ...) activation to the mesh layout; no-op without a
    mesh. GSPMD propagates this through the model body and inserts the
    all-gathers/reduces the spatial ops need."""
    if mesh is None:
        return x
    spec = ("data", "graph") if shard_nodes else ("data",)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec, *([None] * (x.ndim - len(spec)))))
    )
