"""NamedSharding helpers and in-model sharding constraints."""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    ``jax.device_put``; apply the same tree to the Adam state).
    """
    col = NamedSharding(mesh, P(None, "graph"))   # (N, H·d) split on heads
    row = NamedSharding(mesh, P("graph", None))   # (H·d, N) split on input
    repl = NamedSharding(mesh, P())

    g = mesh.shape["graph"]

    def place(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "tat" in keys:
            if keys[-1] in ("wq", "wk", "wv") and leaf.shape[-1] % g == 0:
                return col
            if keys[-1] == "wo" and leaf.shape[0] % g == 0:
                return row
        return repl

    return jax.tree_util.tree_map_with_path(place, params)


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
