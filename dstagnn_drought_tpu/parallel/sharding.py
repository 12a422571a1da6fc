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
