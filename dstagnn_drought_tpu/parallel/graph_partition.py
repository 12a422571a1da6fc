"""Node-partitioned sparse graph ops via shard_map over the 'graph' axis.

The node axis N is this workload's scaling dimension (SURVEY.md §5 —
"long-context" here means many graph nodes, not long sequences). Each device
owns a contiguous block of *target* nodes; aggregation needs *source* node
features that may live on other shards — the halo.

Round-1 implementation: the halo is satisfied with one ``all_gather`` of the
(B, N_local, C·T) feature shards over ICI (jax.lax.all_gather with
tiled=True), followed by purely local SDDMM → masked softmax → ELL
aggregation for the device's target block. For top-1% STAG sparsity the
local compute is O(N_local·E); the all-gather moves B·N·C·T·4 bytes per
step — the same volume GSPMD inserts for the dense path, and the simplest
correctness-first halo. A targeted ppermute halo (exchanging only boundary
rows each neighbour actually references) is the planned refinement.

ELL sharding: ``indices``/``mask`` rows are target-partitioned with the same
layout as the outputs, so every device holds exactly its targets' edges with
*global* source ids into the gathered feature buffer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from dstagnn_drought_tpu.ops.sparse import EllGraph


def pad_nodes_for_mesh(n: int, graph_axis: int) -> int:
    """Targets must split evenly over the 'graph' axis; pad with isolated
    dummy nodes (mask all-False ⇒ they aggregate nothing)."""
    return -(-n // graph_axis) * graph_axis


def shard_ell(ell: EllGraph, graph_axis: int) -> EllGraph:
    """Pad an ELL graph so its target axis splits evenly over the mesh."""
    n = ell.num_nodes
    n_pad = pad_nodes_for_mesh(n, graph_axis)
    if n_pad == n:
        return ell
    extra = n_pad - n
    pad_idx = jnp.tile(
        jnp.arange(n, n_pad, dtype=ell.indices.dtype)[:, None],
        (1, ell.max_degree),
    )
    indices = jnp.concatenate([ell.indices, pad_idx], axis=0)
    mask = jnp.concatenate(
        [ell.mask, jnp.zeros((extra, ell.max_degree), bool)], axis=0
    )
    return EllGraph(indices, mask)


def make_partitioned_sparse_conv(mesh: Mesh, n_heads: int, d_k: int):
    """Build a shard_map'd sparse spatial-attention Chebyshev conv.

    Returns f(emb, x, ell, cheb_edges, bias_edges, thetas, wq, wk) → out,
    where the node axes of emb/x/ell/cheb_edges/bias_edges/out are sharded
    over 'graph' and everything else is replicated. Node counts must be
    divisible by the 'graph' axis (see ``shard_ell``).
    """
    node_sharded2 = P(None, "graph")          # (B, N, ...) activations
    edge_sharded = P(None, "graph", None)     # (K, N, E) edge planes
    repl = P()

    def local_fn(emb, x, idx, msk, cheb_e, bias_e, thetas, wq, wk):
        # emb: (B, nloc, d_model); x: (B, nloc, C, T); idx/msk: (nloc_t?, E)
        B, nloc, C, T = x.shape
        # 1) halo: gather all source features/embeddings across the axis
        emb_full = jax.lax.all_gather(emb, "graph", axis=1, tiled=True)
        x_full = jax.lax.all_gather(
            x.reshape(B, nloc, C * T), "graph", axis=1, tiled=True
        )
        # 2) local SDDMM for this device's targets
        q = jnp.einsum("bnd,dh->bnh", emb_full, wq).reshape(
            B, -1, n_heads, d_k
        )
        k = jnp.einsum("bnd,dh->bnh", emb, wk).reshape(B, nloc, n_heads, d_k)
        q_src = q[:, idx]  # (B, nloc, E, H, d_k)
        s = jnp.einsum("bjehd,bjhd->bhje", q_src, k) / jnp.sqrt(
            jnp.asarray(d_k, x.dtype)
        )
        # 3) masked softmax over source edges + modulated aggregation
        s = s + bias_e[None]
        s = jnp.where(msk[None, None], s, jnp.asarray(-1e30, s.dtype))
        att = jax.nn.softmax(s, axis=-1)
        A = cheb_e[None] * att * msk[None, None]
        x_src = x_full[:, idx]  # (B, nloc, E, C·T)
        agg = jnp.einsum("bkje,bjem->bkjm", A, x_src).reshape(
            B, A.shape[1], nloc, C, T
        )
        out = jnp.einsum("bkjct,kco->bjot", agg, thetas)
        return jax.nn.relu(out)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            node_sharded2,              # emb
            node_sharded2,              # x
            P("graph", None),           # ell indices (targets sharded)
            P("graph", None),           # ell mask
            edge_sharded,               # cheb_edges
            edge_sharded,               # bias_edges
            repl,                       # thetas
            repl,                       # wq
            repl,                       # wk
        ),
        out_specs=node_sharded2,
    )


def partitioned_sparse_conv(
    mesh: Mesh,
    emb: jax.Array,
    x: jax.Array,
    ell: EllGraph,
    *,
    cheb_edges: jax.Array,
    bias_edges: jax.Array,
    thetas: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    n_heads: int,
    d_k: int,
) -> jax.Array:
    """Convenience wrapper: places operands, runs the shard_map'd conv."""
    f = make_partitioned_sparse_conv(mesh, n_heads, d_k)
    return f(emb, x, ell.indices, ell.mask, cheb_edges, bias_edges, thetas, wq, wk)
