"""Node-partitioned sparse graph ops via shard_map over the 'graph' axis.

The node axis N is this workload's scaling dimension (SURVEY.md §5 —
"long-context" here means many graph nodes, not long sequences). Each device
owns a contiguous block of *target* nodes; aggregation needs *source* node
features that may live on other shards — the halo.

Two halo strategies, both shard_map + explicit collectives:

* **Full gather** (``partitioned_sparse_conv``): one ``all_gather`` of the
  (B, N_local, C·T) feature shards over ICI, then purely local SDDMM →
  masked softmax → ELL aggregation for the device's target block. Moves
  B·N·C·T·4 bytes per step — same volume GSPMD inserts for the dense path.
  Correctness-first baseline; right answer when the graph has no locality.

* **Targeted halo** (``halo_partitioned_sparse_conv``): a host-side
  :func:`build_halo_plan` pass over the static ELL structure precomputes,
  per (sender, receiver) device pair, exactly which boundary rows the
  receiver's edges reference. At step time each device packs only those
  rows (source Q-projections + source features, one fused payload) and one
  ``lax.all_to_all`` delivers them; ELL indices are pre-remapped into the
  [own block ‖ halo slots] local buffer, so the aggregation afterwards is
  identical local code. For spatially-local graphs (STAG after RCM
  reordering — ops/block_sparse.py) the halo is the band boundary, so
  comm volume drops from O(N) to O(boundary) per device — see
  ``halo_stats``. The plan is static: zero step-time index computation.

ELL sharding: ``indices``/``mask`` rows are target-partitioned with the same
layout as the outputs, so every device holds exactly its targets' edges
(global source ids for the gather path, buffer-local ids for the halo path).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
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
    node_sharded2 = P("data", "graph")        # (B, N, ...): batch over data,
                                              # nodes over graph
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


# ---------------------------------------------------------------------------
# Targeted halo exchange
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static exchange schedule for one ELL graph over P node shards.

    Built once on the host from the (static) graph structure; all step-time
    work is gathers with precomputed indices plus one ``all_to_all``.
    """

    local_indices: np.ndarray  # (P, nloc, E) int32 → [own ‖ halo] buffer ids
    mask: np.ndarray           # (P, nloc, E) bool — valid edges
    send_idx: np.ndarray       # (P, P, H) int32 — send_idx[s, r]: rows (local
                               #   to sender s's block) s ships to receiver r
    num_shards: int
    nloc: int
    halo_width: int            # H — max rows any pair exchanges (padded)

    @property
    def buffer_rows(self) -> int:
        """Rows in each device's local source buffer: own block + P halo slots."""
        return self.nloc + self.num_shards * self.halo_width


def build_halo_plan(ell: EllGraph, num_shards: int, *, pad_to: int = 8) -> HaloPlan:
    """Precompute the boundary-row exchange for a target-partitioned ELL graph.

    For each device pair (s → r), finds the unique source rows in s's block
    that r's edges reference, pads the per-pair count to a common width H
    (multiple of ``pad_to`` for lane-friendly shapes), and remaps r's ELL
    indices into its local buffer layout ``[own nloc rows ‖ s0 halo ‖ s1 halo
    ‖ …]``. Masked (padding) edges keep an arbitrary in-range id — their
    scores are −inf'd and their aggregation weights zeroed downstream.
    """
    idx = np.asarray(ell.indices)
    msk = np.asarray(ell.mask)
    N, E = idx.shape
    P_ = num_shards
    if N % P_:
        raise ValueError(f"N={N} must divide over {P_} shards; use shard_ell first")
    nloc = N // P_

    # rows_needed[r][s] = sorted unique sources in s's block referenced by r
    rows_needed = [[None] * P_ for _ in range(P_)]
    h_max = 0
    for r in range(P_):
        t_idx = idx[r * nloc:(r + 1) * nloc]
        t_msk = msk[r * nloc:(r + 1) * nloc]
        src = t_idx[t_msk]
        blk = src // nloc
        for s in range(P_):
            if s == r:
                continue
            sel = np.unique(src[blk == s])
            rows_needed[r][s] = sel
            h_max = max(h_max, len(sel))
    H = max(-(-h_max // pad_to) * pad_to, pad_to)

    send_idx = np.zeros((P_, P_, H), np.int32)
    local_indices = np.zeros((P_, nloc, E), np.int32)
    for r in range(P_):
        remap = np.zeros(N, np.int32)
        remap[r * nloc:(r + 1) * nloc] = np.arange(nloc, dtype=np.int32)
        for s in range(P_):
            if s == r:
                continue
            sel = rows_needed[r][s]
            send_idx[s, r, : len(sel)] = sel - s * nloc
            remap[sel] = nloc + s * H + np.arange(len(sel), dtype=np.int32)
        local_indices[r] = remap[idx[r * nloc:(r + 1) * nloc]]

    return HaloPlan(
        local_indices=local_indices,
        mask=msk.reshape(P_, nloc, E),
        send_idx=send_idx,
        num_shards=P_,
        nloc=nloc,
        halo_width=H,
    )


def halo_stats(plan: HaloPlan) -> dict:
    """Comm accounting: halo rows actually moved vs the all_gather volume."""
    N = plan.nloc * plan.num_shards
    # per device: rows sent = nonzero send slots (H is padded; count uniques
    # is not recoverable post-padding, so report the padded schedule volume —
    # what the wire actually carries)
    rows_sent = plan.halo_width * (plan.num_shards - 1)
    gather_rows = N - plan.nloc
    return {
        "halo_rows_per_device": rows_sent,
        "all_gather_rows_per_device": gather_rows,
        "volume_ratio": rows_sent / max(gather_rows, 1),
        "halo_width": plan.halo_width,
    }


def make_halo_partitioned_sparse_conv(
    mesh: Mesh, plan: HaloPlan, n_heads: int, d_k: int
):
    """Shard_map'd sparse spatial-attention Chebyshev conv with targeted halo.

    Same contract as :func:`make_partitioned_sparse_conv` but the halo is one
    ``lax.all_to_all`` of precomputed boundary rows (source Q-projections and
    source features packed in a single payload) instead of a full
    ``all_gather``. Payload per device: (B, P, H, H·d_k + C·T).
    """
    node_sharded2 = P("data", "graph")  # batch over data, nodes over graph
    edge_sharded = P(None, "graph", None)
    repl = P()
    nloc, H = plan.nloc, plan.halo_width
    hq = n_heads * d_k

    def local_fn(emb, x, lidx, msk, send_idx, cheb_e, bias_e, thetas, wq, wk):
        # emb: (B, nloc, d_model); x: (B, nloc, C, T)
        # lidx/msk arrive (1, nloc, E) — leading axis is the sharded shard id;
        # send_idx arrives (1, P, H): the rows THIS device ships to each peer
        lidx, msk, send_idx = lidx[0], msk[0], send_idx[0]
        B, _, C, T = x.shape
        dt = x.dtype
        # 1) pack payload = [Q-projection of my rows ‖ my features]
        q_own = jnp.einsum("bnd,dh->bnh", emb, wq).astype(dt)
        payload = jnp.concatenate([q_own, x.reshape(B, nloc, C * T)], axis=-1)
        send = payload[:, send_idx]  # (B, P, H, hq + C·T)
        # 2) the halo: one all_to_all delivers each receiver its boundary rows
        recv = jax.lax.all_to_all(send, "graph", split_axis=1, concat_axis=1)
        # 3) local work independent of the halo (overlappable by the XLA
        #    latency-hiding scheduler): target K projection
        k_loc = jnp.einsum("bnd,dh->bnh", emb, wk).reshape(B, nloc, n_heads, d_k)
        # 4) assemble [own ‖ halo] buffer, gather per-edge sources
        buf = jnp.concatenate(
            [payload, recv.reshape(B, -1, payload.shape[-1])], axis=1
        )
        q_src = buf[:, lidx, :hq].reshape(B, nloc, -1, n_heads, d_k)
        s = jnp.einsum("bjehd,bjhd->bhje", q_src, k_loc) / jnp.sqrt(
            jnp.asarray(d_k, dt)
        )
        s = s + bias_e[None]
        s = jnp.where(msk[None, None], s, jnp.asarray(-1e30, s.dtype))
        att = jax.nn.softmax(s, axis=-1)
        A = cheb_e[None] * att * msk[None, None]
        x_src = buf[:, lidx, hq:]  # (B, nloc, E, C·T)
        agg = jnp.einsum("bkje,bjem->bkjm", A, x_src).reshape(
            B, A.shape[1], nloc, C, T
        )
        out = jnp.einsum("bkjct,kco->bjot", agg, thetas)
        return jax.nn.relu(out)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            node_sharded2,             # emb
            node_sharded2,             # x
            P("graph", None, None),    # local_indices (P, nloc, E)
            P("graph", None, None),    # mask (P, nloc, E)
            P("graph", None, None),    # send_idx (P, P, H) — sender-sharded
            edge_sharded,              # cheb_edges
            edge_sharded,              # bias_edges
            repl,                      # thetas
            repl,                      # wq
            repl,                      # wk
        ),
        out_specs=node_sharded2,
    )


def halo_partitioned_sparse_conv(
    mesh: Mesh,
    emb: jax.Array,
    x: jax.Array,
    plan: HaloPlan,
    *,
    cheb_edges: jax.Array,
    bias_edges: jax.Array,
    thetas: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    n_heads: int,
    d_k: int,
) -> jax.Array:
    """Convenience wrapper: places operands, runs the halo-exchange conv.

    Accepts node counts that do NOT divide the 'graph' axis: when the plan
    was built from a :func:`shard_ell`-padded graph (Np = nloc·P > N), the
    node axes of emb/x and the target axes of the edge planes are zero-padded
    up to Np here and the output is sliced back to N. The padding rows are
    isolated (all-False mask in the padded ELL) so they aggregate nothing —
    GAMBIA's N=2139 = 3·23·31 runs on any even-sized mesh this way.
    """
    n = x.shape[1]
    n_pad = plan.nloc * plan.num_shards

    def pad_nodes(a, axis):
        if a.shape[axis] == n_pad:
            return a
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, n_pad - a.shape[axis])
        return jnp.pad(a, pad)

    emb = pad_nodes(emb, 1)
    x = pad_nodes(x, 1)
    cheb_edges = pad_nodes(cheb_edges, 1)
    bias_edges = pad_nodes(bias_edges, 1)
    f = make_halo_partitioned_sparse_conv(mesh, plan, n_heads, d_k)
    out = f(
        emb, x,
        jnp.asarray(plan.local_indices),
        jnp.asarray(plan.mask),
        jnp.asarray(plan.send_idx),
        cheb_edges, bias_edges, thetas, wq, wk,
    )
    return out[:, :n] if n_pad != n else out


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
