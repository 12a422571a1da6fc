"""Node-partitioned block-sparse (BELL) spatial conv — the MXU-shaped sparse
path composed with the 'graph' mesh axis.

The fused BELL kernel (ops/pallas/bell_fused.py) streams one active 128×128
tile at a time; its natural partitioning unit is the **target tile**: each
device owns a contiguous range of target tiles (= 128-row output blocks) and
runs the SAME fused kernel on its local tile list. Source features are made
available with one ``all_gather`` over the 'graph' axis — for the modest
per-step feature volume of this model family (B·N·C·T) that is the identical
volume GSPMD inserts for the dense path, and it keeps the kernel untouched
(the kernel already takes *global* source ids; only k/outputs are local).
A block-row targeted halo (ship only referenced source blocks) is the same
optimization the ELL path's :mod:`graph_partition` does and can be layered
under this plan later; the gather version is the correctness + scaling
baseline.

Host-side, :func:`build_bell_shard_plan` splits a :class:`BlockEllGraph`
into per-shard tile lists stacked on a leading shard axis (sharded over
'graph' in the shard_map), padding the tile count to the shard count and the
active lists to a common length. The per-shard kernel call is rectangular:
q/x cover all Np source rows, k and the output cover only the shard's
NJ_loc·BS target rows (ops/pallas/bell_fused.py handles rectangular shapes).

Reference hot loop this scales: /root/reference/model/DSTAGNN_my.py:117-133.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from dstagnn_drought_tpu.ops.block_sparse import BlockEllGraph


@dataclasses.dataclass(frozen=True)
class BellShardPlan:
    """Per-shard BELL tile lists, stacked on a leading shard axis."""

    block_idx: np.ndarray   # (P, NJ_loc, S) int32 — global source block ids
    pattern: np.ndarray     # (P, NJ_loc, S, BS, BS) f32 edge patterns
    a_src: np.ndarray       # (P, A_loc) int32 — global source block ids
    a_tgt: np.ndarray       # (P, A_loc) int32 — LOCAL target tile ids
    tile_start: np.ndarray  # (P, NJ_loc) int32 — offsets into the local list
    tile_count: np.ndarray  # (P, NJ_loc) int32
    adj_bool: np.ndarray    # (Np, Np) bool — padded global edge pattern
    n_nodes: int            # true node count N
    block_size: int
    num_shards: int

    @property
    def padded_nodes(self) -> int:
        return self.block_idx.shape[0] * self.block_idx.shape[1] * \
            self.block_size

    @property
    def tiles_per_shard(self) -> int:
        return self.block_idx.shape[1]


def build_bell_shard_plan(
    bell: BlockEllGraph, num_shards: int
) -> BellShardPlan:
    """Split a BlockEllGraph's target tiles across ``num_shards`` devices.

    The tile count is padded to a shard multiple with inert tiles (one
    all-False-pattern self slot: softmax output there is finite garbage that
    the caller slices away; gradients through it are exactly zero because
    the modulated weights are pattern-masked). Per-shard active lists are
    padded to a common length with entries past every tile's window.
    """
    if bell.active_src is None or bell.tile_start is None:
        raise ValueError("build_bell_shard_plan needs the active-tile list; "
                         "build the graph with block_ell_from_adjacency().")
    P_ = num_shards
    NJ = bell.num_tiles
    S = bell.max_blocks
    BS = bell.block_size
    NJ_pad = -(-NJ // P_) * P_
    NJ_loc = NJ_pad // P_

    block_idx = np.zeros((NJ_pad, S), np.int32)
    pattern = np.zeros((NJ_pad, S, BS, BS), np.float32)
    counts = np.zeros(NJ_pad, np.int32)
    block_idx[:NJ] = np.asarray(bell.block_idx)
    valid = np.asarray(bell.pattern) & np.asarray(
        bell.block_mask)[:, :, None, None]
    pattern[:NJ] = valid.astype(np.float32)
    counts[:NJ] = np.asarray(bell.tile_count)
    # inert pad tiles: one self slot, empty pattern
    for j in range(NJ, NJ_pad):
        block_idx[j, 0] = j
        counts[j] = 1

    # global active list (pad tiles appended in target order)
    a_src_g = list(np.asarray(bell.active_src))
    a_tgt_g = list(np.asarray(bell.active_tgt))
    for j in range(NJ, NJ_pad):
        a_src_g.append(j)
        a_tgt_g.append(j)
    a_src_g = np.asarray(a_src_g, np.int32)
    a_tgt_g = np.asarray(a_tgt_g, np.int32)
    starts_g = np.r_[0, np.cumsum(counts)[:-1]].astype(np.int32)

    A_loc = int(max(
        counts[r * NJ_loc:(r + 1) * NJ_loc].sum() for r in range(P_)
    ))
    A_loc = max(A_loc, 1)
    a_src = np.zeros((P_, A_loc), np.int32)
    a_tgt = np.zeros((P_, A_loc), np.int32)
    tile_start = np.zeros((P_, NJ_loc), np.int32)
    tile_count = np.zeros((P_, NJ_loc), np.int32)
    for r in range(P_):
        lo_tile = r * NJ_loc
        lo = starts_g[lo_tile]
        hi = lo + counts[lo_tile:lo_tile + NJ_loc].sum()
        seg = slice(lo, hi)
        n_seg = hi - lo
        a_src[r, :n_seg] = a_src_g[seg]
        a_tgt[r, :n_seg] = a_tgt_g[seg] - lo_tile
        tile_start[r] = starts_g[lo_tile:lo_tile + NJ_loc] - lo
        tile_count[r] = counts[lo_tile:lo_tile + NJ_loc]

    Np = NJ_pad * BS
    adj_bool = np.zeros((Np, Np), bool)
    ab = np.asarray(bell.adj_bool)
    adj_bool[: ab.shape[0], : ab.shape[1]] = ab
    return BellShardPlan(
        block_idx=block_idx.reshape(P_, NJ_loc, S),
        pattern=pattern.reshape(P_, NJ_loc, S, BS, BS),
        a_src=a_src, a_tgt=a_tgt,
        tile_start=tile_start, tile_count=tile_count,
        adj_bool=adj_bool, n_nodes=bell.n_nodes,
        block_size=BS, num_shards=P_,
    )


def make_partitioned_bell_conv(mesh: Mesh, plan: BellShardPlan,
                               n_heads: int, d_k: int,
                               interpret: bool | None = None):
    """Shard_map'd fused-BELL spatial conv over the 'graph' axis.

    f(emb, x_tm, biasm_p, cheb_p, thetas, wq, wk) → (B, Np, nt·Co) t-major,
    with emb (B, Np, d_model) / x_tm (B, Np, T·C) node-sharded, the bias and
    cheb planes (H, Np, Np) target-sharded, and weights replicated. The
    caller slices the output back to the true N. ``interpret`` pins the
    kernel's Pallas interpret mode (None → infer from the default backend;
    pass the mesh platform when it differs, e.g. a CPU-device mesh under a
    TPU plugin).
    """
    from dstagnn_drought_tpu.ops.pallas.bell_fused import bell_block_out

    node_sh = P("data", "graph")
    plan_sh_3 = P("graph", None, None)

    def local_fn(emb, x_tm, bi, pat, asrc, atgt, tstart, tcount,
                 biasm_p, cheb_p, thetas, wq, wk):
        bi, pat = bi[0], pat[0]
        asrc, atgt = asrc[0], atgt[0]
        tstart, tcount = tstart[0], tcount[0]
        B = emb.shape[0]
        # local projections; gather the global source rows (q + features)
        q_loc = jnp.einsum("bnd,dh->bnh", emb, wq).astype(jnp.float32)
        k_loc = jnp.einsum("bnd,dh->bnh", emb, wk).astype(jnp.float32)
        q_all = jax.lax.all_gather(q_loc, "graph", axis=1, tiled=True)
        x_all = jax.lax.all_gather(x_tm, "graph", axis=1, tiled=True)
        q = q_all.reshape(B, -1, n_heads, d_k).transpose(0, 2, 1, 3)
        k = k_loc.reshape(B, -1, n_heads, d_k).transpose(0, 2, 1, 3)
        # max_out=None → the XLA slot-scan backward (the fused backward's
        # source-sorted dx pass is single-device for now)
        return bell_block_out(
            (None, interpret), tstart, tcount, asrc, atgt, bi, pat,
            q, k, biasm_p, cheb_p, x_all, thetas,
            None, None, None, None,
        )

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            node_sh,                    # emb
            node_sh,                    # x (t-major (B, Np, T·C))
            plan_sh_3,                  # block_idx (P, NJ_loc, S)
            P("graph", None, None, None, None),   # pattern
            P("graph", None),           # a_src
            P("graph", None),           # a_tgt
            P("graph", None),           # tile_start
            P("graph", None),           # tile_count
            P(None, None, "graph"),     # biasm plane (H, Np, Np_tgt)
            P(None, None, "graph"),     # cheb plane
            P(),                        # thetas
            P(),                        # wq
            P(),                        # wk
        ),
        out_specs=node_sh,
        # pallas_call inside shard_map: the kernel's out_shape carries no
        # varying-mesh-axes annotation, so the vma check cannot run
        check_vma=False,
    )


def partitioned_bell_conv(
    mesh: Mesh,
    emb: jax.Array,           # (B, N, d_model)
    x: jax.Array,             # (B, N, C, T)
    plan: BellShardPlan,
    *,
    adj_pa: jax.Array,
    masks: jax.Array,
    cheb_polys: jax.Array,
    thetas: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    n_heads: int,
    d_k: int,
) -> jax.Array:
    """Model-facing wrapper: pads node axes to the plan's block grid, folds
    the edge-pattern mask into the bias plane, runs the shard_map'd fused
    kernel, and returns (B, N, Co, T). Mirrors
    ``bell_cheb_conv_with_sat_pallas`` (single-device) semantics exactly."""
    B, N, C, T = x.shape
    Np = plan.padded_nodes
    Co = thetas.shape[-1]

    def pad_n(a, axis):
        extra = Np - a.shape[axis]
        if extra == 0:
            return a
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, extra)
        return jnp.pad(a, pad)

    f32 = jnp.float32
    emb_p = pad_n(emb, 1)
    bias_p = pad_n(pad_n((adj_pa[None] * masks).astype(f32), 1), 2)
    biasm_p = jnp.where(jnp.asarray(plan.adj_bool)[None], bias_p,
                        jnp.asarray(-1e30, f32))
    cheb_p = pad_n(pad_n(cheb_polys.astype(f32), 1), 2)
    x_tm = pad_n(x.transpose(0, 1, 3, 2).reshape(B, N, T * C), 1)
    # Mosaic HBM slices along the lane dim must be 128-aligned: pad M = T·C
    # to a multiple of lcm(128, C) with zero t-blocks (sliced off below)
    def _gcd(a, b):
        while b:
            a, b = b, a % b
        return a

    m_step = 128 * C // _gcd(128, C)
    M_pad = -(-(T * C) // m_step) * m_step
    if M_pad != T * C:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, 0), (0, M_pad - T * C)))

    # pin the kernel's interpret decision to the MESH's platform — the
    # default backend may differ (CPU-device mesh under a TPU plugin)
    interpret = next(iter(mesh.devices.flat)).platform.lower() != "tpu"
    f = make_partitioned_bell_conv(mesh, plan, n_heads, d_k,
                                   interpret=interpret)
    out = f(
        emb_p, x_tm,
        jnp.asarray(plan.block_idx), jnp.asarray(plan.pattern),
        jnp.asarray(plan.a_src), jnp.asarray(plan.a_tgt),
        jnp.asarray(plan.tile_start), jnp.asarray(plan.tile_count),
        biasm_p, cheb_p, thetas.astype(f32), wq, wk,
    )
    return out[:, :N, : T * Co].reshape(B, N, T, Co).transpose(0, 1, 3, 2).astype(
        x.dtype
    )
