"""Node-partitioned block-sparse (BELL) spatial conv — the MXU-shaped sparse
path composed with the 'graph' mesh axis.

The fused BELL kernel (ops/pallas/bell_fused.py) streams one active 128×128
tile at a time; its natural partitioning unit is the **target tile**: each
device owns a contiguous range of target tiles (= 128-row output blocks) and
runs the SAME fused kernel on its local tile list.

Two plans live here:

* :class:`BellShardPlan` / :func:`partitioned_bell_conv` — the round-2
  correctness baseline: dense-mask (plane) operands, ONE ``all_gather`` of
  all source rows, XLA slot-scan backward.
* :class:`BellTileShardPlan` / :func:`partitioned_bell_tiles_conv` — the
  north-star path (BASELINE.json "boundary all-to-all"): tile-resident
  masks SHARDED over 'graph', a **targeted block halo** that ships only the
  source blocks each shard actually references (one ``all_to_all`` built
  from a precomputed send/recv routing table, volume = Σ referenced blocks
  instead of P·N rows), and the fused K1/K2 Pallas backward running
  per-shard against the shard's COMPACT source table.

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
                               interpret: bool | None = None,
                               check_vma: bool = False):
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
        # varying-mesh-axes annotation, so the vma check cannot run with
        # default settings — tests/test_bell_partition.py pins this (the
        # check_vma knob exists so the regression test notices when a jax
        # upgrade lets the check pass and the suppression can be dropped)
        check_vma=check_vma,
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


# ---------------------------------------------------------------------------
# tile-resident partitioned path: targeted block halo + fused backward
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BellTileShardPlan:
    """Per-shard BELL structure for the tile-resident partitioned path.

    Source blocks are referenced through a per-shard COMPACT table: shard r
    sees only the ``ns_true[r]`` source blocks it actually references
    (padded to ``ns_max``); the routing tables ``send_idx``/``recv_map``
    drive one targeted ``all_to_all`` that fills the table. Every id in
    ``block_idx``/``a_src`` is a compact id. All arrays carry a leading
    shard axis (sharded over 'graph' inside the shard_map).
    """

    # per-shard tile lists (compact source ids)
    block_idx: np.ndarray    # (P, NJ_loc, S) int32
    pattern: np.ndarray      # (P, NJ_loc, S, BS, BS) f32
    tile_start: np.ndarray   # (P, NJ_loc) int32
    tile_count: np.ndarray   # (P, NJ_loc) int32
    a_src: np.ndarray        # (P, A_loc) int32 compact source tile ids
    a_tgt: np.ndarray        # (P, A_loc) int32 local target tile ids
    active_slot: np.ndarray  # (P, A_loc) int32
    # fused-backward source-sorted view (over compact source tiles)
    src_order: np.ndarray    # (P, A_loc) int32
    src_start: np.ndarray    # (P, NS_max) int32
    src_count: np.ndarray    # (P, NS_max) int32
    # targeted-halo routing
    send_idx: np.ndarray     # (P, P, H_max) int32 — local block ids to send
    recv_map: np.ndarray     # (P, NS_max) int32 — flat (owner·H_max+slot)
    # per-active-entry constants (tile-resident operands)
    pattern_act: np.ndarray  # (P, A_loc, BS, BS) bool
    pa_tiles: np.ndarray     # (P, A_loc, BS, BS) f32
    cheb_tiles: np.ndarray   # (P, A_loc, K, BS, BS) f32
    # static sizes
    n_nodes: int
    block_size: int
    num_shards: int
    ns_max: int              # compact source tiles per shard (padded)
    h_max: int               # exchange slots per (owner, dest) pair
    max_out: int             # max outgoing tiles of any compact source
    ns_true: tuple           # true referenced-block count per shard
    a_true: tuple            # true active-entry count per shard
    seg_lo: tuple            # augmented-global-list offset per shard

    @property
    def tiles_per_shard(self) -> int:
        return self.block_idx.shape[1]

    def pack_active(self, values: np.ndarray, fill=0) -> np.ndarray:
        """(A_global, ...) values in BlockEllGraph active-list order →
        (P, A_loc, ...) per-shard layout (pad-tile entries filled).

        Use to carry single-device tile-resident params/constants (e.g.
        ``mask_tiles``) into the partitioned layout."""
        v = np.asarray(values)
        P_ = self.num_shards
        A_loc = self.max_active
        n_pad_entries = sum(self.a_true) - v.shape[0]
        aug = np.concatenate(
            [v, np.full((n_pad_entries,) + v.shape[1:], fill, v.dtype)]
        )
        out = np.full((P_, A_loc) + v.shape[1:], fill, v.dtype)
        for r in range(P_):
            n = self.a_true[r]
            out[r, :n] = aug[self.seg_lo[r]: self.seg_lo[r] + n]
        return out

    @property
    def max_active(self) -> int:
        return self.a_src.shape[1]

    @property
    def padded_nodes(self) -> int:
        return self.num_shards * self.tiles_per_shard * self.block_size

    def halo_stats(self) -> dict:
        """Exchange-volume accounting: targeted halo vs all_gather."""
        P_ = self.num_shards
        NJ_loc = self.tiles_per_shard
        referenced = int(sum(self.ns_true))
        remote = 0
        for r in range(P_):
            # recover global ids via recv_map owner index
            owners = self.recv_map[r][: self.ns_true[r]] // self.h_max
            remote += int((owners != r).sum())
        gather_blocks = P_ * P_ * NJ_loc  # all_gather: every shard gets all
        return {
            "num_shards": P_,
            "blocks_total": P_ * NJ_loc,
            "referenced_blocks": referenced,
            "remote_blocks": remote,
            "targeted_exchange_blocks": referenced,
            "all_gather_blocks": gather_blocks,
            "volume_vs_all_gather": referenced / max(gather_blocks, 1),
        }


def build_bell_tile_shard_plan(
    bell: BlockEllGraph, num_shards: int, adj_pa, cheb_polys
) -> BellTileShardPlan:
    """Split a BlockEllGraph across ``num_shards`` with compact per-shard
    source tables, targeted-halo routing, per-shard fused-backward lists,
    and tile-resident constants (adj_pa / Chebyshev values per active tile).
    """
    from dstagnn_drought_tpu.ops.block_sparse import active_tile_values

    if bell.active_src is None or bell.tile_start is None:
        raise ValueError("build_bell_tile_shard_plan needs the active-tile "
                         "list (block_ell_from_adjacency).")
    P_ = num_shards
    NJ = bell.num_tiles
    S = bell.max_blocks
    BS = bell.block_size
    K = np.asarray(cheb_polys).shape[0]
    NJ_pad = -(-NJ // P_) * P_
    NJ_loc = NJ_pad // P_

    counts = np.zeros(NJ_pad, np.int32)
    counts[:NJ] = np.asarray(bell.tile_count)
    valid_g = np.asarray(bell.pattern) & np.asarray(
        bell.block_mask)[:, :, None, None]              # (NJ, S, BS, BS)

    # global active list + per-entry constants, pad tiles appended in order
    a_src_g = list(np.asarray(bell.active_src))
    a_tgt_g = list(np.asarray(bell.active_tgt))
    a_slot_g = list(np.asarray(bell.active_slot))
    pat_g = list(valid_g[np.asarray(bell.active_tgt),
                         np.asarray(bell.active_slot)])
    pa_g = list(active_tile_values(np.asarray(adj_pa), bell))
    cheb_g = list(active_tile_values(np.asarray(cheb_polys), bell))
    zero_tile = np.zeros((BS, BS), np.float32)
    zero_cheb = np.zeros((K, BS, BS), np.float32)
    for j in range(NJ, NJ_pad):
        a_src_g.append(j)
        a_tgt_g.append(j)
        a_slot_g.append(0)
        pat_g.append(np.zeros((BS, BS), bool))
        pa_g.append(zero_tile)
        cheb_g.append(zero_cheb)
        counts[j] = 1
    a_src_g = np.asarray(a_src_g, np.int32)
    a_tgt_g = np.asarray(a_tgt_g, np.int32)
    a_slot_g = np.asarray(a_slot_g, np.int32)
    starts_g = np.r_[0, np.cumsum(counts)[:-1]].astype(np.int32)

    # per-shard block_idx/pattern in slot layout (global ids for now)
    block_idx_g = np.zeros((NJ_pad, S), np.int32)
    pattern_g = np.zeros((NJ_pad, S, BS, BS), np.float32)
    block_idx_g[:NJ] = np.asarray(bell.block_idx)
    pattern_g[:NJ] = valid_g.astype(np.float32)
    for j in range(NJ, NJ_pad):
        block_idx_g[j, 0] = j

    A_loc = int(max(
        counts[r * NJ_loc:(r + 1) * NJ_loc].sum() for r in range(P_)
    ))
    A_loc = max(A_loc, 1)

    # per-shard segments, compact remap, routing
    owner = lambda g: g // NJ_loc
    send_lists = [[[] for _ in range(P_)] for _ in range(P_)]  # [o][r]
    uniq_per_shard = []
    a_true, ns_true = [], []
    for r in range(P_):
        lo_t = r * NJ_loc
        lo = starts_g[lo_t]
        hi = lo + counts[lo_t:lo_t + NJ_loc].sum()
        seg = a_src_g[lo:hi]
        uniq = np.unique(seg)
        uniq_per_shard.append(uniq)
        ns_true.append(len(uniq))
        a_true.append(int(hi - lo))
        for g in uniq:
            send_lists[owner(g)][r].append(int(g % NJ_loc))
    NS_max = max(max(ns_true), 1)
    H_max = max(
        max((len(send_lists[o][r]) for o in range(P_) for r in range(P_)),
            default=1), 1
    )

    send_idx = np.zeros((P_, P_, H_max), np.int32)
    recv_map = np.zeros((P_, NS_max), np.int32)
    for o in range(P_):
        for r in range(P_):
            lst = send_lists[o][r]
            send_idx[o, r, : len(lst)] = lst
    for r in range(P_):
        uniq = uniq_per_shard[r]
        # position of each unique block within its owner's send list to r
        pos_in_owner = {}
        cnt = {}
        for g in uniq:
            o = owner(g)
            pos_in_owner[g] = cnt.get(o, 0)
            cnt[o] = cnt.get(o, 0) + 1
        for i, g in enumerate(uniq):
            recv_map[r, i] = owner(g) * H_max + pos_in_owner[g]

    a_src_c = np.zeros((P_, A_loc), np.int32)
    a_tgt = np.zeros((P_, A_loc), np.int32)
    a_slot = np.zeros((P_, A_loc), np.int32)
    tile_start = np.zeros((P_, NJ_loc), np.int32)
    tile_count = np.zeros((P_, NJ_loc), np.int32)
    block_idx_c = np.zeros((P_, NJ_loc, S), np.int32)
    pattern = np.zeros((P_, NJ_loc, S, BS, BS), np.float32)
    pattern_act = np.zeros((P_, A_loc, BS, BS), bool)
    pa_tiles = np.zeros((P_, A_loc, BS, BS), np.float32)
    cheb_tiles = np.zeros((P_, A_loc, K, BS, BS), np.float32)
    src_order = np.zeros((P_, A_loc), np.int32)
    src_start = np.zeros((P_, NS_max), np.int32)
    src_count = np.zeros((P_, NS_max), np.int32)
    max_out = 1
    pa_g = np.asarray(pa_g, np.float32)
    cheb_g = np.asarray(cheb_g, np.float32)
    pat_g = np.asarray(pat_g, bool)
    for r in range(P_):
        lo_t = r * NJ_loc
        lo = starts_g[lo_t]
        n_seg = a_true[r]
        seg = slice(lo, lo + n_seg)
        comp = {int(g): i for i, g in enumerate(uniq_per_shard[r])}
        a_src_c[r, :n_seg] = [comp[int(g)] for g in a_src_g[seg]]
        # padded tail entries scatter OUT OF BOUNDS (dropped by JAX scatter
        # semantics) instead of colliding with tile 0 slot 0 in the fused
        # backward's dA placement
        a_tgt[r, n_seg:] = NJ_loc
        a_tgt[r, :n_seg] = a_tgt_g[seg] - lo_t
        a_slot[r, :n_seg] = a_slot_g[seg]
        tile_start[r] = starts_g[lo_t:lo_t + NJ_loc] - lo
        tile_count[r] = counts[lo_t:lo_t + NJ_loc]
        bi = block_idx_g[lo_t:lo_t + NJ_loc].copy()
        for j in range(NJ_loc):
            for s in range(S):
                bi[j, s] = comp.get(int(bi[j, s]), 0)
        block_idx_c[r] = bi
        pattern[r] = pattern_g[lo_t:lo_t + NJ_loc]
        pattern_act[r, :n_seg] = pat_g[seg]
        pa_tiles[r, :n_seg] = pa_g[seg]
        cheb_tiles[r, :n_seg] = cheb_g[seg]
        order = np.argsort(a_src_c[r, :n_seg], kind="stable").astype(np.int32)
        src_order[r, :n_seg] = order
        sc = np.bincount(a_src_c[r, :n_seg], minlength=NS_max).astype(
            np.int32
        )
        src_count[r] = sc
        src_start[r] = np.r_[0, np.cumsum(sc)[:-1]].astype(np.int32)
        if sc.max(initial=0) > max_out:
            max_out = int(sc.max())

    return BellTileShardPlan(
        block_idx=block_idx_c, pattern=pattern,
        tile_start=tile_start, tile_count=tile_count,
        a_src=a_src_c, a_tgt=a_tgt, active_slot=a_slot,
        src_order=src_order, src_start=src_start, src_count=src_count,
        send_idx=send_idx, recv_map=recv_map,
        pattern_act=pattern_act, pa_tiles=pa_tiles, cheb_tiles=cheb_tiles,
        n_nodes=bell.n_nodes, block_size=BS, num_shards=P_,
        ns_max=NS_max, h_max=H_max, max_out=max_out,
        ns_true=tuple(ns_true), a_true=tuple(a_true),
        seg_lo=tuple(int(starts_g[r * NJ_loc]) for r in range(P_)),
    )




def _tiles_use_c_layout(layout, x, thetas, plan, n_heads, d_k, fused_bwd):
    """Resolve the partitioned tile path's feature layout (mirrors the
    single-device wrapper's auto gate: fused backward + 128 | Co·T + a
    VMEM-feasible c tiling at the compute dtype)."""
    from dstagnn_drought_tpu.ops.pallas.bell_fused import (
        c_channel_pad,
        c_layout_feasible,
    )

    if layout == "t":
        return False
    if layout == "c":
        if not fused_bwd:
            raise ValueError("layout='c' requires fused_bwd=True")
        return True  # infeasible tilings raise inside the spec builder
    if layout != "auto":
        raise ValueError(f"unknown layout {layout!r}")
    B, N, C, T = x.shape
    Co = thetas.shape[-1]
    if not fused_bwd or (Co * T) % 128:
        return False
    C_pad = c_channel_pad(C, T)
    return c_layout_feasible(
        B=B, M=C_pad * T, n_ch=C_pad, Co=Co,
        max_slots=int(plan.block_idx.shape[2]), BS=plan.block_size,
        H=n_heads, dk=d_k,
        xb=2 if x.dtype == jnp.bfloat16 else 4,
    )


def _tiles_build_x(x, thetas, use_c, pad_n):
    """x (B,N,C,T) + thetas → (x_flat, thetas') in the chosen layout
    (c: plain reshape with zero-padded channels / zero Θ rows; t: t-major
    transpose with zero fake time blocks for lane alignment)."""
    from dstagnn_drought_tpu.ops.pallas.bell_fused import c_channel_pad

    B, N, C, T = x.shape

    def _gcd(a, b):
        while b:
            a, b = b, a % b
        return a

    if use_c:
        C_pad = c_channel_pad(C, T)
        x_cm = x if C_pad == C else jnp.pad(
            x, ((0, 0), (0, 0), (0, C_pad - C), (0, 0))
        )
        xf = pad_n(x_cm.reshape(B, N, C_pad * T), 1)
        if C_pad != C:
            thetas = jnp.pad(thetas, ((0, 0), (0, C_pad - C), (0, 0)))
        return xf, thetas
    xf = pad_n(x.transpose(0, 1, 3, 2).reshape(B, N, T * C), 1)
    m_step = 128 * C // _gcd(128, C)
    M_pad = -(-(T * C) // m_step) * m_step
    if M_pad != T * C:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, M_pad - T * C)))
    return xf, thetas


def make_partitioned_bell_tiles_conv(
    mesh: Mesh, plan: BellTileShardPlan, n_heads: int, d_k: int,
    interpret: bool | None = None, fused_bwd: bool = True,
    check_vma: bool = False,
    layout: str = "t",
):
    """Shard_map'd tile-resident BELL conv with the targeted block halo.

    f(emb, x_tm, mask_tiles, thetas, wq, wk, *plan arrays) →
    (B, Np, nt·Co) t-major. emb/x_tm node-sharded over ('data','graph'),
    mask_tiles (P, A_loc, K, BS, BS) sharded over 'graph', weights
    replicated. Each shard: local q/k projections → ONE targeted
    ``all_to_all`` per operand (x, q) filling its compact source-block
    table → the fused Pallas kernel on its local tile list, with the fused
    K1/K2 backward running per shard against the compact table (its dx
    routes back through the exchange transpose automatically).
    """
    from dstagnn_drought_tpu.ops.pallas.bell_fused import bell_tiles_out

    node_sh = P("data", "graph")
    BS = plan.block_size
    NJ_loc = plan.tiles_per_shard
    NS_max = plan.ns_max
    H_max = plan.h_max

    def local_fn(emb, x_tm, mask_l, bi, pat, asrc, atgt, tstart, tcount,
                 aslot, sorder, sstart, scount, send_idx, recv_map,
                 pattern_act, pa_t, cheb_t, thetas, wq, wk):
        (mask_l, bi, pat, asrc, atgt, tstart, tcount, aslot, sorder,
         sstart, scount, send_idx, recv_map, pattern_act, pa_t, cheb_t) = (
            mask_l[0], bi[0], pat[0], asrc[0], atgt[0], tstart[0],
            tcount[0], aslot[0], sorder[0], sstart[0],
            scount[0], send_idx[0], recv_map[0],
            pattern_act[0], pa_t[0], cheb_t[0],
        )
        B = emb.shape[0]
        f32 = jnp.float32
        q_loc = jnp.einsum("bnd,dh->bnh", emb, wq).astype(f32)
        k_loc = jnp.einsum("bnd,dh->bnh", emb, wk).astype(f32)

        def exchange(v):
            """(B, NJ_loc·BS, D) local rows → (B, NS_max·BS, D) compact
            referenced-source table via the targeted all_to_all."""
            D = v.shape[-1]
            blocks = v.reshape(B, NJ_loc, BS, D)
            # (P, H_max) send table → (P, H_max, B, BS, D)
            send = jnp.moveaxis(blocks[:, send_idx], 0, 2)
            recv = jax.lax.all_to_all(
                send, "graph", split_axis=0, concat_axis=0, tiled=True
            )                               # recv[o, h] = owner o's slot h
            flat = recv.reshape(-1, B, BS, D)
            comp = flat[recv_map]           # (NS_max, B, BS, D)
            return jnp.moveaxis(comp, 1, 0).reshape(B, NS_max * BS, D)

        x_c = exchange(x_tm)
        q_c = exchange(q_loc)
        q = q_c.reshape(B, NS_max * BS, n_heads, d_k).transpose(0, 2, 1, 3)
        k = k_loc.reshape(B, NJ_loc * BS, n_heads, d_k).transpose(0, 2, 1, 3)
        bias_t = jnp.where(
            pattern_act[:, None],
            (pa_t[:, None] * mask_l).astype(f32),
            jnp.asarray(-1e30, f32),
        )
        return bell_tiles_out(
            (plan.max_out if fused_bwd else None, interpret, layout),
            tstart, tcount, asrc, atgt, bi, pat,
            q, k, bias_t, cheb_t, x_c, thetas,
            aslot if fused_bwd else None,
            sorder if fused_bwd else None,
            sstart if fused_bwd else None,
            scount if fused_bwd else None,
        )

    shard1 = lambda nd: P(*(("graph",) + (None,) * (nd - 1)))
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            node_sh,                # emb
            node_sh,                # x_tm
            shard1(5),              # mask_tiles (P, A_loc, K, BS, BS)
            shard1(3),              # block_idx
            shard1(5),              # pattern
            shard1(2), shard1(2),   # a_src, a_tgt
            shard1(2), shard1(2),   # tile_start, tile_count
            shard1(2),              # active_slot
            shard1(2),              # src_order
            shard1(2), shard1(2),   # src_start, src_count
            shard1(3),              # send_idx (P, P, H_max)
            shard1(2),              # recv_map
            shard1(4),              # pattern_act
            shard1(4),              # pa_tiles
            shard1(5),              # cheb_tiles
            P(),                    # thetas
            P(),                    # wq
            P(),                    # wk
        ),
        out_specs=node_sh,
        # see make_partitioned_bell_conv: pinned by the regression test
        check_vma=check_vma,
    )


def partitioned_bell_tiles_conv(
    mesh: Mesh,
    emb: jax.Array,           # (B, N, d_model)
    x: jax.Array,             # (B, N, C, T)
    plan: BellTileShardPlan,
    *,
    mask_tiles: jax.Array,    # (P, A_loc, K, BS, BS) — sharded over 'graph'
    thetas: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    n_heads: int,
    d_k: int,
    fused_bwd: bool = True,
    layout: str = "auto",
) -> jax.Array:
    """Model-facing wrapper: pads node axes to the plan's block grid, runs
    the targeted-halo shard_map with per-shard fused kernels, and returns
    (B, N, Co, T). ``layout`` as in ``bell_cheb_conv_tiles`` ("auto" picks
    the c-major kernels whenever feasible)."""
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

    emb_p = pad_n(emb, 1)
    use_c = _tiles_use_c_layout(layout, x, thetas, plan, n_heads, d_k,
                                fused_bwd)
    x_tm, thetas = _tiles_build_x(x, thetas, use_c, pad_n)

    interpret = next(iter(mesh.devices.flat)).platform.lower() != "tpu"
    f = make_partitioned_bell_tiles_conv(
        mesh, plan, n_heads, d_k, interpret=interpret, fused_bwd=fused_bwd,
        layout="c" if use_c else "t",
    )
    out = f(
        emb_p, x_tm, mask_tiles,
        jnp.asarray(plan.block_idx), jnp.asarray(plan.pattern),
        jnp.asarray(plan.a_src), jnp.asarray(plan.a_tgt),
        jnp.asarray(plan.tile_start), jnp.asarray(plan.tile_count),
        jnp.asarray(plan.active_slot), jnp.asarray(plan.src_order),
        jnp.asarray(plan.src_start), jnp.asarray(plan.src_count),
        jnp.asarray(plan.send_idx), jnp.asarray(plan.recv_map),
        jnp.asarray(plan.pattern_act), jnp.asarray(plan.pa_tiles),
        jnp.asarray(plan.cheb_tiles),
        thetas.astype(jnp.float32), wq, wk,
    )
    if use_c:
        return out[:, :N].reshape(B, N, Co, T).astype(x.dtype)
    return out[:, :N, : T * Co].reshape(B, N, T, Co).transpose(
        0, 1, 3, 2
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# halo/compute overlap: local-source tiles run while the exchange is in
# flight (BASELINE.json north star: "boundary all-to-all OVERLAPPED with
# neighborhood aggregation")
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BellTileOverlapLists:
    """Static per-shard split of the tile list into sublist A (every source
    block is shard-local → the kernel reads x_loc/q_loc directly, with NO
    data dependence on the ``all_to_all``) and sublist B (at least one
    remote source → reads the exchanged compact table). Two kernel calls
    per shard; XLA's latency-hiding scheduler can then run A's kernel
    between the collective's start and done.

    Sublists are padded across shards by repeating tile 0 with a single
    PAD active entry (zero pattern/cheb → the kernel's masked softmax makes
    its weights exactly zero, so pad copies contribute nothing to any
    gradient); ``sel*`` indexes the shard's A_loc active axis to gather
    per-entry constants/masks, with index A_loc meaning an appended zero
    row. ``inv_pos`` maps each true local tile to its row in
    concat(outA, outB).
    """

    # sublist A (local sources; a_src are LOCAL block ids 0..NJ_loc-1)
    tilesA: np.ndarray        # (P, NJA) int32 local tile ids
    tile_startA: np.ndarray   # (P, NJA) int32
    tile_countA: np.ndarray   # (P, NJA) int32
    a_srcA: np.ndarray        # (P, ALA) int32
    a_tgtA: np.ndarray        # (P, ALA) int32 (position in sublist A)
    slotA: np.ndarray         # (P, ALA) int32
    selA: np.ndarray          # (P, ALA) int32 into [0, A_loc]
    block_idxA: np.ndarray    # (P, NJA, S) int32
    patternA: np.ndarray      # (P, NJA, S, BS, BS) f32
    src_orderA: np.ndarray    # (P, ALA) int32
    src_startA: np.ndarray    # (P, NJ_loc) int32
    src_countA: np.ndarray    # (P, NJ_loc) int32
    max_outA: int
    # sublist B (halo-dependent; a_src are COMPACT table ids)
    tilesB: np.ndarray
    tile_startB: np.ndarray
    tile_countB: np.ndarray
    a_srcB: np.ndarray
    a_tgtB: np.ndarray
    slotB: np.ndarray
    selB: np.ndarray
    block_idxB: np.ndarray
    patternB: np.ndarray
    src_orderB: np.ndarray
    src_startB: np.ndarray    # (P, NS_max) int32
    src_countB: np.ndarray
    max_outB: int
    # reassembly
    inv_pos: np.ndarray       # (P, NJ_loc) int32 row in concat(A, B)
    n_localA: tuple           # true sublist-A tile count per shard
    exposed_blocks: tuple     # per shard: compact blocks only B waits for


def build_overlap_lists(plan: BellTileShardPlan) -> BellTileOverlapLists:
    """Split each shard's tile list for halo/compute overlap (static)."""
    P_ = plan.num_shards
    NJ_loc = plan.tiles_per_shard
    S = plan.block_idx.shape[2]
    BS = plan.block_size
    H_max = plan.h_max

    per_shard = []
    for r in range(P_):
        owners = plan.recv_map[r] // H_max          # (NS_max,)
        slot_in_owner = plan.recv_map[r] % H_max
        # local block id behind each LOCAL compact id
        local_of_compact = np.where(
            owners == r, plan.send_idx[r, r][slot_in_owner], -1
        )
        tilesA, tilesB = [], []
        for j in range(NJ_loc):
            lo = plan.tile_start[r, j]
            cnt = plan.tile_count[r, j]
            srcs = plan.a_src[r, lo:lo + cnt]
            if np.all(owners[srcs] == r):
                tilesA.append(j)
            else:
                tilesB.append(j)
        # compact blocks that only sublist B actually waits for
        b_srcs = set()
        for j in tilesB:
            lo = plan.tile_start[r, j]
            b_srcs.update(plan.a_src[r, lo:lo + plan.tile_count[r, j]])
        per_shard.append((tilesA, tilesB, local_of_compact, len(b_srcs)))

    NJA = max(max(len(t[0]) for t in per_shard), 1)
    NJB = max(max(len(t[1]) for t in per_shard), 1)

    def build_side(side, NJ_sub, n_src_rows):
        ALs = []
        for r in range(P_):
            tiles = per_shard[r][side]
            ALs.append(
                sum(int(plan.tile_count[r, j]) for j in tiles)
                + (NJ_sub - len(tiles))      # one pad entry per pad tile
            )
        AL = max(max(ALs), 1)
        t_ids = np.zeros((P_, NJ_sub), np.int32)
        t_start = np.zeros((P_, NJ_sub), np.int32)
        t_count = np.ones((P_, NJ_sub), np.int32)
        a_src = np.zeros((P_, AL), np.int32)
        a_tgt = np.zeros((P_, AL), np.int32)
        slot = np.zeros((P_, AL), np.int32)
        sel = np.full((P_, AL), plan.a_src.shape[1], np.int32)  # → zero row
        bidx = np.zeros((P_, NJ_sub, S), np.int32)
        pat = np.zeros((P_, NJ_sub, S, BS, BS), np.float32)
        s_order = np.zeros((P_, AL), np.int32)
        s_start = np.zeros((P_, n_src_rows), np.int32)
        s_count = np.zeros((P_, n_src_rows), np.int32)
        max_out = 1
        for r in range(P_):
            local_of_compact = per_shard[r][2]
            tiles = per_shard[r][side]
            pos = 0
            for t_pos in range(NJ_sub):
                t_start[r, t_pos] = pos
                if t_pos < len(tiles):
                    j = tiles[t_pos]
                    t_ids[r, t_pos] = j
                    lo = int(plan.tile_start[r, j])
                    cnt = int(plan.tile_count[r, j])
                    t_count[r, t_pos] = cnt
                    for s in range(cnt):
                        comp = int(plan.a_src[r, lo + s])
                        a_src[r, pos] = (
                            local_of_compact[comp] if side == 0 else comp
                        )
                        a_tgt[r, pos] = t_pos
                        slot[r, pos] = s
                        sel[r, pos] = lo + s
                        pat[r, t_pos, s] = plan.pattern[r, j, s]
                        bidx[r, t_pos, s] = a_src[r, pos]
                        pos += 1
                else:
                    # pad tile: repeat tile 0's identity for k/output rows,
                    # ONE pad active entry (zero pattern → zero weights)
                    t_ids[r, t_pos] = t_ids[r, 0]
                    a_src[r, pos] = 0
                    a_tgt[r, pos] = t_pos
                    slot[r, pos] = 0
                    pos += 1
            # pad the active tail past pos (a_tgt → NJ_sub scatters OOB)
            a_tgt[r, pos:] = NJ_sub
            # source-sorted view for the fused backward
            n_act = pos
            order = np.argsort(
                a_src[r, :n_act], kind="stable"
            ).astype(np.int32)
            s_order[r, :n_act] = order
            sc = np.bincount(a_src[r, :n_act], minlength=n_src_rows).astype(
                np.int32
            )
            s_count[r] = sc
            s_start[r] = np.r_[0, np.cumsum(sc)[:-1]].astype(np.int32)
            if sc.max(initial=0) > max_out:
                max_out = int(sc.max())
        return (t_ids, t_start, t_count, a_src, a_tgt, slot, sel, bidx, pat,
                s_order, s_start, s_count, max_out)

    A = build_side(0, NJA, NJ_loc)
    Bb = build_side(1, NJB, plan.ns_max)

    inv_pos = np.zeros((P_, NJ_loc), np.int32)
    for r in range(P_):
        tilesA, tilesB = per_shard[r][0], per_shard[r][1]
        for pos, j in enumerate(tilesA):
            inv_pos[r, j] = pos
        for pos, j in enumerate(tilesB):
            inv_pos[r, j] = NJA + pos

    return BellTileOverlapLists(
        tilesA=A[0], tile_startA=A[1], tile_countA=A[2], a_srcA=A[3],
        a_tgtA=A[4], slotA=A[5], selA=A[6], block_idxA=A[7], patternA=A[8],
        src_orderA=A[9], src_startA=A[10], src_countA=A[11], max_outA=A[12],
        tilesB=Bb[0], tile_startB=Bb[1], tile_countB=Bb[2], a_srcB=Bb[3],
        a_tgtB=Bb[4], slotB=Bb[5], selB=Bb[6], block_idxB=Bb[7],
        patternB=Bb[8], src_orderB=Bb[9], src_startB=Bb[10],
        src_countB=Bb[11], max_outB=Bb[12],
        inv_pos=inv_pos,
        n_localA=tuple(len(t[0]) for t in per_shard),
        exposed_blocks=tuple(t[3] for t in per_shard),
    )


def make_partitioned_bell_tiles_conv_overlap(
    mesh: Mesh, plan: BellTileShardPlan, ov: BellTileOverlapLists,
    n_heads: int, d_k: int,
    interpret: bool | None = None, fused_bwd: bool = True,
    check_vma: bool = False,
    layout: str = "t",
):
    """Overlapped variant of :func:`make_partitioned_bell_tiles_conv`:
    sublist A's fused kernel consumes only shard-local tensors, so it has
    no data dependence on the targeted ``all_to_all`` and XLA can schedule
    it while the exchange is in flight; sublist B waits for the compact
    table as before. Outputs reassemble by one row gather."""
    from dstagnn_drought_tpu.ops.pallas.bell_fused import bell_tiles_out

    node_sh = P("data", "graph")
    BS = plan.block_size
    NJ_loc = plan.tiles_per_shard
    NS_max = plan.ns_max
    NJA = ov.tilesA.shape[1]
    NJB = ov.tilesB.shape[1]

    def local_fn(emb, x_tm, mask_l, send_idx, recv_map,
                 pattern_act, pa_t, cheb_t,
                 tilesA, tile_startA, tile_countA, a_srcA, a_tgtA, slotA,
                 selA, block_idxA, patternA, src_orderA, src_startA,
                 src_countA,
                 tilesB, tile_startB, tile_countB, a_srcB, a_tgtB, slotB,
                 selB, block_idxB, patternB, src_orderB, src_startB,
                 src_countB,
                 inv_pos, thetas, wq, wk):
        (mask_l, send_idx, recv_map, pattern_act, pa_t, cheb_t) = (
            mask_l[0], send_idx[0], recv_map[0], pattern_act[0], pa_t[0],
            cheb_t[0],
        )
        (tilesA, tile_startA, tile_countA, a_srcA, a_tgtA, slotA, selA,
         block_idxA, patternA, src_orderA, src_startA, src_countA) = (
            tilesA[0], tile_startA[0], tile_countA[0], a_srcA[0], a_tgtA[0],
            slotA[0], selA[0], block_idxA[0], patternA[0], src_orderA[0],
            src_startA[0], src_countA[0],
        )
        (tilesB, tile_startB, tile_countB, a_srcB, a_tgtB, slotB, selB,
         block_idxB, patternB, src_orderB, src_startB, src_countB) = (
            tilesB[0], tile_startB[0], tile_countB[0], a_srcB[0], a_tgtB[0],
            slotB[0], selB[0], block_idxB[0], patternB[0], src_orderB[0],
            src_startB[0], src_countB[0],
        )
        inv_pos = inv_pos[0]
        B = emb.shape[0]
        f32 = jnp.float32
        q_loc = jnp.einsum("bnd,dh->bnh", emb, wq).astype(f32)
        k_loc = jnp.einsum("bnd,dh->bnh", emb, wk).astype(f32)
        M = x_tm.shape[-1]

        def exchange(v):
            D = v.shape[-1]
            blocks = v.reshape(B, NJ_loc, BS, D)
            send = jnp.moveaxis(blocks[:, send_idx], 0, 2)
            recv = jax.lax.all_to_all(
                send, "graph", split_axis=0, concat_axis=0, tiled=True
            )
            flat = recv.reshape(-1, B, BS, D)
            comp = flat[recv_map]
            return jnp.moveaxis(comp, 1, 0).reshape(B, NS_max * BS, D)

        def gather_entry_consts(sel, mask):
            zrow = lambda a: jnp.concatenate(
                [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0
            )
            return (zrow(pattern_act)[sel], zrow(pa_t)[sel],
                    zrow(cheb_t)[sel], zrow(mask)[sel])

        def k_for(tiles, nj_sub):
            kb = k_loc.reshape(B, NJ_loc, BS, -1)[:, tiles]
            return kb.reshape(B, nj_sub * BS, n_heads, d_k).transpose(
                0, 2, 1, 3
            )

        def run(meta, tile_start, tile_count, a_src, a_tgt, block_idx,
                pattern, q, k, sel, mask, x_src, slots, s_order, s_start,
                s_count):
            pat_e, pa_e, cheb_e, mask_e = gather_entry_consts(sel, mask)
            bias_t = jnp.where(
                pat_e[:, None],
                (pa_e[:, None] * mask_e).astype(f32),
                jnp.asarray(-1e30, f32),
            )
            return bell_tiles_out(
                meta, tile_start, tile_count, a_src, a_tgt, block_idx,
                pattern, q, k, bias_t, cheb_e, x_src, thetas,
                slots, s_order, s_start, s_count,
            )

        # sublist A: LOCAL sources only — no exchange dependence
        q_A = q_loc.reshape(B, NJ_loc * BS, n_heads, d_k).transpose(
            0, 2, 1, 3
        )
        outA = run(
            (ov.max_outA if fused_bwd else None, interpret, layout),
            tile_startA, tile_countA, a_srcA, a_tgtA, block_idxA, patternA,
            q_A, k_for(tilesA, NJA), selA, mask_l, x_tm,
            slotA if fused_bwd else None,
            src_orderA if fused_bwd else None,
            src_startA if fused_bwd else None,
            src_countA if fused_bwd else None,
        )

        # sublist B: waits for the targeted exchange
        x_c = exchange(x_tm)
        q_c = exchange(q_loc)
        q_B = q_c.reshape(B, NS_max * BS, n_heads, d_k).transpose(0, 2, 1, 3)
        outB = run(
            (ov.max_outB if fused_bwd else None, interpret, layout),
            tile_startB, tile_countB, a_srcB, a_tgtB, block_idxB, patternB,
            q_B, k_for(tilesB, NJB), selB, mask_l, x_c,
            slotB if fused_bwd else None,
            src_orderB if fused_bwd else None,
            src_startB if fused_bwd else None,
            src_countB if fused_bwd else None,
        )

        Mo = outA.shape[-1]
        cat = jnp.concatenate(
            [outA.reshape(B, NJA, BS, Mo), outB.reshape(B, NJB, BS, Mo)],
            axis=1,
        )
        return cat[:, inv_pos].reshape(B, NJ_loc * BS, Mo)

    shard1 = lambda nd: P(*(("graph",) + (None,) * (nd - 1)))
    ov_specs = tuple(
        shard1(a.ndim) for a in (
            ov.tilesA, ov.tile_startA, ov.tile_countA, ov.a_srcA, ov.a_tgtA,
            ov.slotA, ov.selA, ov.block_idxA, ov.patternA, ov.src_orderA,
            ov.src_startA, ov.src_countA,
            ov.tilesB, ov.tile_startB, ov.tile_countB, ov.a_srcB, ov.a_tgtB,
            ov.slotB, ov.selB, ov.block_idxB, ov.patternB, ov.src_orderB,
            ov.src_startB, ov.src_countB,
            ov.inv_pos,
        )
    )
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            node_sh,                # emb
            node_sh,                # x_tm
            shard1(5),              # mask_tiles
            shard1(3),              # send_idx
            shard1(2),              # recv_map
            shard1(4),              # pattern_act
            shard1(4),              # pa_tiles
            shard1(5),              # cheb_tiles
        ) + ov_specs + (P(), P(), P()),
        out_specs=node_sh,
        # see make_partitioned_bell_conv: pinned by the regression test
        check_vma=check_vma,
    )


def partitioned_bell_tiles_conv_overlap(
    mesh: Mesh,
    emb: jax.Array,
    x: jax.Array,
    plan: BellTileShardPlan,
    ov: BellTileOverlapLists,
    *,
    mask_tiles: jax.Array,
    thetas: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    n_heads: int,
    d_k: int,
    fused_bwd: bool = True,
    layout: str = "auto",
) -> jax.Array:
    """Model-facing wrapper for the overlapped targeted-halo path."""
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

    emb_p = pad_n(emb, 1)
    use_c = _tiles_use_c_layout(layout, x, thetas, plan, n_heads, d_k,
                                fused_bwd)
    x_tm, thetas = _tiles_build_x(x, thetas, use_c, pad_n)

    interpret = next(iter(mesh.devices.flat)).platform.lower() != "tpu"
    f = make_partitioned_bell_tiles_conv_overlap(
        mesh, plan, ov, n_heads, d_k, interpret=interpret,
        fused_bwd=fused_bwd, layout="c" if use_c else "t",
    )
    out = f(
        emb_p, x_tm, mask_tiles,
        jnp.asarray(plan.send_idx), jnp.asarray(plan.recv_map),
        jnp.asarray(plan.pattern_act), jnp.asarray(plan.pa_tiles),
        jnp.asarray(plan.cheb_tiles),
        jnp.asarray(ov.tilesA), jnp.asarray(ov.tile_startA),
        jnp.asarray(ov.tile_countA), jnp.asarray(ov.a_srcA),
        jnp.asarray(ov.a_tgtA), jnp.asarray(ov.slotA),
        jnp.asarray(ov.selA), jnp.asarray(ov.block_idxA),
        jnp.asarray(ov.patternA), jnp.asarray(ov.src_orderA),
        jnp.asarray(ov.src_startA), jnp.asarray(ov.src_countA),
        jnp.asarray(ov.tilesB), jnp.asarray(ov.tile_startB),
        jnp.asarray(ov.tile_countB), jnp.asarray(ov.a_srcB),
        jnp.asarray(ov.a_tgtB), jnp.asarray(ov.slotB),
        jnp.asarray(ov.selB), jnp.asarray(ov.block_idxB),
        jnp.asarray(ov.patternB), jnp.asarray(ov.src_orderB),
        jnp.asarray(ov.src_startB), jnp.asarray(ov.src_countB),
        jnp.asarray(ov.inv_pos),
        thetas.astype(jnp.float32), wq, wk,
    )
    if use_c:
        return out[:, :N].reshape(B, N, Co, T).astype(x.dtype)
    return out[:, :N, : T * Co].reshape(B, N, T, Co).transpose(
        0, 1, 3, 2
    ).astype(x.dtype)
