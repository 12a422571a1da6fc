"""Block-ELL sparse graph ops — the MXU-shaped sparse path.

The edge-list (ELL) path in :mod:`dstagnn_drought_tpu.ops.sparse` is the
semantics/memory-scaling path, but its per-edge row gathers are VPU-bound and
lose to the dense MXU matmul at the shipped graph sizes (measured —
BENCH_NOTES.md "honest status"). TPUs eat 128×128 tiles; the way to make
graph sparsity *pay* on this hardware is block sparsity:

  * nodes are tiled into blocks of ``BS`` (default 128, the MXU/lane width);
  * for each **target tile** j we keep the list of **source blocks** that
    contain at least one in-edge (``block_idx``/``block_mask``), plus the
    dense edge pattern of each active 128×128 tile (``pattern``);
  * SDDMM becomes per-active-block Q_S·K_Jᵀ — a dense (BS,d_k)×(d_k,BS)
    MXU matmul; aggregation becomes per-active-block (BS,BS)ᵀ×(BS,M) MXU
    matmuls; gathers move whole 128-row blocks (sequential, DMA-friendly)
    instead of single rows.

Work scales with the number of *active blocks*. Random fine-grained sparsity
activates every block (1% uniform ⇒ ~all 128×128 tiles hit); real STAG
graphs are spatially local, and a bandwidth-reducing node permutation
(:func:`rcm_permutation`, reverse Cuthill–McKee) concentrates edges near the
diagonal so most tiles stay empty. The expected win is
``active_blocks / total_blocks`` of the dense cost.

Everything here is expressible in XLA (block gathers + batched einsums on
the MXU); no Pallas is required for the first-order win. Softmax semantics
match the ELL path exactly: normalization over each target's true
in-neighbourhood (pattern-masked, -inf padding).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockEllGraph:
    """Block-sparse (block-ELL) description of a directed graph.

    For target tile j (rows ``j*BS:(j+1)*BS`` of the target axis), slot s:
      * ``block_idx[j, s]`` — index of a source-node block;
      * ``block_mask[j, s]`` — slot validity (padding slots are False);
      * ``pattern[j, s]`` — (BS, BS) bool, True where source node
        ``block_idx[j,s]*BS + a`` has an edge into target ``j*BS + b``.
    """

    block_idx: jax.Array   # (NJ, S) int32
    block_mask: jax.Array  # (NJ, S) bool
    pattern: jax.Array     # (NJ, S, BS, BS) bool
    n_nodes: int           # true (unpadded) node count
    # Flat active-tile list (built host-side by the factory; consumed by the
    # fused Pallas kernel so its grid walks ONLY real tiles, in target-tile
    # order). ``adj_bool`` is the padded dense edge pattern, used to fold
    # the -inf mask into the bias plane ahead of the kernel.
    active_src: jax.Array | None = None    # (A,) int32 source block ids
    active_tgt: jax.Array | None = None    # (A,) int32 target tile ids
    tile_start: jax.Array | None = None    # (NJ,) int32 offset into active_*
    tile_count: jax.Array | None = None    # (NJ,) int32 slots per target tile
    adj_bool: jax.Array | None = None      # (Np, Np) bool
    # Source-sorted view of the active list (for the fused BACKWARD's dx
    # pass, which walks tiles in source order so each grid step owns one
    # dx output block): ``src_order`` permutes active indices into source-
    # major order; ``src_start/count`` index it per source tile; ``
    # ``active_slot[a]`` is a's slot position u within its target tile.
    active_slot: jax.Array | None = None   # (A,) int32
    src_order: jax.Array | None = None     # (A,) int32 into active_*
    src_start: jax.Array | None = None     # (NJ,) int32
    src_count: jax.Array | None = None     # (NJ,) int32
    covered: bool = True   # every real target column has ≥1 in-edge
    max_src_blocks: int = 0  # max outgoing active tiles of any source
    #                          tile (static; sizes the dx kernel's loop)

    @property
    def block_size(self) -> int:
        return self.pattern.shape[-1]

    @property
    def num_tiles(self) -> int:
        return self.block_idx.shape[0]

    @property
    def max_blocks(self) -> int:
        return self.block_idx.shape[1]

    @property
    def padded_nodes(self) -> int:
        return self.num_tiles * self.block_size

    @property
    def num_active(self) -> int:
        return 0 if self.active_src is None else self.active_src.shape[0]

    def tree_flatten(self):
        return (
            self.block_idx, self.block_mask, self.pattern, self.active_src,
            self.active_tgt, self.tile_start, self.tile_count, self.adj_bool,
            self.active_slot, self.src_order, self.src_start, self.src_count,
        ), (self.n_nodes, self.covered, self.max_src_blocks)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (bi, bm, pat, a_src, a_tgt, t_start, t_count, adj_bool,
         a_slot, s_order, s_start, s_count) = children
        return cls(
            block_idx=bi, block_mask=bm, pattern=pat, n_nodes=aux[0],
            active_src=a_src, active_tgt=a_tgt,
            tile_start=t_start, tile_count=t_count,
            adj_bool=adj_bool, active_slot=a_slot, src_order=s_order,
            src_start=s_start, src_count=s_count, covered=aux[1],
            max_src_blocks=aux[2] if len(aux) > 2 else 0,
        )


def rcm_permutation(adj: np.ndarray) -> np.ndarray:
    """Reverse Cuthill–McKee node ordering (bandwidth reduction).

    Concentrates the edges of a spatially local graph near the diagonal so
    block tiling activates few off-diagonal tiles. Returns ``perm`` with
    ``reordered = adj[np.ix_(perm, perm)]``. Plain-numpy BFS over the
    symmetrized pattern; deterministic (ties broken by node id).
    """
    A = np.asarray(adj) != 0
    A = A | A.T
    np.fill_diagonal(A, False)
    n = A.shape[0]
    deg = A.sum(axis=1)
    visited = np.zeros(n, dtype=bool)
    order: list[int] = []
    neighbors = [np.nonzero(A[i])[0] for i in range(n)]
    while len(order) < n:
        # lowest-degree unvisited seed (classic CM heuristic)
        seed = int(np.argmin(np.where(visited, np.iinfo(np.int64).max, deg)))
        queue = [seed]
        visited[seed] = True
        while queue:
            v = queue.pop(0)
            order.append(v)
            nbrs = neighbors[v]
            nbrs = nbrs[~visited[nbrs]]
            nbrs = nbrs[np.argsort(deg[nbrs], kind="stable")]
            visited[nbrs] = True
            queue.extend(int(u) for u in nbrs)
    return np.asarray(order[::-1], dtype=np.int64)  # reverse → RCM


def block_ell_from_adjacency(
    adj: np.ndarray,
    block_size: int = 128,
    include_self: bool = True,
    max_blocks: int | None = None,
) -> BlockEllGraph:
    """Dense 0/1 adjacency (source i, target j) → :class:`BlockEllGraph`.

    ``adj[i, j] != 0`` means i is an in-neighbour of target j (the dense
    path's convention, reference model/DSTAGNN_my.py:130). The node axis is
    zero-padded up to a block multiple; padding rows/columns carry no edges.
    """
    A = np.asarray(adj) != 0
    n = A.shape[0]
    if include_self:
        A = A | np.eye(n, dtype=bool)
    BS = block_size
    n_pad = -(-n // BS) * BS
    Ap = np.zeros((n_pad, n_pad), dtype=bool)
    Ap[:n, :n] = A
    nb = n_pad // BS
    # (src_block, a, tgt_block, b) → active if any edge in the tile
    tiles = Ap.reshape(nb, BS, nb, BS)
    active = tiles.any(axis=(1, 3))  # (src_block, tgt_block)
    S = int(active.sum(axis=0).max()) if max_blocks is None else max_blocks
    S = max(S, 1)
    block_idx = np.zeros((nb, S), dtype=np.int32)
    block_mask = np.zeros((nb, S), dtype=bool)
    pattern = np.zeros((nb, S, BS, BS), dtype=bool)
    a_src: list[int] = []
    a_tgt: list[int] = []
    for j in range(nb):
        srcs = np.nonzero(active[:, j])[0][:S]
        block_idx[j, : len(srcs)] = srcs
        block_mask[j, : len(srcs)] = True
        for s, sb in enumerate(srcs):
            pattern[j, s] = tiles[sb, :, j, :]
        if len(srcs):
            a_src.extend(int(s) for s in srcs)
            a_tgt.extend([j] * len(srcs))
        else:
            # dummy entry so every output block is visited exactly once
            # (only arises on graphs with edge-less target columns, where
            # ``covered`` is False and the fused kernel refuses to run)
            a_src.append(j)
            a_tgt.append(j)
    a_src_np = np.asarray(a_src, np.int32)
    a_tgt_np = np.asarray(a_tgt, np.int32)
    t_count = np.bincount(a_tgt_np, minlength=nb).astype(np.int32)
    t_start = np.r_[0, np.cumsum(t_count)[:-1]].astype(np.int32)
    # slot position of each active entry within its target tile
    a_slot = (np.arange(len(a_tgt_np), dtype=np.int32)
              - t_start[a_tgt_np]).astype(np.int32)
    # source-sorted view (stable: within a source, target order preserved)
    s_order = np.argsort(a_src_np, kind="stable").astype(np.int32)
    s_count = np.bincount(a_src_np, minlength=nb).astype(np.int32)
    s_start = np.r_[0, np.cumsum(s_count)[:-1]].astype(np.int32)
    # ``covered`` must reflect the structure the kernels actually visit: when
    # ``max_blocks`` truncates the slot list, a target column whose only
    # in-edges live in truncated-away source blocks is NOT covered even
    # though the full adjacency says it is (the fused kernel's all-masked
    # softmax would emit garbage there).
    kept = pattern & block_mask[:, :, None, None]   # (nb, S, BS, BS)
    col_covered = kept.any(axis=(1, 2)).reshape(n_pad)  # per target column
    return BlockEllGraph(
        jnp.asarray(block_idx), jnp.asarray(block_mask), jnp.asarray(pattern),
        n_nodes=n,
        active_src=jnp.asarray(a_src_np), active_tgt=jnp.asarray(a_tgt_np),
        tile_start=jnp.asarray(t_start), tile_count=jnp.asarray(t_count),
        adj_bool=jnp.asarray(Ap),
        active_slot=jnp.asarray(a_slot), src_order=jnp.asarray(s_order),
        src_start=jnp.asarray(s_start), src_count=jnp.asarray(s_count),
        covered=bool(col_covered[:n].all()),
        max_src_blocks=int(s_count.max()) if len(s_count) else 0,
    )


def active_tile_values(dense, bell: BlockEllGraph) -> np.ndarray:
    """(..., N, N) dense matrix → (A, ..., BS, BS) values at the ACTIVE tiles,
    in flat active-list order (host-side numpy; used at setup time so no
    dense (N, N) plane ever needs to be device-resident).

    ``dense`` is over (source, target) like the dense path's convention."""
    if bell.active_src is None:
        raise ValueError("active_tile_values needs the active-tile list")
    d = np.asarray(dense)
    BS, NJ = bell.block_size, bell.num_tiles
    n_pad = bell.padded_nodes
    pad = [(0, 0)] * (d.ndim - 2) + [
        (0, n_pad - d.shape[-2]), (0, n_pad - d.shape[-1])
    ]
    d = np.pad(d, pad)
    lead = d.shape[:-2]
    d = d.reshape(*lead, NJ, BS, NJ, BS)
    # (..., sb, a, jt, b) → (sb, jt, ..., a, b) → pick the active (sb, jt)
    d = np.moveaxis(d, (-4, -2), (0, 1))
    return d[np.asarray(bell.active_src), np.asarray(bell.active_tgt)]


def build_bell_tile_constants(
    bell: BlockEllGraph, adj_pa, cheb_polys
) -> dict:
    """Per-active-tile CONSTANT operands of the tile-resident BELL path.

    The tile-resident path stores the learnable graph masks only on the
    active-tile support (see ``models.dstagnn``: ``mask_tiles``) and consumes
    adj_pa / Chebyshev values as per-tile constants, so nothing O(N²) is ever
    device-resident. Exact by the reference's own semantics: the bias is
    ``adj_pa ⊙ mask_k`` (model/DSTAGNN_my.py:126) with adj_pa a binarized
    top-k graph (lib/dataloader.py:11-15), so mask entries off the support
    have identically zero gradient and never contribute.

    Returns {'pattern_tiles' (A, BS, BS) bool, 'pa_tiles' (A, BS, BS) f32,
    'cheb_tiles' (A, K, BS, BS) f32} as device arrays.
    """
    valid = np.asarray(bell.pattern) & np.asarray(
        bell.block_mask)[:, :, None, None]
    a_tgt = np.asarray(bell.active_tgt)
    a_slot = np.asarray(bell.active_slot)
    return {
        "pattern_tiles": jnp.asarray(valid[a_tgt, a_slot]),
        "pa_tiles": jnp.asarray(
            active_tile_values(adj_pa, bell), dtype=jnp.float32
        ),
        "cheb_tiles": jnp.asarray(
            active_tile_values(cheb_polys, bell), dtype=jnp.float32
        ),
    }


def gather_block_values(dense: jax.Array, bell: BlockEllGraph) -> jax.Array:
    """(..., N, N) dense matrix → (..., NJ, S, BS, BS) active-tile values.

    ``dense`` is over (source, target); the input may be the true-size (N, N)
    matrix — it is zero-padded to the block grid first.
    """
    BS, NJ = bell.block_size, bell.num_tiles
    n_pad = bell.padded_nodes
    pad = [(0, 0)] * (dense.ndim - 2) + [
        (0, n_pad - dense.shape[-2]), (0, n_pad - dense.shape[-1])
    ]
    d = jnp.pad(dense, pad)
    lead = d.shape[:-2]
    d = d.reshape(*lead, NJ, BS, NJ, BS)
    # (..., sb, a, j, b) → (..., j, sb, a, b), then pick sb = idx[j, s]
    d = jnp.moveaxis(d, -2, -4)
    S = bell.max_blocks
    idx = jnp.broadcast_to(
        bell.block_idx[:, :, None, None], (NJ, S, BS, BS)
    ).reshape((1,) * len(lead) + (NJ, S, BS, BS)).astype(jnp.int32)
    return jnp.take_along_axis(d, idx, axis=-3)  # (..., NJ, S, BS, BS)


def pad_node_axis(x: jax.Array, bell: BlockEllGraph, axis: int) -> jax.Array:
    """Zero-pad a node axis up to the block grid size."""
    extra = bell.padded_nodes - x.shape[axis]
    if extra == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, extra)
    return jnp.pad(x, pad)


def block_sparse_spatial_attention_scores(
    x: jax.Array,
    bell: BlockEllGraph,
    *,
    wq: jax.Array,
    wk: jax.Array,
    n_heads: int,
    d_k: int,
) -> jax.Array:
    """Block SDDMM: raw scores only at active tiles.

    x: (B, N, d_model) spatial embeddings. Returns (B, H, NJ, S, BS, BS)
    with score[b,h,j,s,a,b'] = Q[b, src, h]·K[b, tgt, h]/√d_k for
    src = block_idx[j,s]·BS+a, tgt = j·BS+b'. Mirrors the dense
    ``spatial_attention_scores`` / ELL ``sparse_spatial_attention_scores``.
    """
    B, N, _ = x.shape
    BS, NJ = bell.block_size, bell.num_tiles
    q = jnp.einsum("bnd,dh->bnh", x, wq).reshape(B, N, n_heads, d_k)
    k = jnp.einsum("bnd,dh->bnh", x, wk).reshape(B, N, n_heads, d_k)
    q = pad_node_axis(q, bell, 1).reshape(B, NJ, BS, n_heads, d_k)
    k = pad_node_axis(k, bell, 1).reshape(B, NJ, BS, n_heads, d_k)
    q_blocks = q[:, bell.block_idx]  # (B, NJ, S, BS, H, d_k)
    # per active tile: (BS, d_k) @ (d_k, BS) on the MXU
    scores = jnp.einsum("bjsahd,bjchd->bhjsac", q_blocks, k)
    return scores / jnp.sqrt(jnp.asarray(d_k, x.dtype))


def block_sparse_cheb_conv_with_sat(
    x: jax.Array,
    block_scores: jax.Array,
    bell: BlockEllGraph,
    *,
    cheb_blocks: jax.Array,
    bias_blocks: jax.Array,
    thetas: jax.Array,
) -> jax.Array:
    """Block-sparse attention-modulated Chebyshev conv.

    Args:
      x: (B, N, C, T).
      block_scores: (B, K, NJ, S, BS, BS) raw SDDMM scores at active tiles.
      cheb_blocks: (K, NJ, S, BS, BS) — T_k at active tiles.
      bias_blocks: (K, NJ, S, BS, BS) — (adj_pa ⊙ mask_k) at active tiles.
      thetas: (K, C, C_out).

    Returns (B, N, C_out, T), ReLU applied. Softmax normalizes over each
    target's true in-neighbourhood: entries outside ``pattern`` (and padding
    slots) get -inf before the exp, exactly like the ELL path's masked
    softmax — so BELL and ELL agree numerically (tested).
    """
    B, N, C, T = x.shape
    BS, NJ, S = bell.block_size, bell.num_tiles, bell.max_blocks
    valid = bell.pattern & bell.block_mask[:, :, None, None]  # (NJ, S, BS, BS)
    s = block_scores + bias_blocks[None]
    s = jnp.where(valid[None, None], s, jnp.asarray(-1e30, s.dtype))
    # softmax over the target's full neighbourhood = (slot, source-row) axes
    K = s.shape[1]
    s2 = s.transpose(0, 1, 2, 5, 3, 4).reshape(B, K, NJ, BS, S * BS)
    att = jax.nn.softmax(s2, axis=-1).reshape(B, K, NJ, BS, S, BS)
    att = att.transpose(0, 1, 2, 4, 5, 3)  # (B, K, NJ, S, BS_src, BS_tgt)
    A = cheb_blocks[None] * att * valid[None, None]
    xm = pad_node_axis(x.reshape(B, N, C * T), bell, 1).reshape(
        B, NJ, BS, C * T
    )
    x_blocks = xm[:, bell.block_idx]  # (B, NJ, S, BS, C·T)
    # per active tile: (BS_src, BS_tgt)ᵀ @ (BS_src, M) on the MXU
    agg = jnp.einsum("zkjsuv,zjsum->zkjvm", A, x_blocks)
    agg = agg.reshape(B, K, NJ * BS, C, T)[:, :, :N]
    out = jnp.einsum("bkjct,kco->bjot", agg, thetas)
    return jax.nn.relu(out)
