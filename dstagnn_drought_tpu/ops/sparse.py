"""Sparse (ELL) spatial attention + Chebyshev aggregation — the scaling path.

The reference computes everything dense: (B,K,N,N) spatial attention scores
(model/DSTAGNN_my.py:66) and dense (N,N) Chebyshev matmuls (:128-131), i.e.
O(N²) memory and compute per block. The STAG graphs it runs on are top-1%
sparse (data/STAG_gen.py:108-122), so for the large-N datasets (GAMBIA
N=2139) the framework provides an O(N·E) edge path:

  * **ELL format**: per target node j, up to E source neighbours
    ``indices[j, e]`` with a validity mask — static shapes, gather-friendly,
    the natural TPU sparse layout (no CSR pointer chasing).
  * **SDDMM scores**: Q·K products computed only at graph edges.
  * **masked softmax over the source edges** of each target (the dense path
    normalizes over all N sources and relies on T_k's zeros to drop
    non-edges *after* normalization; the sparse path normalizes over the
    neighbourhood — the semantics the graph structure implies. Equivalence
    holds against a dense computation whose non-edges are masked to -inf
    pre-softmax; see tests/test_sparse.py).
  * NOTE the reference's **elementwise** Chebyshev recurrence
    (lib/utils.py:194) preserves the graph's sparsity pattern (plus the
    identity diagonal), so gathering T_k at edges is exact — no fill-in.

All ops are static-shape gathers + einsums; XLA lowers them to efficient
TPU gather/matmul. E ≈ ⌈0.01·N⌉ (+1 for the diagonal), so the edge path is
~100× less work than dense at the shipped sparsity.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllGraph:
    """Static-shape edge list: for target j, sources ``indices[j, :deg(j)]``."""

    indices: jax.Array  # (N, E) int32 source-node ids (padded with j itself)
    mask: jax.Array     # (N, E) bool — True for real edges

    @property
    def num_nodes(self) -> int:
        return self.indices.shape[0]

    @property
    def max_degree(self) -> int:
        return self.indices.shape[1]

    @property
    def num_edges(self) -> jax.Array:
        return self.mask.sum()

    def tree_flatten(self):
        return (self.indices, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def ell_from_adjacency(
    adj: np.ndarray, max_degree: int | None = None, include_self: bool = True
) -> EllGraph:
    """Dense 0/1 adjacency (source i, target j) → ELL over the source axis.

    ``adj[i, j] != 0`` means i is a source (in-neighbour) of target j —
    matching the dense path's aggregation out_j = Σ_i A[i, j]·x_i
    (model/DSTAGNN_my.py:130). The diagonal is included by default: the
    elementwise Chebyshev pattern always carries T_0 = I.
    """
    adj = np.asarray(adj)
    N = adj.shape[0]
    A = adj != 0
    if include_self:
        A = A | np.eye(N, dtype=bool)
    deg = A.sum(axis=0)  # in-degree per target j
    E = int(max_degree if max_degree is not None else deg.max())
    indices = np.tile(np.arange(N, dtype=np.int32)[:, None], (1, E))
    mask = np.zeros((N, E), dtype=bool)
    src, tgt = np.nonzero(A)  # sorted by source; re-group by target
    order = np.argsort(tgt, kind="stable")
    src, tgt = src[order], tgt[order]
    pos = np.concatenate([[0], np.cumsum(np.bincount(tgt, minlength=N))])
    for j in range(N):
        s = src[pos[j]:pos[j + 1]][:E]
        indices[j, : len(s)] = s
        mask[j, : len(s)] = True
    return EllGraph(jnp.asarray(indices), jnp.asarray(mask))


def gather_edge_values(dense: jax.Array, ell: EllGraph) -> jax.Array:
    """(..., N, N) dense matrix → (..., N, E) values at (indices[j,e], j).

    Formulated as a per-row ``take_along_axis`` on the transposed plane
    rather than a two-index-array fancy gather: the latter's XLA lowering
    aborts the TPU runtime at N≳2000 when the plane is a traced operand
    (reproduced in this jax build; BENCH_NOTES round 3).
    """
    # A shard_ell-padded graph may be gathered over a true-size plane (the
    # targeted-halo path): zero-pad the plane to the padded node count — the
    # padding rows are masked downstream either way.
    n = ell.num_nodes
    if dense.shape[-1] != n or dense.shape[-2] != n:
        pad = [(0, 0)] * (dense.ndim - 2) + [
            (0, n - dense.shape[-2]), (0, n - dense.shape[-1])
        ]
        dense = jnp.pad(dense, pad)
    # dense[..., i, j] with i = indices[j, e]  ≡  denseᵀ[..., j, i]
    d_t = jnp.swapaxes(dense, -1, -2)                     # (..., j, i)
    idx = jnp.broadcast_to(
        ell.indices.astype(jnp.int32),
        d_t.shape[:-1] + (ell.max_degree,),
    )
    return jnp.take_along_axis(d_t, idx, axis=-1)


def sparse_spatial_attention_scores(
    x: jax.Array,
    ell: EllGraph,
    *,
    wq: jax.Array,
    wk: jax.Array,
    n_heads: int,
    d_k: int,
) -> jax.Array:
    """SDDMM: raw edge scores (B, K, N, E) — only at graph edges.

    Mirrors the dense ``spatial_attention_scores`` (ops/attention.py):
    score[b,h,j,e] = Q[b, src, h]·K[b, j, h]/√d_k with src = indices[j,e].
    (Dense equivalent: scores[b,h,i,j] at i=src.)
    """
    B, N, _ = x.shape
    q = jnp.einsum("bnd,dh->bnh", x, wq).reshape(B, N, n_heads, d_k)
    k = jnp.einsum("bnd,dh->bnh", x, wk).reshape(B, N, n_heads, d_k)
    q_src = q[:, ell.indices]  # (B, N, E, H, d_k) — Q rows of the sources
    scores = jnp.einsum("bjehd,bjhd->bhje", q_src, k) / jnp.sqrt(
        jnp.asarray(d_k, x.dtype)
    )
    return scores


# One-shot edge gathers above this size switch to a scan over edge slots
# (multi-GB gathers waste HBM and trip a TPU runtime fault at GAMBIA scale)
_GATHER_BYTES_LIMIT = 256 * 2**20


def sparse_cheb_conv_with_sat(
    x: jax.Array,
    edge_scores: jax.Array,
    ell: EllGraph,
    *,
    cheb_edges: jax.Array,
    bias_edges: jax.Array,
    thetas: jax.Array,
) -> jax.Array:
    """Sparse attention-modulated Chebyshev conv.

    Args:
      x: (B, N, C, T).
      edge_scores: (B, K, N, E) raw SDDMM scores.
      cheb_edges: (K, N, E) — T_k gathered at edges (``gather_edge_values``).
      bias_edges: (K, N, E) — (adj_pa ⊙ mask_k) gathered at edges.
      thetas: (K, C, C_out).

    Returns (B, N, C_out, T), ReLU applied. Softmax is over each target's
    valid source edges (padding masked to -inf).
    """
    B, N, C, T = x.shape
    s = edge_scores + bias_edges[None]
    s = jnp.where(ell.mask[None, None], s, jnp.asarray(-1e30, s.dtype))
    att = jax.nn.softmax(s, axis=-1)  # over source edges e
    A = cheb_edges[None] * att * ell.mask[None, None]
    xm = x.reshape(B, N, C * T)
    E = ell.max_degree
    if B * N * E * C * T * x.dtype.itemsize > _GATHER_BYTES_LIMIT:
        # Large graphs: the one-shot (B, N, E, C·T) gather is multi-GB at
        # GAMBIA scale (3.6 GB at N=2139, E=23, M=4608) and trips a TPU
        # runtime fault in this build besides wasting HBM. Scan over edge
        # slots instead — E transient (B, N, C·T) gathers.
        def edge_step(acc, inp):
            idx_e, A_e = inp          # (N,), (B, K, N)
            acc = acc + jnp.einsum("bkj,bjm->bkjm", A_e, xm[:, idx_e])
            return acc, None

        K = A.shape[1]
        agg, _ = jax.lax.scan(
            edge_step,
            jnp.zeros((B, K, N, C * T), x.dtype),
            (ell.indices.T, jnp.moveaxis(A, 3, 0)),
        )
        agg = agg.reshape(B, K, N, C, T)
    else:
        x_src = xm[:, ell.indices]    # (B, N, E, C·T)
        agg = jnp.einsum("bkje,bjem->bkjm", A, x_src).reshape(
            B, A.shape[1], N, C, T
        )
    out = jnp.einsum("bkjct,kco->bjot", agg, thetas)
    return jax.nn.relu(out)


def dense_reference_masked(
    x: jax.Array,
    scores: jax.Array,
    adj_pattern: jax.Array,
    *,
    cheb_polys: jax.Array,
    bias: jax.Array,
    thetas: jax.Array,
) -> jax.Array:
    """Dense masked-softmax equivalent of the sparse path (test oracle):
    non-edges get -inf pre-softmax instead of relying on T_k zeros."""
    B, N, C, T = x.shape
    pattern = (adj_pattern != 0) | jnp.eye(N, dtype=bool)
    s = scores + bias[None]
    s = jnp.where(pattern[None, None], s, -1e30)
    att = jax.nn.softmax(s, axis=2)
    A = cheb_polys[None] * att * pattern[None, None]
    xm = x.reshape(B, N, C * T)
    agg = jnp.einsum("bkij,bim->bkjm", A, xm).reshape(B, A.shape[1], N, C, T)
    out = jnp.einsum("bkjct,kco->bjot", agg, thetas)
    return jax.nn.relu(out)
