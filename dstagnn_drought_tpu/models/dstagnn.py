"""DSTAGNN model family — functional JAX re-design.

Architecture (reference: model/DSTAGNN_my.py:199-297): a stack of ST blocks,
each = temporal embedding → temporal multi-head attention with score
residuals → 1×F "pre conv" down to d_model → spatial embedding → spatial
attention scores → attention-modulated K-order Chebyshev graph conv →
3/5/7-kernel gated temporal convs → linear time-fusion → residual + LayerNorm;
block outputs are concatenated along time and funnelled through a final conv +
linear head to the prediction horizon.

Design differences from the reference (all documented, none change the
working PEMS-path semantics):
  * pure functions over parameter pytrees; the whole forward jit-compiles as
    one XLA program (no Python-level T×K loops — see ops/cheb.py);
  * the multichannel residual-shape defect (reference :247-252 crashes when
    in_channels != nb_time_filter, e.g. the GAMBIA config) is fixed by routing
    through residual_conv whenever channel counts differ;
  * later blocks' token-width parameter equals the actual incoming feature
    count (nb_time_filter) instead of the reference's
    ``num_of_d * nb_time_filter`` (:262) which crashes for in_channels > 1;
    identical for the in_channels == 1 datasets the reference actually runs.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dstagnn_drought_tpu.ops.attention import (
    spatial_attention_scores,
    temporal_attention,
)
from dstagnn_drought_tpu.ops.cheb import cheb_conv_with_sat
from dstagnn_drought_tpu.ops.gtu import (
    _IM2COL_MIN_T,
    conv2d_nchw,
    gtu,
    gtu_bnct,
)
from dstagnn_drought_tpu.ops.graph import cheb_polynomials, scaled_laplacian
from dstagnn_drought_tpu.ops.nn import dropout, layer_norm
from dstagnn_drought_tpu.models import layers as L

Params = Any  # nested dict pytree


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static (hashable) model hyperparameters — safe to close over in jit."""

    num_of_vertices: int
    len_input: int
    num_for_predict: int
    num_of_d: int  # input feature count (reference: in_channels doubles as num_of_d)
    nb_block: int = 4
    in_channels: int = 1
    K: int = 3
    nb_chev_filter: int = 32
    nb_time_filter: int = 32
    time_strides: int = 1
    d_model: int = 512
    d_k: int = 32
    d_v: int = -1
    n_heads: int = 3
    dropout_rate: float = 0.05

    def __post_init__(self):
        if self.d_v < 0:
            object.__setattr__(self, "d_v", self.d_k)

    @property
    def block_specs(self):
        """(num_of_d, in_channels) per block: block 1 consumes the raw input,
        later blocks consume (B, N, nb_time_filter, T)."""
        first = (self.num_of_d, self.in_channels)
        rest = (self.nb_time_filter, self.nb_chev_filter)
        return [first] + [rest] * (self.nb_block - 1)

    @classmethod
    def from_config(cls, cfg) -> "ModelSpec":
        t, d = cfg.training, cfg.data
        return cls(
            num_of_vertices=d.num_of_vertices,
            len_input=d.len_input,
            num_for_predict=d.num_for_predict,
            num_of_d=t.in_channels,
            nb_block=t.nb_block,
            in_channels=t.in_channels,
            K=t.K,
            nb_chev_filter=t.nb_chev_filter,
            nb_time_filter=t.nb_time_filter,
            time_strides=t.time_strides,
            d_model=t.d_model,
            d_k=t.d_k,
            d_v=t.d_v,
            n_heads=t.n_heads,
            dropout_rate=t.dropout,
        )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_block(kg: L.KeyGen, spec: ModelSpec, num_of_d: int, in_channels: int,
                bell=None):
    N, T = spec.num_of_vertices, spec.len_input
    H, d_k, d_v, K = spec.n_heads, spec.d_k, spec.d_v, spec.K
    C = spec.nb_time_filter
    p = {}
    p["embed_t"] = {
        **L.embedding_params(kg, T, N),
        **{f"ln_{k}": v for k, v in L.layer_norm_params(kg, N).items()},
    }
    p["tat"] = {
        "wq": L.linear_params(kg, N, d_k * H, bias=False)["w"],
        "wk": L.linear_params(kg, N, d_k * H, bias=False)["w"],
        "wv": L.linear_params(kg, N, d_v * H, bias=False)["w"],
        "wo": L.linear_params(kg, H * d_v, N, bias=False)["w"],
        **{f"ln_{k}": v for k, v in L.layer_norm_params(kg, N).items()},
    }
    # (d_model, T, 1, num_of_d) — torch Conv2d(T→d_model, kernel (1, F)) layout
    p["pre_conv"] = L.conv2d_params(kg, spec.d_model, T, 1, num_of_d)
    p["embed_s"] = {
        **L.embedding_params(kg, N, spec.d_model),
        **{f"ln_{k}": v for k, v in L.layer_norm_params(kg, spec.d_model).items()},
    }
    p["sat"] = {
        "wq": L.linear_params(kg, spec.d_model, d_k * K, bias=False)["w"],
        "wk": L.linear_params(kg, spec.d_model, d_k * K, bias=False)["w"],
    }
    p["cheb"] = {
        "thetas": jnp.stack(
            [L.xavier_uniform(kg(), (in_channels, spec.nb_chev_filter)) for _ in range(K)]
        ),
    }
    if bell is None:
        p["cheb"]["masks"] = jnp.stack(
            [L.xavier_uniform(kg(), (N, N)) for _ in range(K)]
        )
    else:
        # tile-resident masks: learnable ONLY on the BELL active-tile support
        # (exact — off-support entries of the reference's dense mask have
        # identically zero gradient, model/DSTAGNN_my.py:126 with binarized
        # adj_pa). Entries are iid uniform with the DENSE xavier bound
        # (fan_in = fan_out = N), so the distribution matches a gathered
        # dense init. ``bell`` is a BlockEllGraph (single device,
        # (A, K, BS, BS)) or a BellTileShardPlan (partitioned,
        # (P, A_loc, K, BS, BS) — sharded over 'graph' by the trainer).
        BS = bell.block_size
        if hasattr(bell, "max_active"):   # BellTileShardPlan
            shape = (bell.num_shards, bell.max_active, K, BS, BS)
        else:                             # BlockEllGraph
            shape = (bell.num_active, K, BS, BS)
        bound = (6.0 / (N + N)) ** 0.5
        p["cheb"]["mask_tiles"] = jnp.asarray(
            kg().uniform(-bound, bound, size=shape), dtype=jnp.float32,
        )
    for ksz in (3, 5, 7):
        p[f"gtu{ksz}"] = L.conv2d_params(kg, 2 * C, C, 1, ksz)
    p["fcmy"] = L.linear_params(kg, 3 * T - 12, T)
    p["residual_conv"] = L.conv2d_params(kg, C, in_channels, 1, 1)
    p["ln"] = L.layer_norm_params(kg, C)
    return p


def init_params(key: jax.Array, spec: ModelSpec, bell=None) -> Params:
    kg = L.KeyGen(key)
    blocks = [
        _init_block(kg, spec, nd, ic, bell=bell) for nd, ic in spec.block_specs
    ]
    T_cat = (spec.len_input // spec.time_strides) * spec.nb_block
    return {
        "blocks": blocks,
        "final_conv": L.conv2d_params(kg, 128, T_cat, 1, spec.nb_time_filter),
        "final_fc": L.linear_params(kg, 128, spec.num_for_predict),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _block_apply(
    p: Params,
    x: jax.Array,
    res_att,
    *,
    spec: ModelSpec,
    adj_pa: jax.Array,
    cheb_polys: jax.Array,
    deterministic: bool,
    rng: jax.Array | None,
    use_pallas: bool = False,
    ell=None,
    halo=None,
    bell_tiles=None,
    fuse_tat: bool = False,
    fuse_spatial: bool = False,
    fuse_gtu: bool = False,
):
    B, N, F, T = x.shape
    if F == 1:
        # EmbedT (reference :227-228,172-176): permute to (B,F,T,N), add the
        # full positional table, LayerNorm over N.
        te = x.transpose(0, 2, 3, 1) + p["embed_t"]["pos"][None, None]
        TEmx = layer_norm(te, p["embed_t"]["ln_scale"], p["embed_t"]["ln_bias"])
    else:
        TEmx = x.transpose(0, 2, 3, 1)  # (B, F, T, N), no embedding (:229-230)

    # Score-residual threading: broadcastable shapes add directly (reference
    # :37). When the feature-axis width changes between blocks (only possible
    # on the fixed multichannel path, in_channels ∉ {1, nb_time_filter}),
    # reduce the incoming scores over that axis — the reference crashes here.
    if (
        isinstance(res_att, jax.Array)
        and res_att.ndim == 5
        and res_att.shape[1] not in (1, F)
    ):
        res_att = res_att.mean(axis=1, keepdims=True)

    if fuse_tat:
        from dstagnn_drought_tpu.ops.pallas.tat_fused import (
            fused_temporal_attention,
        )

        TATout, re_at = fused_temporal_attention(
            TEmx, res_att,
            pos=None, ln0_scale=None, ln0_bias=None,
            wq=p["tat"]["wq"], wk=p["tat"]["wk"], wv=p["tat"]["wv"],
            wo=p["tat"]["wo"],
            ln_scale=p["tat"]["ln_scale"], ln_bias=p["tat"]["ln_bias"],
            n_heads=spec.n_heads, d_k=spec.d_k, d_v=spec.d_v,
        )
    else:
        TATout, re_at = temporal_attention(
            TEmx,
            res_att,
            wq=p["tat"]["wq"],
            wk=p["tat"]["wk"],
            wv=p["tat"]["wv"],
            wo=p["tat"]["wo"],
            ln_scale=p["tat"]["ln_scale"],
            ln_bias=p["tat"]["ln_bias"],
            n_heads=spec.n_heads,
            d_k=spec.d_k,
            d_v=spec.d_v,
        )

    if rng is not None:
        rng, k1, k2 = jax.random.split(rng, 3)
    else:
        k1 = k2 = None

    # True when spatial_gcn comes out of a pallas_call: its buffer layout
    # is pinned row-major, so the BNCT temporal tail (which consumes
    # (B, N, C, T) directly) wins; XLA-produced outputs keep the legacy
    # tail where the compiler chooses layouts freely (measured: dense
    # regressed 71.4 -> 72.2 ms with the BNCT tail forced on).
    pinned_out = False
    if fuse_spatial and ell is None and halo is None:
        # One Pallas kernel for the whole spatial middle: pre_conv → EmbedS
        # LN → dropout → SAt SDDMM → source-axis softmax+bias → Chebyshev
        # aggregation → Θ mix → ReLU (ops/pallas/block_spatial_fused.py).
        from dstagnn_drought_tpu.ops.pallas.block_spatial_fused import (
            fused_spatial_middle,
        )

        STAt = jnp.zeros((), x.dtype)  # not materialized by the kernel
        pinned_out = True
        spatial_gcn = fused_spatial_middle(
            TATout, x,
            pre_w=p["pre_conv"]["w"], pre_b=p["pre_conv"]["b"],
            pos=p["embed_s"]["pos"],
            ln_scale=p["embed_s"]["ln_scale"],
            ln_bias=p["embed_s"]["ln_bias"],
            wq=p["sat"]["wq"], wk=p["sat"]["wk"],
            adj_pa=adj_pa, masks=p["cheb"]["masks"],
            cheb_polys=cheb_polys, thetas=p["cheb"]["thetas"],
            K=spec.K, d_k=spec.d_k,
            dropout_rate=0.0 if deterministic else spec.dropout_rate,
            dropout_key=k1,
        )
        SEmx = None
    else:
        # pre_conv (reference :232, :207): Conv2d(T→d_model, kernel (1,F)) on
        # (B,T,N,F) — a per-node linear map over (T,F), expressed as an einsum.
        x_tat = (
            jnp.einsum("bftn,dtf->bnd", TATout, p["pre_conv"]["w"][:, :, 0, :])
            + p["pre_conv"]["b"]
        )

        se = x_tat + p["embed_s"]["pos"][None]
        SEmx = layer_norm(se, p["embed_s"]["ln_scale"], p["embed_s"]["ln_bias"])
        SEmx = dropout(SEmx, spec.dropout_rate, k1, deterministic)

    if SEmx is None:
        pass  # fused path produced spatial_gcn above
    elif ell is not None:
        from dstagnn_drought_tpu.ops.block_sparse import (
            BlockEllGraph,
            block_sparse_cheb_conv_with_sat,
            block_sparse_spatial_attention_scores,
            gather_block_values,
        )
        from dstagnn_drought_tpu.ops.sparse import (
            gather_edge_values,
            sparse_cheb_conv_with_sat,
            sparse_spatial_attention_scores,
        )

        bias = (
            adj_pa[None] * p["cheb"]["masks"]
            if "masks" in p["cheb"] else None
        )
        from dstagnn_drought_tpu.parallel.bell_partition import (
            BellShardPlan,
            BellTileShardPlan,
        )

        if halo is not None and isinstance(halo[1], BellTileShardPlan):
            # Node-partitioned tile-resident BELL: targeted block halo
            # (ship only referenced source blocks), per-shard fused K1/K2
            # backward, masks sharded over 'graph'.
            from dstagnn_drought_tpu.parallel.bell_partition import (
                partitioned_bell_tiles_conv,
                partitioned_bell_tiles_conv_overlap,
            )

            mesh_, plan_ = halo[0], halo[1]
            ov_ = halo[2] if len(halo) > 2 else None
            STAt = jnp.zeros((), x.dtype)
            pinned_out = True
            if ov_ is not None:
                # halo/compute overlap: local-source tiles run while the
                # targeted all_to_all is in flight (north-star claim)
                spatial_gcn = partitioned_bell_tiles_conv_overlap(
                    mesh_, SEmx, x, plan_, ov_,
                    mask_tiles=p["cheb"]["mask_tiles"],
                    thetas=p["cheb"]["thetas"],
                    wq=p["sat"]["wq"], wk=p["sat"]["wk"],
                    n_heads=spec.K, d_k=spec.d_k,
                )
            else:
                spatial_gcn = partitioned_bell_tiles_conv(
                    mesh_, SEmx, x, plan_,
                    mask_tiles=p["cheb"]["mask_tiles"],
                    thetas=p["cheb"]["thetas"],
                    wq=p["sat"]["wq"], wk=p["sat"]["wk"],
                    n_heads=spec.K, d_k=spec.d_k,
                )
        elif halo is not None and isinstance(halo[1], BellShardPlan):
            # Node-partitioned BELL: each device runs the fused tile kernel
            # on its own target tiles with one all_gather of source rows
            # (parallel/bell_partition.py).
            from dstagnn_drought_tpu.parallel.bell_partition import (
                partitioned_bell_conv,
            )

            mesh_, plan_ = halo
            STAt = jnp.zeros((), x.dtype)
            pinned_out = True
            spatial_gcn = partitioned_bell_conv(
                mesh_, SEmx, x, plan_,
                adj_pa=adj_pa, masks=p["cheb"]["masks"],
                cheb_polys=cheb_polys, thetas=p["cheb"]["thetas"],
                wq=p["sat"]["wq"], wk=p["sat"]["wk"],
                n_heads=spec.K, d_k=spec.d_k,
            )
        elif halo is not None and not isinstance(ell, BlockEllGraph):
            # Node-partitioned path: SAt SDDMM + Chebyshev aggregation run
            # per-shard under shard_map with a targeted all_to_all halo of
            # boundary rows (parallel/graph_partition.py). The global score
            # map is never materialized.
            from dstagnn_drought_tpu.parallel.graph_partition import (
                halo_partitioned_sparse_conv,
            )

            mesh_, plan_ = halo
            STAt = jnp.zeros((), x.dtype)
            spatial_gcn = halo_partitioned_sparse_conv(
                mesh_, SEmx, x, plan_,
                cheb_edges=gather_edge_values(cheb_polys, ell),
                bias_edges=gather_edge_values(bias, ell),
                thetas=p["cheb"]["thetas"],
                wq=p["sat"]["wq"], wk=p["sat"]["wk"],
                n_heads=spec.K, d_k=spec.d_k,
            )
        elif isinstance(ell, BlockEllGraph):
            # Block-sparse (BELL) scaling path: per-active-tile SDDMM and
            # aggregation as dense 128×128 MXU matmuls (ops/block_sparse.py);
            # work scales with active blocks, not N². With use_pallas the
            # whole SDDMM → online-softmax → aggregation pipeline runs as
            # one fused streaming kernel (ops/pallas/bell_fused.py).
            if "mask_tiles" in p["cheb"]:
                # Tile-resident masks (O(active-tiles) params, no dense
                # plane): always the fused kernel path.
                if bell_tiles is None:
                    raise ValueError(
                        "params use tile-resident masks (mask_tiles) but no "
                        "bell_tiles constants were provided — build them "
                        "with ops.block_sparse.build_bell_tile_constants()."
                    )
                from dstagnn_drought_tpu.ops.pallas.bell_fused import (
                    bell_cheb_conv_tiles,
                )

                STAt = jnp.zeros((), x.dtype)
                pinned_out = True
                spatial_gcn = bell_cheb_conv_tiles(
                    x, SEmx, ell,
                    wq=p["sat"]["wq"], wk=p["sat"]["wk"],
                    mask_tiles=p["cheb"]["mask_tiles"],
                    pattern_tiles=bell_tiles["pattern_tiles"],
                    pa_tiles=bell_tiles["pa_tiles"],
                    cheb_tiles=bell_tiles["cheb_tiles"],
                    thetas=p["cheb"]["thetas"],
                    n_heads=spec.K, d_k=spec.d_k,
                )
            elif use_pallas:
                from dstagnn_drought_tpu.ops.pallas.bell_fused import (
                    bell_cheb_conv_with_sat_pallas,
                )

                STAt = jnp.zeros((), x.dtype)  # not materialized by the kernel
                pinned_out = True
                spatial_gcn = bell_cheb_conv_with_sat_pallas(
                    x, SEmx, ell,
                    wq=p["sat"]["wq"], wk=p["sat"]["wk"],
                    adj_pa=adj_pa, masks=p["cheb"]["masks"],
                    cheb_polys=cheb_polys, thetas=p["cheb"]["thetas"],
                    n_heads=spec.K, d_k=spec.d_k,
                )
            else:
                block_scores = block_sparse_spatial_attention_scores(
                    SEmx, ell, wq=p["sat"]["wq"], wk=p["sat"]["wk"],
                    n_heads=spec.K, d_k=spec.d_k,
                )
                STAt = block_scores  # (B, K, NJ, S, BS, BS) — exported map
                spatial_gcn = block_sparse_cheb_conv_with_sat(
                    x, block_scores, ell,
                    cheb_blocks=gather_block_values(cheb_polys, ell),
                    bias_blocks=gather_block_values(bias, ell),
                    thetas=p["cheb"]["thetas"],
                )  # (B, N, C, T)
        else:
            # Edge-list (ELL) sparse path: SDDMM edge scores + neighbourhood
            # softmax aggregation, O(N·E) memory (ops/sparse.py).
            edge_scores = sparse_spatial_attention_scores(
                SEmx, ell, wq=p["sat"]["wq"], wk=p["sat"]["wk"],
                n_heads=spec.K, d_k=spec.d_k,
            )
            STAt = edge_scores  # (B, K, N, E) — the exported attention map
            spatial_gcn = sparse_cheb_conv_with_sat(
                x, edge_scores, ell,
                cheb_edges=gather_edge_values(cheb_polys, ell),
                bias_edges=gather_edge_values(bias, ell),
                thetas=p["cheb"]["thetas"],
            )  # (B, N, C, T)
    else:
        STAt = spatial_attention_scores(
            SEmx, wq=p["sat"]["wq"], wk=p["sat"]["wk"],
            n_heads=spec.K, d_k=spec.d_k,
        )
        if use_pallas:
            from dstagnn_drought_tpu.ops.pallas.cheb_sat import (
                cheb_conv_with_sat_pallas,
            )

            pinned_out = True
            spatial_gcn = cheb_conv_with_sat_pallas(
                x, STAt, adj_pa,
                cheb_polys=cheb_polys,
                masks=p["cheb"]["masks"],
                thetas=p["cheb"]["thetas"],
            )
        else:
            spatial_gcn = cheb_conv_with_sat(
                x, STAt, adj_pa,
                cheb_polys=cheb_polys,
                masks=p["cheb"]["masks"],
                thetas=p["cheb"]["thetas"],
            )  # (B, N, C, T)

    if fuse_gtu:
        # Fused Pallas temporal tail (ops/pallas/gtu_fused.py): the three
        # gated convs + time concat + fcmy in one x pass, entirely in the
        # (B, N, C, T) layout — no BCNT transposes, no HBM ``cols`` tensor.
        from dstagnn_drought_tpu.ops.pallas.gtu_fused import supported

        # Static shape gate (ADVICE r4): the fused kernel assumes stride 1
        # and 16-aligned C/T. Unsupported shapes fall through to the XLA
        # im2col path below instead of computing an unstrided conv
        # (time_strides > 1) or hitting a Pallas tile-alignment error.
        fuse_gtu = supported(
            spec.nb_time_filter, int(spatial_gcn.shape[-1]), spec.time_strides
        )
    # XLA temporal tail in (B, N, C, T) space (round 5): the same im2col
    # matmuls as the legacy BCNT tail, minus the model-level layout round
    # trip (B,N,C,T)→(B,C,N,T)→(B,N,T,C) per GTU per direction — and the
    # layout-pinned Pallas output of the sparse paths feeds it directly.
    # Long-T only (where im2col is the GTU formulation) and stride 1 (the
    # reference's hardcoded setting, train_DSTAGNN_my.py:93).
    tail_bnct = (
        pinned_out
        and not fuse_gtu
        and spec.time_strides == 1
        and int(spatial_gcn.shape[-1]) >= _IM2COL_MIN_T
    )
    if fuse_gtu or tail_bnct:
        if fuse_gtu:
            from dstagnn_drought_tpu.ops.pallas.gtu_fused import gtu_fcmy

            time_conv = gtu_fcmy(
                None, spatial_gcn,
                p["gtu3"]["w"], p["gtu3"]["b"],
                p["gtu5"]["w"], p["gtu5"]["b"],
                p["gtu7"]["w"], p["gtu7"]["b"],
                p["fcmy"]["w"], p["fcmy"]["b"],
            )  # (B, N, C, T)
        else:
            g = [
                gtu_bnct(spatial_gcn, p[f"gtu{k}"]["w"], p[f"gtu{k}"]["b"],
                         in_channels=spec.nb_time_filter)
                for k in (3, 5, 7)
            ]
            cat = jnp.concatenate(g, axis=2)   # (B, N, 3T-12, C)
            time_conv = jnp.einsum(
                "bnmc,mt->bnct", cat, p["fcmy"]["w"]
            ) + p["fcmy"]["b"]                 # (B, N, C, T)
        time_conv = dropout(time_conv, spec.dropout_rate, k2, deterministic)
        if F == 1:
            time_conv_output = jax.nn.relu(time_conv)
        else:
            time_conv_output = jax.nn.relu(spatial_gcn + time_conv)
        if F == spec.nb_time_filter:
            x_residual = x  # identity residual (:251), already (B, N, C, T)
        else:
            # (1,1) conv = per-node channel map; stride is 1 on this path
            x_residual = jnp.einsum(
                "bnft,cf->bnct", x, p["residual_conv"]["w"][:, :, 0, 0]
            ) + p["residual_conv"]["b"][None, None, :, None]
        y = jax.nn.relu(x_residual + time_conv_output)  # (B, N, C, T)
        y = layer_norm(y.transpose(0, 3, 1, 2), p["ln"]["scale"],
                       p["ln"]["bias"])  # (B, T, N, C), LN over C
        return y.transpose(0, 2, 3, 1), re_at, STAt  # (B, N, C, T)

    X = spatial_gcn.transpose(0, 2, 1, 3)  # (B, C, N, T)
    g = [
        gtu(X, p[f"gtu{k}"]["w"], p[f"gtu{k}"]["b"],
            in_channels=spec.nb_time_filter, time_strides=spec.time_strides)
        for k in (3, 5, 7)
    ]
    time_conv = jnp.concatenate(g, axis=-1)  # (B, C, N, 3T-12)
    time_conv = jnp.einsum("bcnm,mt->bcnt", time_conv, p["fcmy"]["w"]) + p["fcmy"]["b"]
    time_conv = dropout(time_conv, spec.dropout_rate, k2, deterministic)

    if F == 1:
        time_conv_output = jax.nn.relu(time_conv)
    else:
        time_conv_output = jax.nn.relu(X + time_conv)

    if F == spec.nb_time_filter:
        x_residual = x.transpose(0, 2, 1, 3)  # identity residual (:251)
    else:
        # F == 1 reference path (:249); also the documented fix for the
        # reference's multichannel residual-shape defect (:247-252).
        x_residual = conv2d_nchw(
            x.transpose(0, 2, 1, 3),
            p["residual_conv"]["w"],
            p["residual_conv"]["b"],
            stride=(1, spec.time_strides),
        )

    y = jax.nn.relu(x_residual + time_conv_output)  # (B, C, N, T)
    y = layer_norm(y.transpose(0, 3, 2, 1), p["ln"]["scale"], p["ln"]["bias"])
    return y.transpose(0, 2, 3, 1), re_at, STAt  # (B, N, C, T)


def apply(
    params: Params,
    x: jax.Array,
    *,
    spec: ModelSpec,
    adj_pa: jax.Array,
    cheb_polys: jax.Array,
    deterministic: bool = True,
    rng: jax.Array | None = None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    ell=None,
    halo=None,
    bell_tiles=None,
    fuse_tat: bool = False,
    fuse_spatial: bool = False,
    fuse_gtu: bool = False,
    remat: bool = False,
    return_attention: bool = False,
) -> jax.Array:
    """Full forward pass. x: (B, N, F, T) → (B, N, num_for_predict).

    ``ell``: optional :class:`~dstagnn_drought_tpu.ops.sparse.EllGraph` —
    switches every block's spatial attention + Chebyshev conv to the sparse
    O(N·E) edge path (the aware-graph neighbourhood defines both the score
    support and the softmax normalization; see ops/sparse.py)."""
    if compute_dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        x = x.astype(compute_dtype)
        adj_pa = adj_pa.astype(compute_dtype)
        cheb_polys = cheb_polys.astype(compute_dtype)

    res_att = jnp.zeros((), dtype=x.dtype)
    outs = []
    spatial_maps = []

    def block_fn(bp, x, res_att, sub):
        return _block_apply(
            bp, x, res_att,
            spec=spec, adj_pa=adj_pa, cheb_polys=cheb_polys,
            deterministic=deterministic, rng=sub, use_pallas=use_pallas,
            ell=ell, halo=halo, bell_tiles=bell_tiles,
            fuse_tat=fuse_tat, fuse_spatial=fuse_spatial,
            fuse_gtu=fuse_gtu,
        )

    if remat:
        # rematerialize each ST block's activations in the backward pass:
        # the big per-block intermediates (temporal-attention chains with
        # d_model = N, GTU im2col patches — all O(N·T·C) with large
        # constants) are recomputed instead of stored, trading ~1 extra
        # forward for the activation memory that dominates HBM at large N
        block_fn = jax.checkpoint(block_fn)

    for i, bp in enumerate(params["blocks"]):
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        x, res_att, stat = block_fn(bp, x, res_att, sub)
        outs.append(x)
        spatial_maps.append(stat)

    final_x = jnp.concatenate(outs, axis=-1)  # (B, N, C, T*nb_block)
    # final_conv (reference :266, :278): Conv2d(T·nb→128, kernel (1,C)).
    out1 = (
        jnp.einsum("bnct,dtc->bnd", final_x, params["final_conv"]["w"][:, :, 0, :])
        + params["final_conv"]["b"]
    )
    out = out1 @ params["final_fc"]["w"] + params["final_fc"]["b"]
    out = out.astype(jnp.float32)
    if return_attention:
        # per-block raw spatial score maps — dense (B,K,N,N) or edge (B,K,N,E)
        # in sparse mode. Mirrors the reference's legacy attention export
        # (lib/utils.py:503,552-589, stale w.r.t. its own model).
        return out, spatial_maps
    return out


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------

def make_model(
    key: jax.Array,
    spec: ModelSpec,
    adj_merge: np.ndarray | jax.Array,
    adj_pa: np.ndarray | jax.Array,
    bell=None,
):
    """Build (params, constants) like the reference ``make_model``
    (model/DSTAGNN_my.py:282-297): scaled Laplacian of the merged graph →
    K Chebyshev polynomials as device constants → initialized params.

    With ``bell`` (a :class:`~dstagnn_drought_tpu.ops.block_sparse.
    BlockEllGraph`), the learnable graph masks are TILE-RESIDENT — stored
    only on the active-tile support (O(N·band) parameters instead of
    O(K·N²)) — and the constants carry per-tile adj_pa / Chebyshev values
    (``bell_tiles``) instead of dense (N, N) planes, so nothing O(N²) is
    device-resident. The dense ``cheb_polys`` / ``adj_pa`` constants become
    minimal placeholders (the tile path never reads them)."""
    L_tilde = scaled_laplacian(jnp.asarray(adj_merge, jnp.float32))
    polys = cheb_polynomials(L_tilde, spec.K)
    params = init_params(key, spec, bell=bell)
    if bell is not None:
        constants = {
            # placeholders: the tile path never builds dense planes; keeping
            # the keys preserves the apply()/step signature
            "cheb_polys": jnp.zeros((spec.K, 1, 1), jnp.float32),
            "adj_pa": jnp.zeros((1, 1), jnp.float32),
        }
        if not hasattr(bell, "max_active"):
            # single-device BlockEllGraph: per-tile constants travel in the
            # constants dict; a BellTileShardPlan carries its own per-shard
            # constants instead (consumed via the halo closure)
            from dstagnn_drought_tpu.ops.block_sparse import (
                build_bell_tile_constants,
            )

            constants["bell_tiles"] = build_bell_tile_constants(
                bell, np.asarray(adj_pa), np.asarray(polys)
            )
        del polys
    else:
        constants = {
            "cheb_polys": polys,
            "adj_pa": jnp.asarray(adj_pa, jnp.float32),
        }
    return params, constants


# ---------------------------------------------------------------------------
# torch weight import (parity harness)
# ---------------------------------------------------------------------------

def import_torch_state_dict(state_dict, spec: ModelSpec) -> Params:
    """Map a reference ``DSTAGNN_submodule.state_dict()`` onto our pytree.

    Accepts a dict of numpy arrays or torch tensors. Used by the parity tests
    to inject identical weights into both implementations.
    """

    def arr(name):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v), jnp.float32)

    blocks = []
    for i in range(spec.nb_block):
        pre = f"BlockList.{i}."
        b = {
            "embed_t": {
                "pos": arr(pre + "EmbedT.pos_embed.weight"),
                "ln_scale": arr(pre + "EmbedT.norm.weight"),
                "ln_bias": arr(pre + "EmbedT.norm.bias"),
            },
            "tat": {
                "wq": arr(pre + "TAt.W_Q.weight").T,
                "wk": arr(pre + "TAt.W_K.weight").T,
                "wv": arr(pre + "TAt.W_V.weight").T,
                "wo": arr(pre + "TAt.fc.weight").T,
                "ln_scale": arr(pre + "TAt.layer_norm.weight"),
                "ln_bias": arr(pre + "TAt.layer_norm.bias"),
            },
            "pre_conv": {
                "w": arr(pre + "pre_conv.weight"),
                "b": arr(pre + "pre_conv.bias"),
            },
            "embed_s": {
                "pos": arr(pre + "EmbedS.pos_embed.weight"),
                "ln_scale": arr(pre + "EmbedS.norm.weight"),
                "ln_bias": arr(pre + "EmbedS.norm.bias"),
            },
            "sat": {
                "wq": arr(pre + "SAt.W_Q.weight").T,
                "wk": arr(pre + "SAt.W_K.weight").T,
            },
            "cheb": {
                "thetas": jnp.stack(
                    [arr(pre + f"cheb_conv_SAt.Theta.{k}") for k in range(spec.K)]
                ),
                "masks": jnp.stack(
                    [arr(pre + f"cheb_conv_SAt.mask.{k}") for k in range(spec.K)]
                ),
            },
            "fcmy": {
                "w": arr(pre + "fcmy.0.weight").T,
                "b": arr(pre + "fcmy.0.bias"),
            },
            "residual_conv": {
                "w": arr(pre + "residual_conv.weight"),
                "b": arr(pre + "residual_conv.bias"),
            },
            "ln": {
                "scale": arr(pre + "ln.weight"),
                "bias": arr(pre + "ln.bias"),
            },
        }
        for ksz in (3, 5, 7):
            b[f"gtu{ksz}"] = {
                "w": arr(pre + f"gtu{ksz}.con2out.weight"),
                "b": arr(pre + f"gtu{ksz}.con2out.bias"),
            }
        blocks.append(b)

    return {
        "blocks": blocks,
        "final_conv": {
            "w": arr("final_conv.weight"),
            "b": arr("final_conv.bias"),
        },
        "final_fc": {
            "w": arr("final_fc.weight").T,
            "b": arr("final_fc.bias"),
        },
    }
