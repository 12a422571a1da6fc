"""Typed configuration with a loader for the reference INI format.

The reference configures everything through ``configparser`` INI files with
``[Data]`` and ``[Training]`` sections (reference: train_DSTAGNN_my.py:36-45,
configurations/*.conf). This module keeps those files working verbatim while
giving the framework a validated, typed config object.

Documented deviations from the reference (see SURVEY.md §5 "Config"):
  * ``graph`` defaults to ``'G'`` when absent — the reference crashes with a
    KeyError on PEMS03/07/08 confs which lack the key (train_DSTAGNN_my.py:81).
  * ``d_v`` is an explicit field (the reference hardcodes d_v := d_k,
    train_DSTAGNN_my.py:102).
  * ``time_strides`` is an explicit field (reference hardcodes 1,
    train_DSTAGNN_my.py:93).
  * unused-but-parsed reference keys (``use_tpu``, ``ctx``, ``period``) are
    accepted and ignored, for drop-in compatibility.
"""
from __future__ import annotations

import configparser
import dataclasses
from pathlib import Path
from typing import Optional


@dataclasses.dataclass
class DataConfig:
    adj_filename: str = ""
    graph_signal_matrix_filename: str = ""
    stag_filename: str = ""
    strg_filename: str = ""
    id_filename: Optional[str] = None
    num_of_vertices: int = 0
    points_per_hour: int = 1
    num_for_predict: int = 12
    len_input: int = 12
    dataset_name: str = ""
    period: int = 12  # parsed for compat; unused by the reference too


@dataclasses.dataclass
class TrainingConfig:
    model_name: str = "dstagnn"
    in_channels: int = 1
    nb_block: int = 4
    n_heads: int = 3
    K: int = 3
    d_k: int = 32
    d_v: int = -1  # -1 → defaults to d_k (reference behaviour)
    d_model: int = 512
    nb_chev_filter: int = 32
    nb_time_filter: int = 32
    time_strides: int = 1
    batch_size: int = 32
    graph: str = "G"  # 'G' = raw adjacency, 'AG' = STAG aware-graph
    num_of_weeks: int = 0
    num_of_days: int = 0
    num_of_hours: int = 1
    start_epoch: int = 0
    epochs: int = 100
    learning_rate: float = 1e-4
    dropout: float = 0.05
    seed: int = 1
    # --- new-framework knobs (no reference equivalent) ---
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    use_pallas: bool = False        # fused Pallas kernels on the cheb-attention path
    sparse: bool = False            # sparse SAt + cheb conv path
    sparse_format: str = "ell"      # "ell" (edge list) | "bell" (block-sparse)
    block_size: int = 128           # bell: node-block tile size (MXU width)
    mask_format: str = "dense"      # learnable graph-mask storage: "dense"
                                    # = reference-shaped (K, N, N) per block;
                                    # "tiles" = ONLY on the BELL active-tile
                                    # support (exact — the reference bias is
                                    # adj_pa ⊙ mask with adj_pa binarized, so
                                    # off-support entries never train), which
                                    # breaks the O(K·N²) parameter wall and
                                    # drops every dense (N, N) plane from the
                                    # train step. Requires sparse=true,
                                    # sparse_format=bell.
    max_degree: int = 0             # ell: cap on in-degree (0 = graph max)
    data_axis: int = 1              # mesh axis sizes; 1 = single chip
    graph_axis: int = 1
    halo: str = "gather"            # node-partition halo strategy when
                                    # sparse & graph_axis > 1: "gather"
                                    # (all_gather all source rows; GSPMD-
                                    # equivalent volume) | "targeted"
                                    # (precomputed boundary-row all_to_all,
                                    # parallel/graph_partition.py; requires
                                    # num_of_vertices % graph_axis == 0)
    halo_overlap: bool = True       # tile-resident partitioned BELL: split
                                    # each shard's tiles into local-source /
                                    # halo-dependent sublists so local tiles
                                    # run while the targeted all_to_all is
                                    # in flight (parallel/bell_partition.py
                                    # build_overlap_lists)
    remat: bool = False             # jax.checkpoint each ST block: recompute
                                    # block activations in the backward pass
                                    # instead of storing them — ~1 extra
                                    # forward of FLOPs for an O(blocks×
                                    # activations) HBM saving; the knob that
                                    # fits N=8556+ on one chip.
    fuse_tat: bool = False          # fused temporal-attention Pallas kernel
    fuse_spatial: bool = False      # fused spatial-middle Pallas kernel
                                    # (both measured ≈ XLA at PEMS scale —
                                    # see BENCH_NOTES.md; for experimentation)
    fuse_gtu: str | bool = "auto"   # fused GTU→concat Pallas kernel
                                    # (ops/pallas/gtu_fused.py). "auto"
                                    # resolves OFF: measured a negative at
                                    # GAMBIA shapes (29.2 vs 18.5 ms/block
                                    # fwd+bwd vs XLA im2col — C=32-granular
                                    # contractions cap MXU util ~25%; see
                                    # BENCH_NOTES round 4). Opt-in knob.
    checkpoint_every: int = 0       # 0 = only best-val checkpoints (reference behaviour)
    tensorboard: bool = False       # also write TensorBoard scalars to <run_dir>/tb
    nan_policy: str = "abort"       # "abort" | "rollback" (restore last good
                                    # checkpoint, halve LR, retry; abort after
                                    # max_rollbacks)
    max_rollbacks: int = 2
    rcm: bool = False               # BELL: reorder nodes with reverse
                                    # Cuthill–McKee before tiling, so a
                                    # spatially-local graph in arbitrary node
                                    # order becomes banded and few 128×128
                                    # tiles activate. Internal only: reports,
                                    # prediction dumps and returned arrays
                                    # stay in the original node order.
    tp: bool = False                # tensor-parallel temporal attention:
                                    # shard the TAt Linear(N→H·d_k)/
                                    # Linear(H·d_v→N) weight pairs (the
                                    # largest params at large N, since
                                    # d_model = num_of_vertices) over the
                                    # 'graph' axis — folded TP, no extra
                                    # mesh axis (parallel/sharding.py
                                    # tat_tp_shardings). Needs graph_axis>1.
    debug: bool = False             # checkify sanitizer mode: every train
                                    # batch runs under jax.experimental.
                                    # checkify (NaN/inf + out-of-bounds
                                    # checks) and raises a LOCALIZED error —
                                    # which op, which source line — instead
                                    # of a NaN surfacing epochs later. Slow
                                    # (per-batch dispatch, checks inserted
                                    # everywhere); debugging only.
    prng_impl: str = "rbg"          # training-rng (dropout) bit generator:
                                    # "rbg" = TPU hardware RNG (~17% faster
                                    # train step than threefry at PEMS08
                                    # scale) | "threefry" = splittable
                                    # counter-based, bit-reproducible across
                                    # backends. Param INIT always uses
                                    # threefry, so weights are impl-invariant.

    def __post_init__(self):
        if self.d_v < 0:
            self.d_v = self.d_k


@dataclasses.dataclass
class Config:
    data: DataConfig
    training: TrainingConfig

    @property
    def num_of_d(self) -> int:
        # the reference passes in_channels for both num_of_d and in_channels
        # (train_DSTAGNN_my.py:87-89)
        return self.training.in_channels

    def validate(self) -> "Config":
        t, d = self.training, self.data
        if d.num_of_vertices <= 0:
            raise ValueError("num_of_vertices must be positive")
        if t.K < 1:
            raise ValueError("K (Chebyshev order) must be >= 1")
        if t.graph not in ("G", "AG"):
            raise ValueError(f"graph must be 'G' or 'AG', got {t.graph!r}")
        if d.len_input < 7:
            # GTU7 uses a width-7 valid conv over time (reference
            # model/DSTAGNN_my.py:215); shorter inputs make 3T-12 <= 0.
            raise ValueError("len_input must be >= 7 for the GTU(3/5/7) stack")
        if t.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported compute_dtype {t.compute_dtype!r}")
        if t.sparse_format not in ("ell", "bell"):
            raise ValueError(f"sparse_format must be 'ell' or 'bell', got "
                             f"{t.sparse_format!r}")
        if t.mask_format not in ("dense", "tiles"):
            raise ValueError(f"mask_format must be 'dense' or 'tiles', got "
                             f"{t.mask_format!r}")
        if t.mask_format == "tiles" and not (
            t.sparse and t.sparse_format == "bell"
        ):
            raise ValueError(
                "mask_format='tiles' stores masks on the BELL tile support; "
                "set sparse=true and sparse_format='bell'"
            )
        if t.nan_policy not in ("abort", "rollback"):
            raise ValueError(f"nan_policy must be 'abort' or 'rollback', got "
                             f"{t.nan_policy!r}")
        if not isinstance(t.fuse_gtu, bool) and t.fuse_gtu != "auto":
            raise ValueError(f"fuse_gtu must be a bool or 'auto', got "
                             f"{t.fuse_gtu!r}")
        return self


_BOOL = {"true": True, "false": False, "1": True, "0": False, "yes": True, "no": False}


def _coerce(field: dataclasses.Field, raw: str):
    ftype = field.type
    if ftype in ("int", int):
        return int(raw)
    if ftype in ("float", float):
        return float(raw)
    if ftype in ("bool", bool):
        return _BOOL[raw.strip().lower()]
    if ftype in ("str | bool",):
        low = raw.strip().lower()
        return _BOOL[low] if low in _BOOL else low
    if ftype in ("Optional[str]",):
        return raw or None
    return raw


def load_config(path: str | Path) -> Config:
    """Load a reference-format INI file into a typed :class:`Config`."""
    parser = configparser.ConfigParser()
    read = parser.read(str(path))
    if not read:
        raise FileNotFoundError(f"config file not found: {path}")

    def fill(cls, section):
        kwargs = {}
        # configparser lowercases option names (optionxform), so match fields
        # case-insensitively — otherwise ``K = 2`` would silently fall back to
        # the default instead of setting the Chebyshev order.
        fields = {f.name.lower(): f for f in dataclasses.fields(cls)}
        for key, raw in section.items():
            f = fields.get(key.lower())
            if f is not None:
                kwargs[f.name] = _coerce(f, raw)
            # unknown keys (use_tpu, ctx, model_name in [Data], ...) ignored
        return cls(**kwargs)

    data = fill(DataConfig, parser["Data"]) if parser.has_section("Data") else DataConfig()
    training = (
        fill(TrainingConfig, parser["Training"])
        if parser.has_section("Training")
        else TrainingConfig()
    )
    return Config(data=data, training=training).validate()


def save_config(cfg: Config, path: str | Path) -> None:
    """Write a Config back to the reference INI format."""
    parser = configparser.ConfigParser()
    parser["Data"] = {
        k: str(v) for k, v in dataclasses.asdict(cfg.data).items() if v is not None
    }
    parser["Training"] = {k: str(v) for k, v in dataclasses.asdict(cfg.training).items()}
    with open(path, "w") as f:
        parser.write(f)
