"""The trainer: end-to-end training with validation, best-checkpointing,
true resume, NaN abort, and final per-horizon test report.

Mirrors the reference run shape (train_DSTAGNN_my.py:141-191): epoch loop →
shuffled train batches → full validation → save best-val checkpoint →
reload best for the final test; with the defects fixed (real resume that
restores params/opt-state/epoch; no per-batch host syncs; sharded sampling
under data parallelism).
"""
from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dstagnn_drought_tpu.config import Config
from dstagnn_drought_tpu.data.adjacency import (
    edge_list_adjacency,
    load_dense_adjacency,
    load_stag_adjacency,
    load_strg_adjacency,
)
from dstagnn_drought_tpu.data.dataset import ArrayDataset, load_windowed_dataset
from dstagnn_drought_tpu.models.dstagnn import ModelSpec, make_model
from dstagnn_drought_tpu.training import checkpoint as ckpt
from dstagnn_drought_tpu.training.logger import MetricLogger
from dstagnn_drought_tpu.training.metrics import horizon_report
from dstagnn_drought_tpu.training.step import (
    make_epoch_runner,
    make_eval_runner,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

PEMS_DATASETS = ("PEMS04", "PEMS08", "PEMS07", "PEMS03")


def load_graphs(cfg: Config):
    """Adjacency loading policy of the reference (train_DSTAGNN_my.py:63-82)."""
    d = cfg.data
    if d.dataset_name in PEMS_DATASETS:
        adj_mx = edge_list_adjacency(d.adj_filename, d.num_of_vertices, d.id_filename)
    else:
        adj_mx = load_dense_adjacency(d.adj_filename, d.num_of_vertices)
    adj_tmd = load_stag_adjacency(d.stag_filename, d.num_of_vertices)
    adj_pa = load_strg_adjacency(d.strg_filename)
    adj_merge = adj_mx if cfg.training.graph == "G" else adj_tmd
    return np.asarray(adj_merge, np.float32), np.asarray(adj_pa, np.float32)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        dataset: Optional[ArrayDataset] = None,
        adj_merge: Optional[np.ndarray] = None,
        adj_pa: Optional[np.ndarray] = None,
        mesh=None,
        experiments_root: str = "myexperiments",
        logger: Optional[MetricLogger] = None,
    ):
        self.cfg = cfg
        t = cfg.training
        self.spec = ModelSpec.from_config(cfg)
        self.mesh = mesh

        if dataset is None:
            dataset = load_windowed_dataset(
                cfg.data.graph_signal_matrix_filename,
                t.num_of_hours, t.num_of_days, t.num_of_weeks,
            )
        self.dataset = dataset
        if adj_merge is None or adj_pa is None:
            adj_merge, adj_pa = load_graphs(cfg)

        # RCM node reordering for the block-sparse path: bandwidth-reduce the
        # merged graph so BELL tiling activates few off-diagonal tiles (the
        # win is active_blocks/total_blocks of the dense cost). Everything
        # node-indexed — graphs, data splits, model params — lives in the
        # permuted order internally; ``evaluate`` maps predictions back, so
        # reports/dumps are in the ORIGINAL node order.
        self._perm = None
        self._inv_perm = None
        if t.rcm and t.sparse and t.sparse_format == "bell":
            from dstagnn_drought_tpu.ops.block_sparse import rcm_permutation

            perm = rcm_permutation(
                np.maximum(np.asarray(adj_merge), np.asarray(adj_merge).T)
            )
            self._perm = perm
            self._inv_perm = np.argsort(perm)
            adj_merge = np.asarray(adj_merge)[np.ix_(perm, perm)]
            adj_pa = np.asarray(adj_pa)[np.ix_(perm, perm)]

        from dstagnn_drought_tpu.models import get_family

        self.family = get_family(t.model_name or "dstagnn")
        key = jax.random.PRNGKey(t.seed)
        key, init_key = jax.random.split(key)
        if t.sparse and t.model_name != "dstagnn":
            raise ValueError(
                f"sparse mode is a dstagnn-family path; got model_name="
                f"{t.model_name!r}"
            )
        # build the sparse graph BEFORE the model: tile-resident masks
        # (mask_format='tiles') are born on the BELL active-tile support
        ell_graph = None
        if t.sparse:
            # neighbourhood = support of the (elementwise) Chebyshev stack,
            # i.e. the merged graph's pattern plus the identity diagonal
            if t.sparse_format == "bell":
                from dstagnn_drought_tpu.ops.block_sparse import (
                    block_ell_from_adjacency,
                )

                ell_graph = block_ell_from_adjacency(
                    adj_merge, block_size=t.block_size
                )
            else:
                from dstagnn_drought_tpu.ops.sparse import ell_from_adjacency

                ell_graph = ell_from_adjacency(
                    adj_merge, max_degree=t.max_degree or None
                )
        use_tiles = t.mask_format == "tiles"
        self._bell_plan = None
        if use_tiles and t.graph_axis > 1:
            # partitioned tile-resident BELL: build the targeted-halo shard
            # plan (needs the Chebyshev values for its per-tile constants)
            from dstagnn_drought_tpu.ops.graph import (
                cheb_polynomials,
                scaled_laplacian,
            )
            from dstagnn_drought_tpu.parallel.bell_partition import (
                build_bell_tile_shard_plan,
            )

            polys = cheb_polynomials(
                scaled_laplacian(jnp.asarray(adj_merge, jnp.float32)), t.K
            )
            self._bell_plan = build_bell_tile_shard_plan(
                ell_graph, t.graph_axis, np.asarray(adj_pa),
                np.asarray(polys),
            )
        bell_for_init = self._bell_plan if self._bell_plan is not None \
            else ell_graph
        self.params, self.constants = self.family.make_model(
            init_key, self.spec, adj_merge, adj_pa,
            **({"bell": bell_for_init} if use_tiles else {}),
        )
        if t.prng_impl != "threefry":
            # Training rng (dropout) on the fast generator; init above stays
            # threefry so weights are identical whatever prng_impl is set.
            key = jax.random.key(t.seed, impl=t.prng_impl)
        if ell_graph is not None:
            self.constants["ell"] = ell_graph
        self.optimizer = make_optimizer(t.learning_rate)
        self.opt_state = self.optimizer.init(self.params)
        self.rng = key

        if mesh is None and (t.data_axis > 1 or t.graph_axis > 1):
            from dstagnn_drought_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(t.data_axis, t.graph_axis)
        self.mesh = mesh

        if t.tp and mesh is not None and t.graph_axis > 1:
            # tensor-parallel temporal attention: place the TAt projection
            # weights sharded over 'graph'; GSPMD derives the sharded
            # matmuls + AllReduce from the placement. The Adam state is
            # re-initialized from the placed params so the moments inherit
            # the same shardings (init is cheap: zeros_like).
            from dstagnn_drought_tpu.parallel.sharding import tat_tp_shardings

            tp_sh = tat_tp_shardings(self.params, mesh)
            self.params = jax.device_put(self.params, tp_sh)
            self.opt_state = jax.jit(self.optimizer.init)(self.params)

        apply_fn = self.family.apply
        apply_extra = {}
        if (t.fuse_tat or t.fuse_spatial) and t.model_name != "dstagnn":
            raise ValueError(
                "fuse_tat/fuse_spatial are dstagnn-family kernels; got "
                f"model_name={t.model_name!r}"
            )
        if t.fuse_tat:
            apply_extra["fuse_tat"] = True
        if t.fuse_spatial:
            apply_extra["fuse_spatial"] = True
        fuse_gtu = t.fuse_gtu
        if fuse_gtu == "auto":
            # Resolves OFF: the fused GTU kernel measured a NEGATIVE at
            # GAMBIA shapes (fwd+bwd 29.2 ms vs XLA im2col 18.5 ms per
            # block — BENCH_NOTES "Fused GTU kernel study", round 4). The
            # op's C=32-granular contractions cap MXU utilization at ~25%
            # in every kernel formulation tried, while XLA's im2col fuses
            # well. Knob kept for experimentation (set fuse_gtu = true).
            fuse_gtu = False
        if fuse_gtu:
            if t.model_name not in (None, "", "dstagnn"):
                raise ValueError(
                    "fuse_gtu is a dstagnn-family kernel; got "
                    f"model_name={t.model_name!r}"
                )
            from dstagnn_drought_tpu.ops.pallas.gtu_fused import supported

            if not supported(
                t.nb_time_filter, cfg.data.len_input, t.time_strides
            ):
                raise ValueError(
                    "fuse_gtu=true but the fused GTU kernel does not "
                    f"support nb_time_filter={t.nb_time_filter}, "
                    f"len_input={cfg.data.len_input}, "
                    f"time_strides={t.time_strides} (needs stride 1, "
                    "T >= 48 and 16 | T, 16 | C) — unset fuse_gtu or use "
                    "the default XLA im2col path"
                )
            apply_extra["fuse_gtu"] = True
        if t.remat:
            apply_extra["remat"] = True
        if (
            t.sparse and mesh is not None and t.graph_axis > 1
            and t.sparse_format == "bell"
        ):
            if self._bell_plan is not None:
                # tile-resident partitioned BELL: targeted block halo +
                # per-shard fused backward; mask params sharded over 'graph'
                from jax.sharding import NamedSharding, PartitionSpec as PS

                if t.halo_overlap:
                    from dstagnn_drought_tpu.parallel.bell_partition import (
                        build_overlap_lists,
                    )

                    apply_extra["halo"] = (
                        mesh, self._bell_plan,
                        build_overlap_lists(self._bell_plan),
                    )
                else:
                    apply_extra["halo"] = (mesh, self._bell_plan)
                mask_sh = NamedSharding(
                    mesh, PS("graph", None, None, None, None)
                )
                repl_sh = NamedSharding(mesh, PS())

                def _place(path, leaf):
                    keys = [getattr(p_, "key", None) for p_ in path]
                    if keys[-1] == "mask_tiles":
                        return mask_sh
                    # keep a mesh placement the leaf already has (TP may
                    # have sharded the TAt weights above); anything still on
                    # a single device gets replicated onto the mesh
                    sh = getattr(leaf, "sharding", None)
                    if isinstance(sh, NamedSharding) and sh.mesh == mesh:
                        return sh
                    return repl_sh

                self.params = jax.device_put(
                    self.params,
                    jax.tree_util.tree_map_with_path(_place, self.params),
                )
                self.opt_state = jax.jit(self.optimizer.init)(self.params)
            else:
                # dense-mask baseline: target tiles partitioned over
                # 'graph', one all_gather of source rows per step
                from dstagnn_drought_tpu.parallel.bell_partition import (
                    build_bell_shard_plan,
                )

                plan = build_bell_shard_plan(
                    self.constants["ell"], t.graph_axis
                )
                apply_extra["halo"] = (mesh, plan)
        elif (
            t.sparse and t.halo == "targeted" and mesh is not None
            and t.graph_axis > 1 and t.sparse_format == "ell"
        ):
            # targeted boundary-row halo exchange over the 'graph' axis;
            # indivisible node counts (GAMBIA N=2139 = 3·23·31) are padded
            # with isolated dummy nodes (shard_ell) — the halo wrapper pads
            # the activations/edge planes to match and slices the output
            from dstagnn_drought_tpu.parallel.graph_partition import (
                build_halo_plan,
                shard_ell,
            )

            ell_for_plan = shard_ell(self.constants["ell"], t.graph_axis)
            self.constants["ell"] = ell_for_plan
            plan = build_halo_plan(ell_for_plan, t.graph_axis)
            apply_extra["halo"] = (mesh, plan)
        if apply_extra:
            import functools

            apply_fn = functools.partial(apply_fn, **apply_extra)

        compute_dtype = jnp.bfloat16 if t.compute_dtype == "bfloat16" else jnp.float32
        step_kw = dict(
            compute_dtype=compute_dtype,
            use_pallas=t.use_pallas,
            mesh=mesh,
            shard_nodes=t.graph_axis > 1 if mesh is not None else False,
            apply_fn=apply_fn,
        )
        self._step_kw = step_kw
        self.train_step = make_train_step(self.spec, self.optimizer, **step_kw)
        self.epoch_runner = make_epoch_runner(self.spec, self.optimizer, **step_kw)
        self.checked_step = None
        if t.debug:
            from dstagnn_drought_tpu.training.step import (
                make_checked_train_step,
            )

            self.checked_step = make_checked_train_step(
                self.spec, self.optimizer, **step_kw
            )
        self.eval_step = make_eval_step(self.spec, **step_kw)
        self.eval_runner = make_eval_runner(self.spec, **step_kw)
        self._lr_scale = 1.0
        self._rollbacks = 0

        self.run_dir = ckpt.run_dir(
            experiments_root, cfg.data.dataset_name, t.model_name,
            t.num_of_hours, t.num_of_days, t.num_of_weeks,
            t.in_channels, t.learning_rate,
        )
        self.logger = logger or MetricLogger(
            os.path.join(self.run_dir, "metrics.jsonl"),
            tensorboard_dir=os.path.join(self.run_dir, "tb") if t.tensorboard else None,
        )
        self.best_val = math.inf
        self.best_epoch = -1
        self.epoch = t.start_epoch

        # Device-resident splits. On a mesh, the node axis of the full split
        # is sharded over 'graph' (matching the in-step activation layout, so
        # the per-batch gather is local); the sample axis stays replicated —
        # batches are assembled by arbitrary shuffled gathers, which a
        # sample-sharded layout would turn into all-to-all traffic.
        split_sharding = None
        if (
            mesh is not None and t.graph_axis > 1
            and cfg.data.num_of_vertices % t.graph_axis == 0
        ):
            # (device_put needs exact divisibility; with an auto-padded node
            # axis — N % graph_axis != 0 — the splits stay replicated and the
            # in-step sharding constraint lays out the activations instead)
            from jax.sharding import NamedSharding, PartitionSpec as P

            split_sharding = NamedSharding(mesh, P(None, "graph"))
        self._device_splits = {}
        for name in ("train", "val", "test"):
            split = getattr(dataset, name)
            x_arr, y_arr = split.x, split.target
            if self._perm is not None:
                x_arr = np.asarray(x_arr)[:, self._perm]
                y_arr = np.asarray(y_arr)[:, self._perm]
            self._device_splits[name] = (
                jax.device_put(x_arr, split_sharding),
                jax.device_put(y_arr, split_sharding),
            )

    # ------------------------------------------------------------------
    def resume(self) -> bool:
        """True resume from the latest checkpoint in the run dir (fixes the
        reference's cosmetic start_epoch, SURVEY.md §5)."""
        latest = ckpt.latest_checkpoint(self.run_dir)
        if latest is None:
            return False
        params, opt_state, rng, meta = ckpt.restore_checkpoint(
            latest, params_template=self.params, opt_state_template=self.opt_state
        )
        self.params = jax.device_put(params)
        if opt_state is not None:
            self.opt_state = jax.device_put(opt_state)
        if rng is not None:
            self.rng = rng
        self.epoch = int(meta.get("epoch", -1)) + 1
        self.best_val = float(meta.get("best_val", math.inf))
        self.best_epoch = int(meta.get("best_epoch", -1))
        self.logger.log("resume", epoch=self.epoch, checkpoint=latest)
        return True

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> float:
        """One epoch = ONE device dispatch (lax.scan over the batch plan)."""
        t = self.cfg.training
        x_full, y_full = self._device_splits["train"]
        idx, n_valid = self.dataset.batch_indices(
            "train", t.batch_size, shuffle=True, seed=t.seed * 100003 + epoch
        )
        # padded tail rows get zero loss weight (the plan repeats index 0 to
        # keep shapes static; without the mask those samples are silently
        # over-weighted every epoch)
        weights = (np.arange(idx.size) < n_valid).astype(np.float32)
        weights = weights.reshape(idx.shape)
        if self.checked_step is not None:
            # sanitizer mode: per-batch checkify dispatch; a NaN/inf/OOB
            # raises HERE with the failing op + source line
            losses = []
            for b in range(idx.shape[0]):
                err, (self.params, self.opt_state, self.rng, loss) = (
                    self.checked_step(
                        self.params, self.opt_state, self.rng,
                        x_full, y_full, jnp.asarray(idx[b]), self.constants,
                        jnp.asarray(weights[b]),
                    )
                )
                err.throw()
                losses.append(loss)
            losses = jnp.stack(losses)
            return float(jnp.mean(losses))
        self.params, self.opt_state, self.rng, losses = self.epoch_runner(
            self.params, self.opt_state, self.rng,
            x_full, y_full, jnp.asarray(idx), self.constants,
            jnp.asarray(weights),
        )
        mean_loss = float(jnp.mean(losses))
        if math.isnan(mean_loss):
            raise FloatingPointError(
                f"NaN training loss at epoch {epoch} — aborting (last good "
                f"checkpoint: epoch_{self.best_epoch})"
            )
        return mean_loss

    def evaluate(self, split: str) -> tuple[np.ndarray, float]:
        """Predictions (true length) and mean loss over a split.

        One device dispatch for the whole split (scan over the batch plan);
        padded tail rows are sliced off the predictions and masked out of the
        loss mean.
        """
        t = self.cfg.training
        x_full, y_full = self._device_splits[split]
        idx, n_valid = self.dataset.batch_indices(
            split, t.batch_size, shuffle=False
        )
        preds, losses = self.eval_runner(
            self.params, x_full, y_full, jnp.asarray(idx), self.constants
        )
        preds = np.asarray(preds, np.float32)
        pred = preds.reshape(-1, *preds.shape[2:])[:n_valid]
        per_sample = np.asarray(losses, np.float32).reshape(-1)[:n_valid]
        if self._inv_perm is not None:
            # back to the ORIGINAL node order (targets/dumps live there)
            pred = pred[:, self._inv_perm]
        return pred, float(per_sample.mean())

    def attention_maps(self, split: str = "test", sample: int = 24) -> list:
        """Per-block raw spatial attention for one sample (the reference's
        legacy export grabs batch 24 — lib/utils.py:552-568; stale against its
        own model, working here). Returns a list of (K, N, N) arrays (dense
        mode) or (K, N, E) edge maps (sparse mode). With ``rcm=True`` the
        maps are in the INTERNAL (RCM) node order — ``self._perm`` maps
        internal index → original node id."""
        x_full, _ = self._device_splits[split]
        n = len(getattr(self.dataset, split))
        idx = jnp.asarray([min(sample, n - 1)], jnp.int32)

        @jax.jit
        def fwd(params, x_full, idx, constants):
            _, maps = self.family.apply(
                params, x_full[idx],
                spec=self.spec,
                adj_pa=constants["adj_pa"],
                cheb_polys=constants["cheb_polys"],
                deterministic=True,
                ell=constants.get("ell"),
                bell_tiles=constants.get("bell_tiles"),
                return_attention=True,
            )
            return maps

        maps = fwd(self.params, x_full, idx, self.constants)
        return [np.asarray(m[0]) for m in maps]

    def _rollback_to_last_good(self, epoch: int) -> None:
        """NaN recovery (SURVEY.md §5 failure detection): restore the last
        checkpoint, halve the learning rate, and continue. The reference has
        no equivalent — a NaN there silently poisons the rest of the run."""
        t = self.cfg.training
        latest = ckpt.latest_checkpoint(self.run_dir)
        if latest is None:
            raise FloatingPointError(
                f"NaN loss at epoch {epoch} and no checkpoint to roll back to"
            )
        params, opt_state, rng, _ = ckpt.restore_checkpoint(
            latest, params_template=self.params,
            opt_state_template=self.opt_state,
        )
        self.params = jax.device_put(params)
        if rng is not None:
            self.rng = rng
        self._rollbacks += 1
        self._lr_scale *= 0.5
        self.optimizer = make_optimizer(t.learning_rate * self._lr_scale)
        self.opt_state = (
            jax.device_put(opt_state)
            if opt_state is not None
            else self.optimizer.init(self.params)
        )
        self.train_step = make_train_step(self.spec, self.optimizer, **self._step_kw)
        self.epoch_runner = make_epoch_runner(self.spec, self.optimizer, **self._step_kw)
        self.logger.log(
            "rollback", epoch=epoch, checkpoint=latest,
            lr=t.learning_rate * self._lr_scale, rollbacks=self._rollbacks,
        )

    # ------------------------------------------------------------------
    def run(self, epochs: Optional[int] = None) -> dict:
        t = self.cfg.training
        end_epoch = epochs if epochs is not None else t.epochs
        import time as _time

        while self.epoch < end_epoch:
            e = self.epoch
            t0 = _time.time()
            try:
                train_loss = self.train_epoch(e)
            except FloatingPointError:
                if (
                    t.nan_policy == "rollback"
                    and self._rollbacks < t.max_rollbacks
                ):
                    self._rollback_to_last_good(e)
                    continue
                raise
            _, val_loss = self.evaluate("val")
            dt = _time.time() - t0
            self.logger.log(
                "epoch", epoch=e, train_loss=train_loss, val_loss=val_loss,
                seconds=round(dt, 2),
            )
            if val_loss < self.best_val:
                self.best_val = val_loss
                self.best_epoch = e
                ckpt.save_checkpoint(
                    self.run_dir, e,
                    params=self.params, opt_state=self.opt_state, rng=self.rng,
                    metadata={"best_val": self.best_val, "best_epoch": e,
                              "val_loss": val_loss},
                )
            elif t.checkpoint_every and (e + 1) % t.checkpoint_every == 0:
                ckpt.save_checkpoint(
                    self.run_dir, e,
                    params=self.params, opt_state=self.opt_state, rng=self.rng,
                    metadata={"best_val": self.best_val,
                              "best_epoch": self.best_epoch},
                )
            self.epoch += 1

        return self.final_test()

    def final_test(self) -> dict:
        # reload best params (reference train:183-191)
        if self.best_epoch >= 0:
            best = os.path.join(self.run_dir, f"epoch_{self.best_epoch}.params.npz")
            if os.path.exists(best):
                self.params, _, _, _ = ckpt.restore_checkpoint(
                    best, params_template=self.params
                )
                self.params = jax.device_put(self.params)
        pred, test_loss = self.evaluate("test")
        report = horizon_report(self.dataset.test.target, pred, null_val=0)
        self.logger.log(
            "test", loss=test_loss, best_epoch=self.best_epoch,
            mae=report["overall"]["mae"], rmse=report["overall"]["rmse"],
            mape=report["overall"]["mape"],
        )
        np.savez(
            os.path.join(self.run_dir, f"output_epoch_{self.best_epoch}_test.npz"),
            # the reference's dump also saves the model input
            # (lib/utils1.py:458-481) — keep the key names it uses
            input=self.dataset.test.x,
            prediction=pred, data_target_tensor=self.dataset.test.target,
        )
        return {"test_loss": test_loss, "report": report,
                "best_epoch": self.best_epoch, "best_val": self.best_val}
