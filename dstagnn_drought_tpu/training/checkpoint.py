"""Pytree checkpointing — npz + JSON metadata, no external deps.

Unlike the reference, which saves only a best-val ``state_dict`` and whose
"resume" never reloads weights (train_DSTAGNN_my.py:138-141,177-184 — a
cosmetic resume, see SURVEY.md §5), checkpoints here carry params, optimizer
state, RNG key, epoch and best-val loss, so restore gives a true resume.

Run-directory naming keeps the reference convention
``myexperiments/<dataset>/<model>_<h>h<d>d<w>w_channel<C>_<lr>/epoch_<e>``
(train_DSTAGNN_my.py:118-126).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import numpy as np


def run_dir(
    root: str,
    dataset_name: str,
    model_name: str,
    num_of_hours: int,
    num_of_days: int,
    num_of_weeks: int,
    in_channels: int,
    learning_rate: float,
) -> str:
    folder = (
        f"{model_name}_{num_of_hours}h{num_of_days}d{num_of_weeks}w"
        f"_channel{in_channels}_{learning_rate}"
    )
    return os.path.join(root, dataset_name, folder)


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template: Any, flat: dict[str, np.ndarray]) -> Any:
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in leaves_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, "
                f"expected {np.shape(leaf)}"
            )
        leaves.append(arr.astype(np.asarray(leaf).dtype) if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path_dir: str,
    epoch: int,
    *,
    params: Any,
    opt_state: Any = None,
    rng: jax.Array | None = None,
    metadata: dict | None = None,
) -> str:
    os.makedirs(path_dir, exist_ok=True)
    base = os.path.join(path_dir, f"epoch_{epoch}")
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        flat.update({f"opt/{k}": v for k, v in _flatten(opt_state).items()})
    meta = {"epoch": epoch, **(metadata or {})}
    if rng is not None:
        flat["rng"] = np.asarray(jax.random.key_data(rng))
        # record the bit-generator so restore rebuilds the same key type
        meta["rng_impl"] = str(jax.random.key_impl(rng))
    np.savez(base + ".params.npz", **flat)
    with open(base + ".meta.json", "w") as f:
        json.dump(meta, f)
    return base + ".params.npz"


def restore_checkpoint(
    path: str,
    *,
    params_template: Any,
    opt_state_template: Any = None,
):
    """Restore from an ``epoch_<e>.params.npz``. Returns
    (params, opt_state|None, rng|None, metadata)."""
    data = dict(np.load(path, allow_pickle=False).items())
    params = _unflatten(
        params_template,
        {k[len("params/"):]: v for k, v in data.items() if k.startswith("params/")},
    )
    opt_state = None
    if opt_state_template is not None:
        opt_flat = {k[len("opt/"):]: v for k, v in data.items() if k.startswith("opt/")}
        if opt_flat:
            opt_state = _unflatten(opt_state_template, opt_flat)
    meta_path = path.replace(".params.npz", ".meta.json")
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    rng = None
    if "rng" in data:
        rng = jax.random.wrap_key_data(
            data["rng"], impl=metadata.get("rng_impl", "threefry2x32")
        )
    return params, opt_state, rng, metadata


def latest_checkpoint(path_dir: str) -> str | None:
    if not os.path.isdir(path_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(path_dir):
        m = re.fullmatch(r"epoch_(\d+)\.params\.npz", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(path_dir, name)
    return best
