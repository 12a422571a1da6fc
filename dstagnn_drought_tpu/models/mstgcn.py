"""MSTGCN — ASTGCN with both attention mechanisms removed (reference remnant
``model/__pycache__/MSTGCN_r.pyc``, SURVEY.md §2 C15). Thin family wrapper
over :mod:`dstagnn_drought_tpu.models.astgcn` with ``attention=False``."""
from __future__ import annotations

from dstagnn_drought_tpu.models import astgcn
from dstagnn_drought_tpu.models.dstagnn import ModelSpec


def init_params(key, spec: ModelSpec):
    return astgcn.init_params(key, spec, attention=False)


def apply(params, x, **kwargs):
    return astgcn.apply(params, x, attention=False, **kwargs)


def make_model(key, spec: ModelSpec, adj_merge, adj_pa):
    return astgcn.make_model(key, spec, adj_merge, adj_pa, attention=False)
