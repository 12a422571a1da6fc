"""Model zoo.

``get_family(name)`` resolves a model family by the config's ``model_name``
key. Every family module exposes the same functional surface:

* ``make_model(key, spec, adj_merge, adj_pa) -> (params, constants)``
* ``apply(params, x, *, spec, adj_pa, cheb_polys, deterministic, rng,
  compute_dtype, use_pallas, ell, return_attention) -> (B, N, T_pred)``

Families: ``dstagnn`` (the flagship, reference model/DSTAGNN_my.py) plus the
heritage families the reference carries only as pyc remnants (SURVEY.md §2
C15): ``astgcn``, ``mstgcn``, ``stgcn``, ``transformer``.
"""
from dstagnn_drought_tpu.models.dstagnn import (  # noqa: F401
    ModelSpec,
    make_model,
    init_params,
    apply as dstagnn_apply,
    import_torch_state_dict,
)

_FAMILIES = ("dstagnn", "astgcn", "mstgcn", "stgcn", "transformer")


def get_family(name: str):
    """Resolve a model-family module by name (case-insensitive; the reference
    configs use ``model_name = dstagnn``)."""
    import importlib

    key = name.lower()
    if key not in _FAMILIES:
        raise ValueError(
            f"unknown model family {name!r}; available: {', '.join(_FAMILIES)}"
        )
    return importlib.import_module(f"dstagnn_drought_tpu.models.{key}")
