from dstagnn_drought_tpu.models.dstagnn import (  # noqa: F401
    ModelSpec,
    make_model,
    init_params,
    apply as dstagnn_apply,
    import_torch_state_dict,
)
