from dstagnn_drought_tpu.training.metrics import (  # noqa: F401
    masked_mape,
    mae,
    rmse,
    horizon_report,
)
from dstagnn_drought_tpu.training.step import make_train_step, make_eval_step  # noqa: F401
from dstagnn_drought_tpu.training.loop import Trainer  # noqa: F401
from dstagnn_drought_tpu.training.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
)
