from dstagnn_drought_tpu.parallel.mesh import make_mesh, factor_devices  # noqa: F401
from dstagnn_drought_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicated,
    constrain_batch,
)
