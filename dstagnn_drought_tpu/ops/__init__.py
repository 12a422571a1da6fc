from dstagnn_drought_tpu.ops.graph import (  # noqa: F401
    scaled_laplacian,
    cheb_polynomials,
    laplacian,
    power_iteration_lambda_max,
)
from dstagnn_drought_tpu.ops.attention import (  # noqa: F401
    temporal_attention,
    spatial_attention_scores,
)
from dstagnn_drought_tpu.ops.cheb import cheb_conv_with_sat, cheb_conv  # noqa: F401
from dstagnn_drought_tpu.ops.gtu import gtu  # noqa: F401
