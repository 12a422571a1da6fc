"""dstagnn_drought_tpu — a TPU-native spatio-temporal GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
DSTAGNN_Drought repository (PyTorch/torch_xla): dynamic spatial-temporal aware
graph neural networks for traffic-flow / drought forecasting.

Layers (bottom-up):
  ops/       pure-JAX + Pallas compute primitives (Laplacians, Chebyshev,
             attention, gated temporal conv, fused graph-attention kernels)
  models/    functional DSTAGNN model family (params as pytrees)
  data/      offline windowing pipeline, adjacency/STAG IO, on-device STAG
             construction (Sinkhorn OT)
  parallel/  device meshes, shardings, halo-partitioned graph ops
  training/  jitted train/eval steps, checkpointing, metrics, trainer loop
  cli/       entry points mirroring the reference CLIs

File-format compatibility: the reference's ``*.conf`` INI files,
``<name>_r{h}_d{d}_w{w}_dstagnn.npz`` windowed datasets and
``stag_*.csv`` / ``strg_*.csv`` graph files are read and written verbatim, so
data prepared for the reference drops straight in.
"""

__version__ = "0.1.0"

from dstagnn_drought_tpu.config import Config, load_config  # noqa: F401
