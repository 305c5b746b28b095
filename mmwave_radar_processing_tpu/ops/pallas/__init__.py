"""Hand-written Pallas TPU kernels for the hot paths.

- :mod:`~mmwave_radar_processing_tpu.ops.pallas.rank_select` — fused bitonic
  rank selection for OS-CFAR noise estimation (the pipeline's dominant stage:
  XLA's generic sort spills every pass to HBM, while the bitonic network runs
  entirely in VMEM/registers).
"""

from mmwave_radar_processing_tpu.ops.pallas.rank_select import kth_smallest

__all__ = ["kth_smallest"]
