"""Pure jittable compute kernels for mmWave radar processing on TPU.

Everything here is shape-static, functional, and safe to ``jax.jit`` /
``jax.vmap`` / ``shard_map``:

- :mod:`~mmwave_radar_processing_tpu.ops.windows` — spectral window constants.
- :mod:`~mmwave_radar_processing_tpu.ops.czt` — chirp-z transform (zoom FFT as
  two FFTs + pointwise products, Bluestein's algorithm).
- :mod:`~mmwave_radar_processing_tpu.ops.peaks` — vectorized local-maxima +
  prominence peak finding with fixed-capacity padded outputs.
- :mod:`~mmwave_radar_processing_tpu.ops.cfar` — CA/GO/SO/OS CFAR threshold
  maps (1D/2D) as vectorized gather + reduce/sort.
- :mod:`~mmwave_radar_processing_tpu.ops.beamform` — Capon/Bartlett
  covariance beamforming spectra as split-complex MXU matmuls.
- :mod:`~mmwave_radar_processing_tpu.ops.ransac` — deterministic vmapped
  fixed-trial RANSAC with closed-form least squares.
- :mod:`~mmwave_radar_processing_tpu.ops.masked` — utilities for fixed-capacity
  masked detection sets (the TPU replacement for dynamic-length lists).
"""

from mmwave_radar_processing_tpu.ops import (
    beamform,
    czt,
    cfar,
    masked,
    peaks,
    ransac,
    windows,
)

__all__ = ["beamform", "czt", "cfar", "masked", "peaks", "ransac", "windows"]
