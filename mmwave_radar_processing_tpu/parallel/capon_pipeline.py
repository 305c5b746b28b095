"""Fused frame-batched Capon / Bartlett heatmap pipeline.

One jitted program mapping a batch of raw TI ADC frames to range-azimuth
beamforming power maps: virtual-array reformat -> windowed range DFT (MXU
matmul) -> per-range-bin snapshot covariance -> Capon (loaded real-embedded
Cholesky solve) or Bartlett (fused Pallas steering kernel) spectrum on the
reference angle grid.  Split-complex throughout — no complex dtypes on device
(axon constraint) — and batch-sharded over the ``data`` mesh axis like the
point-cloud pipeline (``parallel/pipeline.py``).

This is the "Capon/Bartlett beamforming azimuth-elevation heatmaps (virtual
array, 6843 ods)" north-star config (BASELINE.json); the ``bench.py --metric
capon`` entry times it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmwave_radar_processing_tpu.config import RadarConfig, grids
from mmwave_radar_processing_tpu.ops import beamform as bf, mxu, windows


def build_capon_pipeline(
    cfg: RadarConfig,
    *,
    antenna_idxs: Sequence[int] = (0, 3, 4, 7),
    num_angle_bins: int = 64,
    method: str = "capon",
    loading: float = 1e-2,
    reformat_input: bool = True,
    bartlett_backend: Optional[str] = None,
    capon_method: str = "auto",
):
    """Compile ``(raw_re, raw_im) [B, rx, ns, nc] -> [B, ns, angles]`` power.

    ``method``: ``"capon"`` (MVDR, covariance + Cholesky solve) or
    ``"bartlett"`` (steering matmul; ``bartlett_backend`` picks the fused
    Pallas kernel vs the XLA einsum, default auto per ``ops.beamform``).

    ``capon_method``: ``"pallas"`` (default on TPU — one fused kernel for
    covariance + complex Cholesky inverse + spectrum,
    :mod:`ops.pallas.capon`; the XLA chain spends ~85% of its time in
    kernel-launch overhead around trivial arithmetic, measured round 4),
    ``"linv"`` (XLA, unrolled L^-1 + one matmul), or ``"solve"`` (XLA,
    unrolled substitution).  ``"auto"`` resolves to pallas on accelerators,
    linv on CPU.
    """
    if method not in ("capon", "bartlett"):
        raise ValueError(f"unknown method {method!r}")
    ns = cfg.num_adc_samples
    num_rx, cpl = cfg.num_rx_antennas, cfg.chirp_cfgs_per_loop
    idxs = np.asarray(list(antenna_idxs), int)
    rng_factors = mxu.dft_factors(ns, window=windows.hanning(ns))
    steering = bf.steering_ula(grids.phase_shift_bins(num_angle_bins),
                               len(idxs))

    chans = tuple(int(v) for v in idxs)

    def pipeline(raw_re: jax.Array, raw_im: jax.Array) -> jax.Array:
        if reformat_input:
            # reformat folded into the range DFT: only the selected antennas'
            # chirp slices are ever touched, no 12-channel virtual-cube
            # materialization (ops/mxu.range_dft_channels)
            rng = jax.vmap(
                lambda rr, ri: mxu.range_dft_channels(
                    mxu.C2(rr, ri), chans, rng_factors,
                    num_rx=num_rx, cfgs_per_loop=cpl,
                )
            )(raw_re, raw_im)
        else:
            sel = mxu.C2(raw_re[:, idxs], raw_im[:, idxs])  # [B, A, ns, K]
            rng = mxu.dft_apply(sel, rng_factors, axis=-2)
        if method == "capon" and resolved_capon == "pallas":
            from mmwave_radar_processing_tpu.ops.pallas.capon import (
                capon_power_pallas,
            )

            # [B, A, W, K] rides straight into the fused kernel: range bins
            # on sublanes, chirps on lanes — no snapshot transpose
            return capon_power_pallas(
                rng.re, rng.im, steering.re, steering.im, loading=loading,
                interpret=jax.devices()[0].platform == "cpu",
            )
        if method == "bartlett" and resolved_bartlett == "pallas_cov":
            from mmwave_radar_processing_tpu.ops.pallas.capon import (
                bartlett_power_pallas_cov,
            )

            return bartlett_power_pallas_cov(
                rng.re, rng.im, steering.re, steering.im,
                interpret=jax.devices()[0].platform == "cpu",
            )
        # snapshots per (frame, range bin): [B, ns, A, K]
        snaps = mxu.C2(jnp.moveaxis(rng.re, 1, 2), jnp.moveaxis(rng.im, 1, 2))
        if method == "bartlett":
            return bf.bartlett_power(snaps, steering,
                                     method=bartlett_backend)
        r = bf.spatial_covariance(snaps)
        return bf.capon_from_covariance(r, steering, loading=loading,
                                        method=resolved_capon)

    resolved_capon = capon_method
    if capon_method == "auto":
        # Mosaic kernel on accelerators; CPU keeps the XLA form (interpret
        # mode would run but slowly — the CPU tests want the parity oracle)
        resolved_capon = ("pallas" if jax.devices()[0].platform != "cpu"
                          else "linv")
    resolved_bartlett = bartlett_backend
    if bartlett_backend is None:
        # round-4 measured default: the covariance-pair kernel (same VMEM
        # layout as the capon kernel, no solve) beats both the round-2
        # snapshot-projection kernel and the XLA einsum — see BENCH_SELF
        resolved_bartlett = ("pallas_cov"
                             if jax.devices()[0].platform != "cpu" else "xla")
    return jax.jit(pipeline)
