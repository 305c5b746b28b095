"""Point-cloud generation: detections -> batched AoA FFT -> cartesian points.

TPU re-design of ``processors/point_cloud_generator.py``: the per-detection
angle estimation (gather antenna snapshots at each detected (range, vel) cell,
zero-pad, FFT, argmax) was already batched in the reference (:143-214); here
it additionally runs over a *fixed-capacity* padded detection set so the whole
raw-cube -> point-cloud pipeline is one jitted program with no host syncs.

Output is an ``(K, 4)`` ``(x, y, z, radial_vel)`` array + validity mask in the
FLU frame (x forward, y left, z up), matching ``_convert_to_cartesian``
(:216-248).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmwave_radar_processing_tpu.config import RadarConfig, grids
from mmwave_radar_processing_tpu.processors.base import Processor
from mmwave_radar_processing_tpu.processors.detection import (
    Detections,
    get_range_doppler_detector_registry,
)


class PointCloud(NamedTuple):
    """Fixed-capacity padded point cloud."""

    points: jax.Array  # (K, 4) float32 (x, y, z, vel)
    valid: jax.Array  # (K,) bool
    count: jax.Array  # () int32


@partial(jax.jit, static_argnames=("num_angle_bins", "shift"))
def aoa_angles(
    rng_dop_raw: jax.Array,
    antenna_idxs: jax.Array,
    range_idx: jax.Array,
    vel_idx: jax.Array,
    angle_bins: jax.Array,
    *,
    num_angle_bins: int,
    shift: bool,
) -> jax.Array:
    """Per-detection angle via zero-padded FFT over an antenna subset.

    Args:
        rng_dop_raw: ``[rx, range, vel]`` complex RD cube (all antennas).
        antenna_idxs: (A,) static antenna subset.
        range_idx / vel_idx: (K,) detection indices (padded entries arbitrary).

    Returns:
        (K,) angles in radians (reference :143-214).
    """
    # (A, K) antenna snapshots -> (K, A)
    snap = rng_dop_raw[antenna_idxs][:, range_idx, vel_idx].T
    k = snap.shape[0]
    fft_in = jnp.zeros((k, num_angle_bins), jnp.complex64).at[:, : snap.shape[1]].set(snap)
    spec = jnp.fft.fft(fft_in, axis=1)
    if shift:
        spec = jnp.fft.fftshift(spec, axes=1)
    return angle_bins[jnp.argmax(jnp.abs(spec), axis=1)]


@jax.jit
def spherical_to_cartesian_flu(
    ranges: jax.Array, az: jax.Array, el: jax.Array, vel: jax.Array
) -> jax.Array:
    """(K, 4) FLU points from spherical detections (reference :216-248)."""
    x = ranges * jnp.cos(el) * jnp.cos(az)
    y = ranges * jnp.cos(el) * jnp.sin(az)
    z = ranges * jnp.sin(el)
    return jnp.stack([x, y, z, vel], axis=1)


class PointCloudGenerator(Processor):
    """Raw ADC cube -> (x, y, z, vel) point cloud via a composed RD detector."""

    def __init__(
        self,
        config: RadarConfig,
        az_antenna_idxs: Sequence[int],
        el_antenna_idxs: Sequence[int],
        detector_type: str = "range_doppler_detector_2d",
        detector_params: Optional[Dict] = None,
        shift_az_resp: bool = True,
        shift_el_resp: bool = False,
        num_angle_bins: int = 64,
        **kwargs,
    ):
        super().__init__(config)
        self.az_antenna_idxs = np.asarray(az_antenna_idxs if az_antenna_idxs is not None else [], int)
        self.el_antenna_idxs = np.asarray(el_antenna_idxs if el_antenna_idxs is not None else [], int)
        self.shift_az_resp = shift_az_resp
        self.shift_el_resp = shift_el_resp
        self.num_angle_bins = num_angle_bins
        self.phase_shifts = grids.phase_shift_bins(num_angle_bins)
        self.angle_bins = grids.angle_bins(num_angle_bins)

        registry = get_range_doppler_detector_registry()
        if detector_type not in registry:
            raise ValueError(
                f"Unknown detector type: {detector_type}. Available: {list(registry)}"
            )
        self.detector = registry[detector_type](config, **(detector_params or {}))

    # ------------------------------------------------------------------ #
    def angles_for_detections(self, rng_dop_raw: jax.Array, dets: Detections):
        """(az, el) angles for a padded detection set."""
        ab = jnp.asarray(self.angle_bins)
        if self.az_antenna_idxs.size > 0:
            az = aoa_angles(
                rng_dop_raw, jnp.asarray(self.az_antenna_idxs), dets.range_idx,
                dets.vel_idx, ab, num_angle_bins=self.num_angle_bins,
                shift=self.shift_az_resp,
            )
        else:
            az = jnp.zeros(dets.range_idx.shape, jnp.float32)
        if self.el_antenna_idxs.size > 0:
            el = aoa_angles(
                rng_dop_raw, jnp.asarray(self.el_antenna_idxs), dets.range_idx,
                dets.vel_idx, ab, num_angle_bins=self.num_angle_bins,
                shift=self.shift_el_resp,
            )
        else:
            el = jnp.zeros(dets.range_idx.shape, jnp.float32)
        return az, el

    def point_cloud(self, adc_cube: jax.Array, **kwargs) -> PointCloud:
        """Pure device pipeline: cube -> padded point cloud (no host syncs)."""
        from mmwave_radar_processing_tpu.processors.range_doppler import (
            range_doppler_map,
        )

        raw = range_doppler_map(adc_cube)
        dets = self.detector.detections(adc_cube, rng_dop_raw=raw, **kwargs)
        az, el = self.angles_for_detections(raw, dets)
        ranges = jnp.asarray(self.detector.range_bins)[dets.range_idx]
        vels = jnp.asarray(self.detector.vel_bins)[dets.vel_idx]
        pts = spherical_to_cartesian_flu(ranges, az, el, vels)
        pts = jnp.where(dets.valid[:, None], pts, 0.0)
        return PointCloud(pts, dets.valid, dets.count)

    def process(self, adc_cube: jax.Array, **kwargs) -> np.ndarray:
        """Reference-compatible API: (N, 4) numpy point cloud."""
        pc = self.point_cloud(adc_cube, **kwargs)
        valid = np.asarray(pc.valid)
        return np.asarray(pc.points)[valid]

    def reset(self):
        self.detector.reset()
        super().reset()
