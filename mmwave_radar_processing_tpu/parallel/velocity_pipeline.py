"""Fused device-resident ego-velocity pipeline (the RadVel headline on TPU).

One jitted program per frame batch: raw ADC cubes + altitudes in, gated
``[az_vy, el_vy, vx]`` velocity estimates (+ quality stats) out.  Mirrors the
ODS ADC path of :class:`~mmwave_radar_processing_tpu.processors.velocity_estimator.VelocityEstimator`
(coarse responses) with every stage MXU-safe (split-complex DFT matmuls, no
complex dtypes, no host syncs):

1. virtual-array reformat (reshape);
2. range DFT with the Hann window folded in;
3. Doppler-azimuth responses for the two azimuth and two elevation antenna
   sub-arrays (chirp DFT + zero-padded angle DFT as matmuls), averaged, with
   the altitude-centered range window as a traced masked mean;
4. ``vx`` from the strongest zero-azimuth Doppler peak of each response;
5. per-row prominent peaks -> RANSAC ``vy`` fits (standard model for
   ``vx >= 0.1``, inverted small-vx model otherwise, via ``lax.cond``);
6. R^2 / inlier-fraction gates.

Validated against the object API on identical inputs (tests/test_mxu.py).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmwave_radar_processing_tpu.config import RadarConfig, grids
from mmwave_radar_processing_tpu.ops import mxu, peaks as peaks_ops
from mmwave_radar_processing_tpu.ops.ransac import ransac_linear
from mmwave_radar_processing_tpu.processors.velocity_estimator import (
    ODS_AZ_SETS_VIRTUAL,
    ODS_EL_SETS_VIRTUAL,
)
from mmwave_radar_processing_tpu.processors.virtual_array import reformat


class VelocityBatch(NamedTuple):
    velocity: jax.Array  # (B, 3) gated [az_vy, el_vy, vx]
    vx: jax.Array  # (B,) zero-azimuth readout
    az_r2: jax.Array  # (B,)
    el_r2: jax.Array  # (B,)
    az_inlier: jax.Array  # (B,)
    el_inlier: jax.Array  # (B,)


def build_velocity_pipeline(
    cfg: RadarConfig,
    *,
    lower_range_bound: float = 0.5,
    upper_range_bound: float = 0.5,
    num_angle_bins: int = 64,
    valid_angle_range: Sequence[float] = (np.deg2rad(-70), np.deg2rad(70)),
    peak_threshold_db: float = 30.0,
    min_r2_threshold: float = 0.6,
    min_inlier_percent: float = 0.75,
    seed: int = 42,
):
    """Compile ``(raw_re, raw_im, altitude[B]) -> VelocityBatch``."""
    ns, loops = cfg.num_adc_samples, cfg.frame.loops
    num_rx, cpl = cfg.num_rx_antennas, cfg.chirp_cfgs_per_loop

    range_bins = jnp.asarray(grids.range_bins(cfg, variant="eps"))
    vel_bins = jnp.asarray(grids.vel_bins(cfg))
    angle_bins = grids.angle_bins(num_angle_bins)
    var = np.asarray(valid_angle_range, float)
    valid_mask = (angle_bins >= var[0]) & (angle_bins <= var[1])
    valid_cols = np.flatnonzero(valid_mask)
    valid_angle_bins = jnp.asarray(angle_bins[valid_mask])
    zero_az_col = int(np.argmin(np.abs(angle_bins[valid_mask])))

    # static DFT factors: Hann-windowed range + chirp transforms, angle pad
    rng_factors = mxu.dft_factors(ns, window=np.hanning(ns))
    chirp_factors = mxu.dft_factors(loops, window=np.hanning(loops), shift=True)
    az_angle_factors = mxu.aoa_factors(4, num_angle_bins, shift=True)
    el_angle_factors = mxu.aoa_factors(4, num_angle_bins, shift=False)

    az_sets = tuple(np.asarray(s, int) for s in ODS_AZ_SETS_VIRTUAL)
    el_sets = tuple(np.asarray(s, int) for s in ODS_EL_SETS_VIRTUAL)
    base_key = jax.random.PRNGKey(seed)

    def response(rng_fft: mxu.C2, rx_set, angle_factors, rmask):
        """One sub-array's coarse Doppler-azimuth response [vel, valid_angle]."""
        sub = mxu.C2(rng_fft.re[rx_set], rng_fft.im[rx_set])  # [4, range, chirp]
        data = mxu.C2(
            jnp.moveaxis(sub.re, 0, -1), jnp.moveaxis(sub.im, 0, -1)
        )  # [range, chirp, rx]
        spec = mxu.dft_apply(data, chirp_factors, axis=1)
        spec = mxu.dft_apply(spec, angle_factors, axis=2)  # [range, vel, angle]
        mag = mxu.cabs(spec)[..., valid_cols]
        w = rmask[:, None, None]
        return jnp.sum(mag * w, axis=0) / jnp.maximum(jnp.sum(rmask), 1.0)

    def zero_az_vel(resp):
        db = 20.0 * jnp.log10(resp + 1e-12)
        db = jnp.maximum(db, jnp.max(db) - peak_threshold_db)
        col = db[:, zero_az_col]
        mask = peaks_ops.local_maxima(col)
        best = jnp.argmax(jnp.where(mask, col, -jnp.inf))
        return jnp.where(jnp.any(mask), vel_bins[best], 0.0), jnp.any(mask)

    def row_peaks(resp):
        db = 20.0 * jnp.log10(resp + 1e-12)
        db = jnp.maximum(db, jnp.max(db) - peak_threshold_db)

        def per_row(row):
            m = peaks_ops.local_maxima(row)
            m = m & (peaks_ops.prominences(row, m) >= 4.0)
            return jnp.argmax(jnp.where(m, row, -jnp.inf)), jnp.any(m)

        best_idx, found = jax.vmap(per_row)(db)
        return valid_angle_bins[best_idx], vel_bins, found

    def fit_vy(angles, vels, found, vx, key):
        """Standard / small-vx RANSAC vy fit (reference :346-506)."""

        def standard(_):
            y = -vels - vx * jnp.cos(angles)
            h = jnp.sin(angles)[:, None]
            res = ransac_linear(h, y, found, key, min_samples=10,
                                residual_threshold=0.15, max_trials=20)
            return res.coef[0], res.r2, res.inlier_fraction

        def small_vx(_):
            y = angles
            h = (vels - vx)[:, None]
            res = ransac_linear(h, y, found, key, min_samples=10,
                                residual_threshold=0.20, max_trials=20)
            a = res.coef[0]
            vy = jnp.where(res.ok & (a != 0.0), -1.0 / a, 0.0)
            return vy, res.r2, res.inlier_fraction

        return jax.lax.cond(vx >= 0.1, standard, small_vx, None)

    def single_frame(raw_re, raw_im, altitude, key):
        cube = mxu.C2(
            reformat(raw_re, num_rx=num_rx, cfgs_per_loop=cpl),
            reformat(raw_im, num_rx=num_rx, cfgs_per_loop=cpl),
        )
        rng_fft = mxu.dft_apply(cube, rng_factors, axis=-2)  # [rx, range, chirp]

        lo = jnp.maximum(0.0, altitude - lower_range_bound)
        hi = jnp.minimum(cfg.range_max_m, altitude + upper_range_bound)
        rmask = ((range_bins >= lo) & (range_bins <= hi)).astype(jnp.float32)

        az_resp = 0.5 * (
            response(rng_fft, az_sets[0], az_angle_factors, rmask)
            + response(rng_fft, az_sets[1], az_angle_factors, rmask)
        )
        el_resp = 0.5 * (
            response(rng_fft, el_sets[0], el_angle_factors, rmask)
            + response(rng_fft, el_sets[1], el_angle_factors, rmask)
        )

        az_v, az_found = zero_az_vel(az_resp)
        el_v, el_found = zero_az_vel(el_resp)
        vx = jnp.where(
            az_found & el_found, -0.5 * (az_v + el_v),
            jnp.where(az_found, -az_v, jnp.where(el_found, -el_v, 0.0)),
        )

        k1, k2 = jax.random.split(key)
        az_a, az_vl, az_f = row_peaks(az_resp)
        el_a, el_vl, el_f = row_peaks(el_resp)
        az_vy, az_r2, az_in = fit_vy(az_a, az_vl, az_f, vx, k1)
        el_vy, el_r2, el_in = fit_vy(el_a, el_vl, el_f, vx, k2)

        gated_az = jnp.where(
            (az_r2 >= min_r2_threshold) & (az_in >= min_inlier_percent), az_vy, 0.0
        )
        gated_el = jnp.where(
            (el_r2 >= min_r2_threshold) & (el_in >= min_inlier_percent), el_vy, 0.0
        )
        velocity = jnp.stack([gated_az, gated_el, vx])
        return VelocityBatch(velocity, vx, az_r2, el_r2, az_in, el_in)

    def batch_fn(raw_re, raw_im, altitude):
        keys = jax.random.split(base_key, raw_re.shape[0])
        return jax.vmap(single_frame)(raw_re, raw_im, altitude, keys)

    return jax.jit(batch_fn)
