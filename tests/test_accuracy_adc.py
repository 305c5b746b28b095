"""End-to-end ADC-path accuracy: fused velocity pipeline vs live reference.

The accuracy leg of the north star: N simulated down-facing recordings run
through BOTH the fused TPU velocity pipeline and the reference's
``VelocityEstimator.process(adc_cube, altitude)`` ADC path
(``/root/reference/.../velocity_estimator.py:785-872``), then
``VelocityAnalyzer`` summary statistics (Mean/RMSE/90% tail, per axis) are
compared against the same ground truth.  The pipelines must agree per-frame
on the deterministic ``vx`` readout and track each other's error statistics
within a stated bound (RANSAC seeds differ between the implementations).

Estimate-space convention (ODS, down-facing): ``[vy_az, vz_el, vx]`` — the
reference's ``current_velocity_estimate`` layout (:597-621).
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference

from mmwave_radar_processing_tpu.analysis import VelocityAnalyzer
from mmwave_radar_processing_tpu.data import ground_scene, simulate_frame
from mmwave_radar_processing_tpu.parallel.velocity_pipeline import (
    build_velocity_pipeline,
)
from mmwave_radar_processing_tpu.processors import VirtualArrayReformatter

pytestmark = requires_reference

sys.path.insert(0, REFERENCE_ROOT)

EGO_VELS = [
    (1.2, 0.3, -0.1),
    (1.0, 0.5, 0.2),
    (1.4, -0.3, 0.0),
    (0.9, 0.4, 0.1),
]
FRAMES_PER_VEL = 4
ALTITUDE = 1.2


@pytest.fixture(scope="module")
def recordings(flagship_config):
    rng = np.random.default_rng(17)
    raws, gts = [], []
    for ego in EGO_VELS:
        for _ in range(FRAMES_PER_VEL):
            scene = ground_scene(flagship_config, altitude_m=ALTITUDE,
                                 ego_vel=np.asarray(ego), num_patches=200,
                                 rng=rng, noise_sigma=0.01)
            raws.append(simulate_frame(flagship_config, scene, rng))
            gts.append([ego[1], ego[2], ego[0]])  # estimate space [vy, vz, vx]
    return np.stack(raws), np.asarray(gts, np.float32)


def _summary(est, gt):
    an = VelocityAnalyzer()
    an.analyze(history_estimated=est, history_gt=gt, error_method="signed")
    return an.generate_report()


def test_adc_velocity_accuracy_tracks_reference(flagship_config, flagship_cfg_path, recordings):
    from mmwave_radar_processing.config_managers.cfgManager import (
        ConfigManager as RefConfigManager,
    )
    from mmwave_radar_processing.processors.velocity_estimator import (
        VelocityEstimator as RefVelocityEstimator,
    )

    raw, gt = recordings
    n = raw.shape[0]

    fn = build_velocity_pipeline(flagship_config, min_r2_threshold=0.2,
                                 min_inlier_percent=0.3)
    ours = np.asarray(
        fn(np.real(raw).astype(np.float32), np.imag(raw).astype(np.float32),
           np.full(n, ALTITUDE, np.float32)).velocity
    )

    ref_cfg = RefConfigManager()
    ref_cfg.load_cfg(str(flagship_cfg_path), "ods", "down")
    var = VirtualArrayReformatter(flagship_config)
    ve = RefVelocityEstimator(ref_cfg, lower_range_bound=0.5,
                              upper_range_bound=0.5, min_R2_threshold=0.2,
                              min_inlier_percent=0.3)
    theirs = np.stack([
        ve.process(adc_cube=np.asarray(var.process(raw[i])),
                   altitude=ALTITUDE).copy()
        for i in range(n)
    ])

    # deterministic vx readout agrees per-frame
    np.testing.assert_allclose(ours[:, 2], theirs[:, 2], atol=1e-4)
    # RANSAC-dependent vy/vz agree within seed noise per frame
    np.testing.assert_allclose(ours[:, :2], theirs[:, :2], atol=0.45)

    rep_ours = _summary(ours, gt)
    rep_ref = _summary(theirs, gt)
    print("\n== fused TPU pipeline ==\n", rep_ours)
    print("== reference ADC path ==\n", rep_ref)

    # summary statistics track the reference within the stated bound
    for axis in ("X", "Y", "Z", "Norm"):
        for stat in ("Mean", "RMSE", "90% Tail"):
            a = float(rep_ours.loc[axis, stat])
            b = float(rep_ref.loc[axis, stat])
            assert abs(a - b) <= 0.15, (
                f"{axis}/{stat}: ours {a:.3f} vs reference {b:.3f}")
    # and the estimates are genuinely informative (vx within 0.15 m/s RMSE
    # of truth for both implementations)
    assert float(rep_ours.loc["Z", "RMSE"]) <= 0.2
    assert float(rep_ref.loc["Z", "RMSE"]) <= 0.2
