"""Unit tests for the degraded-tunnel benchmark guard (utils/bench_health).

The BENCH_r04 incident: the official capture recorded the north star at
11,081 frames/s — a silent ~16x anomaly vs the healthy 178,525 record, with
no spread, floor cross-check, or retry in the harness.  These tests pin the
guard that makes that capture class impossible to record silently: a
deliberately-throttled run must be flagged (and retried), a healthy run must
pass untouched.
"""

import json

import pytest

from mmwave_radar_processing_tpu.utils import bench_health as bh

PEAKS = {
    "dispatch_overhead_ms": 0.435,
    "measured_hbm_gbs": 662.5,
    "measured_f32_tflops": 112.77,
}
# north-star-like workload: batch 1024, ~40 MFLOP + ~52920 cplx samples/frame
FLOPS_PD = 40.1e6 * 1024
INPUT_BYTES_PD = 2 * 1024 * 4 * 63 * 210 * 4


def _assess(fps, **kw):
    kw.setdefault("peaks", PEAKS)
    kw.setdefault("flops_per_dispatch", FLOPS_PD)
    kw.setdefault("input_bytes_per_dispatch", INPUT_BYTES_PD)
    return bh.assess(fps, batch=1024, metric="pointcloud", **kw)


class TestAssess:
    def test_healthy_run_passes(self):
        # 176k frames/s, probe at calibrated cost, vs 179k known-good
        v = _assess(176_000.0, probe_ms=0.45,
                    expected_frames_per_s=179_161.0)
        assert v.healthy
        assert v.reasons == []
        # all three signals recorded for the JSON line
        f = v.fields()
        assert f["tunnel_probe_ms_per_dispatch"] == 0.45
        assert f["expected_frames_per_s"] == 179_161.0
        assert "floor_ms_per_dispatch" in f

    def test_r04_magnitude_anomaly_is_flagged(self):
        # the actual incident: 11,081 frames/s ≈ 92 ms/dispatch at batch 1024
        v = _assess(11_081.0, probe_ms=7.0,
                    expected_frames_per_s=179_161.0)
        assert not v.healthy
        # probe 16x and expected 16x both trip; the floor ratio is recorded
        # but only *gates* when no known-good record exists (VPU-bound
        # pipelines legitimately sit >10x above the matmul/bandwidth floor)
        assert len(v.reasons) == 2
        assert v.probe_ratio == pytest.approx(7.0 / 0.435, rel=1e-6)
        assert v.expected_ratio == pytest.approx(179_161 / 11_081, rel=1e-6)
        assert v.floor_ratio > bh.FLOOR_RATIO_LIMIT

    def test_floor_gates_only_without_a_record(self):
        # no expected record (unrecorded metric): a 60x-off-floor capture is
        # still caught by the fallback floor criterion
        v = bh.assess(11_081.0, batch=1024, metric="no_such_metric",
                      peaks=PEAKS, flops_per_dispatch=FLOPS_PD,
                      input_bytes_per_dispatch=INPUT_BYTES_PD,
                      expected_frames_per_s=None)
        assert not v.healthy and any("floor" in r for r in v.reasons)
        # with a record, a healthy VPU-bound run 12x above floor that BEAT
        # its record must NOT be flagged (velocity false-positive regression)
        v2 = _assess(65_936.0, probe_ms=0.54,
                     expected_frames_per_s=53_830.0)
        assert v2.healthy and v2.floor_ratio > bh.FLOOR_RATIO_LIMIT

    def test_probe_alone_flags_degraded_runtime(self):
        v = _assess(176_000.0, probe_ms=2.0, expected_frames_per_s=None)
        assert not v.healthy
        assert any("probe" in r for r in v.reasons)

    def test_healthy_run_sits_above_floor_without_tripping(self):
        # healthy north star is ~4x the perfectly-overlapped floor — the
        # floor criterion must NOT flag it (threshold is 6x)
        v = _assess(176_000.0, probe_ms=None, expected_frames_per_s=None)
        assert v.healthy
        assert 2.0 < v.floor_ratio < bh.FLOOR_RATIO_LIMIT

    def test_no_peaks_no_expected_never_flags(self):
        # an unrecorded metric with no peaks file: nothing to judge against —
        # pass, don't guess (expected_frames_per_s=None falls through to the
        # HEALTH_EXPECTED.json lookup, which has no such metric)
        v = bh.assess(1.0, batch=1024, metric="no_such_metric", peaks={},
                      expected_frames_per_s=None)
        assert v.healthy


class TestFloor:
    def test_analytic_floor_composition(self):
        floor = bh.analytic_floor_ms(FLOPS_PD, INPUT_BYTES_PD, PEAKS)
        # 0.435 program + 0.654 input-read + 0.364 flops ≈ 1.45 ms
        assert floor == pytest.approx(
            0.435 + INPUT_BYTES_PD / 662.5e9 * 1e3
            + FLOPS_PD / 112.77e12 * 1e3, rel=1e-9)
        assert 1.2 < floor < 2.0

    def test_missing_peaks_gives_none(self):
        assert bh.analytic_floor_ms(FLOPS_PD, INPUT_BYTES_PD, {}) is None


class TestTimedWithHealth:
    def _mk(self, schedule, probes, sleeps):
        """timer/probe/sleep fakes: `schedule` is per-attempt repeat-seconds."""
        it = iter(schedule)
        pit = iter(probes)
        return (lambda: next(it)), (lambda: next(pit)), sleeps.append

    def test_degraded_first_attempt_retries_then_passes(self):
        # attempt 1: 16x slow (0.092 s/repeat at iters=1) -> retry;
        # attempt 2: healthy 5.7 ms
        sleeps = []
        timer, probe, sleep = self._mk(
            [[0.092, 0.093], [0.0057, 0.0058]], [7.0, 0.44], sleeps)
        out = bh.timed_with_health(
            timer, batch=1024, iters=1, metric="pointcloud",
            probe=probe, peaks=PEAKS, flops_per_dispatch=FLOPS_PD,
            input_bytes_per_dispatch=INPUT_BYTES_PD,
            expected_frames_per_s=179_161.0, max_retries=2, sleep=sleep)
        assert out["degraded_run"] is False
        assert out["health_attempts"] == 2
        assert sleeps == [10.0]
        assert out["frames_per_s"] == pytest.approx(1024 / 0.0057, rel=1e-3)
        assert len(out["per_repeat_frames_per_s"]) == 2
        assert "degraded_reasons" not in out

    def test_persistently_degraded_run_is_flagged_with_both_numbers(self):
        sleeps = []
        timer, probe, sleep = self._mk(
            [[0.092], [0.091], [0.093]], [7.0, 7.1, 6.9], sleeps)
        out = bh.timed_with_health(
            timer, batch=1024, iters=1, metric="pointcloud",
            probe=probe, peaks=PEAKS, flops_per_dispatch=FLOPS_PD,
            input_bytes_per_dispatch=INPUT_BYTES_PD,
            expected_frames_per_s=179_161.0, max_retries=2, sleep=sleep)
        assert out["degraded_run"] is True
        assert out["health_attempts"] == 3
        assert len(out["attempt_history"]) == 3
        # the record carries the comparison numbers, not just a flag
        assert out["expected_frames_per_s"] == 179_161.0
        assert out["tunnel_probe_ms_per_dispatch"] == pytest.approx(6.9)
        assert any("known-good" in r for r in out["degraded_reasons"])

    def test_probe_failure_does_not_kill_capture(self):
        def bad_probe():
            raise RuntimeError("tunnel hiccup")

        out = bh.timed_with_health(
            lambda: [0.0057], batch=1024, iters=1, metric="pointcloud",
            probe=bad_probe, peaks=PEAKS, flops_per_dispatch=FLOPS_PD,
            input_bytes_per_dispatch=INPUT_BYTES_PD,
            expected_frames_per_s=179_161.0, max_retries=0,
            sleep=lambda s: None)
        assert out["degraded_run"] is False

    def test_repeat_spread_recorded(self):
        out = bh.timed_with_health(
            lambda: [0.0060, 0.0057, 0.0070], batch=1024, iters=1,
            metric="pointcloud", probe=lambda: 0.44, peaks=PEAKS,
            expected_frames_per_s=None, max_retries=0, sleep=lambda s: None)
        assert out["repeat_spread_frac"] == pytest.approx(
            1 - 0.0057 / 0.0070, abs=1e-3)


class TestExpectedRecord:
    def test_roundtrip_and_mismatch_guards(self, tmp_path, monkeypatch):
        monkeypatch.setattr(bh, "EXPECTED_PATH",
                            str(tmp_path / "HEALTH_EXPECTED.json"))
        bh.update_expected("pointcloud", 1024, 179161.4, platform="tpu")
        assert bh.load_expected("pointcloud", 1024, "tpu") == 179161.4
        # platform recorded in the file
        doc = json.loads((tmp_path / "HEALTH_EXPECTED.json").read_text())
        assert doc["metrics"]["pointcloud"]["platform"] == "tpu"
        # batch mismatch -> no judgment
        assert bh.load_expected("pointcloud", 512, "tpu") is None
        # platform mismatch (CPU debug run) -> no judgment
        assert bh.load_expected("pointcloud", 1024, "cpu") is None
        # unknown metric -> no judgment
        assert bh.load_expected("capon", 1024, "tpu") is None

    def test_repo_record_is_well_formed(self):
        # the committed file must stay loadable with TPU records at batch 1024
        fps = bh.load_expected("pointcloud", 1024, "tpu")
        assert fps is not None and fps > 100_000
