"""CLI scripts: end-to-end smoke tests over a tiny simulated dataset."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(args, timeout=420):
    # PALLAS_AXON_POOL_IPS="" keeps the container's sitecustomize from
    # registering the TPU tunnel plugin in the subprocess — the scripts run on
    # CPU and must not contend with a concurrently running TPU benchmark.
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scripts") / "ds")
    r = _run([
        "scripts/simulate_dataset.py", "--out", out, "--frames", "12",
        "--vx", "0.4", "--altitude", "1.0", "--ramp-frames", "6",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    return out


def test_simulate_dataset_layout(sim_dataset):
    radar = os.path.join(sim_dataset, "radar_0_adc")
    odom = os.path.join(sim_dataset, "vehicle_odom")
    assert len(os.listdir(radar)) == 12
    assert len(os.listdir(odom)) == 12
    frame = np.load(os.path.join(radar, sorted(os.listdir(radar))[0]))
    assert frame.shape == (4, 63, 210) and np.iscomplexobj(frame)


def test_vel_estimation_script(sim_dataset):
    r = _run([
        "scripts/test_vel_estimation.py",
        "--config", "analyzer_configs/velocity_analysis_config.yaml",
        "--dataset", sim_dataset,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "velocity error report" in r.stdout
    assert "RMSE" in r.stdout


def test_view_radar_data_script(sim_dataset, tmp_path):
    out = str(tmp_path / "frame.png")
    r = _run([
        "scripts/view_radar_data.py", "--dataset", sim_dataset,
        "--frame", "5", "--out", out,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(out) > 10000


def test_multi_vel_estimation_script():
    """Shipped multi-dataset YAML end-to-end (ref test_multi_vel_estimation.py:33-80).

    Simulates the two datasets at the shipped YAML's default paths, then runs
    the script against the shipped config verbatim — per-dataset and pooled
    error reports must come out.
    """
    def complete(path):
        # a stale/interrupted generation (radar dir present but odom missing
        # or short) must trigger a regenerate, not a downstream script failure.
        # >= rather than ==: the shipped YAML's header tells users they may
        # regenerate these same paths with --frames 20 — such a valid
        # user-built dataset must be used as-is, never rmtree'd by the test
        radar = os.path.join(path, "radar_0_adc")
        odom = os.path.join(path, "vehicle_odom")
        if not (os.path.isdir(radar) and os.path.isdir(odom)):
            return False
        n_radar, n_odom = len(os.listdir(radar)), len(os.listdir(odom))
        return n_radar == n_odom and n_radar >= 10

    for path, seed in [("/tmp/sim_radvel_a", "0"), ("/tmp/sim_radvel_b", "1")]:
        if not complete(path):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            r = _run([
                "scripts/simulate_dataset.py", "--out", path, "--frames", "10",
                "--vx", "0.4", "--altitude", "1.0", "--ramp-frames", "5",
                "--seed", seed,
            ])
            assert r.returncode == 0, r.stderr[-2000:]
            assert complete(path)
    r = _run([
        "scripts/test_multi_vel_estimation.py",
        "--config", "analyzer_configs/multi_dataset_velocity_analysis_config.yaml",
    ])
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "sim_radvel_a" in r.stdout and "sim_radvel_b" in r.stdout, (
        r.stdout[-2000:])
    assert "pooled over all datasets" in r.stdout, r.stdout[-2000:]
    assert "RMSE" in r.stdout, r.stdout[-2000:]


def test_dataset_aux_modalities(tmp_path):
    """hand_tracking / imu_orientation / imu_full round-trip through CpslDS."""
    from mmwave_radar_processing_tpu.data.cpsl_dataset import CpslDS, write_dataset

    frames = 3
    adc = (np.random.default_rng(0).normal(size=(frames, 2, 4, 6))
           + 1j * np.random.default_rng(1).normal(size=(frames, 2, 4, 6)))
    hand = np.arange(frames * 5 * 3, dtype=float).reshape(frames, 5, 3)
    quat = np.tile([0.0, 0.0, 0.0, 1.0], (frames, 1))
    imu = np.ones((frames, 6))
    write_dataset(str(tmp_path), adc, hand_tracking=hand,
                  imu_orientation=quat, imu_full=imu)
    ds = CpslDS(str(tmp_path))
    assert ds.hand_tracking_enabled and ds.imu_orientation_enabled
    assert ds.imu_full_enabled and not ds.vehicle_odom_enabled
    np.testing.assert_array_equal(ds.get_hand_tracking_data(1), hand[1])
    np.testing.assert_array_equal(ds.get_imu_orientation_data(2), quat[2])
    np.testing.assert_array_equal(ds.get_imu_full_data(0), imu[0])
    np.testing.assert_array_equal(ds.get_radar_data(1), ds.get_radar_adc_data(1))


def test_dataset_radar_point_clouds(tmp_path):
    """radar_pc_folder round-trip: pc-only datasets drive the points path.

    Reference call site: ``notebooks/hermes_testing_vel_estimation_outward_
    points.ipynb`` (``radar_pc_folder="front_radar_pc"`` +
    ``get_radar_point_cloud``).
    """
    from mmwave_radar_processing_tpu.data.cpsl_dataset import CpslDS, write_dataset

    rng = np.random.default_rng(3)
    pcs = [rng.normal(size=(n, 4)) for n in (12, 7, 20)]
    write_dataset(str(tmp_path), radar_pc=pcs,
                  radar_pc_folder="front_radar_pc")
    ds = CpslDS(str(tmp_path), radar_pc_folder="front_radar_pc")
    assert ds.radar_pc_enabled and not ds.radar_enabled
    assert ds.num_frames == 3
    np.testing.assert_array_equal(ds.get_radar_point_cloud(1), pcs[1])
    # get_radar_data falls through to the point cloud when no ADC exists
    np.testing.assert_array_equal(ds.get_radar_data(2), pcs[2])


def test_dbs_demo_script(tmp_path):
    out = str(tmp_path / "dbs.png")
    r = _run(["scripts/doppler_beam_sharpening_demo.py", "--out", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(out) > 10000


def test_viewer_headless_export(sim_dataset, tmp_path):
    import yaml

    ds_yaml = str(tmp_path / "ds.yaml")
    with open(ds_yaml, "w") as f:
        yaml.safe_dump(
            {
                "dataset": {"dataset_path": sim_dataset},
                "config": {
                    "name": os.path.join(REPO, "configs", "6843_RadVel_ods_20Hz.cfg"),
                    "array_geometry": "ods",
                    "array_direction": "down",
                },
            },
            f,
        )
    movie = str(tmp_path / "viewer.mp4")
    r = _run([
        "scripts/launch_mmwave_viewer.py",
        "--dataset-params", ds_yaml,
        "--processor-params", "gui_configs/processor_params.yaml",
        "--export-movie", movie, "--frames", "3",
        "--views", "range_doppler_resp", "range_resp",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    produced = [p for p in (movie, movie[:-4] + ".gif") if os.path.exists(p)]
    assert produced and os.path.getsize(produced[0]) > 1000


def test_bench_no_health_never_updates_expected(tmp_path):
    """--no-health + --update-expected must NOT touch the known-good record.

    Round-5 review regression: an unchecked (possibly degraded) capture could
    previously be persisted as the known-good record, defeating the
    3x-below-record anomaly criterion for every future run.  A CPU debug run
    (tiny batch, health skipped) exercises exactly that path.
    """
    import json
    import shutil

    expected = os.path.join(REPO, "HEALTH_EXPECTED.json")
    before = open(expected).read()
    r = _run(["bench.py", "--batch", "8", "--iters", "2", "--repeats", "1",
              "--no-health", "--update-expected"], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["degraded_run"] is None  # health explicitly skipped
    after = open(expected).read()
    assert after == before, "unchecked run must not update the record"
