"""Visualization stack: registry, controller fan-out, views, movie export.

Equivalent of the reference's view/controller test suite
(``tests/verify_gui_logic.py``, ``tests/verify_video_exporter.py``) —
payload-level assertions on every view class plus an end-to-end movie export
over a simulated CpslDS dataset, all headless.
"""

import os

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest
import yaml

from mmwave_radar_processing_tpu.data import PointTarget, Scene, simulate_frame
from mmwave_radar_processing_tpu.data.cpsl_dataset import make_odom_rows, write_dataset
from mmwave_radar_processing_tpu.visualization import (
    MmWaveRadarProcessorController,
    get_default_registry,
)
from mmwave_radar_processing_tpu.visualization.views import VIEW_CLASSES


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory, flagship_config):
    """Small simulated dataset in the CpslDS layout + YAML param files."""
    root = tmp_path_factory.mktemp("dataset")
    rng = np.random.default_rng(0)
    frames, odom = [], []
    for i in range(5):
        alt = 0.5 + 0.05 * i
        scene = Scene(
            targets=[
                PointTarget(range_m=alt, rcs=4.0),
                PointTarget(range_m=1.5, azimuth_rad=0.3, velocity_m_s=0.5, rcs=3.0),
            ],
            noise_sigma=0.04,
        )
        frames.append(simulate_frame(flagship_config, scene, rng))
        odom.append(make_odom_rows(np.array([0.3, 0.0, 0.1])))
    write_dataset(str(root / "rec"), np.stack(frames), odom=np.stack(odom))

    ds_params = {
        "dataset": {"dataset_path": str(root / "rec"),
                    "radar_adc_folder": "radar_0_adc",
                    "vehicle_odom_folder": "vehicle_odom"},
        "config": {"name": os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "configs",
                         "6843_RadVel_ods_20Hz.cfg")),
            "array_geometry": "ods", "array_direction": "down"},
    }
    proc_params = {
        "processors": {
            "range_doppler_resp": {"rx_idx": 0},
            "range_resp": {"chirp_idx": 0},
            "micro_doppler_resp": {"target_ranges": [0.2, 2.0],
                                   "num_frames_history": 5},
            "doppler_azimuth_resp": {"num_angle_bins": 64,
                                     "rx_antennas": [0, 3, 4, 7]},
            "range_detector": {"cfar_type": "os_cfar_1d",
                               "cfar_params": {"num_train": 5, "num_guard": 3,
                                               "rho": 0.5, "alpha": 2}},
            "altimeter": {"min_altitude_m": 0.25, "zoom_search_region_m": 0.2,
                          "altitude_search_limit_m": 0.4},
            "range_doppler_detector_2d": {
                "cfar_type": "os_cfar_2d",
                "cfar_params": {"num_train": [5, 5], "num_guard": [3, 2],
                                "rho": 0.7, "alpha": 4}},
            "point_cloud_generator": {
                "az_antenna_idxs": [0, 3, 4, 7],
                "el_antenna_idxs": [9, 8, 5, 4],
                "detector_type": "range_doppler_detector_2d",
                "detector_params": {
                    "cfar_type": "os_cfar_2d",
                    "cfar_params": {"num_train": [5, 5], "num_guard": [3, 2],
                                    "rho": 0.7, "alpha": 4}}},
        }
    }
    ds_path = root / "dataset_params.yaml"
    pp_path = root / "processor_params.yaml"
    ds_path.write_text(yaml.safe_dump(ds_params))
    pp_path.write_text(yaml.safe_dump(proc_params))
    return str(ds_path), str(pp_path)


@pytest.fixture(scope="module")
def controller(sim_dataset):
    ds_path, pp_path = sim_dataset
    registry = get_default_registry()
    # DBS + sequential + ground need extra params; disable for this run
    for k in ("range_angle_resp_dbs_enhanced", "range_doppler_detector_sequential",
              "range_doppler_ground_detector"):
        registry[k].enabled = False
    ctl = MmWaveRadarProcessorController(
        registry=registry, dataset_params_path=ds_path,
        processor_params_path=pp_path,
    )
    return ctl


def test_controller_loads_and_fans_out(controller):
    assert controller.dataset_model.num_frames == 5
    assert controller.config_model.config.num_virtual_antennas == 12
    assert len(controller.processors) >= 8

    received = {}
    controller.subscribe_view_update(lambda k, p: received.setdefault(k, p))
    frames_done = []
    controller.subscribe_frame_processed(frames_done.append)

    controller.process_next_frame(0)
    assert frames_done == [0]
    assert "range_doppler_resp" in received
    assert received["range_doppler_resp"]["data"].shape == (63, 70)
    assert "range_bins" in received["range_doppler_resp"]
    assert "altimeter" in received
    assert "point_cloud_generator" in received
    assert received["point_cloud_generator"]["data"].shape[1] == 4


def test_all_views_render(controller):
    received = {}
    controller.subscribe_view_update(lambda k, p: received.__setitem__(k, p))
    controller.process_next_frame(1)

    for key, payload in received.items():
        spec = controller.registry[key]
        view_cls = VIEW_CLASSES[spec.view_name]
        fig, ax = plt.subplots()
        view = view_cls(ax=ax)
        view.set_data(payload)
        # dB toggle re-renders from the cached payload (reference behavior)
        view.set_db_mode(False)
        assert view.latest_payload is payload
        plt.close(fig)


def test_view_db_conversion():
    from mmwave_radar_processing_tpu.visualization.views import RangeDopplerView

    fig, ax = plt.subplots()
    v = RangeDopplerView(ax=ax)
    data = np.abs(np.random.default_rng(0).standard_normal((10, 12))) + 0.1
    v.set_data({"data": data, "range_bins": np.arange(10),
                "vel_bins": np.linspace(-1, 1, 12)})
    img_db = v.ax.images[-1].get_array()
    np.testing.assert_allclose(
        img_db, 20 * np.log10(np.maximum(data, 1e-12)), rtol=1e-6
    )
    v.set_db_mode(False)
    img_lin = v.ax.images[-1].get_array()
    np.testing.assert_allclose(img_lin, data, rtol=1e-6)
    plt.close(fig)


def test_video_export(controller, tmp_path):
    from mmwave_radar_processing_tpu.visualization.video_exporter import VideoExporter

    out = str(tmp_path / "out.mp4")  # falls back to .gif without ffmpeg
    exporter = VideoExporter(
        controller,
        view_keys=["range_doppler_resp", "range_resp", "altimeter",
                   "point_cloud_generator"],
        fps=10,
    )
    n = exporter.export(out, start=0, end=3)
    assert n == 3
    produced = [p for p in (out, out[:-4] + ".gif") if os.path.exists(p)]
    assert produced and os.path.getsize(produced[0]) > 1000


def test_view_panel_model():
    from mmwave_radar_processing_tpu.visualization.view_panel import ViewPanelModel

    events = []
    panel = ViewPanelModel(num_cells=4, on_assign=lambda c, k: events.append((c, k)))

    assert panel.select(0, "range_doppler") is None
    payload = {"data": 1}
    assert panel.handle_view_update("range_doppler", payload) == [0]

    # cached payload returned on (re)selection elsewhere + uniqueness enforced
    got = panel.select(2, "range_doppler")
    assert got is payload
    assert panel.assignments[0] is None and panel.assignments[2] == "range_doppler"
    assert (0, None) in events

    # hidden view caches payloads and re-renders on reveal
    panel.handle_view_update("altitude", {"data": 2})
    got = panel.select(1, "altitude")
    assert got == {"data": 2}
    assert panel.cell_of("altitude") == 1
