"""CPSL-dataset-compatible loader.

The reference consumes recordings through a ``CpslDS`` class from the
``cpsl_datasets`` submodule (not vendored in the snapshot); its API surface is
reconstructed from call sites (SURVEY.md §2.11, e.g.
``visualization/models/dataset_model.py:67-119``,
``plotting/movies_mmWave_data.py:57-76``).  This implementation reads
folder-per-modality NPY layouts:

    dataset_path/
      radar_0_adc/   frame_*.npy   complex [rx, sample, chirp]
      vehicle_odom/  frame_*.npy   (M, >=11), cols 8:11 = vx,vy,vz
      vehicle_vel/   frame_*.npy
      lidar/         frame_*.npy   (N, >=3) point clouds
      camera/        frame_*.npy / *.png images
      ...

Files are index-aligned by sorted name.  A writer is provided so simulated
scenes can be materialized in the same layout.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


class CpslDS:
    """Folder-of-NPY dataset reader with the reference ``CpslDS`` API."""

    def __init__(
        self,
        dataset_path: str,
        radar_adc_folder: str = "radar_0_adc",
        lidar_folder: str = "lidar",
        camera_folder: str = "camera",
        hand_tracking_folder: str = "hand_tracking",
        imu_orientation_folder: str = "imu_orientation",
        imu_full_folder: str = "imu_data",
        vehicle_vel_folder: str = "vehicle_vel",
        vehicle_odom_folder: str = "vehicle_odom",
        **kwargs,
    ):
        self.dataset_path = dataset_path
        self._files = {}
        for key, folder in [
            ("radar_adc", radar_adc_folder),
            ("lidar", lidar_folder),
            ("camera", camera_folder),
            ("hand_tracking", hand_tracking_folder),
            ("imu_orientation", imu_orientation_folder),
            ("imu_full", imu_full_folder),
            ("vehicle_vel", vehicle_vel_folder),
            ("vehicle_odom", vehicle_odom_folder),
        ]:
            self._files[key] = self._list(folder)

        self.radar_enabled = bool(self._files["radar_adc"])
        self.lidar_enabled = bool(self._files["lidar"])
        self.camera_enabled = bool(self._files["camera"])
        self.vehicle_vel_enabled = bool(self._files["vehicle_vel"])
        self.vehicle_odom_enabled = bool(self._files["vehicle_odom"])
        self.num_frames = len(self._files["radar_adc"])

    def _list(self, folder: str) -> List[str]:
        if not folder:
            return []
        path = os.path.join(self.dataset_path, folder)
        if not os.path.isdir(path):
            return []
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".npy", ".npz", ".png", ".jpg"))
        )

    # ------------------------------------------------------------------ #
    def get_radar_adc_data(self, idx: int) -> np.ndarray:
        """Complex ADC cube ``[rx, sample, chirp]`` for frame ``idx``."""
        return np.load(self._files["radar_adc"][idx])

    def get_vehicle_odom_data(self, idx: int) -> np.ndarray:
        """Odometry rows ``(M, >=11)``; columns 8:11 are vx,vy,vz ground truth."""
        return np.load(self._files["vehicle_odom"][idx])

    def get_vehicle_vel_data(self, idx: int) -> np.ndarray:
        return np.load(self._files["vehicle_vel"][idx])

    def get_lidar_point_cloud_raw(self, idx: int) -> np.ndarray:
        return np.load(self._files["lidar"][idx])

    def get_camera_frame(self, idx: int) -> np.ndarray:
        assert self.camera_enabled, "camera data not available in dataset"
        path = self._files["camera"][idx]
        if path.endswith(".npy"):
            return np.load(path)
        import imageio.v2 as imageio

        return imageio.imread(path)


def write_dataset(
    dataset_path: str,
    adc_frames: np.ndarray,
    odom: Optional[np.ndarray] = None,
    vel: Optional[np.ndarray] = None,
    radar_adc_folder: str = "radar_0_adc",
    vehicle_odom_folder: str = "vehicle_odom",
    vehicle_vel_folder: str = "vehicle_vel",
) -> None:
    """Materialize frames (and optional ground truth) in the CpslDS layout.

    Args:
        adc_frames: ``[frames, rx, sample, chirp]`` complex.
        odom: optional ``[frames, M, >=11]`` odometry (cols 8:11 = velocity).
        vel: optional ``[frames, M, >=3]`` velocity rows.
    """
    radar_dir = os.path.join(dataset_path, radar_adc_folder)
    os.makedirs(radar_dir, exist_ok=True)
    for i, frame in enumerate(adc_frames):
        np.save(os.path.join(radar_dir, f"frame_{i:05d}.npy"), frame)
    if odom is not None:
        odom_dir = os.path.join(dataset_path, vehicle_odom_folder)
        os.makedirs(odom_dir, exist_ok=True)
        for i, row in enumerate(odom):
            np.save(os.path.join(odom_dir, f"frame_{i:05d}.npy"), row)
    if vel is not None:
        vel_dir = os.path.join(dataset_path, vehicle_vel_folder)
        os.makedirs(vel_dir, exist_ok=True)
        for i, row in enumerate(vel):
            np.save(os.path.join(vel_dir, f"frame_{i:05d}.npy"), row)


def make_odom_rows(velocity: np.ndarray, rows: int = 5) -> np.ndarray:
    """Odometry block whose columns 8:11 hold ``velocity`` (reference layout)."""
    out = np.zeros((rows, 11))
    out[:, 8:11] = np.asarray(velocity)[None, :]
    return out
