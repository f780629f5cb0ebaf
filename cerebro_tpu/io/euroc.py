"""EuRoC MAV dataset loader (ASL folder format).

Replaces the reference's rosbag + subscriber ingestion for offline runs
(ref launch/euroc_vinsfusion.launch:12-24 plays the EuRoC bags; the yaml
rig description lives in config/vinsfusion/euroc/). Reads the standard ASL
layout:

    mav0/cam0/data.csv + data/<stamp>.png
    mav0/cam1/data.csv + data/
    mav0/state_groundtruth_estimate0/data.csv   (stamp, p, q, v, ...)

and yields time-aligned stereo frames with (optionally) ground-truth poses
associated by nearest stamp within a tolerance — the reference's ±1 ms
range-search rule (src/DataManager.cpp:924-928).

PNG decoding uses torch's bundled image decoder if available, else PIL,
else raises — no OpenCV dependency.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from cerebro_tpu.geometry import se3
import jax.numpy as jnp


def _read_png_gray(path: str) -> np.ndarray:
    try:
        from PIL import Image  # type: ignore

        return np.asarray(Image.open(path).convert("L"), np.uint8)
    except ImportError:
        pass
    try:
        import torchvision.io as tio  # type: ignore

        img = tio.read_image(path, mode=tio.ImageReadMode.GRAY)
        return img.numpy()[0].astype(np.uint8)
    except ImportError as e:
        raise RuntimeError("no PNG decoder available (PIL or torchvision)") from e


@dataclasses.dataclass
class EurocFrame:
    stamp: float  # seconds
    left_path: str
    right_path: Optional[str]
    pose: Optional[np.ndarray]  # (4,4) w_T_b ground truth if available

    def left(self) -> np.ndarray:
        return _read_png_gray(self.left_path)

    def right(self) -> Optional[np.ndarray]:
        return _read_png_gray(self.right_path) if self.right_path else None


def _read_cam_csv(cam_dir: str) -> List[Tuple[float, str]]:
    out = []
    with open(os.path.join(cam_dir, "data.csv")) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            ns = int(row[0])
            out.append((ns * 1e-9, os.path.join(cam_dir, "data", row[1].strip())))
    out.sort()
    return out


def _read_groundtruth(gt_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (stamps (N,), poses (N,4,4))."""
    stamps, poses = [], []
    with open(os.path.join(gt_dir, "data.csv")) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            ns = int(row[0])
            p = np.array([float(v) for v in row[1:4]], np.float32)
            q = np.array([float(v) for v in row[4:8]], np.float32)  # w,x,y,z
            stamps.append(ns * 1e-9)
            R = np.asarray(se3.quat_to_rot(jnp.asarray(q)))
            poses.append(np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(p))))
    return np.asarray(stamps), np.asarray(poses, np.float32)


class EurocSequence:
    """One EuRoC sequence (e.g. MH_01_easy/mav0)."""

    def __init__(self, mav0_dir: str, stamp_tol: float = 1e-3):
        self.root = mav0_dir
        self.cam0 = _read_cam_csv(os.path.join(mav0_dir, "cam0"))
        cam1_dir = os.path.join(mav0_dir, "cam1")
        self.cam1 = _read_cam_csv(cam1_dir) if os.path.isdir(cam1_dir) else []
        gt_dir = os.path.join(mav0_dir, "state_groundtruth_estimate0")
        if os.path.isdir(gt_dir):
            self.gt_stamps, self.gt_poses = _read_groundtruth(gt_dir)
        else:
            self.gt_stamps, self.gt_poses = np.zeros(0), np.zeros((0, 4, 4), np.float32)
        self.stamp_tol = stamp_tol
        self._cam1_stamps = np.asarray([s for s, _ in self.cam1])

    def __len__(self) -> int:
        return len(self.cam0)

    def _nearest_right(self, stamp: float) -> Optional[str]:
        if len(self.cam1) == 0:
            return None
        i = int(np.searchsorted(self._cam1_stamps, stamp))
        best, best_d = None, self.stamp_tol
        for j in (i - 1, i):
            if 0 <= j < len(self.cam1):
                d = abs(self.cam1[j][0] - stamp)
                if d <= best_d:
                    best, best_d = self.cam1[j][1], d
        return best

    def _nearest_pose(self, stamp: float, tol: float = 0.02) -> Optional[np.ndarray]:
        if len(self.gt_stamps) == 0:
            return None
        i = int(np.searchsorted(self.gt_stamps, stamp))
        best, best_d = None, tol
        for j in (i - 1, i):
            if 0 <= j < len(self.gt_stamps):
                d = abs(self.gt_stamps[j] - stamp)
                if d <= best_d:
                    best, best_d = self.gt_poses[j], d
        return best

    def frames(self, stride: int = 1) -> Iterator[EurocFrame]:
        for stamp, left_path in self.cam0[::stride]:
            yield EurocFrame(
                stamp=stamp,
                left_path=left_path,
                right_path=self._nearest_right(stamp),
                pose=self._nearest_pose(stamp),
            )
