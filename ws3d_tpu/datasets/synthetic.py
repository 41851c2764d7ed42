"""Synthetic KITTI-like scene generator.

The image ships no KITTI data, so every training/eval flow (and the bench)
can run on procedurally generated scenes with the same record layout the
real loader produces: ground-plane + car-shaped point clusters in rect
coordinates (x right, y down, z forward; ground at y≈1.65), KITTI-convention
boxes, weak BEV-click labels with jitter. This replaces nothing in the
reference (it has no synthetic path) — it is the test fixture layer SURVEY.md
§4 calls for.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ws3d_tpu.datasets.kitti_io import Calibration, KittiScene, Object3d

GROUND_Y = 1.65
CAR_MEAN_HWL = np.array([1.53, 1.63, 3.88], np.float32)

_XS = np.array([0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5])
_ZS = np.array([0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5])
_YS = np.array([0.0, 0.0, 0.0, 0.0, -1.0, -1.0, -1.0, -1.0])


def _corners3d_np(b: np.ndarray) -> np.ndarray:
    """NumPy twin of ws3d_tpu.ops.boxes.boxes3d_to_corners3d for one (7,)
    box — keeps scene generation jax-free (no eager device dispatch)."""
    h, w, l, ry = b[3], b[4], b[5], b[6]
    x_c, z_c, y_c = l * _XS, w * _ZS, h * _YS
    c, s = np.cos(ry), np.sin(ry)
    xr = c * x_c + s * z_c
    zr = -s * x_c + c * z_c
    return np.stack([xr + b[0], y_c + b[1], zr + b[2]], axis=-1)


def _car_surface_points(rng: np.random.RandomState, box: np.ndarray,
                        n: int) -> np.ndarray:
    """Sample points on the visible surfaces of a car box (7,) bottom-y."""
    x, y, z, h, w, l, ry = box
    # sample on a box shell: pick faces weighted by area
    u = rng.rand(n)
    pts = np.empty((n, 3), np.float32)
    # local frame: x in [-l/2, l/2], y in [-h, 0], z in [-w/2, w/2]
    lx = rng.uniform(-l / 2, l / 2, n)
    lyy = rng.uniform(-h, 0, n)
    lz = rng.uniform(-w / 2, w / 2, n)
    face = rng.randint(0, 5, n)   # 4 sides + roof
    lx = np.where(face == 0, -l / 2, np.where(face == 1, l / 2, lx))
    lz = np.where(face == 2, -w / 2, np.where(face == 3, w / 2, lz))
    lyy = np.where(face == 4, -h, lyy)
    c, s = np.cos(ry), np.sin(ry)
    pts[:, 0] = c * lx + s * lz + x
    pts[:, 1] = lyy + y
    pts[:, 2] = -s * lx + c * lz + z
    pts += rng.randn(n, 3).astype(np.float32) * 0.02
    return pts


class SyntheticKitti:
    """Deterministic synthetic scene source: `get_scene(i)` mirrors
    KittiRaw.get_scene."""

    def __init__(self, num_scenes: int = 64, max_cars: int = 6,
                 points_per_scene: int = 18000, seed: int = 0,
                 click_noise: float = 0.2, realistic: bool = False):
        """realistic=True exercises the real-data code paths the identity
        fixture cannot: non-identity calibration (offset principal point,
        R0 rotation, velodyne axis swap — velodyne bins live in the TRUE
        lidar frame), per-object occlusion/truncation spanning all three
        KITTI difficulties, Van objects (similar-type handling) and
        DontCare regions."""
        self.num_scenes = num_scenes
        self.max_cars = max_cars
        self.points_per_scene = points_per_scene
        self.seed = seed
        self.click_noise = click_noise
        self.realistic = realistic
        self.sample_ids = list(range(num_scenes))

    # (occlusion, truncation) cycle covering easy / moderate / hard gt
    _DIFF_CYCLE = ((0, 0.0), (1, 0.2), (2, 0.45), (0, 0.1), (0, 0.0))

    @staticmethod
    def _place(rng, placed_xz, draw, min_gap: float = 6.0, tries: int = 25):
        """Draw (z, x-wedge-halfwidth) via `draw` until the BEV center is at
        least min_gap from every placed car (6 m > max car diagonal ~4.7 m:
        real KITTI cars never interpenetrate; overlapping fixtures created
        merged point blobs whose NMS kill read as false misses)."""
        for _ in range(tries):
            z, half = draw()
            x = rng.uniform(-half, half) * z
            if all(np.hypot(x - p[0], z - p[1]) >= min_gap for p in placed_xz):
                break
        return z, x

    def get_scene(self, sample_id: int, with_noise: bool = True) -> KittiScene:
        rng = np.random.RandomState(self.seed * 100003 + sample_id)
        n_cars = rng.randint(1, self.max_cars + 1)
        boxes = []
        classes: List[str] = []
        occ_trunc = []
        placed_xz: List[np.ndarray] = []
        for k in range(n_cars):
            hwl = CAR_MEAN_HWL * (1 + rng.randn(3) * 0.05)
            cls_name = "Car"
            if self.realistic:
                # keep objects inside the camera FOV wedge; spread depth so
                # 2D box heights cross the 40/25 px difficulty edges, and
                # make one object per few scenes a Van (similar type).
                # Depth is near-biased (sqrt of uniform) like real KITTI —
                # without it the easy bucket (height>=40px needs z<~28 m)
                # is so small that the official 41-point AP's
                # thresholds-per-valid-gt cap artificially deflates easy AP
                z, x = self._place(rng, placed_xz,
                                   lambda: (8 + 58 * rng.rand() ** 2, 0.55))
                if k > 0 and rng.rand() < 0.25:
                    cls_name = "Van"
                    hwl = hwl * np.array([1.45, 1.15, 1.3], np.float32)
                occ_trunc.append(
                    self._DIFF_CYCLE[(sample_id + k) % len(self._DIFF_CYCLE)])
            else:
                # keep cars inside the camera FOV wedge (identity calib:
                # u = 700 x/z + 600 in [0, 1242) -> x/z in [-0.857, 0.917)).
                # Sampling x uniform in [-20, 20] regardless of z put many
                # NEAR cars fully outside the frustum: their points are
                # FOV-cropped (undetectable) yet they counted as valid easy
                # GT, inverting the AP difficulty ordering (easy < moderate)
                # — impossible on real KITTI, where labels come from the
                # image itself.
                z, x = self._place(rng, placed_xz,
                                   lambda: (rng.uniform(8, 60), 0.75))
                occ_trunc.append((0, 0.0))
            ry = rng.uniform(-np.pi, np.pi)
            placed_xz.append(np.array([x, z]))
            boxes.append(np.array([x, GROUND_Y, z, *hwl, ry], np.float32))
            classes.append(cls_name)

        n_bg = self.points_per_scene - 300 * n_cars
        ground = np.empty((max(n_bg, 0), 3), np.float32)
        if self.realistic:
            gz = rng.uniform(0.5, 70, ground.shape[0])
            ground[:, 0] = rng.uniform(-0.7, 0.7, ground.shape[0]) * gz
            ground[:, 2] = gz
        else:
            ground[:, 0] = rng.uniform(-40, 40, ground.shape[0])
            ground[:, 2] = rng.uniform(0.5, 70, ground.shape[0])
        ground[:, 1] = GROUND_Y + rng.randn(ground.shape[0]) * 0.05
        # sprinkle some clutter poles/walls
        n_clutter = ground.shape[0] // 20
        ground[:n_clutter, 1] = GROUND_Y - rng.rand(n_clutter) * 2.5

        pieces = [ground] + [_car_surface_points(rng, b, 300) for b in boxes]
        pts_rect = np.concatenate(pieces, axis=0)
        intensity = rng.rand(pts_rect.shape[0], 1).astype(np.float32)
        calib = (Calibration.realistic() if self.realistic
                 else Calibration.identity())
        pts_vel = (calib.rect_to_lidar(pts_rect) if self.realistic
                   else pts_rect)
        pts_lidar = np.hstack([pts_vel, intensity]).astype(np.float32)

        labels: List[Object3d] = []
        noise_labels: List[Object3d] = []
        for b, cls_name, (occ, trunc) in zip(boxes, classes, occ_trunc):
            corners = _corners3d_np(b)
            img_boxes, _ = calib.corners3d_to_img_boxes(corners[None])
            box2d = img_boxes[0].astype(np.float32)
            # KITTI truncation = fraction of the object outside the image
            # (labels derive from the image): compute it from the projected
            # box clipped to the 1242x375 frame, so FOV-edge cars leave the
            # easy bucket exactly as real labels would.
            area = max((box2d[2] - box2d[0]) * (box2d[3] - box2d[1]), 1e-6)
            cw = max(min(box2d[2], 1242.0) - max(box2d[0], 0.0), 0.0)
            ch = max(min(box2d[3], 375.0) - max(box2d[1], 0.0), 0.0)
            trunc = max(float(trunc), round(1.0 - cw * ch / area, 2))
            obj = Object3d(cls_type=cls_name, trucation=trunc, occlusion=occ,
                           alpha=-np.arctan2(b[0], b[2]) + b[6],
                           box2d=box2d, h=b[3], w=b[4], l=b[5],
                           pos=b[0:3].copy(), ry=b[6])
            labels.append(obj)
            nb = b.copy()
            nb[0] += rng.randn() * self.click_noise
            nb[2] += rng.randn() * self.click_noise
            noise_labels.append(Object3d(
                cls_type=cls_name, trucation=trunc, occlusion=occ,
                alpha=obj.alpha, box2d=box2d, h=b[3], w=b[4], l=b[5],
                pos=nb[0:3].copy(), ry=b[6]))
        if self.realistic:
            # DontCare regions: 2D-only ignore boxes (KITTI -1/-1000 fields)
            for _ in range(rng.randint(1, 3)):
                u = rng.uniform(0, 1100)
                v = rng.uniform(120, 250)
                dc2d = np.array([u, v, u + rng.uniform(20, 80),
                                 v + rng.uniform(10, 30)], np.float32)
                labels.append(Object3d(
                    cls_type="DontCare", trucation=-1.0, occlusion=-1.0,
                    alpha=-10.0, box2d=dc2d, h=-1.0, w=-1.0, l=-1.0,
                    pos=np.array([-1000.0, -1000.0, -1000.0], np.float32),
                    ry=-10.0))

        return KittiScene(sample_id=sample_id, pts_lidar=pts_lidar,
                          calib=calib, image_shape=(375, 1242),
                          labels=labels,
                          noise_labels=noise_labels if with_noise else [])
