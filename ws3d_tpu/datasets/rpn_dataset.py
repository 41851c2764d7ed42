"""Stage-1 (RPN) sample pipeline: fixed-shape padded batches from KITTI or
synthetic scenes.

Host-side NumPy re-design of lib/datasets/kitti_rcnn_dataset.py:23-644:
- image-FOV + range crop (get_valid_flag:138-160)
- 16,384-point near/far sampling (get_rpn_sample:424-441; near<40 m priority,
  wraparound repetition when the scene is short)
- intensity shift to [-0.5, 0.5]
- global augmentation: rotation ±π/AUG_ROT_RANGE, scaling 0.95–1.05,
  x-flip (data_augmentation:223-255)
- Gaussian weak cls labels + nearest-center (dx, 0, dz) reg targets
  (generate_gaussian_training_labels:528-573)
- box-based eval labels with a 0.2 m ignore ring
  (generate_rpn_training_labels:575-598)
- batch collation pads gt arrays to a FIXED max (not per-batch max like
  collate_batch:601-644) so jit never recompiles.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from ws3d_tpu.datasets.kitti_io import objs_to_boxes3d

MAX_GT = 32  # fixed gt-pad width (vs. per-batch max in the reference)


def valid_point_mask(pts_rect: np.ndarray, pts_img: np.ndarray,
                     pts_depth: np.ndarray, img_shape,
                     pc_area_scope) -> np.ndarray:
    """Image-FOV + area-scope crop (kitti_rcnn_dataset.get_valid_flag)."""
    ok = ((pts_img[:, 0] >= 0) & (pts_img[:, 0] < img_shape[1])
          & (pts_img[:, 1] >= 0) & (pts_img[:, 1] < img_shape[0])
          & (pts_depth >= 0))
    if pc_area_scope is not None:
        (x0, x1), (y0, y1), (z0, z1) = pc_area_scope
        ok &= ((pts_rect[:, 0] >= x0) & (pts_rect[:, 0] <= x1)
               & (pts_rect[:, 1] >= y0) & (pts_rect[:, 1] <= y1)
               & (pts_rect[:, 2] >= z0) & (pts_rect[:, 2] <= z1))
    return ok


def sample_npoints(n_have: int, npoints: int, depth: np.ndarray,
                   rng: np.random.RandomState) -> np.ndarray:
    """Near/far 16,384-point selection (get_rpn_sample:424-441)."""
    if npoints < n_have:
        near = np.where(depth < 40.0)[0]
        far = np.where(depth >= 40.0)[0]
        take_near = npoints - len(far)
        if take_near > 0:
            near_choice = rng.choice(near, take_near, replace=False)
            choice = np.concatenate([near_choice, far]) if len(far) else near_choice
        else:
            choice = rng.choice(np.arange(n_have), npoints, replace=False)
    else:
        choice = np.arange(n_have, dtype=np.int64)
        while npoints > len(choice):
            choice = np.concatenate([choice, np.arange(n_have, dtype=np.int64)])
        choice = rng.choice(choice, npoints, replace=False)
    rng.shuffle(choice)
    return choice


def rotate_pc_along_y_np(pc: np.ndarray, angle: float) -> np.ndarray:
    """In-place x/z rotation (kitti_utils.rotate_pc_along_y:32-43)."""
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]], dtype=pc.dtype)
    pc[:, [0, 2]] = pc[:, [0, 2]] @ R
    return pc


def augment_scene(pts_rect: np.ndarray, gt_boxes3d: np.ndarray,
                  rng: np.random.RandomState,
                  rot_range: float = 18.0,
                  method_prob: Sequence[float] = (1.0, 1.0, 0.5)):
    """Global rotation/scaling/flip (data_augmentation:223-255)."""
    enable = 1.0 - rng.rand(3)
    methods = []
    if enable[0] < method_prob[0]:
        angle = rng.uniform(-np.pi / rot_range, np.pi / rot_range)
        pts_rect = rotate_pc_along_y_np(pts_rect.copy(), angle)
        gt_boxes3d = rotate_pc_along_y_np(gt_boxes3d.copy(), angle)
        methods.append(("rotation", angle))
    if enable[1] < method_prob[1]:
        scale = rng.uniform(0.95, 1.05)
        pts_rect = pts_rect * scale
        gt_boxes3d = gt_boxes3d.copy()
        gt_boxes3d[:, 0:6] *= scale
        methods.append(("scaling", scale))
    if enable[2] < method_prob[2]:
        pts_rect = pts_rect.copy()
        gt_boxes3d = gt_boxes3d.copy()
        pts_rect[:, 0] = -pts_rect[:, 0]
        gt_boxes3d[:, 0] = -gt_boxes3d[:, 0]
        methods.append(("flip",))
    return pts_rect, gt_boxes3d, methods


def gaussian_weak_labels(pts_rect: np.ndarray, gt_centers: np.ndarray,
                         gauss_height: float = 0.707,
                         gauss_status: float = 0.7,
                         gauss_cov: float = 1.5):
    """Gaussian soft cls labels + nearest-center reg targets
    (generate_gaussian_training_labels:528-573).

    cls = N(clip(d - status, 0); cov) scaled to peak 1, with
    d = sqrt((x-cx)^2 + (y*gauss_height)^2 + (z-cz)^2); reg = (dx, 0, dz) to
    the nearest center for points with min distance < 4 m.
    """
    n = pts_rect.shape[0]
    cls_label = np.zeros((n,), np.float32)
    reg_label = np.zeros((n, 3), np.float32)
    if gt_centers.shape[0] == 0:
        return cls_label, reg_label
    dx = pts_rect[:, 0:1] - gt_centers[None, :, 0]
    dz = pts_rect[:, 2:3] - gt_centers[None, :, 2]
    y2 = np.square(pts_rect[:, 1:2] * gauss_height)
    dist = np.sqrt(np.square(dx) + y2 + np.square(dz))     # (N, K)
    min_dist = np.clip(dist.min(axis=1) - gauss_status, 0.0, 100.0)
    # pdf(d; cov) / pdf(0; cov) = exp(-d^2 / (2*cov))
    cls_label = np.exp(-np.square(min_dist) / (2.0 * gauss_cov)).astype(np.float32)
    nearest = dist.argmin(axis=1)
    fg = dist.min(axis=1) < 4.0
    reg_label[fg, 0] = gt_centers[nearest[fg], 0] - pts_rect[fg, 0]
    reg_label[fg, 2] = gt_centers[nearest[fg], 2] - pts_rect[fg, 2]
    return cls_label, reg_label


def points_in_rotated_boxes_np(pts: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """NumPy twin of ws3d_tpu.ops.boxes.points_in_rotated_boxes — host label
    generation must not dispatch eagerly to the (tunneled) accelerator."""
    shift = pts[:, None, :] - boxes[None, :, 0:3]
    h, w, l, ry = boxes[:, 3], boxes[:, 4], boxes[:, 5], boxes[:, 6]
    cy = -h / 2.0
    c, s = np.cos(ry), np.sin(ry)
    x_loc = shift[..., 0] * c - shift[..., 2] * s
    z_loc = shift[..., 0] * s + shift[..., 2] * c
    return ((np.abs(x_loc) <= l / 2.0) & (np.abs(z_loc) <= w / 2.0)
            & (np.abs(shift[..., 1] - cy) <= h / 2.0))


def _enlarge_box3d_np(boxes: np.ndarray, extra: float) -> np.ndarray:
    out = boxes.copy()
    out[:, 1] += extra
    out[:, 3:6] += extra * 2
    return out


def box_rpn_labels(pts_rect: np.ndarray, gt_boxes3d: np.ndarray,
                   ignore_width: float = 0.2):
    """Eval-mode labels: +1 in box, -1 in the 0.2 m-enlarged ignore ring
    (generate_rpn_training_labels:575-598). Pure NumPy."""
    n = pts_rect.shape[0]
    cls_label = np.zeros((n,), np.int32)
    reg_label = np.zeros((n, 3), np.float32)
    if gt_boxes3d.shape[0] == 0:
        return cls_label, reg_label
    in_box = points_in_rotated_boxes_np(pts_rect, gt_boxes3d)
    big = points_in_rotated_boxes_np(
        pts_rect, _enlarge_box3d_np(gt_boxes3d, ignore_width))
    fg = in_box.any(axis=1)
    ignore = big.any(axis=1) & ~fg
    cls_label[fg] = 1
    cls_label[ignore] = -1
    for k in range(gt_boxes3d.shape[0]):
        m = in_box[:, k]
        center = gt_boxes3d[k, 0:3].copy()
        center[1] = 0.0
        reg_label[m] = center - pts_rect[m]
        reg_label[m, 1] = 0.0
    return cls_label, reg_label


class RPNDataset:
    """Iterable producing fixed-shape RPN batches.

    source: any object with .sample_ids and .get_scene(i, with_noise) —
    KittiRaw or SyntheticKitti.
    """

    def __init__(self, source, cfg, mode: str = "TRAIN",
                 npoints: Optional[int] = None, weakly_num: Optional[int] = None,
                 seed: int = 0, gt_database=None):
        self.source = source
        self.cfg = cfg
        self.mode = mode
        self.npoints = npoints or cfg.RPN.NUM_POINTS
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        # cfg.TPU.SORT_POINTS_Z: emit clouds sorted ascending by rect z so
        # backbone neighborhoods are contiguous index windows (the windowed
        # fused-SA kernel's contract); labels are computed AFTER the sort
        self.sort_z = bool(cfg.TPU.get("SORT_POINTS_Z", True))
        # (easy_db, hard_db) from gt_database.build_gt_database — enables the
        # copy-paste GT augmentation (cfg.GT_AUG_ENABLED)
        self.gt_database = gt_database
        ids = list(source.sample_ids)
        if weakly_num is not None and mode == "TRAIN":
            # reference keeps the first weakly_num non-empty scenes
            # (kitti_rcnn_dataset.py:58-71)
            kept = []
            for sid in ids:
                scene = source.get_scene(sid, with_noise=True)
                if len(scene.noise_labels) > 0:
                    kept.append(sid)
                if len(kept) >= weakly_num:
                    break
            ids = kept
        self.sample_ids = ids

    def __len__(self):
        return len(self.sample_ids)

    def _eval_rng(self, index: int) -> np.random.RandomState:
        """EVAL-mode sampling must be a pure function of (seed, sample_id).

        The shared `self.rng` stream makes the 16,384-point subsample — and
        therefore the detections — depend on CALL HISTORY: the same scene
        evaluated alone vs. as the 10th sample of a run drew different
        subsets, and a marginal car flipped detected<->missed purely with
        the eval batch grouping. TRAIN keeps the stream (it is stochastic
        by design, matching the reference's np.random use in __getitem__,
        kitti_rcnn_dataset.py)."""
        return np.random.RandomState(
            (self.seed * 100003 + 7919 * int(self.sample_ids[index]) + 1)
            % (2**31 - 1))

    def get_whole_scene(self, index: int,
                        max_points: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Whole-scene sample for proposal-DB generation: ALL valid points
        (z-sorted, intensity - 0.5) with no 16,384-point subsample, matching
        the reference boxgen loader (kitti_boxgen_dataset.py:144-211).

        For fixed jit shapes the cloud is duplicate-padded (wraparound) to
        `max_points`; padded rows carry valid=False so proposal/crop stages
        can ignore them. Scenes larger than max_points are uniformly
        subsampled (rare; logged via the returned n_valid).

        Returns dict(pts_input (P, 3+C), valid (P,) bool, n_valid int,
        gt_boxes (G, 7) real labels, noise_boxes (Gn, 7), sample_id).
        """
        cfg = self.cfg
        scene = self.source.get_scene(self.sample_ids[index], with_noise=True)
        order = np.argsort(-scene.pts_lidar[:, 2])
        pts_lidar = scene.pts_lidar[order]
        pts_rect = scene.calib.lidar_to_rect(pts_lidar[:, 0:3])
        intensity = pts_lidar[:, 3]
        pts_img, depth = scene.calib.rect_to_img(pts_rect)
        ok = valid_point_mask(pts_rect, pts_img, depth, scene.image_shape,
                              cfg.PC_AREA_SCOPE if cfg.PC_REDUCE_BY_RANGE
                              else None)
        pts_rect, intensity = pts_rect[ok], intensity[ok] - 0.5

        if cfg.RPN.USE_INTENSITY:
            pts_input = np.hstack([pts_rect,
                                   intensity[:, None]]).astype(np.float32)
        else:
            pts_input = pts_rect.astype(np.float32)
        if self.sort_z:
            pts_input = pts_input[np.argsort(pts_input[:, 2], kind="stable")]

        n = pts_input.shape[0]
        if max_points is not None:
            if n > max_points:
                choice = np.sort(self._eval_rng(index).choice(
                    n, max_points, replace=False))
                pts_input = pts_input[choice]
                n = max_points
                valid = np.ones(max_points, bool)
            else:
                if self.sort_z and n > 0:
                    # repeat-LAST padding keeps the cloud z-sorted (the
                    # wraparound pad would restart at min z)
                    pad_idx = np.minimum(np.arange(max_points), n - 1)
                else:
                    pad_idx = np.arange(max_points) % max(n, 1)
                pts_input = pts_input[pad_idx]
                valid = np.zeros(max_points, bool)
                valid[:n] = True
        else:
            valid = np.ones(n, bool)

        real = [o for o in scene.labels if o.cls_type in ("Car", "Van")]
        noise = [o for o in scene.noise_labels
                 if o.cls_type in ("Car", "Van")]
        return {"pts_input": pts_input, "valid": valid,
                "n_valid": np.int32(n),
                "gt_boxes": objs_to_boxes3d(real).reshape(-1, 7),
                "noise_boxes": objs_to_boxes3d(noise).reshape(-1, 7),
                "sample_id": np.int32(scene.sample_id)}

    def get_sample(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        scene = self.source.get_scene(self.sample_ids[index], with_noise=True)
        order = np.argsort(-scene.pts_lidar[:, 2])
        pts_lidar = scene.pts_lidar[order]
        pts_rect = scene.calib.lidar_to_rect(pts_lidar[:, 0:3])
        intensity = pts_lidar[:, 3]

        extra_boxes = np.zeros((0, 7), np.float32)
        if (self.mode == "TRAIN" and cfg.GT_AUG_ENABLED
                and self.gt_database is not None
                and self.rng.rand() < cfg.GT_AUG_APPLY_PROB):
            from ws3d_tpu.datasets.gt_database import apply_gt_aug
            noise_boxes = objs_to_boxes3d(
                [o for o in scene.noise_labels if o.cls_type in ("Car", "Van")])
            pts_rect, intensity, extra_boxes = apply_gt_aug(
                pts_rect, intensity, noise_boxes, self.gt_database[0],
                self.gt_database[1], self.rng)

        pts_img, depth = scene.calib.rect_to_img(pts_rect)
        ok = valid_point_mask(pts_rect, pts_img, depth, scene.image_shape,
                              cfg.PC_AREA_SCOPE if cfg.PC_REDUCE_BY_RANGE else None)
        pts_rect, intensity, depth = pts_rect[ok], intensity[ok], depth[ok]

        rng = self.rng if self.mode == "TRAIN" else self._eval_rng(index)
        choice = sample_npoints(len(pts_rect), self.npoints, depth, rng)
        pts_rect = pts_rect[choice]
        intensity = intensity[choice] - 0.5

        if cfg.RPN.USE_INTENSITY:
            pts_input = np.hstack([pts_rect, intensity[:, None]]).astype(np.float32)
        else:
            pts_input = pts_rect.astype(np.float32)

        gt_objs = scene.noise_labels if self.mode == "TRAIN" else scene.labels
        gt_objs = [o for o in gt_objs if o.cls_type in ("Car", "Van")]
        gt_boxes3d = objs_to_boxes3d(gt_objs)
        if extra_boxes.shape[0]:
            gt_boxes3d = (np.concatenate([gt_boxes3d, extra_boxes])
                          if gt_boxes3d.shape[0] else extra_boxes)

        if self.mode == "TRAIN" and cfg.AUG_DATA:
            aug_pts, gt_boxes3d, _ = augment_scene(
                pts_input[:, :3], gt_boxes3d.reshape(-1, 7), self.rng,
                rot_range=cfg.AUG_ROT_RANGE,
                method_prob=cfg.AUG_METHOD_PROB)
            pts_input = pts_input.copy()
            pts_input[:, :3] = aug_pts

        if self.sort_z:
            # after aug (rotation changes z); labels below stay aligned
            pts_input = pts_input[np.argsort(pts_input[:, 2], kind="stable")]

        if self.mode == "TRAIN":
            cls_label, reg_label = gaussian_weak_labels(
                pts_input[:, :3], gt_boxes3d[:, :3] if len(gt_boxes3d) else
                np.zeros((0, 3), np.float32),
                gauss_height=cfg.RPN.GAUSS_HEIGHT,
                gauss_status=cfg.RPN.GAUSS_STATUS,
                gauss_cov=cfg.RPN.GAUSS_COV)
        else:
            cls_label, reg_label = box_rpn_labels(pts_input[:, :3], gt_boxes3d)
            cls_label = cls_label.astype(np.float32)

        gt_centers = np.zeros((MAX_GT, 3), np.float32)
        n_gt = min(len(gt_boxes3d), MAX_GT)
        if n_gt:
            gt_centers[:n_gt] = gt_boxes3d[:n_gt, :3]
        gt_boxes_pad = np.zeros((MAX_GT, 7), np.float32)
        if n_gt:
            gt_boxes_pad[:n_gt] = gt_boxes3d[:n_gt]

        return {"sample_id": np.int32(scene.sample_id),
                "pts_input": pts_input,
                "rpn_cls_label": cls_label,
                "rpn_reg_label": reg_label,
                "gt_centers": gt_centers,
                "gt_boxes3d": gt_boxes_pad,
                "gt_count": np.int32(n_gt)}

    def batches(self, batch_size: int, steps: Optional[int] = None,
                shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked fixed-shape batches forever (or `steps` batches)."""
        count = 0
        while steps is None or count < steps:
            idxs = self.rng.permutation(len(self)) if shuffle else np.arange(len(self))
            for lo in range(0, len(idxs) - batch_size + 1, batch_size):
                chunk = [self.get_sample(int(i)) for i in idxs[lo:lo + batch_size]]
                yield {k: np.stack([c[k] for c in chunk]) for k in chunk[0]}
                count += 1
                if steps is not None and count >= steps:
                    return
