"""End-to-end two-stage inference benchmark on the current jax default
device (real TPU chip under the driver).

Prints ONE JSON line: {"metric": "two_stage_scenes_per_sec", "value": N,
"unit": "scenes/sec", "vs_baseline": N / 200.0} — 200 scenes/sec/chip is the
BASELINE.md target (the reference publishes no throughput; its eval loop is
serial B=1 per proposal, tools/eval_auto.py:328-410).

Honesty rules (CLAUDE.md): on the tunneled axon backend block_until_ready
does NOT block, so every timing below is closed by a host transfer. The
measured loop is the REAL deployment loop: distinct input batches each
iteration, dispatched back-to-back (device executes in order; sustained
throughput), with the host-side KITTI txt dump of each completed batch
overlapped with device compute of the following ones — the wall clock spans
first dispatch to last file written. With fitted weights present
(ws3d_tpu/data/bench_weights.npz, produced by tools/fit_bench_weights.py)
the detector emits real detections so finalize/NMS/dump run at realistic
occupancy; without them it falls back to random init (reported in the JSON).
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

BATCH = 16         # scenes per device batch
NBUF = 3           # distinct input batches cycled through the run
WARMUP = 2
ITERS = 12
BASELINE_SCENES_PER_SEC = 200.0
WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ws3d_tpu", "data", "bench_weights.npz")


def _load_fitted(variables):
    """Overlay flat 'params/...'-keyed npz leaves onto the init tree.

    Fails hard unless EVERY init leaf is overlaid and EVERY npz key is
    consumed: a partial overlay after a model/config refactor would make
    the bench silently measure part-random weights while reporting
    weights=fitted (round-2 advisor finding)."""
    flat = np.load(WEIGHTS)
    leaves = {tuple(key.split("/")): flat[key] for key in flat.files}
    stats = {"total": 0, "overlaid": 0, "mismatched": []}
    unused = set(leaves)

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        stats["total"] += 1
        new = leaves.get(path)
        if new is None or new.shape != tree.shape:
            stats["mismatched"].append(
                "/".join(path) + ("" if new is None
                                  else f" shape {new.shape}!={tree.shape}"))
            return tree
        unused.discard(path)
        stats["overlaid"] += 1
        return new.astype(np.asarray(tree).dtype)

    out = walk(variables, ())
    if stats["mismatched"] or unused:
        raise RuntimeError(
            f"bench weights overlay incomplete: {stats['overlaid']}/"
            f"{stats['total']} leaves overlaid; missing/mismatched="
            f"{stats['mismatched'][:5]}; unused npz keys="
            f"{sorted('/'.join(k) for k in unused)[:5]} — regenerate "
            "ws3d_tpu/data/bench_weights.npz with tools/fit_bench_weights.py")
    return out, stats["overlaid"], stats["total"]


def main():
    import jax
    import jax.numpy as jnp
    from ws3d_tpu.config import load_config
    from ws3d_tpu.datasets import SyntheticKitti
    from ws3d_tpu.datasets.kitti_io import Calibration, save_kitti_format
    from ws3d_tpu.datasets.rpn_dataset import RPNDataset
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.pipeline import make_two_stage_fn

    cfg = load_config()
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True

    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    fitted = os.path.exists(WEIGHTS)
    overlaid = total = 0
    if fitted:
        variables, overlaid, total = _load_fitted(variables)
        variables = jax.device_put(variables)
    fn = jax.jit(make_two_stage_fn(model, cfg))

    src = SyntheticKitti(num_scenes=BATCH * NBUF, points_per_scene=20000,
                         seed=3)
    ds = RPNDataset(src, cfg, mode="EVAL", npoints=cfg.RPN.NUM_POINTS, seed=0)
    bufs = [jnp.asarray(b["pts_input"])
            for b in ds.batches(batch_size=BATCH, steps=NBUF, shuffle=False)]
    calib = Calibration.identity()
    out_dir = tempfile.mkdtemp(prefix="ws3d_bench_")

    # The tunnel's compile server intermittently 500s (CLAUDE.md: "just
    # retry"); a transient failure here must not sink the recorded run.
    # Only retry errors that look like transport/compile-server trouble —
    # genuine bugs (tracer/shape errors, OOM) must surface immediately.
    for attempt in range(3):
        try:
            for i in range(WARMUP):
                out = fn(variables, bufs[i % NBUF])
                np.asarray(out["keep"])
            break
        except Exception as e:
            transient = any(s in f"{type(e).__name__}: {e}" for s in (
                "DEADLINE", "UNAVAILABLE", "INTERNAL", "500", "Socket",
                "connection", "Connection", "RPC", "grpc"))
            if attempt == 2 or not transient:
                raise
            print(f"# warmup attempt {attempt} failed (transient, retrying):"
                  f" {type(e).__name__}: {e}")
            time.sleep(60)

    # Sustained-throughput loop: dispatch every batch up front (the device
    # runs them in order), then drain outputs oldest-first, writing each
    # scene's KITTI txt while later batches are still computing.
    t0 = time.perf_counter()
    pending = [(it, fn(variables, bufs[it % NBUF])["packed"])
               for it in range(ITERS)]
    for _, fut in pending:                   # start D2H copies in flight
        if hasattr(fut, "copy_to_host_async"):
            fut.copy_to_host_async()
    n_det = 0
    for it, packed_fut in pending:
        packed = np.asarray(packed_fut)      # ONE transfer per batch
        boxes, scores = packed[..., 0:7], packed[..., 7]
        keep = packed[..., 8] > 0.5
        n_det = int(keep.sum())
        for j in range(BATCH):
            save_kitti_format(it * BATCH + j, calib, boxes[j][keep[j]],
                              out_dir, scores[j][keep[j]], (375, 1242))
    dt = time.perf_counter() - t0
    scenes_per_sec = BATCH * ITERS / dt

    result = {
        "metric": "two_stage_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
        "detections_last_batch": n_det,
        "weights": "fitted" if fitted else "random-init",
        "weights_overlaid": f"{overlaid}/{total}",
        "batch": BATCH,
        "iters": ITERS,
        "points": int(cfg.RPN.NUM_POINTS),
        "kitti_dump": "overlapped",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
