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

# scenes per device batch: 32 measured consistently ~+4.5 scenes/sec over
# 16, and 64 another +1.4 over 32 (199.5 -> 201.0 round 4; 48 REGRESSED to
# 195.2 — the 16-sublane-group kernels prefer power-of-two batches);
# per-batch dispatch/transfer overhead amortizes and device time scales
# sublinearly on the program-switch-bound kernels). Spill stays 0.
BATCH = int(os.environ.get("WS3D_BENCH_BATCH", 64))
NBUF = 3           # distinct input batches cycled through the run
WARMUP = 2
ITERS = 12
BASELINE_SCENES_PER_SEC = 200.0
WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ws3d_tpu", "data", "bench_weights.npz")


def _load_fitted(variables):
    """Overlay the fitted bench npz onto the init tree; all-or-nothing
    (round-2 advisor finding: a partial overlay must fail, not silently
    bench part-random weights while reporting weights=fitted)."""
    from ws3d_tpu.utils.npz_overlay import overlay_flat_npz
    return overlay_flat_npz(variables, WEIGHTS)


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
    # bf16 Dense compute (params/BN/accumulation stay f32) for the FP/head
    # MLPs; the fused SA kernels are bf16-internal either way. Measured
    # AP-neutral on the fitted checkpoint (BENCH.md round-3).
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

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
    outs = [(it, fn(variables, bufs[it % NBUF])) for it in range(ITERS)]
    pending = [(it, o["packed"]) for it, o in outs]
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
    # occupancy/spill accounting (post-timing transfers): live proposals
    # per batch and how many were dropped by the stage-2 compaction
    # budgets — spill MUST be 0 or the budgets are undersized
    n_live = int(np.asarray(outs[-1][1]["n_live"]))
    spilled = max(int(np.asarray(o["spilled"])) for _, o in outs)

    result = {
        "metric": "two_stage_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
        "detections_last_batch": n_det,
        "live_proposals_last_batch": n_live,
        "max_spilled": spilled,
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
