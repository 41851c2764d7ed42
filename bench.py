"""End-to-end two-stage inference benchmark on the current jax default
device (real TPU chip under the driver).

Prints ONE JSON line: {"metric": "two_stage_scenes_per_sec", "value": N,
"unit": "scenes/sec", "vs_baseline": N / 200.0} — 200 scenes/sec/chip is the
BASELINE.md target (the reference publishes no throughput; its eval loop is
serial B=1 per proposal).
"""
from __future__ import annotations

import json
import time

import numpy as np

BATCH = 8          # scenes per device batch
WARMUP = 1
ITERS = 6
BASELINE_SCENES_PER_SEC = 200.0


def main():
    import jax
    import jax.numpy as jnp
    from ws3d_tpu.config import load_config
    from ws3d_tpu.datasets import SyntheticKitti
    from ws3d_tpu.datasets.rpn_dataset import RPNDataset
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.pipeline import make_two_stage_fn

    cfg = load_config()
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True

    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_two_stage_fn(model, cfg))

    src = SyntheticKitti(num_scenes=BATCH * 2, points_per_scene=20000, seed=3)
    ds = RPNDataset(src, cfg, mode="EVAL", npoints=cfg.RPN.NUM_POINTS, seed=0)
    batch = next(ds.batches(batch_size=BATCH, steps=1, shuffle=False))
    pts = jnp.asarray(batch["pts_input"])

    # NOTE: on the tunneled axon backend block_until_ready does NOT actually
    # block; force a (tiny) host transfer each iteration to get honest
    # wall-clock numbers.
    for _ in range(WARMUP):
        out = fn(variables, pts)
        np.asarray(out["keep"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(variables, pts)
        np.asarray(out["keep"])
    dt = time.perf_counter() - t0
    scenes_per_sec = BATCH * ITERS / dt

    n_det = int(np.asarray(out["keep"]).sum())
    result = {
        "metric": "two_stage_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
        "detections_last_batch": n_det,
        "batch": BATCH,
        "points": int(cfg.RPN.NUM_POINTS),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
