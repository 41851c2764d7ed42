"""End-to-end slice on synthetic scenes: stage-1 training must lift the
vote quality; stage-2 training must lift box recall. Small shapes, CPU.

This is the framework's "does the full loop learn" guard — the reference
has no equivalent (it validates only via full KITTI runs, SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.config import load_config
from ws3d_tpu.datasets import SyntheticKitti, RPNDataset
from ws3d_tpu.datasets.boxplace_dataset import (BoxPlaceDataset,
                                                synthetic_proposal_database)
from ws3d_tpu.models import build_model, init_model
from ws3d_tpu.training import create_train_state
from ws3d_tpu.training.trainer import (make_rpn_train_step,
                                       make_rcnn_train_step)
from ws3d_tpu.training.eval_metrics import (rpn_vote_metrics,
                                            box_recall_metrics)
from ws3d_tpu.box_codec import decode_center
from ws3d_tpu.pipeline.inference import rpn_propose


@pytest.mark.slow
def test_rpn_learns_center_votes():
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 1024
    cfg.RPN.SA_CONFIG.NPOINTS = [256, 64, 16, 8]
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    steps = 120
    state = create_train_state(model, cfg, variables, total_steps=steps)
    src = SyntheticKitti(num_scenes=8, points_per_scene=4000, seed=5,
                         max_cars=3)
    ds = RPNDataset(src, cfg, mode="TRAIN", npoints=1024, seed=0)
    step = jax.jit(make_rpn_train_step(model, cfg))
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def infer(params, bs, pts):
        out = model.apply({"params": params, "batch_stats": bs},
                          {"pts_input": pts}, train=False,
                          method=model.rpn_forward)
        centers = decode_center(out["backbone_xyz"], out["rpn_reg"],
                                cfg.RPN.LOC_SCOPE, cfg.RPN.LOC_BIN_SIZE)
        return centers, jax.nn.sigmoid(out["rpn_cls"][..., 0])

    def measure(state):
        es = RPNDataset(src, cfg, mode="TRAIN", npoints=1024, seed=99)
        precs, recs = [], []
        for i in range(4):
            s = es.get_sample(i)
            centers, scores = infer(state.params, state.batch_stats,
                                    jnp.asarray(s["pts_input"][None]))
            m = rpn_vote_metrics(np.asarray(centers[0]),
                                 np.asarray(scores[0]),
                                 s["gt_centers"], int(s["gt_count"]))
            precs.append(m["vote_precision"])
            recs.append(m["gt_recall"])
        return float(np.mean(precs)), float(np.mean(recs))

    p0, r0 = measure(state)
    for i, batch in enumerate(ds.batches(batch_size=4, steps=steps)):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, sub, jnp.float32(0.1))
    p1, r1 = measure(state)
    assert np.isfinite(float(aux["loss"]))
    # trained votes must beat the untrained baseline clearly
    assert r1 > max(r0 + 0.2, 0.5), f"gt recall {r0} -> {r1}"


@pytest.mark.slow
def test_rcnn_learns_box_regression():
    cfg = load_config()
    cfg.RPN.ENABLED = False
    cfg.RCNN.ENABLED = True
    cfg.RCNN.NUM_POINTS = 256
    cfg.RCNN.SA_CONFIG.NPOINTS = [64, 32, 16, -1]
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    steps = 150
    state = create_train_state(model, cfg, variables, total_steps=steps,
                               stage="rcnn")
    db = synthetic_proposal_database(num=48, seed=7, crop_points=256,
                                     fg_ratio=0.8)
    # aug_copies=1 keeps only the noise-free copy-0 stream: with the
    # reference-parity aug pack (gt recentering + noise on copies 1..3,
    # kitti_boxplace_dataset.py:431-435), 150 smoke steps are not enough to
    # move the proposal-centered eval metric — the full fit converges fine
    # (BENCH.md round 2), but this test checks the LEARNING MACHINERY, not
    # the aug schedule
    ds = BoxPlaceDataset(db, cfg, mode="TRAIN", npoints=256, seed=0,
                         aug_copies=1)
    step = jax.jit(make_rcnn_train_step(model, cfg, stage="rcnn"))
    rng = jax.random.PRNGKey(2)

    eval_db = synthetic_proposal_database(num=16, seed=8, crop_points=256,
                                          fg_ratio=1.0)
    eval_ds = BoxPlaceDataset(eval_db, cfg, mode="EVAL", npoints=256, seed=1)
    eval_batch = next(eval_ds.batches(batch_size=16, steps=1,
                                      shuffle=False))

    @jax.jit
    def infer(params, bs, batch):
        return model.apply(
            {"params": params, "batch_stats": bs},
            {"cur_box_point": batch["cur_box_point"],
             "cur_box_reflect": batch["cur_box_reflect"],
             "train_mask": batch["train_mask"]},
            train=False, method=model.rcnn_forward)

    def measure(state):
        out = infer(state.params, state.batch_stats, eval_batch)
        pred = np.asarray(out["pred_boxes3d"])
        gt = np.asarray(eval_batch["gt_boxes"])
        m = box_recall_metrics(pred, gt, thresholds=(0.3, 0.5))
        return m["recall_0.3"]

    r0 = measure(state)
    for i, batch in enumerate(ds.batches(batch_size=16, steps=steps)):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, sub, jnp.float32(0.1))
    r1 = measure(state)
    assert np.isfinite(float(aux["loss"]))
    assert r1 > r0, f"IoU-0.3 recall did not improve: {r0} -> {r1}"
    assert r1 > 0.3, f"trained IoU-0.3 recall too low: {r1}"
