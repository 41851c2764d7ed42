"""Tests for the batched two-stage inference pipeline."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ws3d_tpu.box_codec import encode_center_bins
from ws3d_tpu.config import load_config
from ws3d_tpu.models import build_model, init_model
from ws3d_tpu.pipeline import (rpn_propose, crop_for_rcnn,
                               finalize_detections, make_two_stage_fn)


def _perfect_rpn_outputs(pts, centers, loc_scope=4.0, loc_bin_size=0.8):
    """Construct rpn_cls/rpn_reg that vote exactly for the given centers."""
    N = pts.shape[0]
    n = int(loc_scope / loc_bin_size) * 2
    cls = np.full((N, 1), -10.0, np.float32)
    reg = np.zeros((N, 4 * n), np.float32)
    d = np.sqrt((pts[:, None, 0] - centers[None, :, 0]) ** 2
                + (pts[:, None, 2] - centers[None, :, 1]) ** 2)
    near = d.min(1) < 2.0
    tgt = centers[d.argmin(1)]
    cls[near, 0] = 10.0
    dx = tgt[:, 0] - pts[:, 0]
    dz = tgt[:, 1] - pts[:, 2]
    for axis_off, lo in ((dx, 0), (dz, n)):
        b, r = encode_center_bins(jnp.asarray(axis_off), loc_scope, loc_bin_size)
        b, r = np.asarray(b), np.asarray(r)
        reg[np.arange(N), lo + b] = 50.0
        reg[np.arange(N), 2 * n + lo + b] = r
    return jnp.asarray(cls), jnp.asarray(reg)


def test_rpn_propose_recovers_centers(rng):
    pts = rng.uniform(-20, 20, (1024, 3)).astype(np.float32)
    pts[:, 1] = 1.0
    pts[:, 2] = np.abs(pts[:, 2]) + 5
    centers = np.array([[5.0, 10.0], [-8.0, 20.0]], np.float32)
    cls, reg = _perfect_rpn_outputs(pts, centers)
    got_centers, scores, valid = rpn_propose(
        cls, reg, jnp.asarray(pts), 4.0, 0.8, pre_nms_top=256,
        max_proposals=8)
    got = np.asarray(got_centers)[np.asarray(valid)]
    assert got.shape[0] == 2
    d = np.sqrt(((got[:, None] - centers[None]) ** 2).sum(-1)).min(1)
    assert d.max() < 0.45   # within residual quantization + vote-dist gate


def test_crop_for_rcnn_semantics(rng):
    pts = np.zeros((100, 4), np.float32)
    pts[:, 0] = np.linspace(-10, 10, 100)
    pts[:, 1] = 1.65
    pts[:, 2] = 10.0
    pts[:, 3] = 0.7
    centers = jnp.asarray([[0.0, 10.0]], jnp.float32)
    scores = jnp.asarray(np.linspace(0, 1, 100), jnp.float32)
    crops, empty = crop_for_rcnn(jnp.asarray(pts), scores, centers,
                                 num_sampled=64)
    assert not bool(empty[0])
    xyz = np.asarray(crops["cur_box_point"][0])
    # recentered: in-radius points have |x| < 4 after recentering
    assert np.abs(xyz[:, 0]).max() <= 4.0 + 1e-5
    # ground shift applied
    np.testing.assert_allclose(xyz[:, 1], 0.0, atol=1e-5)
    # mask channel is +-0.5
    m = np.asarray(crops["train_mask"][0])
    assert set(np.round(np.unique(m), 2)).issubset({-0.5, 0.5})


def test_finalize_detections_gates_and_nms():
    K = 8
    boxes = np.zeros((K, 7), np.float32)
    boxes[:, 3:6] = [1.5, 1.6, 3.9]
    boxes[0, 0:3] = [0, 0, 0]
    boxes[1, 0:3] = [0.1, 0, 0.1]      # duplicate of box 0 -> NMS'd
    boxes[2, 0:3] = [10, 0, 10]        # separate keep
    boxes[3, 3] = 5.0                  # size-gated (h too big)
    cls = np.full(K, 5.0, np.float32)
    iou = np.array([0.9, 0.8, 0.7, 0.9, 0, 0, 0, 0], np.float32)
    centers = np.zeros((K, 2), np.float32)
    valid = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    out, scores, keep = finalize_detections(
        jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(iou),
        jnp.asarray(centers), jnp.asarray(valid))
    keep = np.asarray(keep)
    assert keep[0] and keep[2]
    assert not keep[1]      # suppressed duplicate
    assert not keep[3]      # size gate
    assert not keep[4:].any()
    # y restored to scene frame
    assert abs(float(out[0, 1]) - 1.65) < 1e-5


def test_two_stage_fn_end_to_end(rng):
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 32, 16, 8]
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True
    cfg.RCNN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.IOUN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.TPU.MAX_PROPOSALS = 8
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_two_stage_fn(model, cfg, num_points=64,
                                   pre_nms_top=128))
    pts = rng.randn(2, 256, 4).astype(np.float32)
    pts[..., 2] += 20
    out = fn(variables, jnp.asarray(pts))
    assert out["boxes"].shape == (2, 8, 7)
    assert out["scores"].shape == (2, 8)
    assert out["keep"].shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(out["boxes"])))
    # packed (B, K, 9) record must mirror boxes/scores/keep exactly — the
    # bench and eval_auto drain it with one host transfer
    packed = np.asarray(out["packed"])
    np.testing.assert_array_equal(packed[..., 0:7], np.asarray(out["boxes"]))
    np.testing.assert_array_equal(packed[..., 7], np.asarray(out["scores"]))
    np.testing.assert_array_equal(packed[..., 8] > 0.5,
                                  np.asarray(out["keep"]))


def test_two_stage_compaction_matches_full(rng):
    """Stage-2 compaction (pooled top-V live slots through the trunk, gated
    survivors through the cascade) must reproduce the full fixed-K path's
    detections exactly when the budgets don't spill — per-crop compute is
    batch-independent at inference."""
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 32, 16, 8]
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True
    cfg.RCNN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.IOUN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.TPU.MAX_PROPOSALS = 16
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))

    pts = rng.randn(2, 256, 4).astype(np.float32)
    pts[..., 2] += 20
    pts = jnp.asarray(pts)

    cfg.TPU.RCNN_BUDGET_PER_SCENE = 0           # full path
    full = jax.jit(make_two_stage_fn(model, cfg, num_points=64,
                                     pre_nms_top=128))(variables, pts)
    cfg.TPU.RCNN_BUDGET_PER_SCENE = 8           # V1 = 16 < B*K = 32
    cfg.TPU.IOUN_BUDGET_PER_SCENE = 4           # V2 = 8
    comp = jax.jit(make_two_stage_fn(model, cfg, num_points=64,
                                     pre_nms_top=128))(variables, pts)

    assert int(comp["spilled"]) == 0
    keep_f = np.asarray(full["keep"])
    keep_c = np.asarray(comp["keep"])
    np.testing.assert_array_equal(keep_f, keep_c)
    np.testing.assert_allclose(np.asarray(full["boxes"])[keep_f],
                               np.asarray(comp["boxes"])[keep_c],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(full["scores"])[keep_f],
                               np.asarray(comp["scores"])[keep_c],
                               rtol=1e-5, atol=1e-5)


def test_two_stage_compaction_spill_counted(rng):
    """When live proposals exceed the budget the lowest-score ones are
    dropped and `spilled` reports how many."""
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 32, 16, 8]
    cfg.RCNN.ENABLED = True
    cfg.RCNN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.IOUN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.TPU.MAX_PROPOSALS = 16
    cfg.RPN.SCORE_THRESH = -1.0                  # every vote passes
    cfg.TPU.RCNN_BUDGET_PER_SCENE = 4            # V1 = 8, expect spill
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_two_stage_fn(model, cfg, num_points=64,
                                   pre_nms_top=128))
    pts = rng.randn(2, 256, 4).astype(np.float32)
    pts[..., 2] += 20
    out = fn(variables, jnp.asarray(pts))
    n_live = int(out["n_live"])
    # with IOUN off, the only spill source is the trunk budget: the top-V1
    # slots by score are live-first, so spill == max(0, n_live - V1)
    assert int(out["spilled"]) == max(0, n_live - 8)
    assert n_live > 8, "fixture should overflow the budget"


def test_crop_membership_counts_and_order():
    """Whole-crop membership: first-k indices in point order + true count
    (generate_box_dataset.py:216-232 keeps all in-4m points)."""
    import jax.numpy as jnp
    from ws3d_tpu.pipeline.inference import crop_membership

    rng = np.random.RandomState(0)
    pts = rng.randn(64, 3).astype(np.float32) * 3
    centers = np.zeros((2, 2), np.float32)
    valid = np.ones(64, bool)
    valid[50:] = False                      # duplicate-padded tail
    idx, count = jax.jit(lambda p, c, v: crop_membership(p, c, 8, v))(
        jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(valid))
    idx, count = np.asarray(idx), np.asarray(count)
    d = np.hypot(pts[:50, 0], pts[:50, 2])
    expect = np.where(d < 4.0)[0]
    assert count[0] == len(expect)
    take = min(len(expect), 8)
    np.testing.assert_array_equal(idx[0, :take], expect[:take])


def test_whole_scene_sample_duplicate_padding():
    from ws3d_tpu.config import load_config
    from ws3d_tpu.datasets import SyntheticKitti, RPNDataset

    cfg = load_config()
    src = SyntheticKitti(num_scenes=1, points_per_scene=3000, seed=0)
    ds = RPNDataset(src, cfg, mode="EVAL", seed=0)
    s = ds.get_whole_scene(0, max_points=4096)
    assert s["pts_input"].shape == (4096, 4)
    n = int(s["n_valid"])
    assert 0 < n <= 4096
    assert s["valid"][:n].all() and not s["valid"][n:].any()
    # padded rows duplicate the LAST row (keeps the z-sort invariant; the
    # pre-SORT_POINTS_Z loader used head-wraparound)
    if n < 4096:
        np.testing.assert_array_equal(s["pts_input"][n], s["pts_input"][n - 1])
    # sorted ascending by rect z over the valid rows
    z = s["pts_input"][:n, 2]
    assert np.all(np.diff(z) >= 0)
    assert s["gt_boxes"].shape[1] == 7 and s["noise_boxes"].shape[1] == 7


def test_click_gaussian_mask_golden():
    """click_gaussian_mask must match a direct NumPy port of the reference
    (/root/reference/tools/eval_active.py:656-675): per point,
    pdf(clip(min-dist - status, 0, 100); cov) normalized to peak 1."""
    import math
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from eval_active import click_gaussian_mask

    rng = np.random.RandomState(7)
    pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    centers = rng.uniform(-15, 15, (3, 3)).astype(np.float32)
    H, S, C = 0.707, 0.7, 1.5

    # independent golden: literal port of the reference loop
    point_center_dist = np.ones(500, np.float32) * 100
    for k in range(centers.shape[0]):
        box_distance = np.sqrt(
            (pts[:, 0] - centers[k][0]) ** 2
            + (pts[:, 1] * H) ** 2
            + (pts[:, 2] - centers[k][2]) ** 2)
        point_center_dist = np.minimum(
            point_center_dist, np.clip(box_distance - S, 0, 100))
    # multivariate_normal.pdf(d; mean=0, cov=C) / pdf(0) = exp(-d^2/(2C))
    golden = (np.exp(-point_center_dist ** 2 / (2 * C))
              / math.sqrt(2 * np.pi * C) * math.sqrt(2 * np.pi * C))

    got = click_gaussian_mask(pts, centers, H, S, C)
    np.testing.assert_allclose(got, golden, rtol=1e-5, atol=1e-6)
    # peak ~1 near a center, ~0 far away
    assert golden.max() <= 1.0 + 1e-6
    # no centers -> all zeros (reference returns uninitialized there; the
    # repo flow needs zeros so every crop mask is -0.5)
    assert (click_gaussian_mask(pts, np.zeros((0, 3), np.float32),
                                H, S, C) == 0).all()


def test_expand_clicks_no_truncation():
    """8 clicks -> 200 hypotheses must ALL be scored (round-1 cap silently
    dropped hypotheses past 128)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from eval_active import expand_clicks

    clicks = np.random.RandomState(0).randn(8, 2).astype(np.float32) * 10
    hyp, valid = expand_clicks(clicks)
    assert valid.sum() == 8 * 25 == 200
    assert hyp.shape[0] == 256            # next jit bucket
    # every click's 25-point grid is present
    for c in clicks:
        d = np.abs(hyp[valid] - c).max(axis=1)
        assert (d < 0.21).sum() >= 25


def test_two_stage_data_parallel_mesh_matches_single(rng):
    """Data-parallel inference (SURVEY.md §2.6): the jitted two-stage fn
    with the scene batch sharded over the 8-device CPU mesh and params
    replicated must reproduce the single-device outputs — the whole graph
    is batch-leading except the stage-2 compaction, whose batch-pooled
    top-k only reorders work, not per-crop results."""
    from ws3d_tpu.parallel import (batch_sharding, make_mesh,
                                   replicated_sharding)

    cfg = load_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 32, 16, 8]
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True
    cfg.RCNN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.IOUN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.TPU.MAX_PROPOSALS = 8
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_two_stage_fn(model, cfg, num_points=64,
                                   pre_nms_top=128))
    pts = rng.randn(8, 256, 4).astype(np.float32)
    pts[..., 2] += 20

    want = fn(variables, jnp.asarray(pts))["packed"]

    mesh = make_mesh()
    assert mesh.devices.size == 8
    v_repl = jax.device_put(variables, replicated_sharding(mesh))
    pts_shd = jax.device_put(pts, batch_sharding(mesh))
    got = fn(v_repl, pts_shd)["packed"]
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_finalize_no_size_gate_reference_parity():
    """eval_active applies NO car-size gate — the reference gates on scores
    only there (/root/reference/tools/eval_active.py:460-461); the size gate
    belongs to eval_auto (eval_auto.py:433-436). An out-of-size box must
    survive with size_gate=False and be dropped with size_gate=True."""
    K = 8
    boxes = np.zeros((K, 7), np.float32)
    boxes[:, 3:6] = [1.5, 1.6, 3.9]
    boxes[0, 0:3] = [0, 0, 0]
    boxes[1, 0:3] = [30, 0, 30]
    boxes[1, 3] = 5.0                  # h outside the (1.1, 2.3) gate
    cls = np.full(K, 5.0, np.float32)
    iou = np.array([0.9, 0.8, 0, 0, 0, 0, 0, 0], np.float32)
    centers = np.zeros((K, 2), np.float32)
    valid = np.array([1, 1, 0, 0, 0, 0, 0, 0], bool)
    args = (jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(iou),
            jnp.asarray(centers), jnp.asarray(valid))
    _, _, keep_gated = finalize_detections(*args, size_gate=True)
    _, _, keep_open = finalize_detections(*args, size_gate=False)
    assert not bool(keep_gated[1])
    assert bool(keep_open[1])
    assert bool(keep_gated[0]) and bool(keep_open[0])


def test_eval_active_batch_planning():
    """plan_batches groups by jit bucket into fixed-size batches (pads by
    repeating the first scene); pick_v_bucket never drops a live slot."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from eval_active import plan_batches, pick_v_bucket

    keys = [(1024, 128), (1024, 128), (2048, 128), (1024, 128),
            (1024, 256), (1024, 128)]
    plan = plan_batches(keys, batch_size=2)
    # 4 scenes in bucket A -> 2 full batches; 1 each in B and C -> padded
    assert len(plan) == 4
    for key, idxs, n_pad in plan:
        assert len(idxs) == 2
        assert all(keys[i] == key for i in idxs)
        if n_pad:
            assert idxs[-1] == idxs[0]
    covered = sorted(i for _, idxs, n_pad in plan
                     for i in idxs[:2 - n_pad])
    assert covered == list(range(6))

    assert pick_v_bucket(100, 2048) == 128
    assert pick_v_bucket(129, 2048) == 256
    assert pick_v_bucket(5000, 8 * 1024) == 8192
    # never exceeds B*K, falls back to the full slot layout
    assert pick_v_bucket(300, 256) == 256
