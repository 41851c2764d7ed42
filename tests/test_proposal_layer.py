"""Legacy top-N proposal layer (pipeline/proposal_layer.py) — the consumer
of cfg[mode].RPN_PRE/POST_NMS_TOP_N / RPN_NMS_THRESH / RPN.NMS_TYPE /
RPN_DISTANCE_BASED_PROPOSE (reference proposal_layer.py:61-160)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.config import load_config
from ws3d_tpu.pipeline.proposal_layer import (distance_based_proposal,
                                              make_proposal_fn,
                                              score_based_proposal)


def _boxes(xs, zs, ry=0.0):
    n = len(xs)
    out = np.zeros((n, 7), np.float32)
    out[:, 0] = xs
    out[:, 1] = 1.65
    out[:, 2] = zs
    out[:, 3:6] = [1.5, 1.6, 3.9]
    out[:, 6] = ry
    return out


def test_score_based_suppresses_duplicates():
    # three near-identical boxes + one far box; NMS keeps 1 + 1
    boxes = _boxes([0.0, 0.05, -0.05, 20.0], [10.0, 10.0, 10.0, 30.0])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6], jnp.float32)
    out_b, out_s, valid = score_based_proposal(
        scores, jnp.asarray(boxes), pre_top_n=4, post_top_n=4,
        nms_thresh=0.5)
    assert int(valid.sum()) == 2
    kept = np.asarray(out_b)[np.asarray(valid)]
    np.testing.assert_allclose(sorted(kept[:, 0]), [0.0, 20.0], atol=1e-5)
    # best-scoring duplicate wins
    np.testing.assert_allclose(np.asarray(out_s)[np.asarray(valid)].max(),
                               0.9, atol=1e-6)


def test_score_based_post_top_n_caps_output():
    boxes = _boxes(np.arange(8, dtype=np.float32) * 10.0, np.full(8, 10.0))
    scores = jnp.asarray(np.linspace(1.0, 0.3, 8), jnp.float32)
    out_b, out_s, valid = score_based_proposal(
        scores, jnp.asarray(boxes), pre_top_n=8, post_top_n=3,
        nms_thresh=0.5)
    assert out_b.shape == (3, 7) and int(valid.sum()) == 3
    np.testing.assert_allclose(np.asarray(out_s),
                               np.linspace(1.0, 0.3, 8)[:3], atol=1e-6)


def test_distance_based_region_budgets():
    # 4 near (z<=40) + 4 far boxes, all disjoint; 70/30 split of post=4
    boxes = _boxes(np.arange(8, dtype=np.float32) * 10.0,
                   [10.0, 20.0, 30.0, 35.0, 50.0, 60.0, 70.0, 75.0])
    scores = jnp.asarray(np.linspace(1.0, 0.3, 8), jnp.float32)
    out_b, out_s, valid = distance_based_proposal(
        scores, jnp.asarray(boxes), pre_top_n=8, post_top_n=4,
        nms_thresh=0.5)
    # near slots: int(4*0.7)=2, far slots: 2
    assert out_b.shape == (4, 7)
    v = np.asarray(valid)
    zs = np.asarray(out_b)[:, 2]
    assert v.all()
    assert np.all(zs[:2] <= 40.0) and np.all(zs[2:] > 40.0)


def test_make_proposal_fn_consults_mode_knobs():
    cfg = load_config()
    cfg.TEST.RPN_PRE_NMS_TOP_N = 8
    cfg.TEST.RPN_POST_NMS_TOP_N = 2
    cfg.TEST.RPN_NMS_THRESH = 0.5
    boxes = _boxes([0.0, 30.0, -30.0], [10.0, 10.0, 10.0])[None]
    scores = jnp.asarray([[0.9, 0.8, 0.7]], jnp.float32)
    fn = make_proposal_fn(cfg, mode="TEST")
    out_b, out_s, valid = fn(scores, jnp.asarray(boxes))
    assert out_b.shape == (1, 2, 7)          # POST_NMS_TOP_N consulted
    assert int(valid.sum()) == 2

    cfg.TEST.RPN_DISTANCE_BASED_PROPOSE = True
    fn2 = make_proposal_fn(cfg, mode="TEST")
    out_b2, _, valid2 = fn2(scores, jnp.asarray(boxes))
    # 70/30 split of post=2 -> 1 near slot + 1 far slot (no far boxes)
    assert out_b2.shape == (1, 2, 7) and int(valid2.sum()) == 1

    cfg.RPN.NMS_TYPE = "bogus"
    with pytest.raises(NotImplementedError):
        make_proposal_fn(cfg, mode="TEST")


def test_rotate_vs_normal_nms_type():
    # two rotated boxes that overlap axis-aligned but not rotated
    boxes = _boxes([0.0, 0.0], [10.0, 10.0])
    boxes[1, 0] += 1.5
    boxes[0, 6] = np.pi / 2
    boxes[1, 6] = 0.0
    scores = jnp.asarray([0.9, 0.8], jnp.float32)
    kept = {}
    for rotated in (False, True):
        _, _, valid = score_based_proposal(
            scores, jnp.asarray(boxes), pre_top_n=2, post_top_n=2,
            nms_thresh=0.3, rotated=rotated)
        kept[rotated] = int(valid.sum())
    # axis-aligned overlap of the pi/2-rotated box is larger -> suppresses
    assert kept[False] <= kept[True]
