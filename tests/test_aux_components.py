"""Tests for the auxiliary components: differentiable GIoU/IoU losses,
T-Net, RoI target assignment, host sampling utils, scalar writer."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ws3d_tpu.ops.giou import (paired_iou3d, paired_giou3d, ious_3d_loss,
                               gious_3d_loss)
from ws3d_tpu.pipeline.roi_target import sample_rois, aug_roi_by_noise
from ws3d_tpu.utils.sampling_np import (weighted_sample,
                                        greedy_furthest_point_sample)


def _box(x=0.0, z=10.0, ry=0.0, h=1.5, w=1.6, l=3.9):
    return np.array([x, 1.65, z, h, w, l, ry], np.float32)


def test_paired_iou3d_identity_and_disjoint():
    a = jnp.asarray(np.stack([_box(), _box(x=50.0)]))
    b = jnp.asarray(np.stack([_box(), _box()]))
    iou, _ = paired_iou3d(a, b)
    np.testing.assert_allclose(iou[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(iou[1], 0.0, atol=1e-6)


def test_giou_bounds_and_gradient():
    a = jnp.asarray(_box(x=0.5)[None])
    b = jnp.asarray(_box()[None])
    giou = paired_giou3d(a, b)
    iou, _ = paired_iou3d(a, b)
    assert float(giou[0]) <= float(iou[0]) + 1e-6
    assert -1.0 <= float(giou[0]) <= 1.0
    # gradient flows and pushes the box toward the gt
    grad = jax.grad(lambda x: gious_3d_loss(b, x))(a)
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(grad[0, 0]) > 0  # moving +x increases loss (pred at +0.5)


def test_ious_loss_zero_at_match():
    a = jnp.asarray(_box()[None])
    assert float(ious_3d_loss(a, a)) < 1e-5


def test_transformer_identity_init(rng):
    from ws3d_tpu.models.transformer import Transformer, apply_transform
    model = Transformer(k=3, use_bn=False)
    pts = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    t = model.apply(variables, pts)
    assert t.shape == (2, 3, 3)
    np.testing.assert_allclose(np.asarray(t), np.tile(np.eye(3), (2, 1, 1)),
                               atol=1e-5)
    out = apply_transform(pts, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_sample_rois_composition(rng):
    gt = np.stack([_box(), _box(x=8.0)])
    rois = np.concatenate([
        gt + rng.randn(2, 7).astype(np.float32) * 0.05,     # fg
        np.stack([_box(x=3.0), _box(x=-3.0)]),              # some bg
        np.stack([_box(x=30.0), _box(x=-30.0)]),            # easy bg
    ])
    out = sample_rois(rois, gt, roi_per_image=8,
                      rng=np.random.RandomState(0))
    assert out["rois"].shape == (8, 7)
    assert out["is_fg"].sum() >= 1
    assert (~out["is_fg"]).sum() >= 1
    # fg rois carry their gt box
    fg = np.where(out["is_fg"])[0][0]
    d = np.abs(out["gt_of_rois"][fg] - gt).sum(axis=1).min()
    assert d < 1e-4


def test_aug_roi_by_noise_keeps_overlap():
    gt = _box()
    roi = _box(x=0.2)
    out = aug_roi_by_noise(roi, gt, iou_thresh=0.5,
                           rng=np.random.RandomState(1))
    from ws3d_tpu.ops.iou3d import boxes_iou3d
    _, iou = boxes_iou3d(jnp.asarray(out[None]), jnp.asarray(gt[None]))
    assert float(iou[0, 0]) >= 0.5


def test_weighted_sample_distribution():
    w = np.array([0.0, 1.0, 1.0, 10.0])
    idx = weighted_sample(w, 2, np.random.RandomState(0))
    assert len(idx) == 2
    assert 0 not in idx


def test_greedy_fps_cpu(rng):
    pts = rng.randn(100, 3)
    idx = greedy_furthest_point_sample(pts, 10)
    assert len(set(idx.tolist())) == 10
    assert idx[0] == 0


def test_scalar_writer(tmp_path):
    from ws3d_tpu.utils.tb import ScalarWriter
    w = ScalarWriter(str(tmp_path))
    w.write(0, {"loss": 1.0})
    w.write(1, {"loss": 0.5})
    w.close()
    lines = open(os.path.join(str(tmp_path), "scalars.jsonl")).readlines()
    assert len(lines) == 2


def test_prefetch_order_and_errors():
    from ws3d_tpu.utils.prefetch import prefetch
    assert list(prefetch(iter(range(10)), size=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("x")
    it = prefetch(boom(), size=2)
    assert next(it) == 1
    try:
        next(it)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_shard_batch_multihost_single_process_fallthrough():
    """process_count == 1 falls through to shard_batch (same shardings)."""
    import jax
    from ws3d_tpu.parallel import make_mesh
    from ws3d_tpu.parallel.mesh import shard_batch, shard_batch_multihost

    mesh = make_mesh(8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
             "s": np.float32(3.0)}
    a = shard_batch(batch, mesh)
    b = shard_batch_multihost(batch, mesh)
    np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
    assert a["x"].sharding == b["x"].sharding


def test_shard_batch_multihost_uses_process_local_ctor(monkeypatch):
    """In a (mocked) multi-process setting every array leaf must go through
    jax.make_array_from_process_local_data with the batch sharding."""
    import jax
    from ws3d_tpu.parallel import make_mesh
    from ws3d_tpu.parallel.mesh import batch_sharding, shard_batch_multihost

    mesh = make_mesh(8)
    calls = []

    def fake_ctor(sharding, arr, *a, **k):
        calls.append((sharding, np.asarray(arr).shape))
        return jax.device_put(np.asarray(arr), sharding)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "make_array_from_process_local_data", fake_ctor)
    batch = {"x": np.zeros((8, 4), np.float32),
             "y": np.zeros((8,), np.float32)}
    out = shard_batch_multihost(batch, mesh)
    assert len(calls) == 2
    want = batch_sharding(mesh)
    for sh, shape in calls:
        assert sh == want
    assert set(out) == {"x", "y"}


def test_data_parallel_jit_donates_state():
    """The old train-state buffers are donated: reusing them after the step
    raises the deleted-buffer error."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from ws3d_tpu.parallel import make_mesh
    from ws3d_tpu.parallel.mesh import data_parallel_jit, shard_batch

    mesh = make_mesh(8)
    step = data_parallel_jit(lambda s, b: (s + b.sum(), s.sum()), mesh)
    s0 = jnp.ones((4, 4))
    batch = shard_batch({"x": np.ones((8, 2), np.float32)}, mesh)["x"]
    s0_dev = jax.device_put(s0)
    s1, _ = step(s0_dev, batch)
    assert float(s1[0, 0]) == 17.0
    with _pytest.raises(Exception):
        np.asarray(s0_dev) + 1          # donated -> deleted buffer


def test_random_aug_box3d_methods():
    from ws3d_tpu.pipeline.roi_target import random_aug_box3d
    box = _box()
    for method in ("single", "multiple", "normal"):
        out = random_aug_box3d(box, method=method,
                               rng=np.random.RandomState(3))
        assert out.shape == (7,) and out.dtype == np.float32
        assert not np.allclose(out, box)
    # 'normal' is additive on h/w/l (proposal_target_layer.py:273-283),
    # the others multiplicative
    rng = np.random.RandomState(4)
    outs = np.stack([random_aug_box3d(box, "single", rng) for _ in range(64)])
    assert np.all(np.abs(outs[:, 0:3] - box[0:3]) <= 0.5 + 1e-6)
    assert np.all(np.abs(outs[:, 6] - box[6]) <= np.pi / 12 + 1e-6)
    import pytest
    with pytest.raises(ValueError):
        random_aug_box3d(box, method="bogus")


def test_sample_rois_cfg_consults_config():
    from ws3d_tpu.config import load_config
    from ws3d_tpu.pipeline.roi_target import sample_rois_cfg
    rng0 = np.random.RandomState(0)
    gt = np.stack([_box(), _box(x=8.0)])
    rois = np.concatenate([
        gt + rng0.randn(2, 7).astype(np.float32) * 0.02,
        np.stack([_box(x=3.0), _box(x=-3.0)]),
        np.stack([_box(x=30.0), _box(x=-30.0)]),
    ])
    cfg = load_config()
    cfg.RCNN.ROI_PER_IMAGE = 6
    out = sample_rois_cfg(rois, gt, cfg, rng=np.random.RandomState(1))
    assert out["rois"].shape == (6, 7)          # ROI_PER_IMAGE consulted
    assert out["is_fg"].sum() >= 1
    # fg rois are REG_AUG_METHOD-jittered but stay above the fg threshold
    from ws3d_tpu.ops.iou3d import boxes_iou3d
    fg = np.where(out["is_fg"])[0]
    _, iou = boxes_iou3d(jnp.asarray(out["rois"][fg]),
                         jnp.asarray(out["gt_of_rois"][fg]))
    thr = min(cfg.RCNN.REG_FG_THRESH, cfg.RCNN.CLS_FG_THRESH)
    assert np.all(np.asarray(iou).max(axis=1) >= thr - 1e-5)
    # ROI_FG_AUG_TIMES=0 disables the jitter entirely
    cfg2 = load_config()
    cfg2.RCNN.ROI_PER_IMAGE = 6
    cfg2.RCNN.ROI_FG_AUG_TIMES = 0
    out2 = sample_rois_cfg(rois, gt, cfg2, rng=np.random.RandomState(1))
    fg2 = np.where(out2["is_fg"])[0]
    assert np.all(np.isin(out2["rois"][fg2], rois))
