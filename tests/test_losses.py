"""Golden-value tests for the loss layer against NumPy re-derivations of the
reference formulas (lib/utils/loss_utils.py, lib/net/train_functions.py)."""
import numpy as np
import jax.numpy as jnp

from ws3d_tpu import losses


def test_sigmoid_cross_entropy_matches_numpy(rng):
    x = rng.randn(64).astype(np.float32) * 3
    z = (rng.rand(64) > 0.5).astype(np.float32)
    got = np.asarray(losses.sigmoid_cross_entropy(jnp.asarray(x), jnp.asarray(z)))
    p = 1 / (1 + np.exp(-x))
    want = -(z * np.log(p + 1e-12) + (1 - z) * np.log(1 - p + 1e-12))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_focal_loss_downweights_easy(rng):
    easy = losses.sigmoid_focal_loss(jnp.asarray([8.0]), jnp.asarray([1.0]),
                                     jnp.asarray([1.0]))
    hard = losses.sigmoid_focal_loss(jnp.asarray([-8.0]), jnp.asarray([1.0]),
                                     jnp.asarray([1.0]))
    assert float(easy[0]) < 1e-6
    assert float(hard[0]) > 1.0


def test_dice_loss_perfect_and_worst():
    logits = jnp.asarray([100.0, -100.0, 100.0])
    target = jnp.asarray([1.0, 0.0, 1.0])
    assert float(losses.dice_loss(logits, target)) < 1e-5
    assert float(losses.dice_loss(-logits, target)) > 0.99


def test_smooth_l1_formula():
    x = jnp.asarray([0.0, 0.5, 1.0, 3.0, -2.0])
    got = np.asarray(losses.smooth_l1(x, jnp.zeros_like(x)))
    want = np.asarray([0.0, 0.125, 0.5, 2.5, 1.5])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_masked_mean_equals_subset_mean(rng):
    x = rng.randn(32, 5).astype(np.float32)
    mask = rng.rand(32) > 0.5
    got = float(losses.masked_mean(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(got, x[mask].mean(), rtol=1e-5)


def test_rpn_reg_loss_zero_for_perfect_prediction(rng):
    """Construct pred_reg that exactly encodes the labels — bin logits one-hot
    (scaled to dominate CE) can't reach 0 CE, so just check monotonicity: the
    encoded prediction scores lower loss than a random one."""
    P, scope, bsz = 16, 4.0, 0.8
    n = int(scope / bsz) * 2
    reg_label = np.zeros((P, 3), np.float32)
    reg_label[:, 0] = rng.uniform(-3.9, 3.9, P)
    reg_label[:, 2] = rng.uniform(-3.9, 3.9, P)
    pred = np.zeros((P, 4 * n), np.float32)
    for axis, lo in ((0, 0), (2, n)):
        shift = np.clip(reg_label[:, axis] + scope, 0, 2 * scope - 1e-3)
        b = np.floor(shift / bsz).astype(int)
        res = (shift - (b * bsz + bsz / 2)) / (bsz / 2)
        pred[np.arange(P), lo + b] = 50.0           # near-one-hot bins
        pred[np.arange(P), 2 * n + lo + b] = res
    fg = np.ones(P, bool)
    good = float(losses.rpn_reg_loss(jnp.asarray(pred), jnp.asarray(reg_label),
                                     jnp.asarray(fg), scope, bsz))
    bad = float(losses.rpn_reg_loss(jnp.asarray(rng.randn(P, 4 * n).astype(np.float32)),
                                    jnp.asarray(reg_label), jnp.asarray(fg),
                                    scope, bsz))
    assert good < 1e-3
    assert bad > good


def test_rpn_loss_runs_and_no_fg(rng):
    B, N = 2, 64
    cls_lbl = np.zeros((B, N), np.float32)
    out, aux = losses.rpn_loss(
        jnp.asarray(rng.randn(B, N, 1).astype(np.float32)),
        jnp.asarray(rng.randn(B, N, 40).astype(np.float32)),
        jnp.asarray(cls_lbl), jnp.zeros((B, N, 3)), 4.0, 0.8)
    assert float(aux["rpn_loss_reg"]) == 0.0
    assert np.isfinite(float(out))


def test_rcnn_loss_composition(rng):
    B = 8
    anchor = jnp.asarray([1.5, 1.6, 3.9])
    gt = np.tile(np.array([0.1, 0.0, -0.2, 1.5, 1.6, 3.9, 0.3], np.float32),
                 (B, 1))
    pred_boxes = gt + rng.randn(B, 7).astype(np.float32) * 0.01
    cls_label = np.ones(B, np.float32)
    cls_label[::2] = 0.0
    total, aux = losses.rcnn_loss(
        jnp.asarray(rng.randn(B).astype(np.float32)),
        jnp.asarray(rng.randn(B, 52).astype(np.float32) * 0.01),
        jnp.asarray(pred_boxes), jnp.asarray(gt), jnp.asarray(cls_label),
        anchor)
    assert np.isfinite(float(total))
    # near-identical boxes => high IoU => corner loss computed on fg rows
    assert float(aux["rcnn_iou_mean"]) > 0.8


def test_ioun_loss_perfect_refinement(rng):
    B = 6
    gt = np.tile(np.array([0.1, 0.0, -0.2, 1.5, 1.6, 3.9, 0.3], np.float32),
                 (B, 1))
    pred = gt.copy()
    pred[:, 0] += 0.2    # pred offset in x
    # perfect ref: (loc_l - loc_p)/siz_p for loc, 0 size, 0 angle
    ref = np.zeros((B, 7), np.float32)
    ref[:, 0] = (gt[:, 0] - pred[:, 0]) / pred[:, 3]
    ref[:, 1] = 0.0
    ref[:, 2] = 0.0
    refined = gt.copy()
    iou_pred = np.ones(B, np.float32)   # iou(refined==gt) == 1 -> label 1
    total, aux = losses.ioun_loss(
        jnp.asarray(iou_pred), jnp.asarray(ref), jnp.asarray(pred),
        jnp.asarray(refined), jnp.asarray(gt), jnp.ones(B))
    assert float(aux["ioun_loss_loc"]) < 1e-6
    assert float(aux["loss_iou"]) < 1e-4
    assert np.isfinite(float(total))
