import numpy as np
import jax.numpy as jnp

from ws3d_tpu.box_codec import (
    bottom_to_center,
    center_to_bottom,
    decode_box_stage2,
    decode_center,
    encode_center_bins,
    encode_ry_bins,
    refine_box,
)

ANCHOR = jnp.array([1.5, 1.6, 3.9])


def _onehotify(bins, n, residuals, scale=10.0):
    """Build a reg tensor whose argmax = bins and residual slot = residuals."""
    onehot = np.zeros((len(bins), n), np.float32)
    onehot[np.arange(len(bins)), bins] = scale
    res = np.zeros((len(bins), n), np.float32)
    res[np.arange(len(bins)), bins] = residuals
    return onehot, res


def test_decode_center_roundtrip(rng):
    """encode offsets -> build reg -> decode recovers the offsets."""
    loc_scope, loc_bin_size = 4.0, 0.8
    n = int(loc_scope / loc_bin_size) * 2
    offs = rng.uniform(-3.9, 3.9, (32, 2)).astype(np.float32)
    xb, xr = encode_center_bins(jnp.asarray(offs[:, 0]), loc_scope, loc_bin_size)
    zb, zr = encode_center_bins(jnp.asarray(offs[:, 1]), loc_scope, loc_bin_size)
    x_onehot, x_res = _onehotify(np.asarray(xb), n, np.asarray(xr))
    z_onehot, z_res = _onehotify(np.asarray(zb), n, np.asarray(zr))
    reg = jnp.asarray(np.concatenate([x_onehot, z_onehot, x_res, z_res], axis=1))
    roi = rng.randn(32, 3).astype(np.float32)
    out = np.asarray(decode_center(jnp.asarray(roi), reg, loc_scope, loc_bin_size))
    np.testing.assert_allclose(out[:, 0], roi[:, 0] + offs[:, 0], atol=1e-4)
    np.testing.assert_allclose(out[:, 2], roi[:, 2] + offs[:, 1], atol=1e-4)
    np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-6)


def test_decode_center_clamps_to_scope():
    loc_scope, loc_bin_size = 4.0, 0.8
    n = int(loc_scope / loc_bin_size) * 2
    reg = np.zeros((1, 4 * n), np.float32)
    reg[0, n - 1] = 10.0          # x bin = last
    reg[0, 2 * n - 1] = 10.0      # z bin = last
    out = np.asarray(decode_center(jnp.zeros((1, 3)), jnp.asarray(reg),
                                   loc_scope, loc_bin_size))
    assert abs(out[0, 0] - 3.6) < 1e-5  # last bin center = 4.0 - 0.4


def test_decode_box_stage2_coarse_roundtrip(rng):
    """RCNN config path: xz smooth (fine=False), y offset, coarse ry, anchors."""
    loc_scope, loc_bin_size, nbin = 1.5, 0.5, 12
    n = int(loc_scope / loc_bin_size) * 2  # 6
    B = 16
    gt_xyz = rng.uniform(-1.2, 1.2, (B, 3)).astype(np.float32)
    gt_hwl = (np.array([1.5, 1.6, 3.9]) *
              rng.uniform(0.8, 1.2, (B, 3))).astype(np.float32)
    gt_ry = rng.uniform(-np.pi, np.pi, B).astype(np.float32)

    reg = np.zeros((B, n * 4 + 1 + nbin * 2 + 3), np.float32)
    reg[:, 2 * n] = gt_xyz[:, 0] / loc_scope       # x res slot
    reg[:, 3 * n] = gt_xyz[:, 2] / loc_scope       # z res slot
    reg[:, 4 * n] = gt_xyz[:, 1]                    # y offset
    rb, rr = encode_ry_bins(jnp.asarray(gt_ry), nbin)
    rb, rr = np.asarray(rb), np.asarray(rr)
    reg[np.arange(B), 4 * n + 1 + rb] = 10.0
    reg[np.arange(B), 4 * n + 1 + nbin + rb] = rr
    reg[:, 4 * n + 1 + 2 * nbin:] = (gt_hwl - np.asarray(ANCHOR)) / np.asarray(ANCHOR)

    out = np.asarray(decode_box_stage2(
        jnp.zeros((B, 3)), jnp.asarray(reg), ANCHOR,
        loc_scope, loc_bin_size, nbin))
    np.testing.assert_allclose(out[:, 0], gt_xyz[:, 0], atol=1e-4)
    np.testing.assert_allclose(out[:, 1], gt_xyz[:, 1], atol=1e-4)
    np.testing.assert_allclose(out[:, 2], gt_xyz[:, 2], atol=1e-4)
    np.testing.assert_allclose(out[:, 3:6], gt_hwl, rtol=1e-4)
    # angle equal mod 2pi
    diff = (out[:, 6] - gt_ry + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(diff, 0.0, atol=1e-4)
    # decoded ry within (-pi, pi]
    assert (out[:, 6] <= np.pi + 1e-6).all() and (out[:, 6] >= -np.pi - 1e-6).all()


def test_refine_box():
    boxes = jnp.array([[1.0, 2.0, 3.0, 2.0, 1.0, 4.0, 0.5]])
    ref = jnp.array([[0.1, -0.1, 0.05, 0.1, -0.2, 0.0, 0.2]])
    out = np.asarray(refine_box(boxes, ref))[0]
    np.testing.assert_allclose(
        out, [1.0 + 2.0 * 0.1, 2.0 - 1.0 * 0.1, 3.0 + 4.0 * 0.05,
              2.2, 0.8, 4.0, 0.7], rtol=1e-5)


def test_center_bottom_roundtrip(rng):
    boxes = rng.rand(5, 7).astype(np.float32)
    boxes[:, 3:6] += 1.0
    ce = bottom_to_center(jnp.asarray(boxes))
    back = np.asarray(center_to_bottom(ce))
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-5)
    np.testing.assert_allclose(back[:, 6], boxes[:, 6] % (2 * np.pi), atol=1e-5)


def test_encode_center_bins_edges():
    b, r = encode_center_bins(jnp.array([0.0]), 4.0, 0.8)
    assert int(b[0]) == 5  # 4.0/0.8 = bin 5
    b2, _ = encode_center_bins(jnp.array([100.0]), 4.0, 0.8)
    assert int(b2[0]) == 9  # clamped into last bin
    b3, _ = encode_center_bins(jnp.array([-100.0]), 4.0, 0.8)
    assert int(b3[0]) == 0
