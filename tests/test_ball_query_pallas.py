"""Pallas fused multi-scale ball query vs the XLA path (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.ops.ball_query_pallas import ball_query_pallas
from ws3d_tpu.ops.grouping import ball_query_multi


@pytest.mark.parametrize("n,m,radii,ks", [
    (512, 64, [0.5, 1.5], [8, 16]),
    (256, 32, [1.0], [4]),
    (128, 16, [0.2, 0.8], [2, 4]),
])
def test_pallas_ball_query_matches_xla(rng, n, m, radii, ks):
    xyz = jnp.asarray(rng.randn(2, n, 3).astype(np.float32) * 3)
    new_xyz = jnp.asarray(rng.randn(2, m, 3).astype(np.float32) * 3)
    ref = ball_query_multi(radii, ks, xyz, new_xyz)
    got = ball_query_pallas(radii, ks, xyz, new_xyz, interpret=True)
    for s in range(len(radii)):
        np.testing.assert_array_equal(np.asarray(ref[s]), np.asarray(got[s]))


def test_pallas_ball_query_empty_and_pad(rng):
    # centers far from all points -> all-zero indices; sparse -> pad w/ first
    xyz = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32) * 0.1)
    new_xyz = jnp.asarray(np.array([[[50.0, 50, 50], [0, 0, 0]] * 4],
                                   np.float32))
    ref = ball_query_multi([0.5], [8], xyz, new_xyz)
    got = ball_query_pallas([0.5], [8], xyz, new_xyz, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    assert (np.asarray(got[0])[0, 0] == 0).all()   # empty center -> zeros


def test_wrap_pad_matches_first_k_wraparound(rng):
    """wrap_pad mode reproduces roipool's s % cnt duplication + counts."""
    import jax.numpy as jnp
    from ws3d_tpu.ops.ball_query_pallas import ball_query_pallas
    from ws3d_tpu.ops.roipool import _first_k_wraparound

    B, N, M, S = 2, 256, 16, 12
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    new = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    new = new.at[:, 0].set(50.0)          # one empty center
    (idx,), (cnt,) = ball_query_pallas([0.9], [S], xyz, new,
                                       interpret=True, wrap_pad=True)
    d2 = jnp.sum(jnp.square(new[:, :, None] - xyz[:, None]), -1)
    for b in range(B):
        want_idx, want_empty = _first_k_wraparound(
            np.asarray(d2[b]) < 0.9 * 0.9, S)
        np.testing.assert_array_equal(np.asarray(idx[b]),
                                      np.asarray(want_idx))
        np.testing.assert_array_equal(np.asarray(cnt[b]) == 0,
                                      np.asarray(want_empty))


def _legacy_crop(pts_input, scores_norm, centers_xz, num_sampled, sort_z):
    """The pre-fused XLA composition: rank-search idx -> row gathers ->
    (optional) stable z-sort. crop_for_rcnn_batched takes this path off-TPU."""
    from ws3d_tpu.pipeline.inference import crop_for_rcnn_batched
    return crop_for_rcnn_batched(pts_input, scores_norm, centers_xz,
                                 num_sampled=num_sampled, sort_z=sort_z)


def _fused_crop(pts_input, scores_norm, centers_xz, num_sampled, sort_z):
    """Replicate crop_for_rcnn_batched's fused branch with interpret=True."""
    from ws3d_tpu.ops.ball_query_pallas import crop_gather_pallas
    GROUND_Y = 1.65
    xyz = pts_input[..., 0:3].at[..., 1].add(-GROUND_Y)
    reflect = (pts_input[..., 3] if pts_input.shape[-1] > 3
               else jnp.zeros_like(xyz[..., 0]))
    ch = jnp.stack([xyz[..., 0], xyz[..., 1], xyz[..., 2],
                    reflect, scores_norm], axis=1)
    (gx, gy, gz, grf, gsn), cnt = crop_gather_pallas(
        xyz, ch, centers_xz, 4.0, num_sampled, grouped=sort_z,
        interpret=True)
    empty = cnt == 0
    crop_xyz = jnp.stack([gx - centers_xz[..., 0:1], gy,
                          gz - centers_xz[..., 1:2]], axis=-1)
    crop_mask = (gsn > 0.5).astype(crop_xyz.dtype)[..., None] - 0.5
    zero = empty[:, :, None, None]
    crops = {"cur_box_point": jnp.where(zero, 0.0, crop_xyz),
             "cur_box_reflect": jnp.where(zero, 0.0, grf[..., None]),
             "train_mask": jnp.where(zero, 0.0, crop_mask)}
    return crops, empty


@pytest.mark.parametrize("sort_z", [True, False])
def test_crop_gather_matches_legacy_composition(rng, sort_z):
    """Fused in-kernel crop gather == rank-search + gathers (+ stable sort).

    Scene mixes a dense cluster (cnt > S), moderate-density regions
    (wraparound), and a far center (empty crop)."""
    B, N, S = 2, 512, 64
    pts = rng.randn(B, N, 4).astype(np.float32)
    pts[..., 0] *= 6.0
    pts[..., 2] = np.abs(pts[..., 2]) * 12 + 2
    pts[:, :96, 0] = rng.randn(B, 96).astype(np.float32) * 0.4   # dense
    pts[:, :96, 2] = 5.0 + rng.randn(B, 96).astype(np.float32) * 0.4
    order = np.argsort(pts[..., 2], axis=1)
    pts = np.take_along_axis(pts, order[..., None], axis=1)      # z-sorted
    sn = rng.rand(B, N).astype(np.float32)
    centers = np.stack([
        np.array([[0.0, 5.0]] * B, np.float32),                  # dense
        np.array([[2.0, 14.0]] * B, np.float32),                 # wrap
        np.array([[-3.0, 25.0]] * B, np.float32),                # sparse wrap
        np.array([[500.0, 500.0]] * B, np.float32),              # empty
    ] * 2, axis=1).reshape(B, 8, 2)

    ref_crops, ref_empty = _legacy_crop(jnp.asarray(pts), jnp.asarray(sn),
                                        jnp.asarray(centers), S, sort_z)
    got_crops, got_empty = _fused_crop(jnp.asarray(pts), jnp.asarray(sn),
                                       jnp.asarray(centers), S, sort_z)
    np.testing.assert_array_equal(np.asarray(ref_empty),
                                  np.asarray(got_empty))
    assert np.asarray(got_empty)[0, 3]                           # far center
    assert not np.asarray(got_empty)[0, 0]
    for key in ref_crops:
        np.testing.assert_array_equal(np.asarray(ref_crops[key]),
                                      np.asarray(got_crops[key]), err_msg=key)


def test_crop_gather_z_window_matches_full(rng):
    """Windowed fast path (z-sorted centers, per-program tile windows) is
    bit-identical to the full kernel; an undersized budget falls back via
    the in-graph fits check (also bit-identical)."""
    from ws3d_tpu.ops.ball_query_pallas import crop_gather_pallas

    B, N, S = 2, 1024, 128
    xyz = rng.randn(B, N, 3).astype(np.float32)
    xyz[..., 0] *= 6.0
    xyz[..., 2] = np.abs(xyz[..., 2]) * 15 + 2
    order = np.argsort(xyz[..., 2], axis=1)
    xyz = np.take_along_axis(xyz, order[..., None], axis=1)     # z-sorted
    ch = np.stack([xyz[..., 0], xyz[..., 1], xyz[..., 2]], axis=1)
    # z-ordered centers along the scene depth
    cz = np.linspace(4.0, 30.0, 8, dtype=np.float32)
    centers = np.stack([np.zeros_like(cz), cz], axis=-1)[None].repeat(B, 0)

    args = (jnp.asarray(xyz), jnp.asarray(ch), jnp.asarray(centers), 4.0, S)
    full_v, full_c = crop_gather_pallas(*args, interpret=True, z_window=None)
    win_v, win_c = crop_gather_pallas(
        *args, interpret=True, z_window=4,
        center_z=jnp.asarray(centers[..., 1]))
    np.testing.assert_array_equal(np.asarray(full_c), np.asarray(win_c))
    for a, b in zip(full_v, win_v):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # undersized budget: fits=False -> lax.cond fallback, still identical
    fb_v, fb_c = crop_gather_pallas(
        *args, interpret=True, z_window=1,
        center_z=jnp.asarray(centers[..., 1]))
    np.testing.assert_array_equal(np.asarray(full_c), np.asarray(fb_c))
    for a, b in zip(full_v, fb_v):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
