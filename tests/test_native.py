"""Native C++ host kernels vs the NumPy reference implementations."""
import numpy as np
import pytest

from ws3d_tpu import native
from ws3d_tpu.eval.rotate_iou_np import rotate_iou_eval as np_iou

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def _rand_boxes(rng, n):
    return np.column_stack([
        rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
        rng.uniform(0.5, 5, n), rng.uniform(0.5, 5, n),
        rng.uniform(-np.pi, np.pi, n)])


@pytest.mark.parametrize("criterion", [-1, 0, 1, 2])
def test_native_matches_numpy(rng, criterion):
    boxes = _rand_boxes(rng, 40)
    q = _rand_boxes(rng, 25)
    a = native.rotate_iou_eval(boxes, q, criterion)
    b = np_iou(boxes, q, criterion)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_native_greedy_nms_matches_python(rng):
    n = 60
    pair = rng.rand(n, n)
    pair = (pair + pair.T) / 2
    np.fill_diagonal(pair, 1.0)
    valid = rng.rand(n) > 0.2
    keep = native.greedy_nms(pair, 0.7, valid)
    # python reference sweep
    ref = np.zeros(n, bool)
    for i in range(n):
        if not valid[i]:
            continue
        ref[i] = not any(ref[j] and pair[j, i] > 0.7 for j in range(i))
    np.testing.assert_array_equal(keep, ref)


def test_ap_harness_uses_native_consistently(rng):
    # end-to-end: AP path gives same result whether native or numpy drives
    from ws3d_tpu.eval import kitti_ap
    boxes = _rand_boxes(rng, 12)
    q = _rand_boxes(rng, 12)
    got = kitti_ap.rotate_iou_eval(boxes, q)
    np.testing.assert_allclose(got, np_iou(boxes, q), atol=1e-9)


def test_native_statistics_matches_python(rng):
    from ws3d_tpu.eval import kitti_ap
    for trial in range(10):
        n_gt, n_dt = rng.randint(1, 12), rng.randint(0, 14)
        overlaps = rng.rand(n_dt, n_gt)
        gt = np.column_stack([rng.rand(n_gt, 4) * 300, rng.randn(n_gt)])
        dt = np.column_stack([rng.rand(n_dt, 4) * 300, rng.randn(n_dt),
                              rng.rand(n_dt)])
        ig = rng.choice([-1, 0, 1], n_gt).astype(np.int64)
        idt = rng.choice([-1, 0, 1], n_dt).astype(np.int64)
        dc = rng.rand(rng.randint(0, 2), 4) * 300
        for compute_fp in (False, True):
            for thresh in (0.0, 0.5):
                ref = kitti_ap.compute_statistics(
                    overlaps, gt, dt, ig, idt, dc, 0, 0.5, thresh=thresh,
                    compute_fp=compute_fp, compute_aos=True)
                got = native.compute_statistics(
                    overlaps, gt, dt, ig, idt, dc, 0, 0.5, thresh=thresh,
                    compute_fp=compute_fp, compute_aos=True)
                assert ref[:3] == got[:3], (trial, ref, got)
                np.testing.assert_allclose(ref[3], got[3], atol=1e-9)
                np.testing.assert_allclose(np.sort(ref[4]), np.sort(got[4]),
                                           atol=1e-12)


def test_native_fused_statistics_accumulates(rng):
    from ws3d_tpu.eval import kitti_ap
    n_gt, n_dt = 8, 10
    overlaps = rng.rand(n_dt, n_gt)
    gt = np.column_stack([rng.rand(n_gt, 4) * 300, rng.randn(n_gt)])
    dt = np.column_stack([rng.rand(n_dt, 4) * 300, rng.randn(n_dt),
                          rng.rand(n_dt)])
    ig = np.zeros(n_gt, np.int64)
    idt = np.zeros(n_dt, np.int64)
    thresholds = np.linspace(0.9, 0.1, 5)
    pr = np.zeros((5, 4), np.float64)
    native.fused_statistics(overlaps, gt, dt, ig, idt, np.zeros((0, 4)),
                            2, 0.5, thresholds, True, pr)
    ref = np.zeros((5, 4))
    for t, th in enumerate(thresholds):
        tp, fp, fn, sim, _ = kitti_ap.compute_statistics(
            overlaps, gt, dt, ig, idt, np.zeros((0, 4)), 2, 0.5, thresh=th,
            compute_fp=True, compute_aos=True)
        ref[t] = [tp, fp, fn, sim if sim != -1 else 0.0]
    np.testing.assert_allclose(pr, ref, atol=1e-9)
