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
