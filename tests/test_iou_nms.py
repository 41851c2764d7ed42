import numpy as np
import jax.numpy as jnp

from ws3d_tpu.ops.boxes import boxes3d_to_bev
from ws3d_tpu.ops.iou3d import (
    aligned_overlap_bev,
    boxes_iou3d,
    boxes_iou_bev,
    rotated_overlap_bev,
)
from ws3d_tpu.ops.nms import radius_nms, rotated_nms, score_threshold_topk


# ------------- independent numpy convex-polygon clipping reference ----------

def _sh_clip(subject, clip_poly):
    """Sutherland–Hodgman convex clipping (independent of the impl under test)."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

    def inter(a, b, p, q):
        a1 = b[1] - a[1]; b1 = a[0] - b[0]; c1 = a1 * a[0] + b1 * a[1]
        a2 = q[1] - p[1]; b2 = p[0] - q[0]; c2 = a2 * p[0] + b2 * p[1]
        det = a1 * b2 - a2 * b1
        return np.array([(b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det])

    out = list(subject)
    n = len(clip_poly)
    for i in range(n):
        a, b = clip_poly[i], clip_poly[(i + 1) % n]
        inp, out = out, []
        if not inp:
            break
        s = inp[-1]
        for p in inp:
            if inside(p, a, b):
                if not inside(s, a, b):
                    out.append(inter(s, p, a, b))
                out.append(p)
            elif inside(s, a, b):
                out.append(inter(s, p, a, b))
            s = p
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    x = np.array([p[0] for p in poly]); y = np.array([p[1] for p in poly])
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _np_bev_corners_ccw(bev):
    x1, y1, x2, y2, ang = bev
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    dx = np.array([x1 - cx, x2 - cx, x2 - cx, x1 - cx])
    dy = np.array([y1 - cy, y1 - cy, y2 - cy, y2 - cy])
    c, s = np.cos(ang), np.sin(ang)
    px = dx * c + dy * s + cx
    py = -dx * s + dy * c + cy
    pts = np.stack([px, py], axis=-1)
    # ensure counter-clockwise for the clipper
    if _signed_area(pts) < 0:
        pts = pts[::-1]
    return pts


def _signed_area(pts):
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def np_rotated_overlap(bev_a, bev_b):
    pa = _np_bev_corners_ccw(bev_a)
    pb = _np_bev_corners_ccw(bev_b)
    return _poly_area(_sh_clip(pa, pb))


def _rand_bev(rng, n):
    cx = rng.uniform(-3, 3, n); cy = rng.uniform(-3, 3, n)
    w = rng.uniform(1, 4, n); h = rng.uniform(1, 4, n)
    ang = rng.uniform(-np.pi, np.pi, n)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, ang],
                    axis=-1).astype(np.float32)


def test_rotated_overlap_identity(rng):
    bev = _rand_bev(rng, 8)
    got = np.asarray(rotated_overlap_bev(jnp.asarray(bev), jnp.asarray(bev)))
    areas = (bev[:, 2] - bev[:, 0]) * (bev[:, 3] - bev[:, 1])
    np.testing.assert_allclose(np.diag(got), areas, rtol=1e-3, atol=1e-3)


def test_rotated_overlap_vs_clipping(rng):
    A = _rand_bev(rng, 24)
    B = _rand_bev(rng, 24)
    got = np.asarray(rotated_overlap_bev(jnp.asarray(A), jnp.asarray(B)))
    for i in range(24):
        for j in range(24):
            want = np_rotated_overlap(A[i], B[j])
            assert abs(got[i, j] - want) < 2e-2, (i, j, got[i, j], want)


def test_rotated_overlap_disjoint():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b = jnp.array([[10.0, 10.0, 12.0, 12.0, -0.7]])
    assert float(rotated_overlap_bev(a, b)[0, 0]) == 0.0


def test_iou_bev_axis_aligned_matches_normal():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0, 0.0]])
    rot = float(boxes_iou_bev(a, b)[0, 0])
    ali = float(aligned_overlap_bev(a, b)[0, 0])
    want = 1.0 / 7.0
    assert abs(rot - want) < 1e-3 and abs(ali - want) < 1e-5


def test_boxes_iou3d_same_box(rng):
    boxes = np.array([[2.0, 1.0, 10.0, 1.5, 1.6, 3.9, 0.4],
                      [-3.0, 0.5, 20.0, 1.4, 1.7, 4.2, -1.1]], np.float32)
    iou2d, iou3d = boxes_iou3d(jnp.asarray(boxes), jnp.asarray(boxes))
    np.testing.assert_allclose(np.diag(np.asarray(iou3d)), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.diag(np.asarray(iou2d)), 1.0, atol=1e-3)


def test_boxes_iou3d_height_overlap():
    # identical BEV, shifted vertically by half the height -> iou3d = 1/3
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.0]])
    b = jnp.array([[0.0, 1.0, 0.0, 2.0, 1.0, 1.0, 0.0]])
    _, iou3d = boxes_iou3d(a, b)
    assert abs(float(iou3d[0, 0]) - 1.0 / 3.0) < 1e-3


def test_rotated_nms_basic():
    # three boxes: 0 and 1 heavily overlap, 2 is far away
    bev = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.1, 2.1, 2.1, 0.0],
        [10.0, 10.0, 12.0, 12.0, 0.0],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep, order = rotated_nms(bev, scores, 0.5)
    kept = np.asarray(order)[np.asarray(keep)]
    assert set(kept.tolist()) == {0, 2}


def test_rotated_nms_respects_score_order():
    bev = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.1, 2.1, 2.1, 0.0],
    ])
    scores = jnp.array([0.2, 0.9])  # second box wins
    keep, order = rotated_nms(bev, scores, 0.5)
    kept = np.asarray(order)[np.asarray(keep)]
    assert kept.tolist() == [1]


def test_radius_nms():
    centers = jnp.array([[0.0, 0.0], [0.2, 0.0], [5.0, 5.0], [5.1, 5.0]])
    scores = jnp.array([0.9, 0.95, 0.5, 0.6])
    keep, order = radius_nms(centers, scores, 0.3)
    kept = sorted(np.asarray(order)[np.asarray(keep)].tolist())
    assert kept == [1, 3]


def test_radius_nms_invalid_mask():
    centers = jnp.array([[0.0, 0.0], [10.0, 0.0]])
    scores = jnp.array([0.9, 0.8])
    keep, order = radius_nms(centers, scores, 0.3,
                             valid=jnp.array([False, True]))
    kept = np.asarray(order)[np.asarray(keep)]
    assert kept.tolist() == [1]


def test_score_threshold_topk():
    scores = jnp.array([0.1, 0.9, 0.5, 0.3])
    idx, ok = score_threshold_topk(scores, 0.25, 3)
    assert np.asarray(idx).tolist() == [1, 2, 3]
    assert np.asarray(ok).tolist() == [True, True, True]
    idx, ok = score_threshold_topk(scores, 0.45, 3)
    assert np.asarray(ok).tolist() == [True, True, False]
