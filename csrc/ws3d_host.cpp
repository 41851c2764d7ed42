// Host-side native kernels for ws3d_tpu.
//
// TPU-native counterpart of the reference's host/C++ layer: the greedy NMS
// sweep (/root/reference/lib/utils/iou3d/src/iou3d.cpp:73-170) and the
// rotated-rectangle overlap used by the KITTI AP metric
// (/root/reference/tools/kitti_object_eval_python/rotate_iou.py:16-329,
// numba-CUDA there). On a TPU host there is no CUDA; these run on CPU and
// feed the metric harness / host post-processing. Exposed via a plain C ABI
// for ctypes (no pybind11 in the image).
//
// Build: make -C csrc    (produces libws3d_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr double EPS = 1e-8;

struct Pt {
  double x, y;
};

// corners of a rotated rect (cx, cy, w, h, angle)
inline void rect_corners(const double* b, Pt* c) {
  const double cx = b[0], cy = b[1], w = b[2], h = b[3], ang = b[4];
  const double ca = std::cos(ang), sa = std::sin(ang);
  const double dx[4] = {-w / 2, w / 2, w / 2, -w / 2};
  const double dy[4] = {-h / 2, -h / 2, h / 2, h / 2};
  for (int i = 0; i < 4; ++i) {
    c[i].x = dx[i] * ca - dy[i] * sa + cx;
    c[i].y = dx[i] * sa + dy[i] * ca + cy;
  }
}

inline double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

inline bool point_in_quad(const Pt& p, const Pt* q) {
  bool all_pos = true, all_neg = true;
  for (int i = 0; i < 4; ++i) {
    const double c = cross(q[i], q[(i + 1) & 3], p);
    all_pos &= (c >= -1e-9);
    all_neg &= (c <= 1e-9);
  }
  return all_pos || all_neg;
}

inline bool seg_intersect(const Pt& a0, const Pt& a1, const Pt& b0,
                          const Pt& b1, Pt* out) {
  const double d1x = a1.x - a0.x, d1y = a1.y - a0.y;
  const double d2x = b1.x - b0.x, d2y = b1.y - b0.y;
  const double denom = d1x * d2y - d1y * d2x;
  if (std::fabs(denom) <= EPS) return false;
  const double dx = b0.x - a0.x, dy = b0.y - a0.y;
  const double t = (dx * d2y - dy * d2x) / denom;
  const double u = (dx * d1y - dy * d1x) / denom;
  if (t < 0 || t > 1 || u < 0 || u > 1) return false;
  out->x = a0.x + t * d1x;
  out->y = a0.y + t * d1y;
  return true;
}

// intersection area of two rotated rects via vertex enumeration + hull sort
double rect_inter_area(const double* ba, const double* bb) {
  Pt ca[4], cb[4], pts[24];
  rect_corners(ba, ca);
  rect_corners(bb, cb);
  int n = 0;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      Pt p;
      if (seg_intersect(ca[i], ca[(i + 1) & 3], cb[j], cb[(j + 1) & 3], &p))
        pts[n++] = p;
    }
  for (int i = 0; i < 4; ++i) {
    if (point_in_quad(ca[i], cb)) pts[n++] = ca[i];
    if (point_in_quad(cb[i], ca)) pts[n++] = cb[i];
  }
  if (n < 3) return 0.0;
  Pt center{0, 0};
  for (int i = 0; i < n; ++i) {
    center.x += pts[i].x;
    center.y += pts[i].y;
  }
  center.x /= n;
  center.y /= n;
  double angs[24];
  for (int i = 0; i < n; ++i)
    angs[i] = std::atan2(pts[i].y - center.y, pts[i].x - center.x);
  int order[24];
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order, order + n,
            [&](int a, int b) { return angs[a] < angs[b]; });
  double area = 0.0;
  for (int i = 0; i < n; ++i) {
    const Pt& p = pts[order[i]];
    const Pt& q = pts[order[(i + 1) % n]];
    area += p.x * q.y - q.x * p.y;
  }
  return std::fabs(area) / 2.0;
}

}  // namespace

extern "C" {

// boxes (N,5) x qboxes (K,5) -> out (N,K) intersection areas
void ws3d_rotated_inter_area(const double* boxes, int64_t n,
                             const double* qboxes, int64_t k, double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < k; ++j)
      out[i * k + j] = rect_inter_area(boxes + i * 5, qboxes + j * 5);
}

// rotate_iou_gpu_eval criteria: -1 IoU, 0 inter/area1, 1 inter/area2,
// else raw intersection
void ws3d_rotate_iou_eval(const double* boxes, int64_t n,
                          const double* qboxes, int64_t k, int criterion,
                          double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double a1 = boxes[i * 5 + 2] * boxes[i * 5 + 3];
    for (int64_t j = 0; j < k; ++j) {
      const double a2 = qboxes[j * 5 + 2] * qboxes[j * 5 + 3];
      const double inter = rect_inter_area(boxes + i * 5, qboxes + j * 5);
      double ua;
      switch (criterion) {
        case -1: ua = a1 + a2 - inter; break;
        case 0: ua = a1; break;
        case 1: ua = a2; break;
        default: out[i * k + j] = inter; continue;
      }
      out[i * k + j] = inter / std::max(ua, EPS);
    }
  }
}

// Greedy NMS over a precomputed (n, n) pairwise metric in score order:
// keep[i] = 1 iff no kept j < i has pair[j, i] > thresh.
// Equivalent of the host sweep in iou3d.cpp:73-120 over the bitmask matrix.
void ws3d_greedy_nms(const double* pair, int64_t n, double thresh,
                     const uint8_t* valid, uint8_t* keep) {
  for (int64_t i = 0; i < n; ++i) {
    keep[i] = valid[i];
    if (!keep[i]) continue;
    for (int64_t j = 0; j < i; ++j) {
      if (keep[j] && pair[j * n + i] > thresh) {
        keep[i] = 0;
        break;
      }
    }
  }
}

}  // extern "C"
