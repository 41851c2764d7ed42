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
#include <vector>

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

// ---------------------------------------------------------------------------
// KITTI AP statistics (port of compute_statistics_jit,
// tools/kitti_object_eval_python/eval.py:156-273 — numba there, C++ here).
// ---------------------------------------------------------------------------

namespace {

constexpr double NO_DETECTION = -10000000.0;

struct Stats {
  int64_t tp, fp, fn;
  double similarity;
};

// overlaps: (det_size, gt_size) row-major; gt_data (gt,5) [bbox4, alpha];
// dt_data (dt,6) [bbox4, alpha, score]; dc (n_dc, 4)
Stats compute_statistics(const double* overlaps, const double* gt_data,
                         int64_t gt_size, const double* dt_data,
                         int64_t det_size, const int64_t* ignored_gt,
                         const int64_t* ignored_det, const double* dc,
                         int64_t n_dc, int metric, double min_overlap,
                         double thresh, bool compute_fp, bool compute_aos,
                         double* out_thresholds, int64_t* n_thresh) {
  std::vector<char> assigned(det_size, 0);
  std::vector<char> ignored_threshold(det_size, 0);
  if (compute_fp) {
    for (int64_t j = 0; j < det_size; ++j)
      if (dt_data[j * 6 + 5] < thresh) ignored_threshold[j] = 1;
  }
  Stats st{0, 0, 0, 0.0};
  std::vector<double> delta;
  *n_thresh = 0;
  for (int64_t i = 0; i < gt_size; ++i) {
    if (ignored_gt[i] == -1) continue;
    int64_t det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0.0;
    bool assigned_ignored_det = false;
    for (int64_t j = 0; j < det_size; ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j])
        continue;
      const double overlap = overlaps[j * gt_size + i];
      const double dt_score = dt_data[j * 6 + 5];
      if (!compute_fp && overlap > min_overlap && dt_score > valid_detection) {
        det_idx = j;
        valid_detection = dt_score;
      } else if (compute_fp && overlap > min_overlap
                 && (overlap > max_overlap || assigned_ignored_det)
                 && ignored_det[j] == 0) {
        max_overlap = overlap;
        det_idx = j;
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp && overlap > min_overlap
                 && valid_detection == NO_DETECTION && ignored_det[j] == 1) {
        det_idx = j;
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }
    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      st.fn += 1;
    } else if (valid_detection != NO_DETECTION
               && (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = 1;
    } else if (valid_detection != NO_DETECTION) {
      st.tp += 1;
      out_thresholds[(*n_thresh)++] = dt_data[det_idx * 6 + 5];
      if (compute_aos)
        delta.push_back(gt_data[i * 5 + 4] - dt_data[det_idx * 6 + 4]);
      assigned[det_idx] = 1;
    }
  }
  if (compute_fp) {
    for (int64_t j = 0; j < det_size; ++j)
      if (!(assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1
            || ignored_threshold[j]))
        st.fp += 1;
    int64_t nstuff = 0;
    if (metric == 0 && n_dc > 0) {
      for (int64_t i = 0; i < n_dc; ++i) {
        for (int64_t j = 0; j < det_size; ++j) {
          if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1
              || ignored_threshold[j])
            continue;
          // image_box_overlap criterion 0 (inter / det area)
          const double* db = dt_data + j * 6;
          const double* dcb = dc + i * 4;
          const double iw = std::min(db[2], dcb[2]) - std::max(db[0], dcb[0]);
          const double ih = std::min(db[3], dcb[3]) - std::max(db[1], dcb[1]);
          if (iw > 0 && ih > 0) {
            const double area = (db[2] - db[0]) * (db[3] - db[1]);
            if (iw * ih / area > min_overlap) {
              assigned[j] = 1;
              nstuff += 1;
            }
          }
        }
      }
    }
    st.fp -= nstuff;
    if (compute_aos) {
      st.similarity = 0.0;
      for (double d : delta) st.similarity += (1.0 + std::cos(d)) / 2.0;
      if (st.tp == 0 && st.fp == 0) st.similarity = -1.0;
    }
  }
  return st;
}

}  // namespace

extern "C" {

// Single-frame statistics. Returns tp/fp/fn/sim via out array [4];
// thresholds written to out_thresholds (size >= gt_size), count in n_thresh.
void ws3d_compute_statistics(const double* overlaps, const double* gt_data,
                             int64_t gt_size, const double* dt_data,
                             int64_t det_size, const int64_t* ignored_gt,
                             const int64_t* ignored_det, const double* dc,
                             int64_t n_dc, int metric, double min_overlap,
                             double thresh, int compute_fp, int compute_aos,
                             double* out4, double* out_thresholds,
                             int64_t* n_thresh) {
  Stats st = compute_statistics(overlaps, gt_data, gt_size, dt_data, det_size,
                                ignored_gt, ignored_det, dc, n_dc, metric,
                                min_overlap, thresh, compute_fp != 0,
                                compute_aos != 0, out_thresholds, n_thresh);
  out4[0] = (double)st.tp;
  out4[1] = (double)st.fp;
  out4[2] = (double)st.fn;
  out4[3] = st.similarity;
}

// Fused pr-table accumulation over one frame for all thresholds
// (fused_compute_statistics, eval.py:286-332). pr is (n_thresholds, 4).
void ws3d_fused_statistics(const double* overlaps, const double* gt_data,
                           int64_t gt_size, const double* dt_data,
                           int64_t det_size, const int64_t* ignored_gt,
                           const int64_t* ignored_det, const double* dc,
                           int64_t n_dc, int metric, double min_overlap,
                           const double* thresholds, int64_t n_thresholds,
                           int compute_aos, double* pr) {
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < n_thresholds; ++t) {
    std::vector<double> th(std::max<int64_t>(gt_size, 1));
    int64_t n = 0;
    Stats st = compute_statistics(overlaps, gt_data, gt_size, dt_data,
                                  det_size, ignored_gt, ignored_det, dc, n_dc,
                                  metric, min_overlap, thresholds[t], true,
                                  compute_aos != 0, th.data(), &n);
    pr[t * 4 + 0] += (double)st.tp;
    pr[t * 4 + 1] += (double)st.fp;
    pr[t * 4 + 2] += (double)st.fn;
    if (st.similarity != -1.0) pr[t * 4 + 3] += st.similarity;
  }
}

}  // extern "C"
