// LSD-style line segment detector (native host component).
//
// The reference's line extraction is C++ (cv::line_descriptor::LSDDetector
// wrapped by src/LineExtractor.cc). This is a from-scratch implementation of
// the same gradient/region-growing approach (von Gioi et al.'s LSD, with the
// NFA validation replaced by an aligned-point density check, as in EDLines):
//
//   1. 2x2 image gradients; level-line angle = atan2(gx, -gy).
//   2. Pseudo-ordering of seeds by gradient magnitude (bucket sort).
//   3. Region growing over pixels whose level-line angle stays within
//      `angle_tol` of the running region direction.
//   4. Magnitude-weighted rectangle fit (centroid + second moments);
//      endpoints from the extreme projections on the principal axis.
//   5. Accept if aligned-point density and minimum length pass.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr float kPi = 3.14159265358979323846f;

inline float angle_diff(float a, float b) {
  // difference of level-line angles, modulo pi (lines are unoriented)
  float d = std::fabs(a - b);
  while (d > kPi) d -= kPi;
  return std::min(d, kPi - d);
}

struct Region {
  std::vector<int> px;  // linear pixel indices
  float angle = 0.f;    // running direction (level-line angle)
  float sx = 0.f, sy = 0.f;  // direction accumulator (unit vectors, mod pi)
};

}  // namespace

extern "C" {

// img: float32 row-major [h, w] in 0..255.
// out_segs: capacity * 4 floats (x1, y1, x2, y2), sorted by length desc.
// Returns the number of segments written.
int lsd_detect(const float* img, int h, int w, float* out_segs, int capacity,
               float min_len, float angle_tol_deg, float density_th,
               float grad_th) {
  if (h < 8 || w < 8 || capacity <= 0) return 0;
  const int n = h * w;
  std::vector<float> mag(n, 0.f), ang(n, 0.f);
  std::vector<uint8_t> used(n, 1);  // border stays "used"

  // 2x2 gradients (as in the original LSD)
  for (int y = 0; y < h - 1; ++y) {
    for (int x = 0; x < w - 1; ++x) {
      const int i = y * w + x;
      const float a = img[i], b = img[i + 1], c = img[i + w], d = img[i + w + 1];
      const float gx = 0.5f * ((b + d) - (a + c));
      const float gy = 0.5f * ((c + d) - (a + b));
      mag[i] = std::sqrt(gx * gx + gy * gy);
      ang[i] = std::atan2(gx, -gy);  // level-line angle
      used[i] = mag[i] > grad_th ? 0 : 1;
    }
  }

  // pseudo-sort seeds by magnitude: 1024 buckets, strongest first
  constexpr int kBuckets = 1024;
  float max_mag = 0.f;
  for (int i = 0; i < n; ++i) max_mag = std::max(max_mag, mag[i]);
  if (max_mag <= 0.f) return 0;
  std::vector<std::vector<int>> buckets(kBuckets);
  for (int i = 0; i < n; ++i) {
    if (used[i]) continue;
    int b = static_cast<int>(mag[i] / max_mag * (kBuckets - 1));
    buckets[b].push_back(i);
  }

  const float tol = angle_tol_deg * kPi / 180.f;
  struct Seg { float x1, y1, x2, y2, len; };
  std::vector<Seg> segs;
  std::vector<int> stack;
  Region reg;

  for (int b = kBuckets - 1; b >= 0; --b) {
    for (int seed : buckets[b]) {
      if (used[seed]) continue;
      // --- region grow ---
      reg.px.clear();
      reg.sx = std::cos(ang[seed]);
      reg.sy = std::sin(ang[seed]);
      reg.angle = ang[seed];
      stack.clear();
      stack.push_back(seed);
      used[seed] = 1;
      while (!stack.empty()) {
        const int p = stack.back();
        stack.pop_back();
        reg.px.push_back(p);
        const int py = p / w, px = p % w;
        for (int dy = -1; dy <= 1; ++dy) {
          for (int dx = -1; dx <= 1; ++dx) {
            const int qy = py + dy, qx = px + dx;
            if (qy < 0 || qy >= h || qx < 0 || qx >= w) continue;
            const int q = qy * w + qx;
            if (used[q]) continue;
            if (angle_diff(ang[q], reg.angle) > tol) continue;
            used[q] = 1;
            stack.push_back(q);
            // update running direction (angles doubled to handle mod pi)
            reg.sx += std::cos(ang[q]);
            reg.sy += std::sin(ang[q]);
            reg.angle = std::atan2(reg.sy, reg.sx);
          }
        }
      }
      if (static_cast<int>(reg.px.size()) < 16) continue;

      // --- magnitude-weighted rectangle fit ---
      double swt = 0, cx = 0, cy = 0;
      for (int p : reg.px) {
        const double wgt = mag[p];
        swt += wgt;
        cx += wgt * (p % w);
        cy += wgt * (p / w);
      }
      cx /= swt;
      cy /= swt;
      double ixx = 0, iyy = 0, ixy = 0;
      for (int p : reg.px) {
        const double wgt = mag[p];
        const double dx = (p % w) - cx, dy = (p / w) - cy;
        ixx += wgt * dx * dx;
        iyy += wgt * dy * dy;
        ixy += wgt * dx * dy;
      }
      // principal axis of the scatter matrix
      const double theta = 0.5 * std::atan2(2.0 * ixy, ixx - iyy);
      const double dxu = std::cos(theta), dyu = std::sin(theta);
      double tmin = 1e18, tmax = -1e18, nmax = 0;
      for (int p : reg.px) {
        const double dx = (p % w) - cx, dy = (p / w) - cy;
        const double t = dx * dxu + dy * dyu;
        const double nn = std::fabs(-dx * dyu + dy * dxu);
        tmin = std::min(tmin, t);
        tmax = std::max(tmax, t);
        nmax = std::max(nmax, nn);
      }
      const float len = static_cast<float>(tmax - tmin);
      if (len < min_len) continue;
      const float width = static_cast<float>(std::max(2.0 * nmax, 1.0));
      const float density = static_cast<float>(reg.px.size()) / (len * width);
      if (density < density_th) continue;

      Seg s;
      s.x1 = static_cast<float>(cx + tmin * dxu);
      s.y1 = static_cast<float>(cy + tmin * dyu);
      s.x2 = static_cast<float>(cx + tmax * dxu);
      s.y2 = static_cast<float>(cy + tmax * dyu);
      s.len = len;
      segs.push_back(s);
    }
  }

  std::sort(segs.begin(), segs.end(),
            [](const Seg& a, const Seg& b) { return a.len > b.len; });
  const int m = std::min<int>(segs.size(), capacity);
  for (int i = 0; i < m; ++i) {
    out_segs[i * 4 + 0] = segs[i].x1;
    out_segs[i * 4 + 1] = segs[i].y1;
    out_segs[i * 4 + 2] = segs[i].x2;
    out_segs[i * 4 + 3] = segs[i].y2;
  }
  return m;
}

}  // extern "C"
