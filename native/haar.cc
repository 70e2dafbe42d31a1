// First-party Viola-Jones pyramid scan — the hot loop of the Haar face
// detector (data/haar.py). Capability parity with the evaluation semantics
// of OpenCV's CascadeClassifier::detectMultiScale for stump HAAR cascades
// (the reference's fallback detector, app.py:1988-2025): image pyramid with
// a fixed 24x24 window at stride 2, uint64 integral / squared-integral
// images, per-window variance normalization over the (1,1,w-2,h-2)
// normrect, and sum-of-stumps stages with early rejection. Rectangle
// grouping (the cheap part) stays in Python (data/haar.py).
//
// The scan is scalar-per-window with per-stage early exit — the win over
// the vectorized numpy engine is exactly that exit: >95% of windows die in
// the first two stages, and here they cost ~20 feature lookups instead of
// a full-stage broadcast.
//
// Build: g++ -O3 -fPIC -shared -std=c++17 -o build/libhaar.so haar.cc

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// bilinear resize, same sampling as data/haar.py::_resize_bilinear
void resize_bilinear(const float* src, int h, int w, float* dst, int oh,
                     int ow) {
  for (int oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * (float)h / oh - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.f; }
    if (y0 > h - 1) { y0 = h - 1; wy = 0.f; }
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    for (int ox = 0; ox < ow; ++ox) {
      float fx = (ox + 0.5f) * (float)w / ow - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      if (x0 < 0) { x0 = 0; wx = 0.f; }
      if (x0 > w - 1) { x0 = w - 1; wx = 0.f; }
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float top = src[y0 * w + x0] * (1 - wx) + src[y0 * w + x1] * wx;
      float bot = src[y1 * w + x0] * (1 - wx) + src[y1 * w + x1] * wx;
      dst[oy * ow + ox] = top * (1 - wy) + bot * wy;
    }
  }
}

struct Stump {
  int off[3][4];     // flat corner offsets (tl, tr, bl, br) per rect
  double w[3];       // rect weights (0 = unused slot)
  int nrects;
  double thr;
  double leaf0, leaf1;
};

}  // namespace

extern "C" {

// RGB uint8 (H,W,3) → BT.601 gray float32 downscaled to (oh,ow) — the
// full-res prepare step of detect_faces (data/haar.py). Fusing gray+resize
// here keeps the per-frame host cost of the haar serving path ~25 ms at
// 1080p instead of ~60-90 ms through numpy.
void haar_prepare(const uint8_t* rgb, int H, int W, float* out, int oh,
                  int ow) {
  // gray at full res (single pass), then bilinear down
  std::vector<float> gray((size_t)H * W);
  const uint8_t* p = rgb;
  for (size_t i = 0; i < (size_t)H * W; ++i, p += 3)
    gray[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
  resize_bilinear(gray.data(), H, W, out, oh, ow);
}

// Scan the full pyramid of one grayscale image. Appends raw surviving
// windows as (x, y, side) triples in ORIGINAL image coordinates (float).
// Returns the TRUE number of surviving windows (may exceed max_out, in
// which case only the first max_out were written and the caller should
// retry with a larger buffer), or -1 on error.
int haar_scan(const float* gray, int H, int W,
              const int32_t* rects,      // (F,3,4) x,y,w,h in 24x24 units
              const double* weights,     // (F,3)
              const int32_t* feat_idx,   // (T,)
              const double* node_thr,    // (T,)
              const double* leaves,      // (T,2)
              const int32_t* stage_ends, // (S,) cumulative stump counts
              const double* stage_thr,   // (S,)
              int n_stages, int win_w, int win_h, double scale_factor,
              int min_size, int max_size, float* out_xys, int max_out) {
  if (scale_factor <= 1.0 || win_w <= 2 || win_h <= 2) return -1;
  int total_stumps = stage_ends[n_stages - 1];
  int n_out = 0;

  std::vector<float> level;
  std::vector<uint64_t> ii, ii2;
  std::vector<Stump> stumps(total_stumps);

  double factor = min_size > win_w ? (double)min_size / win_w : 1.0;
  const double area = (double)(win_w - 2) * (win_h - 2);

  while (true) {
    int lh = (int)std::lround(H / factor);
    int lw = (int)std::lround(W / factor);
    if (lh < win_h || lw < win_w) break;
    if (max_size > 0 && win_w * factor > max_size) break;

    level.resize((size_t)lh * lw);
    resize_bilinear(gray, H, W, level.data(), lh, lw);

    const int W1 = lw + 1;
    ii.assign((size_t)(lh + 1) * W1, 0);
    ii2.assign((size_t)(lh + 1) * W1, 0);
    for (int y = 0; y < lh; ++y) {
      uint64_t row = 0, row2 = 0;
      for (int x = 0; x < lw; ++x) {
        // rint (round-half-even) matches numpy's np.rint in the fallback
        // engine — keeps the two engines window-for-window identical
        uint32_t v = (uint32_t)(int64_t)std::rint(level[(size_t)y * lw + x]);
        row += v;
        row2 += (uint64_t)v * v;
        ii[(size_t)(y + 1) * W1 + x + 1] = ii[(size_t)y * W1 + x + 1] + row;
        ii2[(size_t)(y + 1) * W1 + x + 1] = ii2[(size_t)y * W1 + x + 1] + row2;
      }
    }

    // flat corner offsets are level-width dependent, so they must be
    // rebuilt per level — but LAZILY, stage by stage, as the first window
    // of the level reaches each stage: >95% of windows die in stages 0-2,
    // so most levels never materialize offsets for the other ~2.8k stumps.
    // (Rebuilding all of them cost ~350 KB of writes per level, which
    // dominated small tracked-ROI scans.)
    int built = 0;
    auto build_to = [&](int end) {
      for (int t = built; t < end; ++t) {
        const int32_t* r = rects + (size_t)feat_idx[t] * 12;
        const double* w = weights + (size_t)feat_idx[t] * 3;
        Stump& s = stumps[t];
        s.nrects = 0;
        for (int j = 0; j < 3; ++j) {
          if (w[j] == 0.0) continue;
          int x = r[j * 4], y = r[j * 4 + 1], rw = r[j * 4 + 2],
              rh = r[j * 4 + 3];
          int k = s.nrects++;
          s.off[k][0] = y * W1 + x;
          s.off[k][1] = y * W1 + x + rw;
          s.off[k][2] = (y + rh) * W1 + x;
          s.off[k][3] = (y + rh) * W1 + x + rw;
          s.w[k] = w[j];
        }
        s.thr = node_thr[t];
        s.leaf0 = leaves[t * 2];
        s.leaf1 = leaves[t * 2 + 1];
      }
      built = end;
    };

    const uint64_t* iid = ii.data();
    const uint64_t* ii2d = ii2.data();
    for (int y = 0; y + win_h <= lh; y += 2) {
      for (int x = 0; x + win_w <= lw; x += 2) {
        const size_t o = (size_t)y * W1 + x;
        // variance normalization over normrect (1,1,w-2,h-2)
        const size_t n1 = o + W1 + 1;
        const int nw = win_w - 2, nh = win_h - 2;
        uint64_t s1 = iid[n1 + (size_t)nh * W1 + nw] - iid[n1 + nw] -
                      iid[n1 + (size_t)nh * W1] + iid[n1];
        uint64_t s2 = ii2d[n1 + (size_t)nh * W1 + nw] - ii2d[n1 + nw] -
                      ii2d[n1 + (size_t)nh * W1] + ii2d[n1];
        double nf2 = area * (double)s2 - (double)s1 * (double)s1;
        double inv_nf = nf2 > 0 ? 1.0 / std::sqrt(nf2) : 1.0;

        bool alive = true;
        int t = 0;
        for (int si = 0; si < n_stages && alive; ++si) {
          double acc = 0.0;
          const int end = stage_ends[si];
          if (end > built) build_to(end);
          for (; t < end; ++t) {
            const Stump& s = stumps[t];
            double v = 0.0;
            for (int k = 0; k < s.nrects; ++k) {
              uint64_t rs = iid[o + s.off[k][3]] - iid[o + s.off[k][1]] -
                            iid[o + s.off[k][2]] + iid[o + s.off[k][0]];
              v += (double)rs * s.w[k];
            }
            acc += (v * inv_nf < s.thr) ? s.leaf0 : s.leaf1;
          }
          alive = acc >= stage_thr[si];
        }
        if (alive) {
          if (n_out < max_out) {
            out_xys[n_out * 3] = (float)(x * factor);
            out_xys[n_out * 3 + 1] = (float)(y * factor);
            out_xys[n_out * 3 + 2] = (float)(win_w * factor);
          }
          ++n_out;
        }
      }
    }
    factor *= scale_factor;
  }
  return n_out;
}

}  // extern "C"
