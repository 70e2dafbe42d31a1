// First-party Viola-Jones pyramid scan — the hot loop of the Haar face
// detector (data/haar.py). Capability parity with the evaluation semantics
// of OpenCV's CascadeClassifier::detectMultiScale for stump HAAR cascades
// (the reference's fallback detector, app.py:1988-2025): image pyramid with
// a fixed 24x24 window at stride 2, uint64 integral / squared-integral
// images, per-window variance normalization over the (1,1,w-2,h-2)
// normrect, and sum-of-stumps stages with early rejection. Rectangle
// grouping (the cheap part) stays in Python (data/haar.py).
//
// Two scan engines share the stage/stump data:
//  * scalar-per-window with per-stage early exit — >95% of windows die in
//    the first two stages at ~20 feature lookups each;
//  * AVX-512 8-window groups (r5): windows in a row sit at x stride 2, so
//    each integral-image corner for 8 adjacent windows is an even-lane
//    extraction from 16 consecutive uint64 (2 loads + 1 vpermt2q — no
//    gathers), evaluated as 8 double lanes with a group-alive mask and
//    group-level early exit. Every FP op (mul-then-add, no FMA; IEEE
//    sqrt/div) matches the scalar engine's sequence, so the two engines
//    are bit-identical window-for-window (cross-checked in test_haar.py
//    alongside the numpy engine). HAAR_SIMD=0 forces the scalar path.
//
// Build: g++ -O3 -fPIC -shared -std=c++17 -o build/libhaar.so haar.cc
// (the AVX-512 body carries a target attribute + cpuid dispatch, so the
// baseline build stays runnable on any x86-64.)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(__x86_64__) || defined(_M_X64)
#include <immintrin.h>
#define HAAR_HAVE_AVX512_BUILD 1
#endif

namespace {

bool use_avx512();  // defined below (cpuid + HAAR_SIMD env gate)

#ifdef HAAR_HAVE_AVX512_BUILD
// one output row of the LUT-driven bilinear resize: f32 gathers (exact
// 4-byte elements — no over-read), mul/add in the same order as the scalar
// loop (no FMA contraction), so output is bit-identical.
__attribute__((target("avx512f"))) void resize_row_avx512(
    const float* r0, const float* r1, const int* lx0, const int* lx1,
    const float* lwx, float wy, float* d, int n) {
  const __m512 one = _mm512_set1_ps(1.f);
  const __m512 vwy = _mm512_set1_ps(wy);
  const __m512 vwy1 = _mm512_set1_ps(1.f - wy);
  int ox = 0;
  for (; ox + 16 <= n; ox += 16) {
    __m512i i0 = _mm512_loadu_si512((const void*)(lx0 + ox));
    __m512i i1 = _mm512_loadu_si512((const void*)(lx1 + ox));
    __m512 wx = _mm512_loadu_ps(lwx + ox);
    __m512 wx1 = _mm512_sub_ps(one, wx);
    __m512 t0 = _mm512_i32gather_ps(i0, r0, 4);
    __m512 t1 = _mm512_i32gather_ps(i1, r0, 4);
    __m512 b0 = _mm512_i32gather_ps(i0, r1, 4);
    __m512 b1 = _mm512_i32gather_ps(i1, r1, 4);
    __m512 top = _mm512_add_ps(_mm512_mul_ps(t0, wx1), _mm512_mul_ps(t1, wx));
    __m512 bot = _mm512_add_ps(_mm512_mul_ps(b0, wx1), _mm512_mul_ps(b1, wx));
    _mm512_storeu_ps(d + ox,
                     _mm512_add_ps(_mm512_mul_ps(top, vwy1),
                                   _mm512_mul_ps(bot, vwy)));
  }
  for (; ox < n; ++ox) {
    float wx = lwx[ox];
    float top = r0[lx0[ox]] * (1 - wx) + r0[lx1[ox]] * wx;
    float bot = r1[lx0[ox]] * (1 - wx) + r1[lx1[ox]] * wx;
    d[ox] = top * (1 - wy) + bot * wy;
  }
}
#endif

// bilinear resize, same sampling as data/haar.py::_resize_bilinear.
// The horizontal floor/clamp is hoisted into per-call LUTs (the per-pixel
// expression is unchanged, so output is bit-identical to the naive loop).
void resize_bilinear(const float* src, int h, int w, float* dst, int oh,
                     int ow) {
  thread_local std::vector<int> lx0, lx1;
  thread_local std::vector<float> lwx;
  lx0.resize(ow);
  lx1.resize(ow);
  lwx.resize(ow);
  for (int ox = 0; ox < ow; ++ox) {
    float fx = (ox + 0.5f) * (float)w / ow - 0.5f;
    int a = (int)std::floor(fx);
    float t = fx - a;
    if (a < 0) { a = 0; t = 0.f; }
    if (a > w - 1) { a = w - 1; t = 0.f; }
    lx0[ox] = a;
    lx1[ox] = a + 1 < w ? a + 1 : w - 1;
    lwx[ox] = t;
  }
#ifdef HAAR_HAVE_AVX512_BUILD
  const bool simd = use_avx512();
#endif
  for (int oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * (float)h / oh - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.f; }
    if (y0 > h - 1) { y0 = h - 1; wy = 0.f; }
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    const float* r0 = src + (size_t)y0 * w;
    const float* r1 = src + (size_t)y1 * w;
    float* d = dst + (size_t)oy * ow;
#ifdef HAAR_HAVE_AVX512_BUILD
    if (simd) {
      resize_row_avx512(r0, r1, lx0.data(), lx1.data(), lwx.data(), wy, d,
                        ow);
      continue;
    }
#endif
    for (int ox = 0; ox < ow; ++ox) {
      float wx = lwx[ox];
      float top = r0[lx0[ox]] * (1 - wx) + r0[lx1[ox]] * wx;
      float bot = r1[lx0[ox]] * (1 - wx) + r1[lx1[ox]] * wx;
      d[ox] = top * (1 - wy) + bot * wy;
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

// Lazy per-level stump-offset builder (flat corner offsets depend on the
// level width). Built stage by stage as the first window of the level
// reaches each stage: >95% of windows die in stages 0-2, so most levels
// never materialize offsets for the other ~2.8k stumps.
struct StumpBuilder {
  std::vector<Stump>& stumps;
  const int32_t* rects;
  const double* weights;
  const int32_t* feat_idx;
  const double* node_thr;
  const double* leaves;
  int W1;
  int built = 0;

  void build_to(int end) {
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
  }
};

#ifdef HAAR_HAVE_AVX512_BUILD

// 8 even-index uint64 starting at p: lanes p[0], p[2], ..., p[14] — the 8
// adjacent windows' values for one integral-image corner (x stride 2).
__attribute__((target("avx512f,avx512dq"))) static inline __m512i
load_even8(const uint64_t* p) {
  const __m512i idx = _mm512_setr_epi64(0, 2, 4, 6, 8, 10, 12, 14);
  __m512i a = _mm512_loadu_si512((const void*)p);
  __m512i b = _mm512_loadu_si512((const void*)(p + 8));
  return _mm512_permutex2var_epi64(a, idx, b);
}

// rect sum for 8 windows: br - tr - bl + tl in exact uint64 arithmetic
// (matches the scalar engine), converted to double once at the end.
__attribute__((target("avx512f,avx512dq"))) static inline __m512d
rect_sum8(const uint64_t* base, const int off[4]) {
  __m512i tl = load_even8(base + off[0]);
  __m512i tr = load_even8(base + off[1]);
  __m512i bl = load_even8(base + off[2]);
  __m512i br = load_even8(base + off[3]);
  __m512i rs = _mm512_add_epi64(_mm512_sub_epi64(br, tr),
                                _mm512_sub_epi64(tl, bl));
  return _mm512_cvtepu64_pd(rs);
}

// Evaluate the cascade for one group of <=8 adjacent windows (row y, first
// window x0, lane i = window x0 + 2i). Appends survivors to out_xys in
// lane (= x) order. Returns the updated n_out (true count; writes capped
// at max_out like the scalar engine).
__attribute__((target("avx512f,avx512dq"))) static int eval_group8(
    const uint64_t* iid, const uint64_t* ii2d, StumpBuilder& sb,
    const std::vector<Stump>& stumps, const int32_t* stage_ends,
    const double* stage_thr, int n_stages, int win_w, int win_h, int W1,
    double area, int y, int x0, int nwin, double factor, float* out_xys,
    int max_out, int n_out) {
  const size_t o = (size_t)y * W1 + x0;
  __mmask8 alive = (__mmask8)((1u << nwin) - 1u);

  // variance normalization over the (1,1,w-2,h-2) normrect
  const size_t n1 = o + W1 + 1;
  const int nw = win_w - 2, nh = win_h - 2;
  const int noff[4] = {0, nw, nh * W1, nh * W1 + nw};
  __m512d s1 = rect_sum8(iid + n1, noff);
  __m512d s2 = rect_sum8(ii2d + n1, noff);
  __m512d nf2 = _mm512_sub_pd(_mm512_mul_pd(_mm512_set1_pd(area), s2),
                              _mm512_mul_pd(s1, s1));
  __m512d ones = _mm512_set1_pd(1.0);
  __mmask8 pos = _mm512_cmp_pd_mask(nf2, _mm512_setzero_pd(), _CMP_GT_OQ);
  // masked sqrt+div: lanes with nf2<=0 keep inv_nf=1.0 (scalar semantics)
  __m512d inv_nf = _mm512_mask_div_pd(
      ones, pos, ones, _mm512_mask_sqrt_pd(ones, pos, nf2));

  int t = 0;
  for (int si = 0; si < n_stages; ++si) {
    const int end = stage_ends[si];
    if (end > sb.built) sb.build_to(end);
    __m512d acc = _mm512_setzero_pd();
    for (; t < end; ++t) {
      const Stump& s = stumps[t];
      __m512d v = _mm512_setzero_pd();
      for (int k = 0; k < s.nrects; ++k)
        v = _mm512_add_pd(
            v, _mm512_mul_pd(rect_sum8(iid + o, s.off[k]),
                             _mm512_set1_pd(s.w[k])));
      __mmask8 lt = _mm512_cmp_pd_mask(_mm512_mul_pd(v, inv_nf),
                                       _mm512_set1_pd(s.thr), _CMP_LT_OQ);
      acc = _mm512_add_pd(
          acc, _mm512_mask_blend_pd(lt, _mm512_set1_pd(s.leaf1),
                                    _mm512_set1_pd(s.leaf0)));
    }
    alive &= _mm512_cmp_pd_mask(acc, _mm512_set1_pd(stage_thr[si]),
                                _CMP_GE_OQ);
    if (!alive) return n_out;
  }
  for (int i = 0; i < nwin; ++i) {
    if (!(alive & (1u << i))) continue;
    if (n_out < max_out) {
      out_xys[n_out * 3] = (float)((x0 + 2 * i) * factor);
      out_xys[n_out * 3 + 1] = (float)(y * factor);
      out_xys[n_out * 3 + 2] = (float)(win_w * factor);
    }
    ++n_out;
  }
  return n_out;
}

#endif  // HAAR_HAVE_AVX512_BUILD

bool use_avx512() {
#ifdef HAAR_HAVE_AVX512_BUILD
  static const bool hw = __builtin_cpu_supports("avx512f") &&
                         __builtin_cpu_supports("avx512dq") != 0;
  if (!hw) return false;
  // env read per call (not cached) so tests can A/B the engines in-process
  const char* e = getenv("HAAR_SIMD");
  return !(e && e[0] == '0');
#else
  return false;
#endif
}

#ifdef HAAR_HAVE_AVX512_BUILD
// float row → round-half-even uint32 (cvtps2dq in the default rounding
// mode IS rint — identical to the scalar std::rint conversion)
__attribute__((target("avx512f"))) void convert_row_avx512(const float* src,
                                                           uint32_t* dst,
                                                           int n) {
  int i = 0;
  for (; i + 16 <= n; i += 16)
    _mm512_storeu_si512((void*)(dst + i),
                        _mm512_cvtps_epi32(_mm512_loadu_ps(src + i)));
  for (; i < n; ++i) dst[i] = (uint32_t)(int64_t)std::rint(src[i]);
}
#endif

void convert_row(const float* src, uint32_t* dst, int n) {
#ifdef HAAR_HAVE_AVX512_BUILD
  if (use_avx512()) {
    convert_row_avx512(src, dst, n);
    return;
  }
#endif
  for (int i = 0; i < n; ++i) dst[i] = (uint32_t)(int64_t)std::rint(src[i]);
}

}  // namespace

extern "C" {

// exported for videodec.cc (linked into libvideodec.so): the coarse
// acquisition downscale shares this engine so it rides the same SIMD path
void haar_resize_f32(const float* src, int h, int w, float* dst, int oh,
                     int ow) {
  resize_bilinear(src, h, w, dst, oh, ow);
}

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

  // thread_local: the serving path scans per tracked frame — reallocating
  // (and value-zeroing) ~350 KB of buffers per scan dominated small-ROI
  // scans once the window evaluation went SIMD (r5)
  thread_local std::vector<float> level;
  thread_local std::vector<uint64_t> ii, ii2;
  thread_local std::vector<uint32_t> rowtmp;
  thread_local std::vector<Stump> stumps;
  if ((int)stumps.size() < total_stumps) stumps.resize(total_stumps);

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
    // +32 element pad: the AVX-512 group loader reads 16 consecutive
    // uint64 starting up to 14 lanes past the last window's corner.
    // Only row 0, column 0 and the pad are zeroed — the prefix pass
    // overwrites everything else.
    const size_t need = (size_t)(lh + 1) * W1 + 32;
    if (ii.size() < need) ii.resize(need);
    if (ii2.size() < need) ii2.resize(need);
    rowtmp.resize(lw);
    std::memset(ii.data(), 0, sizeof(uint64_t) * W1);
    std::memset(ii2.data(), 0, sizeof(uint64_t) * W1);
    std::memset(ii.data() + need - 32, 0, sizeof(uint64_t) * 32);
    std::memset(ii2.data() + need - 32, 0, sizeof(uint64_t) * 32);
    for (int y = 0; y < lh; ++y) {
      // rint (round-half-even) matches numpy's np.rint in the fallback
      // engine — keeps the engines window-for-window identical
      convert_row(level.data() + (size_t)y * lw, rowtmp.data(), lw);
      uint64_t row = 0, row2 = 0;
      const uint64_t* pi = ii.data() + (size_t)y * W1;
      const uint64_t* pi2 = ii2.data() + (size_t)y * W1;
      uint64_t* ci = ii.data() + (size_t)(y + 1) * W1;
      uint64_t* ci2 = ii2.data() + (size_t)(y + 1) * W1;
      ci[0] = 0;
      ci2[0] = 0;
      for (int x = 0; x < lw; ++x) {
        uint32_t v = rowtmp[x];
        row += v;
        row2 += (uint64_t)v * v;
        ci[x + 1] = pi[x + 1] + row;
        ci2[x + 1] = pi2[x + 1] + row2;
      }
    }

    StumpBuilder sb{stumps, rects, weights, feat_idx, node_thr, leaves, W1};
    const uint64_t* iid = ii.data();
    const uint64_t* ii2d = ii2.data();
    const int nx = (lw - win_w) / 2 + 1;  // windows per row at x stride 2
    const bool simd = use_avx512();
    for (int y = 0; y + win_h <= lh; y += 2) {
#ifdef HAAR_HAVE_AVX512_BUILD
      if (simd) {
        for (int g = 0; g < nx; g += 8)
          n_out = eval_group8(iid, ii2d, sb, stumps, stage_ends, stage_thr,
                              n_stages, win_w, win_h, W1, area, y, 2 * g,
                              nx - g < 8 ? nx - g : 8, factor, out_xys,
                              max_out, n_out);
        continue;
      }
#endif
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
          if (end > sb.built) sb.build_to(end);
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
