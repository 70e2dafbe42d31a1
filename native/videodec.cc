// TPU-host video decode runtime.
//
// Replaces the reference's imageio/opencv frame sampler
// (`src/utils.py:19-93` sample_video_frames) with a native C++ decoder on
// libavformat/libavcodec/libswscale. Designed for the serving/prep hot loop
// (SURVEY.md §3.1/§3.5): decode every Nth frame up to max_frames, optionally
// swscale straight to the target resolution + RGB24, writing into a
// caller-provided buffer (numpy array) with zero Python-side copies.
//
// Frame-level decoder threading is enabled (thread_count=0 → auto); the
// Python wrapper additionally fans out across videos with a thread pool —
// ctypes calls release the GIL so decode overlaps TPU compute.
//
// C ABI only — consumed via ctypes (no pybind11 in the image).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <climits>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Ctx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  int stream_idx = -1;
};

#ifndef AV_FRAME_FLAG_KEY  // pre-6.x libavutil
#define AV_FRAME_FLAG_KEY 0
inline bool frame_is_key(const AVFrame* f) { return f->key_frame != 0; }
#else
inline bool frame_is_key(const AVFrame* f) {
  return (f->flags & AV_FRAME_FLAG_KEY) != 0;
}
#endif

void close_ctx(Ctx* c) {
  if (!c) return;
  if (c->sws) sws_freeContext(c->sws);
  if (c->dec) avcodec_free_context(&c->dec);
  if (c->fmt) avformat_close_input(&c->fmt);
  delete c;
}

Ctx* open_ctx(const char* path, char* err, int errlen, int threads = 0) {
  Ctx* c = new Ctx();
  int rc = avformat_open_input(&c->fmt, path, nullptr, nullptr);
  if (rc < 0) {
    av_strerror(rc, err, errlen);
    close_ctx(c);
    return nullptr;
  }
  if (avformat_find_stream_info(c->fmt, nullptr) < 0) {
    snprintf(err, errlen, "no stream info");
    close_ctx(c);
    return nullptr;
  }
  const AVCodec* codec = nullptr;
  c->stream_idx =
      av_find_best_stream(c->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (c->stream_idx < 0 || !codec) {
    snprintf(err, errlen, "no video stream");
    close_ctx(c);
    return nullptr;
  }
  c->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(c->dec,
                                c->fmt->streams[c->stream_idx]->codecpar);
  c->dec->thread_count = threads;  // 0 = auto frame/slice threading
  if (avcodec_open2(c->dec, codec, nullptr) < 0) {
    snprintf(err, errlen, "codec open failed");
    close_ctx(c);
    return nullptr;
  }
  return c;
}

// Keyframe-sampling fast path: drop non-key packets at DEMUX (never sent to
// the decoder at all — `dec->skip_frame` alone still parses them), and skip
// the in-loop deblocking filter: detector inputs are downscaled face crops,
// not display frames, so loop-filter fidelity is irrelevant.
void enable_keyframe_fast_path(Ctx* c) {
  c->fmt->streams[c->stream_idx]->discard = AVDISCARD_NONKEY;
  c->dec->skip_frame = AVDISCARD_NONKEY;
  c->dec->skip_loop_filter = AVDISCARD_ALL;
}

// Bytes-per-pixel step of a plane's first component (1 for 8-bit planar;
// 2 for 10/12/16-bit or packed-luma formats) — crop x-offsets are in BYTES.
int plane_bpp(const AVPixFmtDescriptor* desc, int plane) {
  if (!desc) return 1;
  for (int i = 0; i < desc->nb_components; ++i)
    if (desc->comp[i].plane == plane) return std::max(1, desc->comp[i].step);
  return 1;
}

// Compute the per-plane cropped source pointers for sws_scale.
void crop_src_planes(const AVFrame* f, const AVPixFmtDescriptor* desc,
                     int crop_x, int crop_y, const uint8_t* src[4]) {
  for (int p = 0; p < 4; ++p) src[p] = nullptr;
  for (int p = 0; p < 4 && f->data[p]; ++p) {
    int sx = crop_x, sy = crop_y;
    if (p == 1 || p == 2) {  // chroma planes
      sx >>= (desc ? desc->log2_chroma_w : 1);
      sy >>= (desc ? desc->log2_chroma_h : 1);
    }
    src[p] = f->data[p] + (size_t)sy * f->linesize[p] +
             (size_t)sx * plane_bpp(desc, p);
  }
}

}  // namespace

extern "C" {

// Probe container metadata. Returns 0 on success.
int vd_probe(const char* path, int* width, int* height, double* fps,
             int64_t* nframes, char* err, int errlen) {
  Ctx* c = open_ctx(path, err, errlen);
  if (!c) return -1;
  AVStream* st = c->fmt->streams[c->stream_idx];
  *width = c->dec->width;
  *height = c->dec->height;
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  *fps = r.den ? av_q2d(r) : 0.0;
  *nframes = st->nb_frames;  // 0 when the container doesn't record it
  close_ctx(c);
  return 0;
}

// Decode every `sample_rate`-th frame (starting at 0) up to `max_frames`,
// scaled to (out_w, out_h) RGB24, packed into `out` (size must be
// max_frames*out_h*out_w*3). Returns the number of frames written, or -1.
//
// `keyframes_only != 0` switches to keyframe sampling: the decoder skips all
// non-key frames (AVDISCARD_NONKEY) and `sample_rate` counts keyframes. For
// sparse temporal sampling (serving reads ~8 frames of a 300-frame clip)
// this cuts decode work by roughly the GOP size (10-25x) since inter frames
// are never reconstructed.
int vd_sample(const char* path, int sample_rate, int max_frames, int out_w,
              int out_h, int keyframes_only, uint8_t* out, char* err,
              int errlen) {
  if (sample_rate < 1) sample_rate = 1;
  Ctx* c = open_ctx(path, err, errlen);
  if (!c) return -1;
  if (keyframes_only) enable_keyframe_fast_path(c);

  c->sws = sws_getContext(c->dec->width, c->dec->height, c->dec->pix_fmt,
                          out_w, out_h, AV_PIX_FMT_RGB24,
                          SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!c->sws) {
    snprintf(err, errlen, "swscale init failed");
    close_ctx(c);
    return -1;
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t frame_idx = 0;
  int written = 0;
  const int frame_bytes = out_w * out_h * 3;
  bool done = false;

  auto take = [&](AVFrame* f) {
    if (keyframes_only && !frame_is_key(f)) return;  // decoder may ignore
                                                     // skip_frame; filter here
    if (frame_idx % sample_rate == 0 && written < max_frames) {
      uint8_t* dst[1] = {out + (size_t)written * frame_bytes};
      int dst_stride[1] = {out_w * 3};
      sws_scale(c->sws, f->data, f->linesize, 0, c->dec->height, dst,
                dst_stride);
      ++written;
    }
    ++frame_idx;
    if (written >= max_frames) done = true;
  };

  while (!done && av_read_frame(c->fmt, pkt) >= 0) {
    if (pkt->stream_index == c->stream_idx) {
      if (avcodec_send_packet(c->dec, pkt) == 0) {
        while (!done && avcodec_receive_frame(c->dec, frame) == 0) take(frame);
      }
    }
    av_packet_unref(pkt);
  }
  if (!done) {  // flush delayed frames
    avcodec_send_packet(c->dec, nullptr);
    while (!done && avcodec_receive_frame(c->dec, frame) == 0) take(frame);
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  close_ctx(c);
  return written;
}

// Like vd_sample but crops a source rectangle BEFORE scaling — the serving
// path's "center face prior" crop runs here, inside the decode worker, so
// the device receives ready (T, out_h, out_w, 3) batches and the Python
// side does zero per-clip image work. Crop offsets are aligned down to the
// chroma subsampling grid. crop_w/crop_h <= 0 selects the full frame.
int vd_sample_crop(const char* path, int sample_rate, int max_frames,
                   int crop_x, int crop_y, int crop_w, int crop_h, int out_w,
                   int out_h, int keyframes_only, uint8_t* out, char* err,
                   int errlen) {
  if (sample_rate < 1) sample_rate = 1;
  Ctx* c = open_ctx(path, err, errlen);
  if (!c) return -1;
  if (keyframes_only) enable_keyframe_fast_path(c);

  const int W = c->dec->width, H = c->dec->height;
  if (crop_w <= 0 || crop_h <= 0) {
    crop_x = crop_y = 0;
    crop_w = W;
    crop_h = H;
  }
  crop_x = std::max(0, std::min(crop_x, W - 2));
  crop_y = std::max(0, std::min(crop_y, H - 2));
  crop_w = std::min(crop_w, W - crop_x);
  crop_h = std::min(crop_h, H - crop_y);

  const AVPixFmtDescriptor* desc = av_pix_fmt_desc_get(c->dec->pix_fmt);
  // align the crop origin to the chroma grid so plane offsets are exact
  const int align_x = 1 << (desc ? desc->log2_chroma_w : 1);
  const int align_y = 1 << (desc ? desc->log2_chroma_h : 1);
  crop_x -= crop_x % align_x;
  crop_y -= crop_y % align_y;

  // FAST_BILINEAR: ~25% cheaper; downscaling face crops to 224 is not
  // quality-sensitive for the detector
  c->sws = sws_getContext(crop_w, crop_h, c->dec->pix_fmt, out_w, out_h,
                          AV_PIX_FMT_RGB24, SWS_FAST_BILINEAR, nullptr,
                          nullptr, nullptr);
  if (!c->sws) {
    snprintf(err, errlen, "swscale init failed");
    close_ctx(c);
    return -1;
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t frame_idx = 0;
  int written = 0;
  const int frame_bytes = out_w * out_h * 3;
  bool done = false;

  auto take = [&](AVFrame* f) {
    if (keyframes_only && !frame_is_key(f)) return;
    if (frame_idx % sample_rate == 0 && written < max_frames) {
      const uint8_t* src[4];
      crop_src_planes(f, desc, crop_x, crop_y, src);
      uint8_t* dst[1] = {out + (size_t)written * frame_bytes};
      int dst_stride[1] = {out_w * 3};
      sws_scale(c->sws, src, f->linesize, 0, crop_h, dst, dst_stride);
      ++written;
    }
    ++frame_idx;
    if (written >= max_frames) done = true;
  };

  while (!done && av_read_frame(c->fmt, pkt) >= 0) {
    if (pkt->stream_index == c->stream_idx) {
      if (avcodec_send_packet(c->dec, pkt) == 0) {
        while (!done && avcodec_receive_frame(c->dec, frame) == 0) take(frame);
      }
    }
    av_packet_unref(pkt);
  }
  if (!done) {
    avcodec_send_packet(c->dec, nullptr);
    while (!done && avcodec_receive_frame(c->dec, frame) == 0) take(frame);
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  close_ctx(c);
  return written;
}

namespace {

// Shared impl for the seek-based sparse samplers. `yuv_out` selects the
// output packing:
//   0 — packed RGB24, frame stride out_w*out_h*3;
//   1 — planar YUV420P (Y then U then V per frame), frame stride
//       out_w*out_h*3/2. HALF the bytes of RGB24 — built for hosts where
//       the host→device link is the serving bottleneck; the YUV→RGB
//       matrix runs on device where it fuses into normalization.
// center_margin_ppm != kNoCenterCrop: ignore crop_x/y/w/h and crop the
// centered square of side min(W,H)*(1e6-ppm)/1e6 — computed HERE from the
// opened stream's dimensions, so callers skip a separate probe open (one
// open per clip instead of two; ~8% of the per-clip host cost at serving
// shapes). Negative ppm ENLARGES the square (margin < 0 is the caller's
// margin-expansion convention); the box is then clamped to the frame
// bounds below exactly like an explicit out-of-bounds crop.
static const int kNoCenterCrop = INT_MIN;
int seek_sample_impl(const char* path, int n_frames, int crop_x, int crop_y,
                     int crop_w, int crop_h, int out_w, int out_h,
                     int yuv_out, int center_margin_ppm, uint8_t* out,
                     char* err, int errlen) {
  if (n_frames < 1) n_frames = 1;
  if (yuv_out && ((out_w | out_h) & 1)) {
    snprintf(err, errlen, "yuv output size must be even");
    return -1;
  }
  // thread_count=1: frame-threaded decoders delay output by N frames, which
  // defeats seek-decode-one; an intra frame decodes fast single-threaded.
  Ctx* c = open_ctx(path, err, errlen, /*threads=*/1);
  if (!c) return -1;
  enable_keyframe_fast_path(c);

  AVStream* st = c->fmt->streams[c->stream_idx];
  int64_t start = st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  int64_t dur = st->duration;
  if (dur == AV_NOPTS_VALUE || dur <= 0) {
    if (c->fmt->duration > 0)
      dur = av_rescale_q(c->fmt->duration, AV_TIME_BASE_Q, st->time_base);
    else
      dur = 0;
  }
  bool seekable = dur > 0;

  const int W = c->dec->width, H = c->dec->height;
  if (center_margin_ppm != kNoCenterCrop) {
    const int side =
        (int)((int64_t)std::min(W, H) * (1000000 - (int64_t)center_margin_ppm) /
              1000000);
    crop_w = crop_h = std::max(2, side);
    crop_x = (W - crop_w) / 2;
    crop_y = (H - crop_h) / 2;
  }
  if (crop_w <= 0 || crop_h <= 0) {
    crop_x = crop_y = 0;
    crop_w = W;
    crop_h = H;
  }
  crop_x = std::max(0, std::min(crop_x, W - 2));
  crop_y = std::max(0, std::min(crop_y, H - 2));
  crop_w = std::min(crop_w, W - crop_x);
  crop_h = std::min(crop_h, H - crop_y);
  const AVPixFmtDescriptor* desc = av_pix_fmt_desc_get(c->dec->pix_fmt);
  const int align_x = 1 << (desc ? desc->log2_chroma_w : 1);
  const int align_y = 1 << (desc ? desc->log2_chroma_h : 1);
  crop_x -= crop_x % align_x;
  crop_y -= crop_y % align_y;

  c->sws = sws_getContext(crop_w, crop_h, c->dec->pix_fmt, out_w, out_h,
                          yuv_out ? AV_PIX_FMT_YUV420P : AV_PIX_FMT_RGB24,
                          SWS_FAST_BILINEAR, nullptr, nullptr, nullptr);
  if (!c->sws) {
    snprintf(err, errlen, "swscale init failed");
    close_ctx(c);
    return -1;
  }

  const size_t frame_bytes =
      yuv_out ? (size_t)out_w * out_h * 3 / 2 : (size_t)out_w * out_h * 3;
  int written = 0;

  auto write_frame = [&](AVFrame* f) {
    const uint8_t* src[4];
    crop_src_planes(f, desc, crop_x, crop_y, src);
    uint8_t* base = out + (size_t)written * frame_bytes;
    if (yuv_out) {
      uint8_t* dst[3] = {base, base + (size_t)out_w * out_h,
                         base + (size_t)out_w * out_h +
                             (size_t)(out_w / 2) * (out_h / 2)};
      int dst_stride[3] = {out_w, out_w / 2, out_w / 2};
      sws_scale(c->sws, src, f->linesize, 0, crop_h, dst, dst_stride);
    } else {
      uint8_t* dst[1] = {base};
      int dst_stride[1] = {out_w * 3};
      sws_scale(c->sws, src, f->linesize, 0, crop_h, dst, dst_stride);
    }
    ++written;
  };

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();

  if (seekable) {
    for (int i = 0; i < n_frames; ++i) {
      // midpoints of n equal spans — unbiased coverage of the whole clip
      int64_t target = start + dur * (2 * i + 1) / (2 * n_frames);
      if (av_seek_frame(c->fmt, c->stream_idx, target, AVSEEK_FLAG_BACKWARD) <
          0) {
        seekable = false;
        break;
      }
      avcodec_flush_buffers(c->dec);
      bool got = false;
      // demux discards non-key packets, so the first packet IS the keyframe
      // at/before `target`; cap reads defensively for broken containers.
      for (int reads = 0; !got && reads < 256; ++reads) {
        if (av_read_frame(c->fmt, pkt) < 0) break;
        if (pkt->stream_index != c->stream_idx) {
          av_packet_unref(pkt);
          continue;
        }
        int rc = avcodec_send_packet(c->dec, pkt);
        av_packet_unref(pkt);
        if (rc < 0) continue;
        while (avcodec_receive_frame(c->dec, frame) == 0) {
          if (!got) {
            write_frame(frame);
            got = true;
          }
        }
      }
      if (!got) break;  // EOF past the last keyframe — stop early
    }
  }

  if (written == 0) {
    // no duration, unseekable container, OR seeks that "succeeded" but
    // produced no decodable frame (broken/absent keyframe index after a
    // truncated download): sequential keyframe scan from the start
    av_seek_frame(c->fmt, c->stream_idx, start, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(c->dec);
    bool done = false;
    while (!done && av_read_frame(c->fmt, pkt) >= 0) {
      if (pkt->stream_index == c->stream_idx) {
        if (avcodec_send_packet(c->dec, pkt) == 0) {
          while (!done && avcodec_receive_frame(c->dec, frame) == 0) {
            if (frame_is_key(frame) && written < n_frames) write_frame(frame);
            if (written >= n_frames) done = true;
          }
        }
      }
      av_packet_unref(pkt);
    }
    if (!done) {
      avcodec_send_packet(c->dec, nullptr);
      while (!done && avcodec_receive_frame(c->dec, frame) == 0) {
        if (frame_is_key(frame) && written < n_frames) write_frame(frame);
        if (written >= n_frames) done = true;
      }
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  close_ctx(c);
  return written;
}

}  // namespace

// Seek-based sparse sampler: decode EXACTLY `n_frames` keyframes, evenly
// spaced across the clip's duration, each cropped (crop_w/h <= 0 = full
// frame) and scaled to (out_w, out_h) RGB24. This is the speed-of-light
// host path for serving-style sampling (T of ~300 frames): per sample it
// pays one container seek + ONE intra-frame decode — no scanning, no
// inter-frame reconstruction, no loop filter. Falls back to a sequential
// keyframe scan when the container has no usable duration/index.
// Returns frames written, or -1.
int vd_sample_seek_crop(const char* path, int n_frames, int crop_x,
                        int crop_y, int crop_w, int crop_h, int out_w,
                        int out_h, uint8_t* out, char* err, int errlen) {
  return seek_sample_impl(path, n_frames, crop_x, crop_y, crop_w, crop_h,
                          out_w, out_h, /*yuv_out=*/0, kNoCenterCrop, out,
                          err, errlen);
}

// Same sampler, planar YUV420P output (Y, U, V per frame; U/V are
// (out_h/2, out_w/2)). Frame stride is out_w*out_h*3/2 — HALF of RGB24,
// for transfer-bound serving hosts. Limited-range BT.601 (swscale converts
// full-range sources). Convert to RGB on device (ops/yuv.py).
int vd_sample_seek_crop_yuv(const char* path, int n_frames, int crop_x,
                            int crop_y, int crop_w, int crop_h, int out_w,
                            int out_h, uint8_t* out, char* err, int errlen) {
  return seek_sample_impl(path, n_frames, crop_x, crop_y, crop_w, crop_h,
                          out_w, out_h, /*yuv_out=*/1, kNoCenterCrop, out,
                          err, errlen);
}

// Seek sampler with the centered-square crop computed in-decoder from the
// stream's own dimensions (margin in parts-per-million of min(W,H)):
// saves the caller's separate probe open — one container open per clip.
int vd_sample_seek_center(const char* path, int n_frames, int margin_ppm,
                          int out_w, int out_h, uint8_t* out, char* err,
                          int errlen) {
  return seek_sample_impl(path, n_frames, 0, 0, 0, 0, out_w, out_h,
                          /*yuv_out=*/0, margin_ppm, out, err, errlen);
}

int vd_sample_seek_center_yuv(const char* path, int n_frames, int margin_ppm,
                              int out_w, int out_h, uint8_t* out, char* err,
                              int errlen) {
  return seek_sample_impl(path, n_frames, 0, 0, 0, 0, out_w, out_h,
                          /*yuv_out=*/1, margin_ppm, out, err, errlen);
}

// Test/fixture encoder: write `n` RGB24 frames (packed in `rgb`) as an
// mpeg4-in-avi video. Lets the test suite create real videos without an
// ffmpeg binary. Returns 0 on success.
int vd_encode(const char* path, const uint8_t* rgb, int n, int w, int h,
              int fps, char* err, int errlen) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) {
    snprintf(err, errlen, "cannot infer output format");
    return -1;
  }
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MJPEG);
  if (!codec) {
    snprintf(err, errlen, "no encoder");
    avformat_free_context(fmt);
    return -1;
  }
  AVStream* st = avformat_new_stream(fmt, codec);
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->thread_count = 0;  // auto threading
  enc->width = w;
  enc->height = h;
  enc->time_base = {1, fps};
  enc->framerate = {fps, 1};
  enc->pix_fmt = codec->id == AV_CODEC_ID_MJPEG ? AV_PIX_FMT_YUVJ420P
                                                : AV_PIX_FMT_YUV420P;
  enc->bit_rate = 2'000'000;
  enc->gop_size = 12;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(enc, codec, nullptr) < 0) {
    snprintf(err, errlen, "encoder open failed");
    avcodec_free_context(&enc);
    avformat_free_context(fmt);
    return -1;
  }
  avcodec_parameters_from_context(st->codecpar, enc);
  st->time_base = enc->time_base;

  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
    snprintf(err, errlen, "cannot open output file");
    avcodec_free_context(&enc);
    avformat_free_context(fmt);
    return -1;
  }
  if (avformat_write_header(fmt, nullptr) < 0) {
    snprintf(err, errlen, "cannot write container header");
    avio_closep(&fmt->pb);
    avcodec_free_context(&enc);
    avformat_free_context(fmt);
    return -1;
  }

  SwsContext* sws =
      sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, enc->pix_fmt,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVFrame* fr = av_frame_alloc();
  fr->format = enc->pix_fmt;
  fr->width = w;
  fr->height = h;
  av_frame_get_buffer(fr, 0);
  AVPacket* pkt = av_packet_alloc();

  auto drain = [&]() {
    while (avcodec_receive_packet(enc, pkt) == 0) {
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int i = 0; i < n; ++i) {
    av_frame_make_writable(fr);
    const uint8_t* src[1] = {rgb + (size_t)i * w * h * 3};
    int src_stride[1] = {w * 3};
    sws_scale(sws, src, src_stride, 0, h, fr->data, fr->linesize);
    fr->pts = i;
    avcodec_send_frame(enc, fr);
    drain();
  }
  avcodec_send_frame(enc, nullptr);
  drain();

  av_write_trailer(fmt);
  sws_freeContext(sws);
  av_frame_free(&fr);
  av_packet_free(&pkt);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avcodec_free_context(&enc);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// In-decoder Haar face pipeline: detect on the decoder's Y plane at the
// detection resolution, crop ONLY the detected face from the native YUV
// planes. This is the serving path for FACE_DETECTOR=haar — the reference
// always runs real detection in production (app.py:1988-2025); the round-3
// measurement showed the detector itself costs ~9 ms/frame tracked while
// decoding full frames to RGB for it cost ~450 ms/clip. Everything here runs
// GIL-free inside the ctypes call, so decode+detect overlap the TPU forward
// across the serving thread pool. The pyramid scan is the SAME engine the
// Python detector uses (haar_scan, native/haar.cc — linked into this
// library); grouping + largest-face + temporal tracking are ported from
// data/haar.py::group_rectangles and data/faces.py::_detect_haar.
// ---------------------------------------------------------------------------

extern "C" int haar_scan(const float* gray, int H, int W, const int32_t* rects,
                         const double* weights, const int32_t* feat_idx,
                         const double* node_thr, const double* leaves,
                         const int32_t* stage_ends, const double* stage_thr,
                         int n_stages, int win_w, int win_h,
                         double scale_factor, int min_size, int max_size,
                         float* out_xys, int max_out);
// f32 bilinear downscale from haar.cc — SIMD when the host has AVX-512
extern "C" void haar_resize_f32(const float* src, int h, int w, float* dst,
                                int oh, int ow);

namespace {

struct HaarModel {  // borrowed views of the caller's parsed cascade arrays
  const int32_t* rects;
  const double* weights;
  const int32_t* feat_idx;
  const double* node_thr;
  const double* leaves;
  const int32_t* stage_ends;
  const double* stage_thr;
  int n_stages, win_w, win_h;
};


// Horizontal sampling LUT for the detection-res luma resize — the grid is
// constant across a clip's frames, so floor/clamp per output column is
// hoisted out of the per-frame loop.
struct HLut {
  std::vector<int> x0, x1;
  std::vector<float> wx;
  void build(int w, int ow) {
    x0.resize(ow);
    x1.resize(ow);
    wx.resize(ow);
    for (int ox = 0; ox < ow; ++ox) {
      float fx = (ox + 0.5f) * (float)w / ow - 0.5f;
      int a = (int)std::floor(fx);
      float t = fx - a;
      if (a < 0) { a = 0; t = 0.f; }
      if (a > w - 1) { a = w - 1; t = 0.f; }
      x0[ox] = a;
      x1[ox] = a + 1 < w ? a + 1 : w - 1;
      wx[ox] = t;
    }
  }
};

#if defined(__x86_64__) || defined(_M_X64)
#include <immintrin.h>
#define VD_HAVE_AVX512_BUILD 1

// One output row of the u8 bilinear resize via dword gathers at byte
// addresses (low byte masked out). Same mul/add order as the scalar loop
// (no FMA contraction) → bit-identical output. A gather at column index
// w-1 reads 3 bytes past the row, so callers must guarantee
// stride >= w + 4 AND pass rows below the last plane row (the scalar
// fallback handles the rest).
__attribute__((target("avx512f"))) void resize_u8_row_avx512(
    const uint8_t* r0, const uint8_t* r1, const int* lx0, const int* lx1,
    const float* lwx, float wy, float* d, int n) {
  const __m512i mask = _mm512_set1_epi32(0xFF);
  const __m512 one = _mm512_set1_ps(1.f);
  const __m512 vwy = _mm512_set1_ps(wy);
  const __m512 vwy1 = _mm512_set1_ps(1.f - wy);
  int ox = 0;
  for (; ox + 16 <= n; ox += 16) {
    __m512i i0 = _mm512_loadu_si512((const void*)(lx0 + ox));
    __m512i i1 = _mm512_loadu_si512((const void*)(lx1 + ox));
    __m512 wx = _mm512_loadu_ps(lwx + ox);
    __m512 wx1 = _mm512_sub_ps(one, wx);
    __m512 t0 = _mm512_cvtepi32_ps(_mm512_and_si512(
        _mm512_i32gather_epi32(i0, (const int*)r0, 1), mask));
    __m512 t1 = _mm512_cvtepi32_ps(_mm512_and_si512(
        _mm512_i32gather_epi32(i1, (const int*)r0, 1), mask));
    __m512 b0 = _mm512_cvtepi32_ps(_mm512_and_si512(
        _mm512_i32gather_epi32(i0, (const int*)r1, 1), mask));
    __m512 b1 = _mm512_cvtepi32_ps(_mm512_and_si512(
        _mm512_i32gather_epi32(i1, (const int*)r1, 1), mask));
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

bool vd_use_avx512() {
  static const bool hw = __builtin_cpu_supports("avx512f") != 0;
  if (!hw) return false;
  const char* e = getenv("HAAR_SIMD");  // same kill-switch as the scanner
  return !(e && e[0] == '0');
}
#endif

// Rows [oy0,oy1) x cols [ox0,ox1) of the virtual (oh,ow) bilinear resize of
// a strided uint8 plane, written densely into dst ((oy1-oy0, ox1-ox0)).
// Bit-identical to the corresponding region of a full-output resize — the
// tracked-ROI fast path depends on that: scanning a region-resized patch
// must equal scanning a crop of the full detection-res gray.
void resize_u8_region(const uint8_t* src, int stride, int h, int w,
                      const HLut& lut, int oh, int oy0, int oy1, int ox0,
                      int ox1, float* dst) {
  const int dw = ox1 - ox0;
#ifdef VD_HAVE_AVX512_BUILD
  // gather safety: dword gathers read up to 3 bytes past column w-1, and
  // the last plane row has no guaranteed padding below it
  const bool simd = vd_use_avx512() && stride >= w + 4;
#endif
  for (int oy = oy0; oy < oy1; ++oy) {
    float fy = (oy + 0.5f) * (float)h / oh - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.f; }
    if (y0 > h - 1) { y0 = h - 1; wy = 0.f; }
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    const uint8_t* r0 = src + (size_t)y0 * stride;
    const uint8_t* r1 = src + (size_t)y1 * stride;
    float* d = dst + (size_t)(oy - oy0) * dw;
#ifdef VD_HAVE_AVX512_BUILD
    if (simd && y1 < h - 1) {  // last source row: scalar (no row below)
      resize_u8_row_avx512(r0, r1, lut.x0.data() + ox0, lut.x1.data() + ox0,
                           lut.wx.data() + ox0, wy, d, ox1 - ox0);
      continue;
    }
#endif
    for (int ox = ox0; ox < ox1; ++ox) {
      float wx = lut.wx[ox];
      float top = r0[lut.x0[ox]] * (1 - wx) + r0[lut.x1[ox]] * wx;
      float bot = r1[lut.x0[ox]] * (1 - wx) + r1[lut.x1[ox]] * wx;
      d[ox - ox0] = top * (1 - wy) + bot * wy;
    }
  }
}


// Port of data/haar.py::group_rectangles specialised to the serving need:
// cluster raw (x, y, side) windows (eps=0.2 edge similarity, union-find),
// average each cluster with >= min_neighbors members, return the
// AREA-LARGEST averaged box (xywh) — the reference keeps max(rects, by
// area), app.py:2001-2012.
bool group_largest(const float* xys, int n, int min_neighbors,
                   double out_xywh[4]) {
  if (n <= 0) return false;
  std::vector<int> parent(n);
  for (int i = 0; i < n; ++i) parent[i] = i;
  auto find = [&](int i) {
    while (parent[i] != i) {
      parent[i] = parent[parent[i]];
      i = parent[i];
    }
    return i;
  };
  const double eps = 0.2;
  for (int i = 0; i < n; ++i) {
    double xi = xys[i * 3], yi = xys[i * 3 + 1], si = xys[i * 3 + 2];
    for (int j = i + 1; j < n; ++j) {
      double xj = xys[j * 3], yj = xys[j * 3 + 1], sj = xys[j * 3 + 2];
      double d = eps * std::min(si, sj);  // w==h==side for square windows
      if (std::abs(xi - xj) <= d && std::abs(yi - yj) <= d &&
          std::abs(xi + si - xj - sj) <= d &&
          std::abs(yi + si - yj - sj) <= d) {
        int ri = find(i), rj = find(j);
        if (ri != rj) parent[rj] = ri;
      }
    }
  }
  std::vector<double> sx(n, 0), sy(n, 0), ss(n, 0);
  std::vector<int> cnt(n, 0);
  for (int i = 0; i < n; ++i) {
    int r = find(i);
    sx[r] += xys[i * 3];
    sy[r] += xys[i * 3 + 1];
    ss[r] += xys[i * 3 + 2];
    ++cnt[r];
  }
  double best_area = -1.0;
  for (int r = 0; r < n; ++r) {
    if (cnt[r] < min_neighbors) continue;
    double s = ss[r] / cnt[r];
    if (s * s > best_area) {
      best_area = s * s;
      out_xywh[0] = sx[r] / cnt[r];
      out_xywh[1] = sy[r] / cnt[r];
      out_xywh[2] = s;
      out_xywh[3] = s;
    }
  }
  return best_area > 0.0;
}

// One largest-face detection on a prepared gray image (detection coords).
bool detect_largest_gray(const HaarModel& m, const float* gray, int gh,
                         int gw, int min_neighbors, int min_size,
                         int max_size, double out_xywh[4],
                         std::vector<float>& raw,
                         double scale_factor = 1.1) {
  // haar_scan returns the TRUE surviving-window count: on overflow grow
  // the buffer and rescan once, so grouping never votes on a silently
  // truncated set (texture-dense frames can exceed any fixed cap)
  int cap = 8192;
  int n;
  for (;;) {
    raw.resize((size_t)cap * 3);
    n = haar_scan(gray, gh, gw, m.rects, m.weights, m.feat_idx, m.node_thr,
                  m.leaves, m.stage_ends, m.stage_thr, m.n_stages, m.win_w,
                  m.win_h, scale_factor, min_size, max_size, raw.data(), cap);
    if (n <= cap) break;
    cap = n;
  }
  if (n <= 0) return false;
  return group_largest(raw.data(), n, min_neighbors, out_xywh);
}

}  // namespace

extern "C" {

// Seek-decode `n_frames` keyframes evenly spread over the clip; per frame:
// Viola-Jones largest-face detection on the (<= max_side)-downscaled LUMA
// plane (limited-range Y is an affine transform of BT.601 gray, and the
// cascade's per-window variance normalization is affine-invariant), with
// temporal ROI tracking (track != 0, expand ~2.0: scan only around the
// previous box at +-60% of its size, full rescan the moment the track
// loses); then crop the margin-expanded face box from the NATIVE YUV
// planes and scale to (face_size, face_size) planar YUV420, packed per
// frame (Y | U | V — face_size^2*3/2 bytes). Frames with no detection get
// the centered-square prior (margin_ppm, same integer math as
// vd_sample_seek_center_yuv) and out_found[i] = 0.
//
// acquire != 0 enables coarse-to-fine acquisition for non-tracked frames:
// half-resolution full scan (1/4 the windows) + full-res ROI refinement,
// falling back to the full-res scan when the coarse pass finds nothing.
//
// out:       (n_frames, face_size*face_size*3/2) uint8
// out_boxes: (n_frames, 4) float32 xyxy — the crop actually taken, original
//            frame coordinates
// out_found: (n_frames,) uint8 — 0 none, 1 tracked-roi, 2 coarse-acquired,
//            3 full-scan
// Returns frames written, or -1 (err filled).
int vd_sample_seek_faces_yuv(
    const char* path, int n_frames, const int32_t* rects,
    const double* weights, const int32_t* feat_idx, const double* node_thr,
    const double* leaves, const int32_t* stage_ends, const double* stage_thr,
    int n_stages, int win_w, int win_h, int max_side, int min_neighbors,
    int track, double track_expand, int acquire, int face_size,
    int margin_ppm, uint8_t* out, float* out_boxes, uint8_t* out_found,
    char* err, int errlen) {
  if (n_frames < 1) n_frames = 1;
  if (face_size & 1) {
    snprintf(err, errlen, "face_size must be even for yuv420");
    return -1;
  }
  if (max_side < win_w * 2) max_side = win_w * 2;
  HaarModel hm{rects,      weights,  feat_idx, node_thr, leaves,
               stage_ends, stage_thr, n_stages, win_w,    win_h};

  Ctx* c = open_ctx(path, err, errlen, /*threads=*/1);
  if (!c) return -1;
  enable_keyframe_fast_path(c);

  AVStream* st = c->fmt->streams[c->stream_idx];
  int64_t start = st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  int64_t dur = st->duration;
  if (dur == AV_NOPTS_VALUE || dur <= 0) {
    if (c->fmt->duration > 0)
      dur = av_rescale_q(c->fmt->duration, AV_TIME_BASE_Q, st->time_base);
    else
      dur = 0;
  }
  bool seekable = dur > 0;

  const int W = c->dec->width, H = c->dec->height;
  const AVPixFmtDescriptor* desc = av_pix_fmt_desc_get(c->dec->pix_fmt);
  const int align_x = 1 << (desc ? desc->log2_chroma_w : 1);
  const int align_y = 1 << (desc ? desc->log2_chroma_h : 1);
  const bool planar_luma8 =
      desc && !(desc->flags & AV_PIX_FMT_FLAG_RGB) && desc->nb_components &&
      desc->comp[0].plane == 0 && desc->comp[0].step == 1 &&
      desc->comp[0].depth == 8;

  // detection geometry: scale derives from the FULL frame so tracked ROI
  // passes see the same pyramid granularity as full-frame passes
  const double scale = std::max(1.0, (double)std::max(W, H) / max_side);
  const int gw = std::max(win_w, (int)std::lround(W / scale));
  const int gh = std::max(win_h, (int)std::lround(H / scale));

  // center-prior fallback box (same integer math as seek_sample_impl)
  const int cside = std::max(
      2, (int)((int64_t)std::min(W, H) * (1000000 - (int64_t)margin_ppm) /
               1000000));
  const int cx0 = (W - cside) / 2, cy0 = (H - cside) / 2;

  const size_t frame_bytes = (size_t)face_size * face_size * 3 / 2;
  int written = 0;
  bool have_prev = false;
  double prev[4] = {0, 0, 0, 0};  // last detected face, xyxy original coords
  std::vector<float> gray((size_t)gh * gw), roi_buf, raw;
  SwsContext* crop_sws = nullptr;
  SwsContext* gray_sws = nullptr;
  HLut lut;  // horizontal resize LUT, constant across the clip's frames
  lut.build(W, gw);

  auto process_frame = [&](AVFrame* f) {
    // ---- 1. detection gray (luma, detection resolution), built LAZILY:
    // tracked frames resize only the ROI region (r5 — the full-frame
    // resize was ~45% of per-clip detection cost once the scan went SIMD)
    bool gray_built = false;
    auto ensure_gray = [&]() {
      if (gray_built) return;
      gray_built = true;
      if (planar_luma8 && f->data[0]) {
        resize_u8_region(f->data[0], f->linesize[0], H, W, lut, gh, 0, gh, 0,
                         gw, gray.data());
      } else {  // exotic pix fmt: let swscale produce the gray
        static thread_local std::vector<uint8_t> g8;
        g8.resize((size_t)gh * gw);
        gray_sws = sws_getCachedContext(gray_sws, W, H, c->dec->pix_fmt, gw,
                                        gh, AV_PIX_FMT_GRAY8,
                                        SWS_FAST_BILINEAR, nullptr, nullptr,
                                        nullptr);
        uint8_t* dst[1] = {g8.data()};
        int dst_stride[1] = {gw};
        sws_scale(gray_sws, f->data, f->linesize, 0, H, dst, dst_stride);
        for (size_t i = 0; i < g8.size(); ++i) gray[i] = g8[i];
      }
    };

    // ---- 2. largest-face detection with temporal tracking ---------------
    bool found = false;
    int how = 0;  // 1=tracked roi, 2=coarse acquisition(+refine), 3=full
    double box[4];  // xywh, detection coords (offset-corrected for ROI)

    // ROI scan around a center/size prior at full detection resolution —
    // shared by temporal tracking and coarse-acquisition refinement.
    // cx/cy/side in DETECTION coords. When the full gray hasn't been built
    // yet (tracked fast path), the ROI patch is region-resized straight
    // from the luma plane — bit-identical to cropping the full resize.
    auto roi_scan = [&](double cx, double cy, double side, double expand,
                        double lo, double hi, double out_box[4]) -> bool {
      double half = 0.5 * side * expand;
      int rx0 = std::max(0, (int)std::floor(cx - half));
      int ry0 = std::max(0, (int)std::floor(cy - half));
      int rx1 = std::min(gw, (int)std::ceil(cx + half));
      int ry1 = std::min(gh, (int)std::ceil(cy + half));
      int rw = rx1 - rx0, rh = ry1 - ry0;
      if (rw < win_w || rh < win_h) return false;
      roi_buf.resize((size_t)rw * rh);
      if (!gray_built && planar_luma8 && f->data[0]) {
        resize_u8_region(f->data[0], f->linesize[0], H, W, lut, gh, ry0, ry1,
                         rx0, rx1, roi_buf.data());
      } else {
        ensure_gray();
        for (int y = 0; y < rh; ++y)
          std::memcpy(roi_buf.data() + (size_t)y * rw,
                      gray.data() + (size_t)(ry0 + y) * gw + rx0,
                      sizeof(float) * rw);
      }
      int mn = std::max(win_w, (int)(lo * side));
      int mx = std::max(win_w, (int)(hi * side));
      // size is known within the [lo, hi] band, so a coarser pyramid
      // step (1.15 vs the reference's 1.1) halves the levels while the
      // face still collects 2-3x min_neighbors votes (measured)
      if (!detect_largest_gray(hm, roi_buf.data(), rh, rw, min_neighbors, mn,
                               mx, out_box, raw, 1.15))
        return false;
      out_box[0] += rx0;
      out_box[1] += ry0;
      return true;
    };

    if (track && have_prev) {
      double side = std::max(prev[2] - prev[0], prev[3] - prev[1]) / scale;
      double cx = 0.5 * (prev[0] + prev[2]) / scale;
      double cy = 0.5 * (prev[1] + prev[3]) / scale;
      // two-tier track (r5): a narrow VERIFY band first — faces change
      // scale slowly between samples, so ±25% around the tracked size
      // (~4 pyramid levels) confirms the face at ~1/4 the cost of the
      // full tracked band; the [0.6, 1.6] band only runs when the verify
      // band comes up empty, and a full acquisition below when both do.
      if (roi_scan(cx, cy, side, std::min(1.5, track_expand), 0.8, 1.25,
                   box) ||
          roi_scan(cx, cy, side, track_expand, 0.6, 1.6, box)) {
        found = true;
        how = 1;
      }
    }
    if (!found && acquire) {
      // Coarse-to-fine acquisition: a half-resolution full scan costs 1/4
      // the windows of a full-res scan (the full scan is ~4x the cost of
      // everything else per clip on realistically textured content), then
      // a full-res ROI refinement recovers the localization quality. The
      // implied minimum detectable face is 2*win_w detection pixels
      // (~15% of frame height at the default HAAR_MAX_SIDE) — smaller
      // faces fall through to the full-res scan below.
      ensure_gray();
      int aw = std::max(win_w, gw / 2), ah = std::max(win_h, gh / 2);
      std::vector<float> coarse((size_t)aw * ah);
      haar_resize_f32(gray.data(), gh, gw, coarse.data(), ah, aw);
      double cbox[4];
      if (detect_largest_gray(hm, coarse.data(), ah, aw, min_neighbors,
                              win_w, 0, cbox, raw, 1.2)) {
        double fx = (double)gw / aw, fy = (double)gh / ah;
        double side = cbox[2] * fx;
        double cx = (cbox[0] + 0.5 * cbox[2]) * fx;
        double cy = (cbox[1] + 0.5 * cbox[3]) * fy;
        if (roi_scan(cx, cy, side, 1.6, 0.6, 1.6, box)) {
          found = true;
        } else {  // refinement missed: the coarse box itself is a valid
          box[0] = cbox[0] * fx;  // (coarser-grid) detection — keep it
          box[1] = cbox[1] * fy;
          box[2] = side;
          box[3] = cbox[3] * fy;
          found = true;
        }
        how = 2;
      }
    }
    if (!found) {  // acquisition off/empty: full-resolution full scan
      ensure_gray();
      found = detect_largest_gray(hm, gray.data(), gh, gw, min_neighbors,
                                  win_w, 0, box, raw);
      if (found) how = 3;
    }

    // ---- 3. crop box in original coords (margin-expanded) ----------------
    double m = (double)margin_ppm / 1000000.0;
    double x1, y1, x2, y2;
    if (found) {
      double bw = box[2] * scale, bh = box[3] * scale;
      x1 = box[0] * scale - bw * m;
      y1 = box[1] * scale - bh * m;
      x2 = box[0] * scale + bw * (1 + m);
      y2 = box[1] * scale + bh * (1 + m);
      prev[0] = box[0] * scale;
      prev[1] = box[1] * scale;
      prev[2] = (box[0] + box[2]) * scale;
      prev[3] = (box[1] + box[3]) * scale;
      have_prev = true;
    } else {
      x1 = cx0;
      y1 = cy0;
      x2 = cx0 + cside;
      y2 = cy0 + cside;
      have_prev = false;
    }
    int crop_x = std::max(0, std::min((int)std::lround(x1), W - 2));
    int crop_y = std::max(0, std::min((int)std::lround(y1), H - 2));
    int crop_w = std::max(2, std::min((int)std::lround(x2 - x1), W - crop_x));
    int crop_h = std::max(2, std::min((int)std::lround(y2 - y1), H - crop_y));
    crop_x -= crop_x % align_x;
    crop_y -= crop_y % align_y;

    // ---- 4. crop + scale from the native YUV planes ----------------------
    crop_sws = sws_getCachedContext(crop_sws, crop_w, crop_h, c->dec->pix_fmt,
                                    face_size, face_size, AV_PIX_FMT_YUV420P,
                                    SWS_FAST_BILINEAR, nullptr, nullptr,
                                    nullptr);
    const uint8_t* src[4];
    crop_src_planes(f, desc, crop_x, crop_y, src);
    uint8_t* base = out + (size_t)written * frame_bytes;
    uint8_t* dst[3] = {base, base + (size_t)face_size * face_size,
                       base + (size_t)face_size * face_size +
                           (size_t)(face_size / 2) * (face_size / 2)};
    int dst_stride[3] = {face_size, face_size / 2, face_size / 2};
    sws_scale(crop_sws, src, f->linesize, 0, crop_h, dst, dst_stride);
    if (out_boxes) {
      out_boxes[written * 4] = (float)crop_x;
      out_boxes[written * 4 + 1] = (float)crop_y;
      out_boxes[written * 4 + 2] = (float)(crop_x + crop_w);
      out_boxes[written * 4 + 3] = (float)(crop_y + crop_h);
    }
    if (out_found) out_found[written] = (uint8_t)how;
    ++written;
  };

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();

  if (seekable) {
    for (int i = 0; i < n_frames; ++i) {
      int64_t target = start + dur * (2 * i + 1) / (2 * n_frames);
      if (av_seek_frame(c->fmt, c->stream_idx, target, AVSEEK_FLAG_BACKWARD) <
          0) {
        seekable = false;
        break;
      }
      avcodec_flush_buffers(c->dec);
      bool got = false;
      for (int reads = 0; !got && reads < 256; ++reads) {
        if (av_read_frame(c->fmt, pkt) < 0) break;
        if (pkt->stream_index != c->stream_idx) {
          av_packet_unref(pkt);
          continue;
        }
        int rc = avcodec_send_packet(c->dec, pkt);
        av_packet_unref(pkt);
        if (rc < 0) continue;
        while (avcodec_receive_frame(c->dec, frame) == 0) {
          if (!got) {
            process_frame(frame);
            got = true;
          }
        }
      }
      if (!got) break;
    }
  }

  if (written == 0) {  // unseekable/broken container: sequential key scan
    av_seek_frame(c->fmt, c->stream_idx, start, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(c->dec);
    bool done = false;
    while (!done && av_read_frame(c->fmt, pkt) >= 0) {
      if (pkt->stream_index == c->stream_idx) {
        if (avcodec_send_packet(c->dec, pkt) == 0) {
          while (!done && avcodec_receive_frame(c->dec, frame) == 0) {
            if (frame_is_key(frame) && written < n_frames)
              process_frame(frame);
            if (written >= n_frames) done = true;
          }
        }
      }
      av_packet_unref(pkt);
    }
    if (!done) {
      avcodec_send_packet(c->dec, nullptr);
      while (!done && avcodec_receive_frame(c->dec, frame) == 0) {
        if (frame_is_key(frame) && written < n_frames) process_frame(frame);
        if (written >= n_frames) done = true;
      }
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (crop_sws) sws_freeContext(crop_sws);
  if (gray_sws) sws_freeContext(gray_sws);
  close_ctx(c);
  return written;
}

}  // extern "C"
