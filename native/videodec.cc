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
#include <cstdint>
#include <cstring>
#include <string>

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
