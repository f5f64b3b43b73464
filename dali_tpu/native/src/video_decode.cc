// Host video demux + decode via FFmpeg (libavformat/libavcodec/libswscale).
//
// TPU-native analogue of the reference video stack (dali/operators/video/
// frames_decoder_base.cc: FFmpeg demux; CPU libavcodec decode — there is no
// NVDEC analogue on TPU hosts, SURVEY §2.4 "Video"). Provides frame-accurate
// sequence reads: seek to the nearest keyframe before the target and decode
// forward.
//
// Color conversion contract (round 4): for 4:2:0 sources (the overwhelming
// H.264/MPEG-4 case) the YUV→RGB conversion is the framework's OWN integer
// BT.601 formula (below) with nearest-neighbor chroma upsampling — the exact
// same arithmetic the device program applies when planar YUV ships over the
// wire (executor.py "yuv420" boundary), so cpu and mixed outputs are
// bit-identical. swscale is only used for non-420 pixel formats. This mirrors
// the reference's split: NVDEC emits YUV and DALI converts on the GPU
// (dali/operators/video/color_space_conversion_impl.h), while its CPU path
// converts in libavfilter — the two backends there differ by filtering; here
// they are bit-equal by construction (documented in docs/compatibility.md).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cmath>
#include <cstring>
#include <string>

namespace {

struct VideoHandle {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_idx = -1;
  int width = 0;
  int height = 0;
  // OPEN-TIME pixel format snapshot. The live codec->pix_fmt FOLLOWS a
  // mid-stream reconfiguration (new SPS etc.), so comparing frame->format
  // against it can never detect a format change — callers sized their
  // buffers from the open-time contract, so that is what reads must check
  // (width/height above are snapshots for the same reason).
  AVPixelFormat open_pix_fmt = AV_PIX_FMT_NONE;
  bool open_full_range = false;
  double fps = 0;
  int64_t num_frames = 0;
  int64_t next_frame = 0;  // frame index the decoder will produce next
  AVFrame* frame = nullptr;
  AVFrame* rgb = nullptr;
  AVPacket* pkt = nullptr;
};

// Saturating double→int64 cast: mutated containers can carry duration /
// pts / time_base values whose products overflow int64, and casting an
// out-of-range (or NaN) double to int64_t is undefined behavior — the
// ASan/UBSan fuzz gate (qa/asan_fuzz.sh, -fno-sanitize-recover=all)
// aborts on it. Clamp to ±2^62 so downstream int64 additions (e.g.
// seek ts + start_time) cannot overflow either.
int64_t sat_i64(double x) {
  const double kLim = 4.6e18;  // < 2^62
  if (!(x > -kLim)) return x != x ? 0 : (int64_t)-kLim;  // NaN → 0
  if (x > kLim) return (int64_t)kLim;
  return (int64_t)x;
}

int64_t pts_to_frame(VideoHandle* v, int64_t pts) {
  AVStream* st = v->fmt->streams[v->stream_idx];
  // subtract in double: corrupt pts/start_time extremes would overflow
  // the int64 subtraction before the cast ever happens
  double start = st->start_time == AV_NOPTS_VALUE ? 0.0 : (double)st->start_time;
  double sec = ((double)pts - start) * av_q2d(st->time_base);
  return sat_i64(sec * v->fps + 0.5);
}

// Pixel-format class: 0 = not 4:2:0 (swscale RGB path), 1 = 4:2:0 limited
// range, 2 = 4:2:0 full range (yuvj420p / JPEG-range flag). Classified from
// the OPEN-TIME snapshot — the class is part of the open-time contract the
// Python callers plan wires and buffers against; per-frame deviations from
// it are detected in the read loops and reported (-2-got) or swscaled.
int pixfmt_class(const VideoHandle* v) {
  AVPixelFormat f = v->open_pix_fmt;
  bool full = v->open_full_range;
  if (f == AV_PIX_FMT_YUV420P) return full ? 2 : 1;
  if (f == AV_PIX_FMT_YUVJ420P) return 2;
  return 0;
}

inline unsigned char clamp255(int x) {
  return (unsigned char)(x < 0 ? 0 : (x > 255 ? 255 : x));
}

// The framework's own integer BT.601 YUV→RGB with nearest chroma upsampling.
// MUST stay arithmetically identical to the device lowering
// (executor.py _yuv420_to_rgb): limited range
//   R = (298·(Y−16) + 409·(V−128) + 128) >> 8   (and G/B analogues),
// full range
//   R = (256·Y + 359·(V−128) + 128) >> 8        (and G/B analogues).
void yuv420_frame_to_rgb(const AVFrame* f, int w, int h, bool full,
                         unsigned char* dst) {
  for (int y = 0; y < h; y++) {
    const uint8_t* yp = f->data[0] + (long)y * f->linesize[0];
    const uint8_t* up = f->data[1] + (long)(y >> 1) * f->linesize[1];
    const uint8_t* vp = f->data[2] + (long)(y >> 1) * f->linesize[2];
    unsigned char* d = dst + (long)y * w * 3;
    if (full) {
      for (int x = 0; x < w; x++) {
        int Y = 256 * yp[x];
        int D = up[x >> 1] - 128, E = vp[x >> 1] - 128;
        d[3 * x + 0] = clamp255((Y + 359 * E + 128) >> 8);
        d[3 * x + 1] = clamp255((Y - 88 * D - 183 * E + 128) >> 8);
        d[3 * x + 2] = clamp255((Y + 454 * D + 128) >> 8);
      }
    } else {
      for (int x = 0; x < w; x++) {
        int C = 298 * (yp[x] - 16);
        int D = up[x >> 1] - 128, E = vp[x >> 1] - 128;
        d[3 * x + 0] = clamp255((C + 409 * E + 128) >> 8);
        d[3 * x + 1] = clamp255((C - 100 * D - 208 * E + 128) >> 8);
        d[3 * x + 2] = clamp255((C + 516 * D + 128) >> 8);
      }
    }
  }
}

}  // namespace

extern "C" {

void* dali_tpu_video_open(const char* path) {
  auto* v = new VideoHandle();
  if (avformat_open_input(&v->fmt, path, nullptr, nullptr) < 0) {
    delete v;
    return nullptr;
  }
  if (avformat_find_stream_info(v->fmt, nullptr) < 0) {
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  v->stream_idx = av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (v->stream_idx < 0 || !dec) {
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  AVStream* st = v->fmt->streams[v->stream_idx];
  v->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(v->codec, st->codecpar);
  if (avcodec_open2(v->codec, dec, nullptr) < 0) {
    avcodec_free_context(&v->codec);
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  v->width = v->codec->width;
  v->height = v->codec->height;
  if (v->width <= 0 || v->height <= 0) {
    // corrupt container metadata: the callers size every read buffer from
    // these dims, and sws_getContext below would return null
    avcodec_free_context(&v->codec);
    avformat_close_input(&v->fmt);
    delete v;
    return nullptr;
  }
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  double fps = fr.den ? av_q2d(fr) : 0.0;
  // fps must be strictly positive: the seek math divides by it, and a
  // mutated container can carry num=0 (a 0.0 here would make the
  // int64 cast of the resulting inf undefined behavior)
  v->fps = (fps > 0.0 && std::isfinite(fps)) ? fps : 25.0;
  v->num_frames = st->nb_frames;
  if (v->num_frames <= 0 && st->duration != AV_NOPTS_VALUE) {
    // sat_i64: corrupt duration/time_base can push the double product past
    // int64 range, and the raw cast would be UB (same class as the fps
    // guard above)
    v->num_frames = sat_i64((double)st->duration * av_q2d(st->time_base) * v->fps + 0.5);
  }
  if (v->num_frames <= 0 && v->fmt->duration != AV_NOPTS_VALUE) {
    v->num_frames = sat_i64((double)v->fmt->duration / (double)AV_TIME_BASE * v->fps + 0.5);
  }
  v->open_pix_fmt = v->codec->pix_fmt;
  v->open_full_range = v->codec->color_range == AVCOL_RANGE_JPEG;
  v->sws = sws_getContext(v->width, v->height, v->open_pix_fmt, v->width, v->height,
                          AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  v->frame = av_frame_alloc();
  v->rgb = av_frame_alloc();
  v->pkt = av_packet_alloc();
  return v;
}

int dali_tpu_video_info(void* handle, int* w, int* h, long* frames, double* fps) {
  auto* v = static_cast<VideoHandle*>(handle);
  if (!v) return -1;
  *w = v->width;
  *h = v->height;
  *frames = (long)v->num_frames;
  *fps = v->fps;
  return 0;
}

void dali_tpu_video_close(void* handle) {
  auto* v = static_cast<VideoHandle*>(handle);
  if (!v) return;
  if (v->pkt) av_packet_free(&v->pkt);
  if (v->frame) av_frame_free(&v->frame);
  if (v->rgb) av_frame_free(&v->rgb);
  if (v->sws) sws_freeContext(v->sws);
  if (v->codec) avcodec_free_context(&v->codec);
  if (v->fmt) avformat_close_input(&v->fmt);
  delete v;
}

// Decode the next frame into v->frame; returns its frame index or -1 on EOF/err.
static int64_t decode_next(VideoHandle* v) {
  while (true) {
    int rc = avcodec_receive_frame(v->codec, v->frame);
    if (rc == 0) {
      int64_t pts = v->frame->best_effort_timestamp != AV_NOPTS_VALUE
                        ? v->frame->best_effort_timestamp
                        : v->frame->pts;
      int64_t idx = pts != AV_NOPTS_VALUE ? pts_to_frame(v, pts) : v->next_frame;
      v->next_frame = idx + 1;
      return idx;
    }
    if (rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) return -1;
    if (rc == AVERROR_EOF) return -1;
    // feed more packets
    while (true) {
      rc = av_read_frame(v->fmt, v->pkt);
      if (rc < 0) {
        avcodec_send_packet(v->codec, nullptr);  // flush
        break;
      }
      if (v->pkt->stream_index == v->stream_idx) {
        avcodec_send_packet(v->codec, v->pkt);
        av_packet_unref(v->pkt);
        break;
      }
      av_packet_unref(v->pkt);
    }
  }
}

// Read `count` frames starting at `start`, spaced by `stride`, into out
// (count * h * w * 3 bytes, RGB24).
int dali_tpu_video_read_frames(void* handle, long start, int count, int stride,
                               unsigned char* out) {
  auto* v = static_cast<VideoHandle*>(handle);
  if (!v) return -1;
  long target = start;
  int got = 0;
  // seek if target is behind the decoder position or far ahead
  if (target < v->next_frame || target > v->next_frame + 64) {
    AVStream* st = v->fmt->streams[v->stream_idx];
    // whole expression in double + one saturating cast: a far-past-EOF
    // target over a tiny time_base (fuzzed seeks) overflows both the raw
    // cast and the subsequent int64 addition
    int64_t ts = sat_i64(
        (double)target / v->fps / av_q2d(st->time_base) +
        (st->start_time == AV_NOPTS_VALUE ? 0.0 : (double)st->start_time));
    if (av_seek_frame(v->fmt, v->stream_idx, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(v->codec);
      v->next_frame = -1;  // unknown until first decoded frame reports pts
    }
  }
  const long row_bytes = (long)v->width * 3;
  while (got < count) {
    int64_t idx = decode_next(v);
    if (idx < 0) return got > 0 ? got : -1;
    if (idx >= target) {
      // mid-stream dimension change (corrupt/spliced container): the copy
      // and conversion below index by the OPEN-time dims — reading a
      // smaller frame's planes at those extents would overrun them
      if (v->frame->width != v->width || v->frame->height != v->height)
        return got > 0 ? got : -1;
      unsigned char* dst = out + (long)got * v->height * row_bytes;
      int pc = pixfmt_class(v);
      if (pc != 0 && v->frame->format == v->open_pix_fmt) {
        yuv420_frame_to_rgb(v->frame, v->width, v->height, pc == 2, dst);
      } else {
        // This is the documented "swscale handles any format" fallback the
        // Python callers bounce to on VideoPixfmtChanged — so the context
        // must track the FRAME's actual format, not the open-time one: a
        // mid-stream yuv420p→gray8 splice leaves data[1]/data[2] null and
        // scaling it through the stale 3-plane context would read them.
        // sws_getCachedContext reuses v->sws when nothing changed.
        if (v->frame->format < 0) return got > 0 ? got : -1;
        v->sws = sws_getCachedContext(
            v->sws, v->width, v->height, (AVPixelFormat)v->frame->format,
            v->width, v->height, AV_PIX_FMT_RGB24, SWS_BILINEAR,
            nullptr, nullptr, nullptr);
        if (!v->sws) return got > 0 ? got : -1;  // exotic pixfmt sws rejected
        uint8_t* planes[1] = {dst};
        int strides[1] = {(int)row_bytes};
        sws_scale(v->sws, v->frame->data, v->frame->linesize, 0, v->height, planes, strides);
      }
      got++;
      target += stride;
    }
  }
  return got;
}

// 0 = not 4:2:0 (callers must use the RGB read), 1 = 4:2:0 limited range,
// 2 = 4:2:0 full range.
int dali_tpu_video_pixfmt_class(void* handle) {
  auto* v = static_cast<VideoHandle*>(handle);
  if (!v) return 0;
  return pixfmt_class(v);
}

// Read `count` frames starting at `start`, spaced by `stride`, as PLANAR
// YUV 4:2:0: y is count*h*w bytes, u and v are count*ceil(h/2)*ceil(w/2)
// bytes each. Only valid when dali_tpu_video_pixfmt_class != 0. This is the
// host half of the planar video wire: chroma upsample + BT.601 happen on
// the device (executor.py "yuv420" boundary), halving wire bytes vs RGB24.
int dali_tpu_video_read_frames_yuv(void* handle, long start, int count,
                                   int stride, unsigned char* out_y,
                                   unsigned char* out_u, unsigned char* out_v) {
  auto* v = static_cast<VideoHandle*>(handle);
  if (!v || pixfmt_class(v) == 0) return -1;
  long target = start;
  int got = 0;
  if (target < v->next_frame || target > v->next_frame + 64) {
    AVStream* st = v->fmt->streams[v->stream_idx];
    // whole expression in double + one saturating cast: a far-past-EOF
    // target over a tiny time_base (fuzzed seeks) overflows both the raw
    // cast and the subsequent int64 addition
    int64_t ts = sat_i64(
        (double)target / v->fps / av_q2d(st->time_base) +
        (st->start_time == AV_NOPTS_VALUE ? 0.0 : (double)st->start_time));
    if (av_seek_frame(v->fmt, v->stream_idx, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(v->codec);
      v->next_frame = -1;
    }
  }
  const int w = v->width, h = v->height;
  const int cw = (w + 1) / 2, ch = (h + 1) / 2;
  while (got < count) {
    int64_t idx = decode_next(v);
    if (idx < 0) return got > 0 ? got : -1;
    if (idx >= target) {
      // Mid-stream pixel-format OR dimension change: the planar copy below
      // would read planes that no longer exist (or at the wrong extents).
      // Return a DISTINCT code (-2 - got, never the EOF shape) so Python
      // callers can fall back to the dense RGB path (which handles any
      // format) instead of silently padding with repeated frames.
      if (v->frame->format != v->open_pix_fmt ||
          v->frame->width != v->width || v->frame->height != v->height)
        return -2 - got;
      unsigned char* dy = out_y + (long)got * h * w;
      unsigned char* du = out_u + (long)got * ch * cw;
      unsigned char* dv = out_v + (long)got * ch * cw;
      for (int y = 0; y < h; y++)
        std::memcpy(dy + (long)y * w, v->frame->data[0] + (long)y * v->frame->linesize[0], w);
      for (int y = 0; y < ch; y++) {
        std::memcpy(du + (long)y * cw, v->frame->data[1] + (long)y * v->frame->linesize[1], cw);
        std::memcpy(dv + (long)y * cw, v->frame->data[2] + (long)y * v->frame->linesize[2], cw);
      }
      got++;
      target += stride;
    }
  }
  return got;
}

}  // extern "C"
