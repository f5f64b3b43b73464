// Host video demux + decode via FFmpeg (libavformat/libavcodec/libswscale).
//
// TPU-native analogue of the reference video stack (dali/operators/video/
// frames_decoder_base.cc: FFmpeg demux; CPU libavcodec decode — there is no
// NVDEC analogue on TPU hosts, SURVEY §2.4 "Video"). Provides frame-accurate
// sequence reads: seek to the nearest keyframe before the target and decode
// forward, converting to RGB24 with swscale.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

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
  double fps = 0;
  int64_t num_frames = 0;
  int64_t next_frame = 0;  // frame index the decoder will produce next
  AVFrame* frame = nullptr;
  AVFrame* rgb = nullptr;
  AVPacket* pkt = nullptr;
};

int64_t pts_to_frame(VideoHandle* v, int64_t pts) {
  AVStream* st = v->fmt->streams[v->stream_idx];
  double sec = (pts - (st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time)) *
               av_q2d(st->time_base);
  return (int64_t)(sec * v->fps + 0.5);
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
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  v->fps = fr.den ? av_q2d(fr) : 25.0;
  v->num_frames = st->nb_frames;
  if (v->num_frames <= 0 && st->duration != AV_NOPTS_VALUE) {
    v->num_frames = (int64_t)(st->duration * av_q2d(st->time_base) * v->fps + 0.5);
  }
  if (v->num_frames <= 0 && v->fmt->duration != AV_NOPTS_VALUE) {
    v->num_frames = (int64_t)(v->fmt->duration / (double)AV_TIME_BASE * v->fps + 0.5);
  }
  v->sws = sws_getContext(v->width, v->height, v->codec->pix_fmt, v->width, v->height,
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
    int64_t ts = (int64_t)(target / v->fps / av_q2d(st->time_base)) +
                 (st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time);
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
      unsigned char* dst = out + (long)got * v->height * row_bytes;
      uint8_t* planes[1] = {dst};
      int strides[1] = {(int)row_bytes};
      sws_scale(v->sws, v->frame->data, v->frame->linesize, 0, v->height, planes, strides);
      got++;
      target += stride;
    }
  }
  return got;
}

}  // extern "C"
