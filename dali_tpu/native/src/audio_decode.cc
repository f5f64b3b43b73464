// Host audio decode via FFmpeg (in-memory demux + decode + to-float32).
// Covers FLAC (LibriSpeech), OGG/Vorbis, MP3, M4A/AAC, and WAV variants —
// the TPU-native analogue of the reference's libsndfile generic decoder
// (reference dali/operators/decoder/audio/generic_decoder.cc:16,140).
// The pure-Python RIFF/WAV parser in backend/audio.py remains the
// dependency-free fast path; this entry is the generic fallback.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct MemCtx {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  MemCtx* m = static_cast<MemCtx*>(opaque);
  size_t left = m->len - m->pos;
  size_t n = (size_t)buf_size < left ? (size_t)buf_size : left;
  if (n == 0) return AVERROR_EOF;
  std::memcpy(buf, m->data + m->pos, n);
  m->pos += n;
  return (int)n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  MemCtx* m = static_cast<MemCtx*>(opaque);
  if (whence == AVSEEK_SIZE) return (int64_t)m->len;
  int64_t base = whence == SEEK_SET ? 0 : whence == SEEK_CUR ? (int64_t)m->pos
                                                             : (int64_t)m->len;
  int64_t np = base + offset;
  if (np < 0 || np > (int64_t)m->len) return -1;
  m->pos = (size_t)np;
  return np;
}

}  // namespace

extern "C" {

int dali_tpu_has_audio() { return 1; }

void dali_tpu_audio_buffer_free(float* p) { free(p); }

// Decode the first audio stream of an in-memory file to float32 interleaved.
// *out is malloc'd (caller frees via dali_tpu_audio_buffer_free). Returns 0
// on success, negative on error.
int dali_tpu_audio_decode(const unsigned char* data, size_t len, float** out,
                          long* frames, int* channels, double* sample_rate) {
  *out = nullptr;
  *frames = 0;
  MemCtx mem{data, len, 0};
  const int avio_buf_sz = 1 << 14;
  unsigned char* avio_buf = (unsigned char*)av_malloc(avio_buf_sz);
  if (!avio_buf) return -1;
  AVIOContext* avio = avio_alloc_context(avio_buf, avio_buf_sz, 0, &mem,
                                         mem_read, nullptr, mem_seek);
  if (!avio) {
    av_free(avio_buf);
    return -1;
  }
  AVFormatContext* fmt = avformat_alloc_context();
  if (!fmt) {
    av_freep(&avio->buffer);
    avio_context_free(&avio);
    return -1;
  }
  fmt->pb = avio;
  fmt->flags |= AVFMT_FLAG_CUSTOM_IO;
  int rc = -2;
  AVCodecContext* dec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frm = nullptr;
  std::vector<float>* acc = nullptr;
  int nch = 0;

  do {
    if (avformat_open_input(&fmt, nullptr, nullptr, nullptr) < 0) {
      fmt = nullptr;  // freed by open_input on failure
      break;
    }
    if (avformat_find_stream_info(fmt, nullptr) < 0) break;
    int si = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (si < 0) break;
    AVStream* st = fmt->streams[si];
    const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) break;
    dec = avcodec_alloc_context3(codec);
    if (!dec || avcodec_parameters_to_context(dec, st->codecpar) < 0) break;
    if (avcodec_open2(dec, codec, nullptr) < 0) break;
    nch = dec->ch_layout.nb_channels;
    if (nch <= 0) break;
    *channels = nch;
    *sample_rate = (double)dec->sample_rate;

    AVChannelLayout out_layout;
    av_channel_layout_copy(&out_layout, &dec->ch_layout);
    if (swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_FLT,
                            dec->sample_rate, &dec->ch_layout,
                            dec->sample_fmt, dec->sample_rate, 0,
                            nullptr) < 0) {
      av_channel_layout_uninit(&out_layout);
      break;
    }
    av_channel_layout_uninit(&out_layout);
    if (swr_init(swr) < 0) break;

    pkt = av_packet_alloc();
    frm = av_frame_alloc();
    acc = new std::vector<float>();
    acc->reserve(1 << 16);
    bool fail = false;
    int read_rc = 0;
    while (!fail) {
      read_rc = av_read_frame(fmt, pkt);
      if (read_rc < 0) {
        avcodec_send_packet(dec, nullptr);  // flush
      } else if (pkt->stream_index != si) {
        av_packet_unref(pkt);
        continue;
      } else if (avcodec_send_packet(dec, pkt) < 0) {
        av_packet_unref(pkt);
        fail = true;
        break;
      } else {
        av_packet_unref(pkt);
      }
      int rrc;
      while ((rrc = avcodec_receive_frame(dec, frm)) == 0) {
        int n = frm->nb_samples;
        size_t base = acc->size();
        acc->resize(base + (size_t)n * nch);
        float* dst = acc->data() + base;
        uint8_t* outp[1] = {(uint8_t*)dst};
        if (swr_convert(swr, outp, n, (const uint8_t**)frm->extended_data,
                        n) < 0) {
          fail = true;
          break;
        }
        av_frame_unref(frm);
      }
      if (read_rc < 0) break;  // flushed
    }
    if (fail || acc->empty()) break;
    float* buf = (float*)malloc(acc->size() * sizeof(float));
    if (!buf) break;
    std::memcpy(buf, acc->data(), acc->size() * sizeof(float));
    *out = buf;
    *frames = (long)(acc->size() / nch);
    rc = 0;
  } while (false);

  delete acc;
  if (frm) av_frame_free(&frm);
  if (pkt) av_packet_free(&pkt);
  if (swr) swr_free(&swr);
  if (dec) avcodec_free_context(&dec);
  if (fmt) avformat_close_input(&fmt);
  if (avio) {
    av_freep(&avio->buffer);
    avio_context_free(&avio);
  }
  return rc;
}

// ---------------------------------------------------------------------------
// Encode float32 interleaved PCM to a container (fixture generation for the
// decoder tests and the LibriSpeech-style benchmark; there is no ffmpeg CLI
// in the image). format: "flac", "ogg", "mp3", "wav". Returns byte count or
// negative on error / unsupported encoder.
long dali_tpu_audio_encode(const float* pcm, long frames, int channels,
                           int rate, const char* format, unsigned char* out,
                           long out_cap) {
  const char* codec_name = nullptr;
  if (!strcmp(format, "flac")) codec_name = "flac";
  else if (!strcmp(format, "ogg")) codec_name = "vorbis";
  else if (!strcmp(format, "mp3")) codec_name = "libmp3lame";
  else if (!strcmp(format, "wav")) codec_name = "pcm_s16le";
  else return -1;
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec && !strcmp(format, "mp3"))
    codec = avcodec_find_encoder_by_name("mp3");  // alt name
  if (!codec) return -2;

  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, format, nullptr) < 0 ||
      !fmt)
    return -3;
  long result = -4;
  AVCodecContext* enc = nullptr;
  SwrContext* swr = nullptr;
  AVFrame* frm = nullptr;
  AVPacket* pkt = nullptr;
  uint8_t* dyn = nullptr;

  do {
    AVStream* st = avformat_new_stream(fmt, codec);
    if (!st) break;
    enc = avcodec_alloc_context3(codec);
    if (!enc) break;
    av_channel_layout_default(&enc->ch_layout, channels);
    enc->sample_rate = rate;
    enc->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0]
                                         : AV_SAMPLE_FMT_FLTP;
    enc->time_base = {1, rate};
    enc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;  // native vorbis
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(enc, codec, nullptr) < 0) break;
    if (avcodec_parameters_from_context(st->codecpar, enc) < 0) break;
    st->time_base = enc->time_base;
    if (avio_open_dyn_buf(&fmt->pb) < 0) break;
    if (avformat_write_header(fmt, nullptr) < 0) break;

    if (swr_alloc_set_opts2(&swr, &enc->ch_layout, enc->sample_fmt, rate,
                            &enc->ch_layout, AV_SAMPLE_FMT_FLT, rate, 0,
                            nullptr) < 0 ||
        swr_init(swr) < 0)
      break;

    frm = av_frame_alloc();
    pkt = av_packet_alloc();
    const int chunk = enc->frame_size > 0 ? enc->frame_size : 4096;
    long pos = 0;
    int64_t pts = 0;
    bool fail = false;
    while (pos <= frames && !fail) {
      AVFrame* send = nullptr;
      if (pos < frames) {
        int n = (int)((frames - pos) < chunk ? (frames - pos) : chunk);
        frm->nb_samples = n;
        av_channel_layout_copy(&frm->ch_layout, &enc->ch_layout);
        frm->format = enc->sample_fmt;
        frm->sample_rate = rate;
        if (av_frame_get_buffer(frm, 0) < 0) { fail = true; break; }
        const uint8_t* src[1] = {(const uint8_t*)(pcm + (size_t)pos * channels)};
        if (swr_convert(swr, frm->extended_data, n, src, n) < 0) {
          fail = true;
          break;
        }
        frm->pts = pts;
        pts += n;
        send = frm;
        pos += n;
      } else {
        pos++;  // one flush round
      }
      if (avcodec_send_frame(enc, send) < 0) { fail = true; break; }
      int rrc;
      while ((rrc = avcodec_receive_packet(enc, pkt)) == 0) {
        av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
        pkt->stream_index = st->index;
        if (av_interleaved_write_frame(fmt, pkt) < 0) { fail = true; break; }
      }
      if (rrc != AVERROR(EAGAIN) && rrc != AVERROR_EOF) fail = true;
      if (send) av_frame_unref(frm);
    }
    if (fail) break;
    if (av_write_trailer(fmt) < 0) break;
    int n = avio_close_dyn_buf(fmt->pb, &dyn);
    fmt->pb = nullptr;
    if (n < 0 || n > out_cap) { result = -5; break; }
    std::memcpy(out, dyn, n);
    result = n;
  } while (false);

  if (dyn) av_free(dyn);
  if (fmt && fmt->pb) {
    uint8_t* tmp = nullptr;
    avio_close_dyn_buf(fmt->pb, &tmp);
    if (tmp) av_free(tmp);
  }
  if (pkt) av_packet_free(&pkt);
  if (frm) av_frame_free(&frm);
  if (swr) swr_free(&swr);
  if (enc) avcodec_free_context(&enc);
  if (fmt) avformat_free_context(fmt);
  return result;
}

}  // extern "C"
