// Native media runtime for vexpress_tpu.
//
// Replaces the reference's host-side media dependencies (torchaudio.load +
// resample, inference.py:245-253; ffmpeg-subprocess audio muxing,
// pipelines/utils.py:84-86) with an in-process C++ module on
// libavformat/libavcodec/libswresample:
//
//   vx_decode_audio  — demux + decode any audio container/codec to mono
//                      float PCM at a target sample rate
//   vx_mux_av        — remux a (video-only) mp4 with an audio file into one
//                      container, stream-copy, trimmed to the shorter stream
//
// Exposed to Python through ctypes (vexpress_tpu/utils/media_native.py).

#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

void set_err(char* err, int errlen, const std::string& msg) {
  if (err && errlen > 0) {
    std::snprintf(err, (size_t)errlen, "%s", msg.c_str());
  }
}

std::string av_errstr(int code) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(code, buf, sizeof(buf));
  return std::string(buf);
}

}  // namespace

extern "C" {

void vx_free(void* p) { std::free(p); }

// Decode the first audio stream of `path` into mono float PCM at
// `target_rate` Hz. On success returns the number of samples and stores a
// malloc'd buffer in *out (caller frees with vx_free). On failure returns -1
// and writes a message into err.
long vx_decode_audio(const char* path, int target_rate, float** out, char* err, int errlen) {
  AVFormatContext* fmt = nullptr;
  int ret = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (ret < 0) {
    set_err(err, errlen, "open_input: " + av_errstr(ret));
    return -1;
  }
  ret = avformat_find_stream_info(fmt, nullptr);
  if (ret < 0) {
    avformat_close_input(&fmt);
    set_err(err, errlen, "find_stream_info: " + av_errstr(ret));
    return -1;
  }
  const AVCodec* codec = nullptr;
  int stream_idx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
  if (stream_idx < 0 || !codec) {
    avformat_close_input(&fmt);
    set_err(err, errlen, "no audio stream found");
    return -1;
  }
  AVStream* stream = fmt->streams[stream_idx];

  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, stream->codecpar);
  ret = avcodec_open2(ctx, codec, nullptr);
  if (ret < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    set_err(err, errlen, "avcodec_open2: " + av_errstr(ret));
    return -1;
  }

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  ret = swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, target_rate,
                            &ctx->ch_layout, ctx->sample_fmt, ctx->sample_rate,
                            0, nullptr);
  if (ret < 0 || !swr || swr_init(swr) < 0) {
    if (swr) swr_free(&swr);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    set_err(err, errlen, "swresample init failed");
    return -1;
  }

  std::vector<float> samples;
  samples.reserve(1 << 20);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<float> tmp;

  auto drain_frame = [&](AVFrame* f) {
    int max_out = (int)av_rescale_rnd(
        swr_get_delay(swr, ctx->sample_rate) + (f ? f->nb_samples : 0),
        target_rate, ctx->sample_rate, AV_ROUND_UP);
    if (max_out <= 0) max_out = 4096;
    tmp.resize((size_t)max_out);
    uint8_t* outbuf = (uint8_t*)tmp.data();
    int got = swr_convert(swr, &outbuf, max_out,
                          f ? (const uint8_t**)f->extended_data : nullptr,
                          f ? f->nb_samples : 0);
    if (got > 0) samples.insert(samples.end(), tmp.begin(), tmp.begin() + got);
  };

  while (av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == stream_idx) {
      if (avcodec_send_packet(ctx, pkt) >= 0) {
        while (avcodec_receive_frame(ctx, frame) >= 0) drain_frame(frame);
      }
    }
    av_packet_unref(pkt);
  }
  // flush decoder then resampler
  avcodec_send_packet(ctx, nullptr);
  while (avcodec_receive_frame(ctx, frame) >= 0) drain_frame(frame);
  drain_frame(nullptr);

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);

  if (samples.empty()) {
    set_err(err, errlen, "decoded zero samples");
    return -1;
  }
  float* buf = (float*)std::malloc(samples.size() * sizeof(float));
  if (!buf) {
    set_err(err, errlen, "oom");
    return -1;
  }
  std::memcpy(buf, samples.data(), samples.size() * sizeof(float));
  *out = buf;
  return (long)samples.size();
}

// Remux video stream of `video_path` with audio stream of `audio_path` into
// `out_path` (container inferred from extension), stream-copy, stopping at
// the shorter stream ("-shortest" semantics). Returns 0 on success.
int vx_mux_av(const char* video_path, const char* audio_path, const char* out_path,
              char* err, int errlen) {
  AVFormatContext *in_v = nullptr, *in_a = nullptr, *out = nullptr;
  int ret;
  if ((ret = avformat_open_input(&in_v, video_path, nullptr, nullptr)) < 0 ||
      avformat_find_stream_info(in_v, nullptr) < 0) {
    set_err(err, errlen, "open video: " + av_errstr(ret));
    if (in_v) avformat_close_input(&in_v);
    return -1;
  }
  if ((ret = avformat_open_input(&in_a, audio_path, nullptr, nullptr)) < 0 ||
      avformat_find_stream_info(in_a, nullptr) < 0) {
    set_err(err, errlen, "open audio: " + av_errstr(ret));
    avformat_close_input(&in_v);
    if (in_a) avformat_close_input(&in_a);
    return -1;
  }
  int vs = av_find_best_stream(in_v, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  int as = av_find_best_stream(in_a, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (vs < 0 || as < 0) {
    set_err(err, errlen, "missing stream (video or audio)");
    avformat_close_input(&in_v);
    avformat_close_input(&in_a);
    return -1;
  }

  avformat_alloc_output_context2(&out, nullptr, nullptr, out_path);
  if (!out) {
    set_err(err, errlen, "alloc output failed");
    avformat_close_input(&in_v);
    avformat_close_input(&in_a);
    return -1;
  }
  AVStream* ov = avformat_new_stream(out, nullptr);
  AVStream* oa = avformat_new_stream(out, nullptr);
  avcodec_parameters_copy(ov->codecpar, in_v->streams[vs]->codecpar);
  avcodec_parameters_copy(oa->codecpar, in_a->streams[as]->codecpar);
  ov->codecpar->codec_tag = 0;
  oa->codecpar->codec_tag = 0;

  if (!(out->oformat->flags & AVFMT_NOFILE)) {
    if ((ret = avio_open(&out->pb, out_path, AVIO_FLAG_WRITE)) < 0) {
      set_err(err, errlen, "avio_open: " + av_errstr(ret));
      avformat_free_context(out);
      avformat_close_input(&in_v);
      avformat_close_input(&in_a);
      return -1;
    }
  }
  if ((ret = avformat_write_header(out, nullptr)) < 0) {
    set_err(err, errlen, "write_header: " + av_errstr(ret));
    avformat_free_context(out);
    avformat_close_input(&in_v);
    avformat_close_input(&in_a);
    return -1;
  }

  double video_dur = in_v->streams[vs]->duration > 0
      ? in_v->streams[vs]->duration * av_q2d(in_v->streams[vs]->time_base)
      : (in_v->duration > 0 ? in_v->duration / (double)AV_TIME_BASE : 1e18);

  AVPacket* pkt = av_packet_alloc();
  // video pass
  while (av_read_frame(in_v, pkt) >= 0) {
    if (pkt->stream_index == vs) {
      av_packet_rescale_ts(pkt, in_v->streams[vs]->time_base, ov->time_base);
      pkt->stream_index = 0;
      av_interleaved_write_frame(out, pkt);
    }
    av_packet_unref(pkt);
  }
  // audio pass, trimmed to video duration
  while (av_read_frame(in_a, pkt) >= 0) {
    if (pkt->stream_index == as) {
      double t = pkt->pts * av_q2d(in_a->streams[as]->time_base);
      if (t > video_dur) {
        av_packet_unref(pkt);
        break;
      }
      av_packet_rescale_ts(pkt, in_a->streams[as]->time_base, oa->time_base);
      pkt->stream_index = 1;
      av_interleaved_write_frame(out, pkt);
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  av_write_trailer(out);
  if (!(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
  avformat_free_context(out);
  avformat_close_input(&in_v);
  avformat_close_input(&in_a);
  return 0;
}

}  // extern "C"
