// Native media runtime for vexpress_tpu.
//
// Replaces the reference's host-side media dependencies (torchaudio.load +
// resample, inference.py:245-253; ffmpeg-subprocess audio muxing,
// pipelines/utils.py:84-86) with an in-process C++ module on
// libavformat/libavcodec/libswresample:
//
//   vx_decode_audio  — demux + decode any audio container/codec to mono
//                      float PCM at a target sample rate
//   vx_mux_av        — mux a (video-only) mp4 with an audio file into one
//                      container, trimmed to the shorter stream. Audio is
//                      stream-copied when the output container supports the
//                      source codec, else transcoded to the container's
//                      default audio codec (AAC for mp4) — the same outcome
//                      as the reference's ffmpeg invocation, which lets
//                      ffmpeg pick the codec (so .wav input still muxes)
//   vx_venc_*        — streaming video encoder taking YUV420P planes
//                      directly (open / write frame / close). The pipeline
//                      converts RGB->YUV420 ON DEVICE (pipelines/pipeline.
//                      _to_yuv420), so the host link carries 1.5 B/px instead
//                      of 3 B/px and the host never touches RGB at all —
//                      replacing cv2.VideoWriter's BGR path + its internal
//                      sws conversion.
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
#include <libavutil/audio_fifo.h>
#include <libavutil/channel_layout.h>
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

namespace {

// decode -> resample -> fifo -> encode state for the transcode audio path
struct AudioTranscoder {
  AVCodecContext* dec = nullptr;
  AVCodecContext* enc = nullptr;
  SwrContext* swr = nullptr;
  AVAudioFifo* fifo = nullptr;
  int64_t next_pts = 0;  // in encoder samples
  ~AudioTranscoder() {
    if (fifo) av_audio_fifo_free(fifo);
    if (swr) swr_free(&swr);
    if (enc) avcodec_free_context(&enc);
    if (dec) avcodec_free_context(&dec);
  }
};

int pick_sample_rate(const AVCodec* enc, int want) {
  if (!enc->supported_samplerates) return want;
  int best = enc->supported_samplerates[0];
  for (const int* r = enc->supported_samplerates; *r; ++r) {
    if (*r == want) return want;
    if (std::abs(*r - want) < std::abs(best - want)) best = *r;
  }
  return best;
}

// Open decoder + encoder + resampler + fifo and fill oa->codecpar from the
// encoder. Returns 0 on success, else -1 with a message in *emsg.
int setup_audio_transcoder(AudioTranscoder& t, AVFormatContext* in_a, int as,
                           AVFormatContext* out, const char* out_path,
                           AVStream* oa, std::string* emsg) {
  AVStream* ia = in_a->streams[as];
  const AVCodec* dec_codec = avcodec_find_decoder(ia->codecpar->codec_id);
  if (!dec_codec) { *emsg = "no audio decoder"; return -1; }
  t.dec = avcodec_alloc_context3(dec_codec);
  avcodec_parameters_to_context(t.dec, ia->codecpar);
  int ret = avcodec_open2(t.dec, dec_codec, nullptr);
  if (ret < 0) { *emsg = "audio decoder open: " + av_errstr(ret); return -1; }

  enum AVCodecID enc_id = av_guess_codec(
      const_cast<AVOutputFormat*>(out->oformat), nullptr, out_path, nullptr,
      AVMEDIA_TYPE_AUDIO);
  const AVCodec* enc_codec = avcodec_find_encoder(enc_id);
  if (!enc_codec) { *emsg = "no audio encoder for output container"; return -1; }
  t.enc = avcodec_alloc_context3(enc_codec);
  // AAC (and most lossy codecs) cap at stereo in practice; downmix beyond
  // 2ch. Use the canonical named layout — decoders like pcm_s16le report an
  // order-unspecified layout ("1 channels") that encoders reject.
  int nch = t.dec->ch_layout.nb_channels > 2 ? 2 : t.dec->ch_layout.nb_channels;
  av_channel_layout_default(&t.enc->ch_layout, nch);
  t.enc->sample_rate = pick_sample_rate(enc_codec, t.dec->sample_rate);
  t.enc->sample_fmt = enc_codec->sample_fmts ? enc_codec->sample_fmts[0]
                                             : AV_SAMPLE_FMT_FLTP;
  t.enc->bit_rate = 64000 * t.enc->ch_layout.nb_channels;  // speech-sane
  t.enc->time_base = AVRational{1, t.enc->sample_rate};
  if (out->oformat->flags & AVFMT_GLOBALHEADER)
    t.enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  ret = avcodec_open2(t.enc, enc_codec, nullptr);
  if (ret < 0) { *emsg = "audio encoder open: " + av_errstr(ret); return -1; }
  avcodec_parameters_from_context(oa->codecpar, t.enc);
  oa->time_base = t.enc->time_base;

  ret = swr_alloc_set_opts2(&t.swr, &t.enc->ch_layout, t.enc->sample_fmt,
                            t.enc->sample_rate, &t.dec->ch_layout,
                            t.dec->sample_fmt, t.dec->sample_rate, 0, nullptr);
  if (ret < 0 || !t.swr || swr_init(t.swr) < 0) {
    *emsg = "transcode swresample init failed";
    return -1;
  }
  t.fifo = av_audio_fifo_alloc(t.enc->sample_fmt, t.enc->ch_layout.nb_channels, 1);
  if (!t.fifo) { *emsg = "audio fifo alloc failed"; return -1; }
  return 0;
}

// Decode + resample + re-encode the audio stream into output stream 1,
// stopping once video_dur seconds have been encoded. Returns 0 on success.
int run_audio_transcode(AudioTranscoder& t, AVFormatContext* in_a, int as,
                        AVFormatContext* out, AVStream* oa, double video_dur,
                        std::string* emsg) {
  AVPacket* pkt = av_packet_alloc();
  AVPacket* enc_pkt = av_packet_alloc();
  AVFrame* dec_frame = av_frame_alloc();
  AVFrame* enc_frame = av_frame_alloc();
  uint8_t** conv = nullptr;
  int conv_cap = 0;
  int ret = 0;
  std::string msg;

  auto fifo_push_converted = [&](AVFrame* f) -> int {
    int in_nb = f ? f->nb_samples : 0;
    int max_out = (int)av_rescale_rnd(
        swr_get_delay(t.swr, t.dec->sample_rate) + in_nb,
        t.enc->sample_rate, t.dec->sample_rate, AV_ROUND_UP);
    if (max_out <= 0) max_out = 1024;
    if (max_out > conv_cap) {
      if (conv) { av_freep(&conv[0]); av_freep(&conv); }
      if (av_samples_alloc_array_and_samples(
              &conv, nullptr, t.enc->ch_layout.nb_channels, max_out,
              t.enc->sample_fmt, 0) < 0) {
        msg = "transcode buffer alloc failed";
        return -1;
      }
      conv_cap = max_out;
    }
    int got = swr_convert(t.swr, conv, max_out,
                          f ? (const uint8_t**)f->extended_data : nullptr, in_nb);
    if (got > 0 && av_audio_fifo_write(t.fifo, (void**)conv, got) < got) {
      msg = "audio fifo write failed";
      return -1;
    }
    return 0;
  };

  // encode `n` samples from the fifo (n <= frame_size; short final frame OK)
  auto encode_from_fifo = [&](int n) -> int {
    enc_frame->nb_samples = n;
    enc_frame->format = t.enc->sample_fmt;
    enc_frame->sample_rate = t.enc->sample_rate;
    av_channel_layout_copy(&enc_frame->ch_layout, &t.enc->ch_layout);
    if (av_frame_get_buffer(enc_frame, 0) < 0 ||
        av_audio_fifo_read(t.fifo, (void**)enc_frame->data, n) < n) {
      msg = "audio fifo read failed";
      return -1;
    }
    enc_frame->pts = t.next_pts;
    t.next_pts += n;
    int r = avcodec_send_frame(t.enc, enc_frame);
    av_frame_unref(enc_frame);
    if (r < 0) { msg = "audio encode: " + av_errstr(r); return -1; }
    while (avcodec_receive_packet(t.enc, enc_pkt) >= 0) {
      av_packet_rescale_ts(enc_pkt, t.enc->time_base, oa->time_base);
      enc_pkt->stream_index = 1;
      av_interleaved_write_frame(out, enc_pkt);
      av_packet_unref(enc_pkt);
    }
    return 0;
  };

  const int frame_size = t.enc->frame_size > 0 ? t.enc->frame_size : 1024;
  bool trimmed = false;
  while (!trimmed && av_read_frame(in_a, pkt) >= 0) {
    if (pkt->stream_index == as && avcodec_send_packet(t.dec, pkt) >= 0) {
      while (avcodec_receive_frame(t.dec, dec_frame) >= 0) {
        if ((ret = fifo_push_converted(dec_frame)) < 0) goto done;
      }
    }
    av_packet_unref(pkt);
    while (av_audio_fifo_size(t.fifo) >= frame_size) {
      if ((double)t.next_pts / t.enc->sample_rate > video_dur) {
        trimmed = true;
        break;
      }
      if ((ret = encode_from_fifo(frame_size)) < 0) goto done;
    }
  }
  if (!trimmed) {
    // flush decoder, resampler, fifo tail, then the encoder
    avcodec_send_packet(t.dec, nullptr);
    while (avcodec_receive_frame(t.dec, dec_frame) >= 0) {
      if ((ret = fifo_push_converted(dec_frame)) < 0) goto done;
    }
    if ((ret = fifo_push_converted(nullptr)) < 0) goto done;
    while (av_audio_fifo_size(t.fifo) > 0) {
      int n = av_audio_fifo_size(t.fifo);
      if ((ret = encode_from_fifo(n < frame_size ? n : frame_size)) < 0) goto done;
    }
  }
  avcodec_send_frame(t.enc, nullptr);
  while (avcodec_receive_packet(t.enc, enc_pkt) >= 0) {
    av_packet_rescale_ts(enc_pkt, t.enc->time_base, oa->time_base);
    enc_pkt->stream_index = 1;
    av_interleaved_write_frame(out, enc_pkt);
    av_packet_unref(enc_pkt);
  }

done:
  if (conv) { av_freep(&conv[0]); av_freep(&conv); }
  av_frame_free(&dec_frame);
  av_frame_free(&enc_frame);
  av_packet_free(&pkt);
  av_packet_free(&enc_pkt);
  if (ret < 0) *emsg = msg;
  return ret;
}

}  // namespace

// Mux the video stream of `video_path` with the audio stream of `audio_path`
// into `out_path` (container inferred from extension), stopping at the
// shorter stream ("-shortest" semantics). Audio is stream-copied when the
// container supports the source codec, else transcoded to the container's
// default audio codec (AAC for mp4) — matching the reference's ffmpeg
// invocation, which lets ffmpeg pick (pipelines/utils.py:84-86).
// Returns 0 on success.
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

  auto fail = [&](const std::string& msg) {
    set_err(err, errlen, msg);
    if (out) {
      if (out->pb && !(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
      avformat_free_context(out);
    }
    avformat_close_input(&in_v);
    avformat_close_input(&in_a);
    return -1;
  };

  if (vs < 0 || as < 0) return fail("missing stream (video or audio)");

  avformat_alloc_output_context2(&out, nullptr, nullptr, out_path);
  if (!out) return fail("alloc output failed");
  AVStream* ov = avformat_new_stream(out, nullptr);
  AVStream* oa = avformat_new_stream(out, nullptr);
  avcodec_parameters_copy(ov->codecpar, in_v->streams[vs]->codecpar);
  ov->codecpar->codec_tag = 0;

  // stream-copy only if the output container can carry the source codec
  bool copy_audio = avformat_query_codec(
      out->oformat, in_a->streams[as]->codecpar->codec_id,
      FF_COMPLIANCE_NORMAL) == 1;
  AudioTranscoder t;
  std::string emsg;
  if (copy_audio) {
    avcodec_parameters_copy(oa->codecpar, in_a->streams[as]->codecpar);
    oa->codecpar->codec_tag = 0;
  } else if (setup_audio_transcoder(t, in_a, as, out, out_path, oa, &emsg) < 0) {
    return fail(emsg);
  }

  if (!(out->oformat->flags & AVFMT_NOFILE)) {
    if ((ret = avio_open(&out->pb, out_path, AVIO_FLAG_WRITE)) < 0)
      return fail("avio_open: " + av_errstr(ret));
  }
  if ((ret = avformat_write_header(out, nullptr)) < 0)
    return fail("write_header: " + av_errstr(ret));

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
  if (copy_audio) {
    while (av_read_frame(in_a, pkt) >= 0) {
      if (pkt->stream_index == as) {
        double tsec = pkt->pts * av_q2d(in_a->streams[as]->time_base);
        if (tsec > video_dur) {
          av_packet_unref(pkt);
          break;
        }
        av_packet_rescale_ts(pkt, in_a->streams[as]->time_base, oa->time_base);
        pkt->stream_index = 1;
        av_interleaved_write_frame(out, pkt);
      }
      av_packet_unref(pkt);
    }
  } else if (run_audio_transcode(t, in_a, as, out, oa, video_dur, &emsg) < 0) {
    av_packet_free(&pkt);
    av_write_trailer(out);
    return fail(emsg);
  }
  av_packet_free(&pkt);
  av_write_trailer(out);
  if (!(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
  avformat_free_context(out);
  avformat_close_input(&in_v);
  avformat_close_input(&in_a);
  return 0;
}

// ---------------------------------------------------------------------------
// Streaming YUV420P video encoder.
//
// vx_venc_open  -> opaque handle (nullptr on failure, message in err)
// vx_venc_write -> feed one frame as three planes (Y: w*h, U/V: w/2*h/2,
//                  tightly packed rows); returns 0 on success
// vx_venc_close -> flush, write trailer, free; returns 0 on success
//
// Codec: H.264 when an encoder is present in this libavcodec build, else
// MPEG-4 part 2 (what cv2.VideoWriter's "mp4v" wrote before). Quality is
// qscale-based (qmin/qmax pinned) — visually transparent for this use.

struct VEnc {
  AVFormatContext* oc = nullptr;
  AVCodecContext* cc = nullptr;
  AVStream* st = nullptr;
  AVFrame* fr = nullptr;
  AVPacket* pkt = nullptr;
  int64_t n = 0;
  int w = 0, h = 0;
};

namespace {

void venc_free(VEnc* e) {
  if (!e) return;
  if (e->fr) av_frame_free(&e->fr);
  if (e->pkt) av_packet_free(&e->pkt);
  if (e->cc) avcodec_free_context(&e->cc);
  if (e->oc) {
    if (e->oc->pb && !(e->oc->oformat->flags & AVFMT_NOFILE)) avio_closep(&e->oc->pb);
    avformat_free_context(e->oc);
  }
  delete e;
}

int venc_drain(VEnc* e, char* err, int errlen) {
  // receive + write all pending packets from the encoder
  int ret;
  while ((ret = avcodec_receive_packet(e->cc, e->pkt)) >= 0) {
    av_packet_rescale_ts(e->pkt, e->cc->time_base, e->st->time_base);
    if (e->pkt->duration == 0)  // 1 frame in codec tb; keeps stream duration
      e->pkt->duration = av_rescale_q(1, e->cc->time_base, e->st->time_base);
    e->pkt->stream_index = 0;
    int wret = av_interleaved_write_frame(e->oc, e->pkt);
    av_packet_unref(e->pkt);
    if (wret < 0) {
      set_err(err, errlen, "write packet: " + av_errstr(wret));
      return -1;
    }
  }
  if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
  set_err(err, errlen, "receive packet: " + av_errstr(ret));
  return -1;
}

}  // namespace

void* vx_venc_open(const char* path, int w, int h, double fps,
                   char* err, int errlen) {
  av_log_set_level(AV_LOG_ERROR);  // keep the x264 banner out of CLI output
  if (w <= 0 || h <= 0 || (w % 2) || (h % 2) || fps <= 0) {
    set_err(err, errlen, "invalid dims/fps (need even w/h, fps > 0)");
    return nullptr;
  }
  VEnc* e = new VEnc();
  e->w = w;
  e->h = h;
  auto fail = [&](const std::string& msg) -> void* {
    set_err(err, errlen, msg);
    venc_free(e);
    return nullptr;
  };

  avformat_alloc_output_context2(&e->oc, nullptr, nullptr, path);
  if (!e->oc) return fail("alloc output context failed (bad extension?)");

  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) return fail("no H.264 or MPEG-4 encoder in this libavcodec");

  e->st = avformat_new_stream(e->oc, nullptr);
  e->cc = avcodec_alloc_context3(codec);
  if (!e->st || !e->cc) return fail("alloc stream/codec context failed");

  e->cc->width = w;
  e->cc->height = h;
  e->cc->pix_fmt = AV_PIX_FMT_YUV420P;
  e->cc->time_base = av_d2q(1.0 / fps, 1000000);
  e->cc->framerate = av_d2q(fps, 1000000);
  e->cc->gop_size = 12;
  e->cc->color_range = AVCOL_RANGE_MPEG;      // planes are studio-swing BT.601
  e->cc->colorspace = AVCOL_SPC_BT470BG;
  // constant-quality mode: visually transparent, no bitrate tuning needed
  e->cc->flags |= AV_CODEC_FLAG_QSCALE;
  e->cc->global_quality = FF_QP2LAMBDA * 3;
  e->cc->qmin = 2;
  e->cc->qmax = 10;
  if (codec->id == AV_CODEC_ID_H264) {
    av_opt_set(e->cc->priv_data, "preset", "fast", 0);
    av_opt_set(e->cc->priv_data, "crf", "18", 0);
  }
  if (e->oc->oformat->flags & AVFMT_GLOBALHEADER)
    e->cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;

  int ret;
  if ((ret = avcodec_open2(e->cc, codec, nullptr)) < 0)
    return fail("video encoder open: " + av_errstr(ret));
  if ((ret = avcodec_parameters_from_context(e->st->codecpar, e->cc)) < 0)
    return fail("codec params: " + av_errstr(ret));
  e->st->time_base = e->cc->time_base;
  e->st->avg_frame_rate = e->cc->framerate;

  if (!(e->oc->oformat->flags & AVFMT_NOFILE)) {
    if ((ret = avio_open(&e->oc->pb, path, AVIO_FLAG_WRITE)) < 0)
      return fail("avio_open: " + av_errstr(ret));
  }
  if ((ret = avformat_write_header(e->oc, nullptr)) < 0)
    return fail("write_header: " + av_errstr(ret));

  e->fr = av_frame_alloc();
  e->pkt = av_packet_alloc();
  if (!e->fr || !e->pkt) return fail("alloc frame/packet failed");
  e->fr->format = AV_PIX_FMT_YUV420P;
  e->fr->width = w;
  e->fr->height = h;
  if ((ret = av_frame_get_buffer(e->fr, 0)) < 0)
    return fail("frame buffer: " + av_errstr(ret));
  return e;
}

int vx_venc_write(void* handle, const uint8_t* y, const uint8_t* u,
                  const uint8_t* v, char* err, int errlen) {
  VEnc* e = (VEnc*)handle;
  if (!e) {
    set_err(err, errlen, "null encoder handle");
    return -1;
  }
  int ret;
  if ((ret = av_frame_make_writable(e->fr)) < 0) {
    set_err(err, errlen, "frame not writable: " + av_errstr(ret));
    return -1;
  }
  const int w = e->w, h = e->h, cw = w / 2, ch = h / 2;
  for (int r = 0; r < h; r++)
    std::memcpy(e->fr->data[0] + (size_t)r * e->fr->linesize[0], y + (size_t)r * w, w);
  for (int r = 0; r < ch; r++) {
    std::memcpy(e->fr->data[1] + (size_t)r * e->fr->linesize[1], u + (size_t)r * cw, cw);
    std::memcpy(e->fr->data[2] + (size_t)r * e->fr->linesize[2], v + (size_t)r * cw, cw);
  }
  e->fr->pts = e->n++;
  e->fr->quality = e->cc->global_quality;
  if ((ret = avcodec_send_frame(e->cc, e->fr)) < 0) {
    set_err(err, errlen, "send frame: " + av_errstr(ret));
    return -1;
  }
  return venc_drain(e, err, errlen);
}

int vx_venc_close(void* handle, char* err, int errlen) {
  VEnc* e = (VEnc*)handle;
  if (!e) {
    set_err(err, errlen, "null encoder handle");
    return -1;
  }
  int rc = 0;
  int ret = avcodec_send_frame(e->cc, nullptr);  // flush
  if (ret < 0 && ret != AVERROR_EOF) {
    set_err(err, errlen, "flush: " + av_errstr(ret));
    rc = -1;
  } else if (venc_drain(e, err, errlen) < 0) {
    rc = -1;
  }
  if ((ret = av_write_trailer(e->oc)) < 0 && rc == 0) {
    set_err(err, errlen, "trailer: " + av_errstr(ret));
    rc = -1;
  }
  venc_free(e);
  return rc;
}

}  // extern "C"
