// reenact_io — native host-side IO runtime for the TPU reenactment framework.
//
// Role: the host data path around the XLA compute path. The reference uses
// OpenCV (C++ under the hood) for video decode/encode and frame handling
// (`libs/utilities/utils_inference.py:11-58` extract_frames/generate_video);
// this library provides the equivalent on libavformat/libavcodec/libswscale:
//
//   * rio_video_open / rio_video_read / rio_video_close — demux+decode an
//     mp4/avi into RGB24 frames with an optional frame stride (the
//     reference's `fps` parameter is actually a stride).
//   * rio_video_writer_* — encode RGB24 frames to an mp4 (mpeg4 fourcc,
//     matching the reference's `mp4v` writer).
//   * rio_resize_bilinear_u8 / rio_to_gan_range — batch preprocessing
//     (bilinear resize + [-1,1] normalization) without a Python loop.
//
// Exposed via a plain C ABI consumed by ctypes (`native/imgproc.py`).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

extern "C" {

// ---------------------------------------------------------------------------
// Decoder
// ---------------------------------------------------------------------------

struct RioVideo {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* dec = nullptr;
    SwsContext* sws = nullptr;
    int stream_index = -1;
    int width = 0;
    int height = 0;
    double fps = 0.0;
    long decoded = 0;  // persists across rio_video_read calls (stride state)
    AVPacket* pending = nullptr;  // packet the decoder refused (EAGAIN)
};

void* rio_video_open(const char* path) {
    auto* v = new RioVideo();
    if (avformat_open_input(&v->fmt, path, nullptr, nullptr) < 0) {
        delete v;
        return nullptr;
    }
    if (avformat_find_stream_info(v->fmt, nullptr) < 0) {
        avformat_close_input(&v->fmt);
        delete v;
        return nullptr;
    }
    const AVCodec* codec = nullptr;
    v->stream_index = av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                          &codec, 0);
    if (v->stream_index < 0 || !codec) {
        avformat_close_input(&v->fmt);
        delete v;
        return nullptr;
    }
    AVStream* st = v->fmt->streams[v->stream_index];
    v->dec = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(v->dec, st->codecpar);
    // frame-threaded decode; hardware_concurrency reports 1 in some
    // containers, so keep a floor — idle threads cost ~nothing, missing
    // ones serialize the codec
    {
        unsigned hc = std::thread::hardware_concurrency();
        v->dec->thread_count = hc > 8 ? (int)hc : 8;
    }
    v->dec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (avcodec_open2(v->dec, codec, nullptr) < 0) {
        avcodec_free_context(&v->dec);
        avformat_close_input(&v->fmt);
        delete v;
        return nullptr;
    }
    v->width = v->dec->width;
    v->height = v->dec->height;
    AVRational r = st->avg_frame_rate;
    v->fps = r.den ? (double)r.num / r.den : 0.0;
    return v;
}

int rio_video_width(void* h) { return ((RioVideo*)h)->width; }
int rio_video_height(void* h) { return ((RioVideo*)h)->height; }
double rio_video_fps(void* h) { return ((RioVideo*)h)->fps; }

// Read up to max_frames frames (taking every `stride`-th decoded frame)
// into out (max_frames * height * width * 3, RGB24). Returns frames read.
int rio_video_read(void* h, uint8_t* out, int max_frames, int stride) {
    auto* v = (RioVideo*)h;
    if (stride < 1) stride = 1;
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    AVFrame* rgb = av_frame_alloc();

    const size_t frame_bytes = (size_t)v->width * v->height * 3;
    int written = 0;

    if (!v->sws) {
        v->sws = sws_getContext(v->width, v->height, v->dec->pix_fmt,
                                v->width, v->height, AV_PIX_FMT_RGB24,
                                SWS_BILINEAR, nullptr, nullptr, nullptr);
    }

    auto emit = [&](AVFrame* f) {
        if (written >= max_frames) return;
        if (v->decoded % stride == 0) {
            uint8_t* dst_data[1] = {out + (size_t)written * frame_bytes};
            int dst_linesize[1] = {3 * v->width};
            sws_scale(v->sws, f->data, f->linesize, 0, v->height, dst_data,
                      dst_linesize);
            written++;
        }
        v->decoded++;
    };

    // A packet must never be read from the demuxer and then dropped:
    // B-frame decoders return EAGAIN from send while frames are pending,
    // and a full output buffer can force an early return — the refused
    // packet is stashed in v->pending and re-sent on the next call.
    bool eof = false;
    while (written < max_frames) {
        const bool from_pending = v->pending != nullptr;
        AVPacket* cur;
        if (from_pending) {
            cur = v->pending;
        } else {
            if (av_read_frame(v->fmt, pkt) < 0) { eof = true; break; }
            if (pkt->stream_index != v->stream_index) {
                av_packet_unref(pkt);
                continue;
            }
            cur = pkt;
        }
        const int s = avcodec_send_packet(v->dec, cur);
        if (s == AVERROR(EAGAIN)) {
            if (!from_pending) {
                v->pending = av_packet_alloc();
                av_packet_move_ref(v->pending, pkt);
            }
        } else {  // consumed (0) or hard error: release the packet
            if (from_pending) av_packet_free(&v->pending);
            else av_packet_unref(pkt);
        }
        while (avcodec_receive_frame(v->dec, frame) == 0) {
            emit(frame);
            if (written >= max_frames) break;
        }
    }
    // flush only at true end-of-stream (a full output buffer is not EOF)
    if (eof && !v->pending) {
        avcodec_send_packet(v->dec, nullptr);
        while (avcodec_receive_frame(v->dec, frame) == 0 &&
               written < max_frames) {
            emit(frame);
        }
    }
    av_frame_free(&rgb);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    return written;
}

void rio_video_close(void* h) {
    auto* v = (RioVideo*)h;
    if (v->pending) av_packet_free(&v->pending);
    if (v->sws) sws_freeContext(v->sws);
    if (v->dec) avcodec_free_context(&v->dec);
    if (v->fmt) avformat_close_input(&v->fmt);
    delete v;
}

// ---------------------------------------------------------------------------
// Encoder: h264-in-mp4 via libx264 when available (universally decodable,
// none of mpeg4's last-frame flush quirks), mpeg4 fallback (the
// reference's cv2 `mp4v` writer equivalent).
// ---------------------------------------------------------------------------

struct RioWriter {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* enc = nullptr;
    AVStream* stream = nullptr;
    SwsContext* sws = nullptr;
    AVFrame* yuv = nullptr;
    int width = 0, height = 0;
    int64_t pts = 0;
};

void* rio_writer_open(const char* path, int width, int height, int fps) {
    auto* w = new RioWriter();
    w->width = width;
    w->height = height;
    avformat_alloc_output_context2(&w->fmt, nullptr, "mp4", path);
    if (!w->fmt) { delete w; return nullptr; }
    const AVCodec* codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!codec) { avformat_free_context(w->fmt); delete w; return nullptr; }
    w->stream = avformat_new_stream(w->fmt, codec);
    w->enc = avcodec_alloc_context3(codec);
    w->enc->width = width;
    w->enc->height = height;
    w->enc->pix_fmt = AV_PIX_FMT_YUV420P;
    w->enc->time_base = AVRational{1, fps};
    // frame-threaded encode: x264 gets threads=1 through libav unless the
    // context asks (thread_count=0 "auto" also resolves to 1 in
    // containers whose hardware_concurrency reports 1) — single-threaded
    // encode was the wall-clock floor of the video→video path
    // (3.2 s per 48 grid frames; threaded veryfast: 1.2 s)
    {
        unsigned hc = std::thread::hardware_concurrency();
        w->enc->thread_count = hc > 8 ? (int)hc : 8;
    }
    w->enc->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (codec->id == AV_CODEC_ID_H264) {
        av_opt_set(w->enc->priv_data, "preset", "veryfast", 0);
        av_opt_set(w->enc->priv_data, "crf", "18", 0);
        // no B-frames: this libav build's h264 decoder drops the final
        // reordered frame of a B-frame stream at EOF
        w->enc->max_b_frames = 0;
    } else {
        w->enc->bit_rate = 4'000'000;
    }
    if (w->fmt->oformat->flags & AVFMT_GLOBALHEADER)
        w->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(w->enc, codec, nullptr) < 0) {
        avcodec_free_context(&w->enc);
        avformat_free_context(w->fmt);
        delete w;
        return nullptr;
    }
    avcodec_parameters_from_context(w->stream->codecpar, w->enc);
    w->stream->time_base = w->enc->time_base;
    if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) {
        if (avio_open(&w->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
            avcodec_free_context(&w->enc);
            avformat_free_context(w->fmt);
            delete w;
            return nullptr;
        }
    }
    if (avformat_write_header(w->fmt, nullptr) < 0) {
        avcodec_free_context(&w->enc);
        avformat_free_context(w->fmt);
        delete w;
        return nullptr;
    }
    w->sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                            AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                            nullptr, nullptr);
    w->yuv = av_frame_alloc();
    w->yuv->format = AV_PIX_FMT_YUV420P;
    w->yuv->width = width;
    w->yuv->height = height;
    av_frame_get_buffer(w->yuv, 0);
    return w;
}

static int rio_writer_flush_packets(RioWriter* w) {
    AVPacket* pkt = av_packet_alloc();
    int ret;
    while ((ret = avcodec_receive_packet(w->enc, pkt)) == 0) {
        av_packet_rescale_ts(pkt, w->enc->time_base, w->stream->time_base);
        pkt->stream_index = w->stream->index;
        av_interleaved_write_frame(w->fmt, pkt);
        av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    return ret == AVERROR(EAGAIN) || ret == AVERROR_EOF ? 0 : ret;
}

int rio_writer_write(void* h, const uint8_t* rgb) {
    auto* w = (RioWriter*)h;
    const uint8_t* src_data[1] = {rgb};
    int src_linesize[1] = {3 * w->width};
    av_frame_make_writable(w->yuv);
    sws_scale(w->sws, src_data, src_linesize, 0, w->height, w->yuv->data,
              w->yuv->linesize);
    w->yuv->pts = w->pts++;
    if (avcodec_send_frame(w->enc, w->yuv) < 0) return -1;
    return rio_writer_flush_packets(w);
}

int rio_writer_close(void* h) {
    auto* w = (RioWriter*)h;
    avcodec_send_frame(w->enc, nullptr);
    rio_writer_flush_packets(w);
    av_write_trailer(w->fmt);
    if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&w->fmt->pb);
    sws_freeContext(w->sws);
    av_frame_free(&w->yuv);
    avcodec_free_context(&w->enc);
    avformat_free_context(w->fmt);
    delete w;
    return 0;
}

// ---------------------------------------------------------------------------
// Batch preprocessing
// ---------------------------------------------------------------------------

// Bilinear resize a batch of HWC uint8 RGB images (half-pixel centers,
// matching torch/PIL antialias-off semantics closely enough for data-path
// use).
void rio_resize_bilinear_u8(const uint8_t* src, int n, int h, int w,
                            uint8_t* dst, int oh, int ow) {
    const double sy = (double)h / oh;
    const double sx = (double)w / ow;
    for (int i = 0; i < n; i++) {
        const uint8_t* s = src + (size_t)i * h * w * 3;
        uint8_t* d = dst + (size_t)i * oh * ow * 3;
        for (int y = 0; y < oh; y++) {
            double fy = (y + 0.5) * sy - 0.5;
            int y0 = (int)fy;
            if (fy < 0) { fy = 0; y0 = 0; }
            int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
            double wy = fy - y0;
            for (int x = 0; x < ow; x++) {
                double fx = (x + 0.5) * sx - 0.5;
                int x0 = (int)fx;
                if (fx < 0) { fx = 0; x0 = 0; }
                int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
                double wx = fx - x0;
                for (int c = 0; c < 3; c++) {
                    double v00 = s[(y0 * w + x0) * 3 + c];
                    double v01 = s[(y0 * w + x1) * 3 + c];
                    double v10 = s[(y1 * w + x0) * 3 + c];
                    double v11 = s[(y1 * w + x1) * 3 + c];
                    double v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                               wy * ((1 - wx) * v10 + wx * v11);
                    d[(y * ow + x) * 3 + c] = (uint8_t)(v + 0.5);
                }
            }
        }
    }
}


// ---------------------------------------------------------------------------
// FFHQ landmark crop (reference `ffhq_cropping.py:49-69` fast path)
// ---------------------------------------------------------------------------

// PIL-compatible bicubic resampling (a = -0.5, antialias: the filter
// support scales with the downscale ratio, like ImagingResample's float
// path). Separable with precomputed per-axis weight tables; both passes
// stream rows (cache-friendly).
static inline double rio_cubic(double x) {
    const double a = -0.5;
    if (x < 0) x = -x;
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

struct RioAxisTable {
    std::vector<int> lo, len;
    std::vector<float> w;   // out_len rows of max_len weights
    int max_len = 0;
};

static RioAxisTable rio_axis_table(int in_len, int out_len) {
    RioAxisTable t;
    const double scale = (double)in_len / out_len;
    const double filterscale = scale > 1.0 ? scale : 1.0;
    const double support = 2.0 * filterscale;
    t.max_len = (int)std::ceil(2.0 * support) + 2;
    t.lo.resize(out_len);
    t.len.resize(out_len);
    t.w.assign((size_t)out_len * t.max_len, 0.0f);
    for (int i = 0; i < out_len; i++) {
        const double center = (i + 0.5) * scale;
        int lo = (int)(center - support + 0.5);
        int hi = (int)(center + support + 0.5);
        if (lo < 0) lo = 0;
        if (hi > in_len) hi = in_len;
        double wsum = 0.0;
        float* row = t.w.data() + (size_t)i * t.max_len;
        for (int j = lo; j < hi; j++) {
            const double wgt = rio_cubic((j - center + 0.5) / filterscale);
            row[j - lo] = (float)wgt;
            wsum += wgt;
        }
        if (wsum != 0.0)
            for (int j = 0; j < hi - lo; j++) row[j] = (float)(row[j] / wsum);
        t.lo[i] = lo;
        t.len[i] = hi - lo;
    }
    return t;
}

// numpy-compatible round-half-even (the Python path uses ndarray.round()).
static inline long rio_round_half_even(double v) {
    const double f = std::floor(v);
    const double diff = v - f;
    if (diff > 0.5) return (long)f + 1;
    if (diff < 0.5) return (long)f;
    const long fl = (long)f;
    return (fl % 2 == 0) ? fl : fl + 1;
}

// One FFHQ crop: landmark bbox -> square crop box -> bicubic resize to
// out_size. Returns 1 on success; 0 when the box leaves the frame or is
// degenerate (caller falls back to the Python pad+blur+fade slow path).
static int rio_ffhq_crop_one(const uint8_t* img, int h, int w,
                             const float* lms, uint8_t* out, int out_size) {
    double minx = lms[0], maxx = lms[0], miny = lms[1], maxy = lms[1];
    for (int i = 1; i < 68; i++) {
        const double x = lms[2 * i], y = lms[2 * i + 1];
        if (x < minx) minx = x;
        if (x > maxx) maxx = x;
        if (y < miny) miny = y;
        if (y > maxy) maxy = y;
    }
    const long cx = rio_round_half_even((minx + maxx) / 2.0);
    long cy = rio_round_half_even((miny + maxy) / 2.0);
    long size = (long)((maxx - minx) > (maxy - miny) ? (maxx - minx)
                                                     : (maxy - miny));
    if (size <= 0) return 0;
    cy -= size / 6;
    const long x1 = cx - size, y1 = cy - size;
    const long x2 = cx + size, y2 = cy + size;
    if (x1 < 0 || y1 < 0 || x2 > w || y2 > h) return 0;  // slow path
    const int cw = (int)(x2 - x1), ch = (int)(y2 - y1);

    const RioAxisTable tx = rio_axis_table(cw, out_size);
    const RioAxisTable ty = rio_axis_table(ch, out_size);

    // horizontal pass: (ch, cw, 3) u8 -> (ch, out, 3), streaming rows.
    // PIL quantizes the intermediate image to uint8 between the two
    // passes (8-bit pipeline); match it for parity.
    auto q8 = [](float v) -> float {
        if (v < 0) v = 0;
        if (v > 255) v = 255;
        return (float)(int)(v + 0.5f);
    };
    std::vector<float> tmp((size_t)ch * out_size * 3);
    for (int y = 0; y < ch; y++) {
        const uint8_t* sp = img + (((size_t)(y1 + y) * w) + x1) * 3;
        float* dp = tmp.data() + (size_t)y * out_size * 3;
        for (int i = 0; i < out_size; i++) {
            const float* wr = tx.w.data() + (size_t)i * tx.max_len;
            const uint8_t* jp = sp + (size_t)tx.lo[i] * 3;
            float a0 = 0, a1 = 0, a2 = 0;
            for (int j = 0; j < tx.len[i]; j++, jp += 3) {
                const float wgt = wr[j];
                a0 += wgt * jp[0];
                a1 += wgt * jp[1];
                a2 += wgt * jp[2];
            }
            dp[3 * i] = q8(a0);
            dp[3 * i + 1] = q8(a1);
            dp[3 * i + 2] = q8(a2);
        }
    }
    // vertical pass: accumulate whole rows (contiguous axpy)
    const int row_elems = out_size * 3;
    std::vector<float> acc(row_elems);
    for (int i = 0; i < out_size; i++) {
        std::fill(acc.begin(), acc.end(), 0.0f);
        const float* wr = ty.w.data() + (size_t)i * ty.max_len;
        for (int j = 0; j < ty.len[i]; j++) {
            const float wgt = wr[j];
            const float* rp = tmp.data() + (size_t)(ty.lo[i] + j) * row_elems;
            for (int k = 0; k < row_elems; k++) acc[k] += wgt * rp[k];
        }
        uint8_t* op = out + (size_t)i * row_elems;
        for (int k = 0; k < row_elems; k++) {
            float v = acc[k];
            if (v < 0) v = 0;
            if (v > 255) v = 255;
            op[k] = (uint8_t)(v + 0.5f);
        }
    }
    return 1;
}

// Batched, threaded FFHQ crop. imgs: (B, H, W, 3) u8; lms: (B, 68, 2) f32;
// out: (B, out_size, out_size, 3); done: (B,) int32 (1 = cropped here,
// 0 = caller must run the Python slow path for that image).
void rio_ffhq_crop_batch(const uint8_t* imgs, int b, int h, int w,
                         const float* lms, uint8_t* out, int out_size,
                         int32_t* done) {
    const int n_threads = b < 8 ? b : 8;
    std::vector<std::thread> ts;
    std::atomic<int> next(0);
    for (int t = 0; t < n_threads; t++) {
        ts.emplace_back([&]() {
            int i;
            while ((i = next.fetch_add(1)) < b) {
                done[i] = rio_ffhq_crop_one(
                    imgs + (size_t)i * h * w * 3, h, w, lms + (size_t)i * 136,
                    out + (size_t)i * out_size * out_size * 3, out_size);
            }
        });
    }
    for (auto& th : ts) th.join();
}

// uint8 RGB -> float32 in [-1, 1] (the GAN input range).
void rio_to_gan_range(const uint8_t* src, float* dst, int64_t count) {
    for (int64_t i = 0; i < count; i++) {
        dst[i] = (float)src[i] / 127.5f - 1.0f;
    }
}

// float32 [-1, 1] -> uint8 RGB with clipping.
void rio_from_gan_range(const float* src, uint8_t* dst, int64_t count) {
    for (int64_t i = 0; i < count; i++) {
        float v = (src[i] + 1.0f) * 127.5f;
        if (v < 0) v = 0;
        if (v > 255) v = 255;
        dst[i] = (uint8_t)(v + 0.5f);
    }
}

}  // extern "C"
