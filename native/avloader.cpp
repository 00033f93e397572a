// avloader — native data-loading kernels for the host input pipeline.
//
// The reference feeds training through torch's (C++) DataLoader with
// per-frame Python PIL work inside __getitem__ (reference
// av_manifest.py:87-128).  This library replaces the per-frame Python with
// one native call per clip: JPEG decode (libjpeg) + bilinear resize +
// normalize to float32 + [3, T, H, W] layout, parallelized across frames
// with std::thread, plus a RIFF/PCM WAV reader.  Exposed as a plain C ABI
// consumed via ctypes (datasets/native_loader.py) — no pybind11 needed.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links -ljpeg -lpthread)

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jmp, 1);
}

// Decode a JPEG file into an RGB8 buffer; returns true on success and fills
// (*w, *h).  Caller owns *out (malloc'd).
bool decode_jpeg_rgb(const char* path, unsigned char** out, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    unsigned char* buf = nullptr;
    if (setjmp(jerr.jmp)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        free(buf);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int W = cinfo.output_width, H = cinfo.output_height;
    buf = static_cast<unsigned char*>(malloc(size_t(W) * H * 3));
    if (!buf) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* row = buf + size_t(cinfo.output_scanline) * W * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    *out = buf;
    *w = W;
    *h = H;
    return true;
}

// Bilinear resize RGB8 (half-pixel centers, like cv2/PIL without antialias).
void resize_bilinear(const unsigned char* src, int sw, int sh,
                     unsigned char* dst, int dw, int dh) {
    if (sw == dw && sh == dh) {
        memcpy(dst, src, size_t(dw) * dh * 3);
        return;
    }
    const float sx = float(sw) / dw, sy = float(sh) / dh;
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = int(floorf(fy));
        float wy = fy - y0;
        int y1 = y0 + 1;
        if (y0 < 0) { y0 = 0; y1 = 0; wy = 0.f; }
        if (y1 >= sh) { y1 = sh - 1; if (y0 >= sh) y0 = sh - 1; }
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = int(floorf(fx));
            float wx = fx - x0;
            int x1 = x0 + 1;
            if (x0 < 0) { x0 = 0; x1 = 0; wx = 0.f; }
            if (x1 >= sw) { x1 = sw - 1; if (x0 >= sw) x0 = sw - 1; }
            const unsigned char* p00 = src + (size_t(y0) * sw + x0) * 3;
            const unsigned char* p01 = src + (size_t(y0) * sw + x1) * 3;
            const unsigned char* p10 = src + (size_t(y1) * sw + x0) * 3;
            const unsigned char* p11 = src + (size_t(y1) * sw + x1) * 3;
            unsigned char* d = dst + (size_t(y) * dw + x) * 3;
            for (int c = 0; c < 3; ++c) {
                float top = p00[c] * (1 - wx) + p01[c] * wx;
                float bot = p10[c] * (1 - wx) + p11[c] * wx;
                d[c] = static_cast<unsigned char>(top * (1 - wy) + bot * wy + 0.5f);
            }
        }
    }
}

}  // namespace

extern "C" {

// Decode `T` JPEG frames into a float32 [3, T, H, W] clip tensor in [0, 1],
// parallel over frames.  Returns 0 on success, else 1-based index of the
// first failing frame.
int decode_clip_f32(const char** paths, int T, int H, int W, int n_threads,
                    float* out /* 3*T*H*W */) {
    std::atomic<int> fail{0};
    const size_t plane = size_t(T) * H * W;  // per-channel stride

    auto work = [&](int t) {
        unsigned char* rgb = nullptr;
        int w = 0, h = 0;
        if (!decode_jpeg_rgb(paths[t], &rgb, &w, &h)) {
            int expected = 0;
            fail.compare_exchange_strong(expected, t + 1);
            return;
        }
        std::vector<unsigned char> resized;
        const unsigned char* px = rgb;
        if (w != W || h != H) {
            resized.resize(size_t(W) * H * 3);
            resize_bilinear(rgb, w, h, resized.data(), W, H);
            px = resized.data();
        }
        const float inv = 1.0f / 255.0f;
        // [H, W, 3] u8 -> channel planes of [T, H, W] f32
        for (int y = 0; y < H; ++y) {
            const unsigned char* row = px + size_t(y) * W * 3;
            float* r = out + 0 * plane + (size_t(t) * H + y) * W;
            float* g = out + 1 * plane + (size_t(t) * H + y) * W;
            float* b = out + 2 * plane + (size_t(t) * H + y) * W;
            for (int x = 0; x < W; ++x) {
                r[x] = row[3 * x + 0] * inv;
                g[x] = row[3 * x + 1] * inv;
                b[x] = row[3 * x + 2] * inv;
            }
        }
        free(rgb);
    };

    if (n_threads <= 1 || T <= 1) {
        for (int t = 0; t < T; ++t) work(t);
    } else {
        std::vector<std::thread> pool;
        std::atomic<int> next{0};
        int nt = n_threads < T ? n_threads : T;
        for (int i = 0; i < nt; ++i) {
            pool.emplace_back([&]() {
                for (int t = next.fetch_add(1); t < T; t = next.fetch_add(1))
                    work(t);
            });
        }
        for (auto& th : pool) th.join();
    }
    return fail.load();
}

// Decode `T` JPEG frames into a uint8 [T, H, W, 3] clip (no normalization) —
// the device-side pipeline casts/normalizes/transposes on TPU, so the host
// ships 4x fewer bytes than float32.  Returns 0 or 1-based failing index.
int decode_clip_u8(const char** paths, int T, int H, int W, int n_threads,
                   unsigned char* out /* T*H*W*3 */) {
    std::atomic<int> fail{0};
    auto work = [&](int t) {
        unsigned char* rgb = nullptr;
        int w = 0, h = 0;
        if (!decode_jpeg_rgb(paths[t], &rgb, &w, &h)) {
            int expected = 0;
            fail.compare_exchange_strong(expected, t + 1);
            return;
        }
        unsigned char* dst = out + size_t(t) * H * W * 3;
        if (w != W || h != H) {
            resize_bilinear(rgb, w, h, dst, W, H);
        } else {
            memcpy(dst, rgb, size_t(W) * H * 3);
        }
        free(rgb);
    };
    if (n_threads <= 1 || T <= 1) {
        for (int t = 0; t < T; ++t) work(t);
    } else {
        std::vector<std::thread> pool;
        std::atomic<int> next{0};
        int nt = n_threads < T ? n_threads : T;
        for (int i = 0; i < nt; ++i) {
            pool.emplace_back([&]() {
                for (int t = next.fetch_add(1); t < T; t = next.fetch_add(1))
                    work(t);
            });
        }
        for (auto& th : pool) th.join();
    }
    return fail.load();
}

// Minimal RIFF/WAVE reader: PCM16 / PCM32 / IEEE-float32, any channel count
// (averaged to mono).  Writes up to max_len float32 samples; returns the
// number written (or the full length if out == nullptr), -1 on error.
// *sr_out receives the sample rate.
long load_wav_mono(const char* path, float* out, long max_len, int* sr_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char riff[4], wave[4];
    uint32_t riff_size;
    if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) ||
        fread(&riff_size, 4, 1, f) != 1 ||
        fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4)) {
        fclose(f);
        return -1;
    }
    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t sr = 0;
    long n_out = -1;
    while (true) {
        char id[4];
        uint32_t sz;
        if (fread(id, 1, 4, f) != 4 || fread(&sz, 4, 1, f) != 1) break;
        if (!memcmp(id, "fmt ", 4)) {
            uint8_t hdr[16];
            if (sz < 16 || fread(hdr, 1, 16, f) != 16) break;
            fmt = hdr[0] | (hdr[1] << 8);
            channels = hdr[2] | (hdr[3] << 8);
            sr = hdr[4] | (hdr[5] << 8) | (hdr[6] << 16) |
                 (uint32_t(hdr[7]) << 24);
            bits = hdr[14] | (hdr[15] << 8);
            if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
        } else if (!memcmp(id, "data", 4)) {
            if (!channels || !bits) break;
            const int bytes = bits / 8;
            const long frames = long(sz) / (bytes * channels);
            if (!out) { n_out = frames; break; }
            const long n = frames < max_len ? frames : max_len;
            std::vector<uint8_t> buf(size_t(bytes) * channels);
            for (long i = 0; i < n; ++i) {
                if (fread(buf.data(), 1, buf.size(), f) != buf.size()) break;
                float acc = 0.f;
                for (int c = 0; c < channels; ++c) {
                    const uint8_t* p = buf.data() + size_t(c) * bytes;
                    float v = 0.f;
                    if (fmt == 3 && bits == 32) {  // IEEE float
                        float fv;
                        memcpy(&fv, p, 4);
                        v = fv;
                    } else if (bits == 16) {
                        int16_t s = p[0] | (p[1] << 8);
                        v = s / 32768.0f;
                    } else if (bits == 32) {
                        int32_t s = p[0] | (p[1] << 8) | (p[2] << 16) |
                                    (int32_t(p[3]) << 24);
                        v = s / 2147483648.0f;
                    } else if (bits == 8) {
                        v = (int(p[0]) - 128) / 128.0f;
                    }
                    acc += v;
                }
                out[i] = acc / channels;
            }
            n_out = n;
            break;
        } else {
            fseek(f, (sz + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
        }
    }
    fclose(f);
    if (sr_out) *sr_out = int(sr);
    return n_out;
}

int avloader_version() { return 1; }

}  // extern "C"
