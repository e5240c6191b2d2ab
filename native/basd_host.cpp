// Native host-side data kernels for the BASD-TPU input pipeline.
//
// The reference hides its host data-path cost inside 8 torchvision worker
// processes (reference src/data/datasets.py:158-166). This runtime performs
// the host-side work (one-time uint8 decode-resize at dataset load, Welford
// channel statistics) in C++ instead of per-image Python/PIL, keeping the
// single host core ahead of the device input queue.
//
// Build: make -C native   (produces libbasd_host.so; loaded via ctypes from
// basd_tpu/data/native.py with a pure-Python fallback).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Batched bilinear resize, uint8 HWC -> uint8 HWC (half-pixel centers,
// matching PIL/torch antialias=false semantics). 10.6 fixed point weights.
void resize_bilinear_u8(const uint8_t* src, int64_t n, int32_t h, int32_t w,
                        int32_t c, uint8_t* dst, int32_t oh, int32_t ow) {
    const float sy = static_cast<float>(h) / oh;
    const float sx = static_cast<float>(w) / ow;

    // precompute per-output-row/col source indices and weights
    int32_t* y0 = new int32_t[oh];
    int32_t* y1 = new int32_t[oh];
    float* fy = new float[oh];
    for (int32_t i = 0; i < oh; ++i) {
        float s = (i + 0.5f) * sy - 0.5f;
        s = std::min(std::max(s, 0.0f), static_cast<float>(h - 1));
        y0[i] = static_cast<int32_t>(s);
        y1[i] = std::min(y0[i] + 1, h - 1);
        fy[i] = s - y0[i];
    }
    int32_t* x0 = new int32_t[ow];
    int32_t* x1 = new int32_t[ow];
    float* fx = new float[ow];
    for (int32_t j = 0; j < ow; ++j) {
        float s = (j + 0.5f) * sx - 0.5f;
        s = std::min(std::max(s, 0.0f), static_cast<float>(w - 1));
        x0[j] = static_cast<int32_t>(s);
        x1[j] = std::min(x0[j] + 1, w - 1);
        fx[j] = s - x0[j];
    }

    const int64_t in_img = static_cast<int64_t>(h) * w * c;
    const int64_t out_img = static_cast<int64_t>(oh) * ow * c;

    for (int64_t img = 0; img < n; ++img) {
        const uint8_t* s0 = src + img * in_img;
        uint8_t* d0 = dst + img * out_img;
        for (int32_t i = 0; i < oh; ++i) {
            const uint8_t* r0 = s0 + static_cast<int64_t>(y0[i]) * w * c;
            const uint8_t* r1 = s0 + static_cast<int64_t>(y1[i]) * w * c;
            const float wy = fy[i];
            uint8_t* drow = d0 + static_cast<int64_t>(i) * ow * c;
            for (int32_t j = 0; j < ow; ++j) {
                const float wx = fx[j];
                const int64_t a = static_cast<int64_t>(x0[j]) * c;
                const int64_t b = static_cast<int64_t>(x1[j]) * c;
                for (int32_t k = 0; k < c; ++k) {
                    const float top = r0[a + k] + wx * (r0[b + k] - r0[a + k]);
                    const float bot = r1[a + k] + wx * (r1[b + k] - r1[a + k]);
                    const float v = top + wy * (bot - top);
                    drow[j * c + k] = static_cast<uint8_t>(v + 0.5f);
                }
            }
        }
    }

    delete[] y0; delete[] y1; delete[] fy;
    delete[] x0; delete[] x1; delete[] fx;
}

// Streaming Welford channel statistics over uint8 HWC images (merge form
// identical to reference src/data/datasets.py:46-68). mean/m2 are running
// accumulators over c channels; count is the running pixel count.
void channel_stats_update(const uint8_t* img, int64_t n_pixels, int32_t c,
                          double* mean, double* m2, int64_t* count) {
    double batch_mean[8] = {0};
    double batch_m2[8] = {0};
    // single pass per image: mean + sum of squared deviations
    double sum[8] = {0};
    double sumsq[8] = {0};
    for (int64_t p = 0; p < n_pixels; ++p) {
        for (int32_t k = 0; k < c; ++k) {
            const double v = img[p * c + k] / 255.0;
            sum[k] += v;
            sumsq[k] += v * v;
        }
    }
    for (int32_t k = 0; k < c; ++k) {
        batch_mean[k] = sum[k] / n_pixels;
        batch_m2[k] = sumsq[k] - n_pixels * batch_mean[k] * batch_mean[k];
    }
    const int64_t new_count = *count + n_pixels;
    for (int32_t k = 0; k < c; ++k) {
        const double delta = batch_mean[k] - mean[k];
        mean[k] += delta * n_pixels / new_count;
        m2[k] += batch_m2[k] +
                 delta * delta * (*count) * n_pixels / new_count;
    }
    *count = new_count;
}

}  // extern "C"
