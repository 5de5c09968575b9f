// Native data-pipeline kernels for dlmc_quant_tpu.
//
// The reference rides on torchvision/PyTorch DataLoader worker processes
// (ref: data_loader/data_loaders.py:9-89, base/base_data_loader.py); the
// TPU-native equivalent is a host-side C++ pipeline that assembles whole
// batches in one threaded pass — XLA wants large ready batches, not
// per-sample Python workers.  One call fuses: gather (fancy index) →
// zero-pad random crop → horizontal flip → 1/255 scale → mean/std
// normalize, writing float32 NHWC ready for device_put.
//
// Crop offsets / flip decisions are computed by the CALLER (numpy RNG)
// and passed in, so the native path is bit-exact with the pure-numpy
// fallback and trivially testable.
//
// Build: g++ -O3 -march=native -shared -fPIC -o _libdlmcq_data.so augment.cpp -lpthread
// ABI: plain C, loaded via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

struct AugArgs {
    const void*    images;     // (n_total, h, w, c) uint8 or float32
    int            is_u8;
    int64_t        h, w, c;
    const int64_t* idx;        // (n,) gather indices
    int64_t        n;
    int            pad;        // zero-pad width (0 = no crop aug)
    const int32_t* oy;         // (n,) crop offsets in [0, 2*pad]
    const int32_t* ox;
    const uint8_t* flip;       // (n,) 1 = horizontal flip
    const float*   mean;       // (c,) or nullptr
    const float*   stdv;       // (c,)
    int            scale255;   // divide by 255 (u8-range inputs)
    float*         out;        // (n, h, w, c) float32
};

// Copy one source row [src, src+c*w) into dst with optional flip along w.
template <typename T>
inline void row_to_f32(const T* src, float* dst, int64_t w, int64_t c,
                       bool flip, float inv255) {
    if (!flip) {
        for (int64_t i = 0; i < w * c; ++i) dst[i] = float(src[i]) * inv255;
    } else {
        for (int64_t x = 0; x < w; ++x) {
            const T* s = src + (w - 1 - x) * c;
            float* d = dst + x * c;
            for (int64_t k = 0; k < c; ++k) d[k] = float(s[k]) * inv255;
        }
    }
}

template <typename T>
void augment_range(const AugArgs& a, int64_t lo, int64_t hi) {
    const int64_t h = a.h, w = a.w, c = a.c;
    const int64_t img_sz = h * w * c;
    const float inv255 = a.scale255 ? (1.0f / 255.0f) : 1.0f;
    const int p = a.pad;
    std::vector<float> inv_std;
    if (a.mean) {
        inv_std.resize(c);
        for (int64_t k = 0; k < c; ++k) inv_std[k] = 1.0f / a.stdv[k];
    }
    for (int64_t i = lo; i < hi; ++i) {
        const T* img = static_cast<const T*>(a.images) + a.idx[i] * img_sz;
        float* dst = a.out + i * img_sz;
        const bool flip = a.flip && a.flip[i];
        if (p == 0) {
            for (int64_t y = 0; y < h; ++y)
                row_to_f32(img + y * w * c, dst + y * w * c, w, c, flip,
                           inv255);
        } else {
            // crop window in padded coords: rows [oy, oy+h) of an
            // (h+2p, w+2p) zero-padded image == source rows [oy-p, ...)
            const int oy = a.oy[i] - p, ox = a.ox[i] - p;
            for (int64_t y = 0; y < h; ++y) {
                float* drow = dst + y * w * c;
                const int64_t sy = y + oy;
                if (sy < 0 || sy >= h) {              // fully in pad
                    std::memset(drow, 0, sizeof(float) * w * c);
                    continue;
                }
                const T* srow = img + sy * w * c;
                // visible source column range [x0, x1) in dst coords
                // (pre-flip); memset the zero borders, copy the middle
                int64_t x0 = std::max<int64_t>(0, -ox);
                int64_t x1 = std::min<int64_t>(w, w - ox);
                if (x0 > 0)
                    std::memset(drow, 0, sizeof(float) * x0 * c);
                if (x1 < w)
                    std::memset(drow + x1 * c, 0, sizeof(float) * (w - x1) * c);
                if (x1 > x0) {
                    const T* s = srow + (x0 + ox) * c;
                    for (int64_t j = 0; j < (x1 - x0) * c; ++j)
                        drow[x0 * c + j] = float(s[j]) * inv255;
                }
            }
            if (flip) {
                // flip the assembled cropped image in-place along w
                for (int64_t y = 0; y < h; ++y) {
                    float* row = dst + y * w * c;
                    for (int64_t x = 0; x < w / 2; ++x)
                        for (int64_t k = 0; k < c; ++k)
                            std::swap(row[x * c + k],
                                      row[(w - 1 - x) * c + k]);
                }
            }
        }
        if (a.mean) {
            for (int64_t j = 0; j < img_sz; ++j) {
                const int64_t k = j % c;
                dst[j] = (dst[j] - a.mean[k]) * inv_std[k];
            }
        }
    }
}

}  // namespace

extern "C" {

// Returns 0 on success.
int dlmcq_augment(const void* images, int is_u8, int64_t h, int64_t w,
                  int64_t c, const int64_t* idx, int64_t n, int pad,
                  const int32_t* oy, const int32_t* ox, const uint8_t* flip,
                  const float* mean, const float* stdv, int scale255,
                  int n_threads, float* out) {
    AugArgs a{images, is_u8, h, w, c, idx, n, pad, oy, ox, flip,
              mean, stdv, scale255, out};
    if (n_threads <= 1 || n < 2 * n_threads) {
        if (is_u8) augment_range<uint8_t>(a, 0, n);
        else       augment_range<float>(a, 0, n);
        return 0;
    }
    std::vector<std::thread> ts;
    const int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] {
            if (is_u8) augment_range<uint8_t>(a, lo, hi);
            else       augment_range<float>(a, lo, hi);
        });
    }
    for (auto& t : ts) t.join();
    return 0;
}

// Simple version probe so the Python side can verify the ABI.
int dlmcq_abi_version() { return 1; }

}  // extern "C"
