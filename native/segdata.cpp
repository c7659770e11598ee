// Native data-path kernels for contrastiveseg_tpu.
//
// TPU-native equivalent of the reference's host-side native code
// (lib/metrics/cityscapes/evaluation/addToConfusionMatrix_impl.c and the
// cv2 C++ resize paths the aug pipeline leans on): the TPU does the math,
// but the host still has to decode/augment images fast enough to feed it —
// on this project's single-core hosts the C path is the difference between
// data-bound and compute-bound training.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
//
// Semantics:
//   * resize_bicubic_u8: cv2.INTER_CUBIC equivalent — Keys kernel
//     a = -0.75, half-pixel centers, border clamp, round-half-away, clip
//     to [0,255].  (torch's bicubic uses the same kernel, which the tests
//     exploit for equivalence checks.)
//   * resize_nearest_i32: src = floor(dst * in/out) (torch/cv2 'nearest').
//   * normalize_pad_f32: uint8 HWC -> (x/div - mean)/std into a padded
//     float32 canvas (pad value 0 == post-normalization zeros).
//   * confusion_matrix_i64: histogram of (gt, pred) pairs, gt outside
//     [0, C) dropped.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

static inline float cubic_weight(float x) {
    // Keys cubic, a = -0.75 (cv2/torch).
    const float a = -0.75f;
    x = std::fabs(x);
    if (x <= 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    return 0.0f;
}

// Horizontal bicubic pass for one source row: uint8 [sw*ch] -> float
// [dw*ch].  Border columns (taps clamped) are handled separately from the
// clamp-free interior so the hot loop auto-vectorizes.
static void hresize_row(const uint8_t* srow, int sw, int ch, int dw,
                        const int* x0s, const float* wxs,
                        int lo, int hi, float* out) {
    for (int dx = 0; dx < lo; ++dx) {
        const float* wx = wxs + (size_t)dx * 4;
        const int x0 = x0s[dx];
        for (int c = 0; c < ch; ++c) {
            float acc = 0.0f;
            for (int j = 0; j < 4; ++j) {
                int x = std::min(std::max(x0 + j, 0), sw - 1);
                acc += wx[j] * srow[(size_t)x * ch + c];
            }
            out[(size_t)dx * ch + c] = acc;
        }
    }
    for (int dx = lo; dx < hi; ++dx) {
        const float* wx = wxs + (size_t)dx * 4;
        const uint8_t* p = srow + (size_t)x0s[dx] * ch;
        for (int c = 0; c < ch; ++c)
            out[(size_t)dx * ch + c] =
                wx[0] * p[c] + wx[1] * p[ch + c] +
                wx[2] * p[2 * ch + c] + wx[3] * p[3 * ch + c];
    }
    for (int dx = hi; dx < dw; ++dx) {
        const float* wx = wxs + (size_t)dx * 4;
        const int x0 = x0s[dx];
        for (int c = 0; c < ch; ++c) {
            float acc = 0.0f;
            for (int j = 0; j < 4; ++j) {
                int x = std::min(std::max(x0 + j, 0), sw - 1);
                acc += wx[j] * srow[(size_t)x * ch + c];
            }
            out[(size_t)dx * ch + c] = acc;
        }
    }
}

void resize_bicubic_window_u8(const uint8_t* src, int sh, int sw, int ch,
                              uint8_t* dst, int vdh, int vdw,
                              int oy, int ox, int out_h, int out_w);

// Separable two-pass with a 4-row ring cache: each source row's
// horizontal pass runs once, no matter how many output rows reuse it
// (a naive 2-D loop recomputes it ~4/scale_y times per row).
void resize_bicubic_u8(const uint8_t* src, int sh, int sw, int ch,
                       uint8_t* dst, int dh, int dw) {
    resize_bicubic_window_u8(src, sh, sw, ch, dst, dh, dw, 0, 0, dh, dw);
}

// Windowed bicubic: compute ONLY the [oy, oy+out_h) x [ox, ox+out_w)
// region of the virtual (vdh x vdw) resize of src.  Tap positions and
// weights use global output coordinates, so every produced pixel is
// bit-identical to the corresponding pixel of resize_bicubic_u8's full
// output — this is the fused random_resize+random_crop fast path (the
// full resize at scale 2 materializes 8.4 Mpx to keep a 0.5 Mpx crop).
void resize_bicubic_window_u8(const uint8_t* src, int sh, int sw, int ch,
                              uint8_t* dst, int vdh, int vdw,
                              int oy, int ox, int out_h, int out_w) {
    const float scale_y = (float)sh / vdh;
    const float scale_x = (float)sw / vdw;

    int* x0s = new int[out_w];
    float* wxs = new float[(size_t)out_w * 4];
    for (int i = 0; i < out_w; ++i) {
        float sx = (ox + i + 0.5f) * scale_x - 0.5f;
        int ix = (int)std::floor(sx);
        float fx = sx - ix;
        x0s[i] = ix - 1;
        for (int k = 0; k < 4; ++k)
            wxs[(size_t)i * 4 + k] = cubic_weight(fx - (k - 1));
    }
    int lo = 0, hi = out_w;
    while (lo < out_w && x0s[lo] < 0) ++lo;
    while (hi > lo && x0s[hi - 1] + 3 > sw - 1) --hi;

    const size_t rw = (size_t)out_w * ch;
    float* cache = new float[rw * 4];
    int cached[4] = {-9, -9, -9, -9};
    float* row_acc = new float[rw];

    for (int i = 0; i < out_h; ++i) {
        float sy = (oy + i + 0.5f) * scale_y - 0.5f;
        int iy = (int)std::floor(sy);
        float fy = sy - iy;
        float wy[4];
        for (int k = 0; k < 4; ++k) wy[k] = cubic_weight(fy - (k - 1));

        const float* rows[4];
        for (int k = 0; k < 4; ++k) {
            int y = std::min(std::max(iy - 1 + k, 0), sh - 1);
            float* slot = cache + (size_t)(y & 3) * rw;
            if (cached[y & 3] != y) {
                hresize_row(src + (size_t)y * sw * ch, sw, ch, out_w,
                            x0s, wxs, lo, hi, slot);
                cached[y & 3] = y;
            }
            rows[k] = slot;
        }
        std::memset(row_acc, 0, sizeof(float) * rw);
        for (int k = 0; k < 4; ++k) {
            const float w = wy[k];
            if (w == 0.0f) continue;
            const float* hrow = rows[k];
            for (size_t j = 0; j < rw; ++j) row_acc[j] += w * hrow[j];
        }
        uint8_t* drow = dst + (size_t)i * rw;
        for (size_t j = 0; j < rw; ++j) {
            float v = row_acc[j];
            v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
            drow[j] = (uint8_t)std::lrintf(v);
        }
    }
    delete[] x0s;
    delete[] wxs;
    delete[] cache;
    delete[] row_acc;
}

void resize_nearest_i32(const int32_t* src, int sh, int sw,
                        int32_t* dst, int dh, int dw) {
    // Precompute the column gather map (one divide per column, not per
    // pixel) and memcpy repeated rows (upscales repeat each source row
    // ~dh/sh times).
    int* cols = new int[dw];
    for (int dx = 0; dx < dw; ++dx)
        cols[dx] = std::min((int)((int64_t)dx * sw / dw), sw - 1);
    int prev_y = -1;
    for (int dy = 0; dy < dh; ++dy) {
        int y = std::min((int)((int64_t)dy * sh / dh), sh - 1);
        int32_t* drow = dst + (size_t)dy * dw;
        if (y == prev_y) {
            std::memcpy(drow, drow - dw, sizeof(int32_t) * dw);
            continue;
        }
        const int32_t* srow = src + (size_t)y * sw;
        for (int dx = 0; dx < dw; ++dx) drow[dx] = srow[cols[dx]];
        prev_y = y;
    }
    delete[] cols;
}

// Normalize into a zero-padded canvas.  Uses the exact python Normalizer
// op sequence (((v / div) - mean) / std, strict IEEE — see normalize_f32)
// so `normalize_pad(img) == np.pad(normalize(img))` BIT-IDENTICALLY; this
// is the collate fast path that writes each sample straight into its
// preallocated batch slot (skipping the per-image float allocation, the
// np.pad copy and the np.stack copy).
__attribute__((optimize("-fno-fast-math")))
void normalize_pad_f32(const uint8_t* src, int sh, int sw, int ch,
                       float* dst, int dh, int dw,
                       int off_y, int off_x,
                       float div_value, const float* mean, const float* std_) {
    if (sh != dh || sw != dw)
        std::memset(dst, 0, sizeof(float) * (size_t)dh * dw * ch);
    for (int y = 0; y < sh; ++y) {
        const uint8_t* srow = src + (size_t)y * sw * ch;
        float* drow = dst + ((size_t)(y + off_y) * dw + off_x) * ch;
        for (int x = 0; x < sw; ++x)
            for (int c = 0; c < ch; ++c)
                drow[(size_t)x * ch + c] =
                    ((float)srow[(size_t)x * ch + c] / div_value - mean[c])
                    / std_[c];
    }
}

// Exact counterpart of the python Normalizer: y = ((v / div) - mean) / std
// with the same IEEE float32 op sequence (real divisions, no
// reciprocal-multiply), so outputs are bit-identical to numpy's.  The
// library builds with -ffast-math (which would substitute reciprocal
// multiplies); this function opts back into strict IEEE division.
__attribute__((optimize("-fno-fast-math")))
void normalize_f32(const uint8_t* src, int64_t npx, int ch,
                   float* dst, float div_value,
                   const float* mean, const float* std_) {
    for (int64_t i = 0; i < npx; ++i) {
        const uint8_t* s = src + i * ch;
        float* d = dst + i * ch;
        for (int c = 0; c < ch; ++c)
            d[c] = ((float)s[c] / div_value - mean[c]) / std_[c];
    }
}

void confusion_matrix_i64(const int32_t* pred, const int32_t* gt,
                          int64_t n, int num_classes, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t g = gt[i];
        if (g < 0 || g >= num_classes) continue;
        int32_t p = pred[i];
        if (p < 0) p = 0;
        if (p >= num_classes) p = num_classes - 1;
        out[(size_t)g * num_classes + p] += 1;
    }
}

}  // extern "C"
