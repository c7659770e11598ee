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

void resize_bicubic_u8(const uint8_t* src, int sh, int sw, int ch,
                       uint8_t* dst, int dh, int dw) {
    const float scale_y = (float)sh / dh;
    const float scale_x = (float)sw / dw;

    // Precompute x-axis taps.
    int* x0s = new int[dw];
    float* wxs = new float[dw * 4];
    for (int dx = 0; dx < dw; ++dx) {
        float sx = (dx + 0.5f) * scale_x - 0.5f;
        int ix = (int)std::floor(sx);
        float fx = sx - ix;
        x0s[dx] = ix - 1;
        for (int k = 0; k < 4; ++k)
            wxs[dx * 4 + k] = cubic_weight(fx - (k - 1));
    }

    float* row_acc = new float[dw * ch];
    for (int dy = 0; dy < dh; ++dy) {
        float sy = (dy + 0.5f) * scale_y - 0.5f;
        int iy = (int)std::floor(sy);
        float fy = sy - iy;
        float wy[4];
        for (int k = 0; k < 4; ++k) wy[k] = cubic_weight(fy - (k - 1));

        std::memset(row_acc, 0, sizeof(float) * dw * ch);
        for (int k = 0; k < 4; ++k) {
            int y = std::min(std::max(iy - 1 + k, 0), sh - 1);
            const uint8_t* srow = src + (size_t)y * sw * ch;
            const float w = wy[k];
            if (w == 0.0f) continue;
            for (int dx = 0; dx < dw; ++dx) {
                const float* wx = wxs + dx * 4;
                const int x0 = x0s[dx];
                for (int c = 0; c < ch; ++c) {
                    float acc = 0.0f;
                    for (int j = 0; j < 4; ++j) {
                        int x = std::min(std::max(x0 + j, 0), sw - 1);
                        acc += wx[j] * srow[(size_t)x * ch + c];
                    }
                    row_acc[dx * ch + c] += w * acc;
                }
            }
        }
        uint8_t* drow = dst + (size_t)dy * dw * ch;
        for (int i = 0; i < dw * ch; ++i) {
            float v = row_acc[i];
            v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
            drow[i] = (uint8_t)std::lrintf(v);
        }
    }
    delete[] x0s;
    delete[] wxs;
    delete[] row_acc;
}

void resize_nearest_i32(const int32_t* src, int sh, int sw,
                        int32_t* dst, int dh, int dw) {
    for (int dy = 0; dy < dh; ++dy) {
        int y = std::min((int)((int64_t)dy * sh / dh), sh - 1);
        const int32_t* srow = src + (size_t)y * sw;
        int32_t* drow = dst + (size_t)dy * dw;
        for (int dx = 0; dx < dw; ++dx) {
            int x = std::min((int)((int64_t)dx * sw / dw), sw - 1);
            drow[dx] = srow[x];
        }
    }
}

void normalize_pad_f32(const uint8_t* src, int sh, int sw, int ch,
                       float* dst, int dh, int dw,
                       int off_y, int off_x,
                       float div_value, const float* mean, const float* std_) {
    std::memset(dst, 0, sizeof(float) * (size_t)dh * dw * ch);
    float inv_div = 1.0f / div_value;
    float scale[8], bias[8];
    for (int c = 0; c < ch && c < 8; ++c) {
        scale[c] = inv_div / std_[c];
        bias[c] = -mean[c] / std_[c];
    }
    for (int y = 0; y < sh; ++y) {
        const uint8_t* srow = src + (size_t)y * sw * ch;
        float* drow = dst + ((size_t)(y + off_y) * dw + off_x) * ch;
        for (int x = 0; x < sw; ++x)
            for (int c = 0; c < ch; ++c)
                drow[(size_t)x * ch + c] =
                    srow[(size_t)x * ch + c] * scale[c] + bias[c];
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
