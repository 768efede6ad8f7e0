// Native block-quant repacker: GGUF packed blocks -> (q int8, scale f32, bias f32).
//
// The C++ counterpart of eagle_tpu/quant/qtensor.py's numpy repackers — same
// bit semantics (ggml block layouts, ggml-common.h / ggml-quants.c), built for
// multi-GB checkpoint loads: OpenMP across super-blocks, one pass, no
// intermediate allocations. Exposed through ctypes (see
// eagle_tpu/quant/native.py). Built standalone: no Python.h dependency.
//
// All functions return 0 on success, negative on error.

#include <cstdint>
#include <cstring>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            int e = -1;
            do { man <<= 1; e++; } while (!(man & 0x400));
            man &= 0x3FF;
            bits = sign | ((uint32_t)(127 - 15 - e) << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp + 112) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &bits, sizeof(out));
    return out;
}

inline void scale_min_k4(int j, const uint8_t* s, uint8_t* sc, uint8_t* m) {
    if (j < 4) {
        *sc = s[j] & 63;
        *m = s[j + 4] & 63;
    } else {
        *sc = (uint8_t)((s[j + 4] & 0xF) | ((s[j - 4] >> 6) << 4));
        *m = (uint8_t)((s[j + 4] >> 4) | ((s[j] >> 6) << 4));
    }
}

}  // namespace

extern "C" {

// Q8_0: 34-byte blocks of 32. scale per block, no bias.
int repack_q8_0(const uint8_t* src, int64_t n_blocks, int8_t* q, float* scale) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_blocks; ++i) {
        const uint8_t* b = src + i * 34;
        uint16_t d16;
        std::memcpy(&d16, b, 2);
        scale[i] = f16_to_f32(d16);
        std::memcpy(q + i * 32, b + 2, 32);
    }
    return 0;
}

// Q4_0: 18-byte blocks of 32; q in [0,15], scale=d, bias=-8d.
int repack_q4_0(const uint8_t* src, int64_t n_blocks, int8_t* q, float* scale, float* bias) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_blocks; ++i) {
        const uint8_t* b = src + i * 18;
        uint16_t d16;
        std::memcpy(&d16, b, 2);
        float d = f16_to_f32(d16);
        scale[i] = d;
        bias[i] = -8.0f * d;
        int8_t* out = q + i * 32;
        for (int j = 0; j < 16; ++j) {
            out[j] = (int8_t)(b[2 + j] & 0xF);
            out[j + 16] = (int8_t)(b[2 + j] >> 4);
        }
    }
    return 0;
}

// Q4_K: 144-byte super-blocks of 256; 8 groups of 32.
int repack_q4_k(const uint8_t* src, int64_t n_blocks, int8_t* q, float* scale, float* bias) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_blocks; ++i) {
        const uint8_t* b = src + i * 144;
        uint16_t d16, dmin16;
        std::memcpy(&d16, b, 2);
        std::memcpy(&dmin16, b + 2, 2);
        float d = f16_to_f32(d16), dmin = f16_to_f32(dmin16);
        const uint8_t* scales = b + 4;
        const uint8_t* qs = b + 16;
        int8_t* out = q + i * 256;
        for (int g = 0; g < 8; ++g) {
            uint8_t sc, mn;
            scale_min_k4(g, scales, &sc, &mn);
            scale[i * 8 + g] = d * (float)sc;
            bias[i * 8 + g] = -(dmin * (float)mn);
        }
        for (int c = 0; c < 4; ++c) {
            const uint8_t* qc = qs + c * 32;
            int8_t* lo = out + c * 64;
            int8_t* hi = lo + 32;
            for (int j = 0; j < 32; ++j) {
                lo[j] = (int8_t)(qc[j] & 0xF);
                hi[j] = (int8_t)(qc[j] >> 4);
            }
        }
    }
    return 0;
}

// Q5_K: 176-byte super-blocks of 256.
int repack_q5_k(const uint8_t* src, int64_t n_blocks, int8_t* q, float* scale, float* bias) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_blocks; ++i) {
        const uint8_t* b = src + i * 176;
        uint16_t d16, dmin16;
        std::memcpy(&d16, b, 2);
        std::memcpy(&dmin16, b + 2, 2);
        float d = f16_to_f32(d16), dmin = f16_to_f32(dmin16);
        const uint8_t* scales = b + 4;
        const uint8_t* qh = b + 16;
        const uint8_t* ql = b + 48;
        int8_t* out = q + i * 256;
        for (int g = 0; g < 8; ++g) {
            uint8_t sc, mn;
            scale_min_k4(g, scales, &sc, &mn);
            scale[i * 8 + g] = d * (float)sc;
            bias[i * 8 + g] = -(dmin * (float)mn);
        }
        for (int c = 0; c < 4; ++c) {
            const uint8_t* qc = ql + c * 32;
            int8_t* lo = out + c * 64;
            int8_t* hi = lo + 32;
            uint8_t m1 = (uint8_t)(1u << (2 * c)), m2 = (uint8_t)(2u << (2 * c));
            for (int j = 0; j < 32; ++j) {
                lo[j] = (int8_t)((qc[j] & 0xF) | ((qh[j] & m1) ? 16 : 0));
                hi[j] = (int8_t)((qc[j] >> 4) | ((qh[j] & m2) ? 16 : 0));
            }
        }
    }
    return 0;
}

// Q6_K: 210-byte super-blocks of 256; 16 groups of 16; signed q (q-32), no bias.
int repack_q6_k(const uint8_t* src, int64_t n_blocks, int8_t* q, float* scale) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_blocks; ++i) {
        const uint8_t* b = src + i * 210;
        const uint8_t* ql = b;
        const uint8_t* qh = b + 128;
        const int8_t* sc = (const int8_t*)(b + 192);
        uint16_t d16;
        std::memcpy(&d16, b + 208, 2);
        float d = f16_to_f32(d16);
        for (int g = 0; g < 16; ++g) scale[i * 16 + g] = d * (float)sc[g];
        int8_t* out = q + i * 256;
        for (int half = 0; half < 2; ++half) {
            const uint8_t* l = ql + half * 64;
            const uint8_t* h = qh + half * 32;
            int8_t* o = out + half * 128;
            for (int j = 0; j < 32; ++j) {
                o[j] = (int8_t)(((l[j] & 0xF) | ((h[j] & 0x3) << 4)) - 32);
                o[j + 32] = (int8_t)(((l[j + 32] & 0xF) | (((h[j] >> 2) & 0x3) << 4)) - 32);
                o[j + 64] = (int8_t)(((l[j] >> 4) | (((h[j] >> 4) & 0x3) << 4)) - 32);
                o[j + 96] = (int8_t)(((l[j + 32] >> 4) | (((h[j] >> 6) & 0x3) << 4)) - 32);
            }
        }
    }
    return 0;
}

// Transpose helpers: [N, K] int8 -> [K, N] (blocked, OpenMP).
int transpose_i8(const int8_t* src, int64_t n, int64_t k, int8_t* dst) {
    const int64_t B = 64;
#pragma omp parallel for collapse(2) schedule(static)
    for (int64_t ib = 0; ib < n; ib += B)
        for (int64_t jb = 0; jb < k; jb += B) {
            int64_t ie = ib + B < n ? ib + B : n;
            int64_t je = jb + B < k ? jb + B : k;
            for (int64_t i = ib; i < ie; ++i)
                for (int64_t j = jb; j < je; ++j) dst[j * n + i] = src[i * k + j];
        }
    return 0;
}

int transpose_f32(const float* src, int64_t n, int64_t k, float* dst) {
    const int64_t B = 32;
#pragma omp parallel for collapse(2) schedule(static)
    for (int64_t ib = 0; ib < n; ib += B)
        for (int64_t jb = 0; jb < k; jb += B) {
            int64_t ie = ib + B < n ? ib + B : n;
            int64_t je = jb + B < k ? jb + B : k;
            for (int64_t i = ib; i < ie; ++i)
                for (int64_t j = jb; j < je; ++j) dst[j * n + i] = src[i * k + j];
        }
    return 0;
}

}  // extern "C"
