// Native host-side data path: multithreaded batch assembly + normalization.
//
// Fills the role of the reference's numba @njit fast-path kernels
// (rnn/utils.py:1798-1865) and torch DataLoader worker processes: the
// host-side hot loop that gathers shuffled rows, converts to float32, and
// applies (x-mean)/div normalization before device_put. OpenMP-parallel;
// exposed to Python via ctypes (climsim_tpu/data/native.py).
#include <cstdint>
#include <cstring>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// y[i, :] = (src[idx[i], :] - mean) / div    (gather + normalize fused)
void gather_normalize_f32(const float* src, const int64_t* idx,
                          const float* mean, const float* divisor,
                          float* dst, int64_t n_rows, int64_t row_elems) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        const float* s = src + idx[i] * row_elems;
        float* d = dst + i * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) {
            d[j] = (s[j] - mean[j]) / divisor[j];
        }
    }
}

// plain parallel gather (float32)
void gather_f32(const float* src, const int64_t* idx, float* dst,
                int64_t n_rows, int64_t row_elems) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                    sizeof(float) * row_elems);
    }
}

// in-place normalization over [n_rows, row_elems]
void normalize_f32(float* x, const float* mean, const float* divisor,
                   int64_t n_rows, int64_t row_elems) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        float* r = x + i * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) {
            r[j] = (r[j] - mean[j]) / divisor[j];
        }
    }
}

// exponential cloud transform q -> 1 - exp(-q*lambda) on selected channel
// of a [n, nlev, nch] tensor (rnn/utils.py:1809 cloud_exp_norm semantics)
void cloud_exp_transform_f32(float* x, const float* lbd, int64_t n,
                             int64_t nlev, int64_t nch, int64_t channel) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t l = 0; l < nlev; ++l) {
            float* v = x + (i * nlev + l) * nch + channel;
            *v = 1.0f - std::exp(-(*v) * lbd[l]);
        }
    }
}

// scrub NaN/Inf to 0 (data_utils.py:1150-1156)
void scrub_nonfinite_f32(float* x, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        if (!std::isfinite(x[i])) x[i] = 0.0f;
    }
}

int omp_thread_count() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
