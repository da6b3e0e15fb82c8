// cmodel — host-side C++ model of the TPU MXU matmul pipeline.
//
// The native analog of the reference toolkit's "HW C-model"
// (/root/reference/mpemu/cmodel/simple/simple_gemm_impl.cpp: a blocked
// 16x16x64 AVX2 engine with a separate tile accumulator, and
// simple_conv2d_impl.cpp: conv fwd/bwd-data/bwd-weight on the same
// engine) — re-designed for the TPU's numbers: the systolic tile is
// 128x128, operands are rounded to bf16 before entering the array, and
// products accumulate in fp32 inside the tile before a separate
// accumulate into C.  Used for bit-level study of tile-accumulation
// order and as a device-free execution backend for tests; implemented
// from the architecture description, no code taken from the reference.
//
// ABI (ctypes):
//   int cmodel_gemm(const float* A, const float* B, float* C,
//                   int64_t M, int64_t N, int64_t K,
//                   int a_trans, int b_trans,
//                   float alpha, float beta,
//                   int tile, int kchunk, int round_bf16);
//   int cmodel_conv2d_fp(const float* X, const float* W, float* Y,
//                        int64_t N, int64_t H, int64_t Wd, int64_t Cin,
//                        int64_t KH, int64_t KW, int64_t Cout,
//                        int64_t stride, int64_t pad, int round_bf16);
//   int cmodel_conv2d_bp(const float* dY, const float* W, float* dX, ...)
//       gradient w.r.t. the input (reference engine: gemm_kernel_conv_bp,
//       simple_conv2d_impl.cpp:472-572) — dcol = dY @ W^T on the tile
//       engine, then col2im scatter-add.
//   int cmodel_conv2d_wu(const float* X, const float* dY, float* dW, ...)
//       gradient w.r.t. the weights (gemm_kernel_conv_wu,
//       simple_conv2d_impl.cpp:574-670) — dW = col(X)^T @ dY.
// Returns 0 on success, negative on bad arguments.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

// Round an fp32 value to bf16 (round-to-nearest-even), back as fp32 —
// models the MXU consuming bf16 operands.
inline float to_bf16(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  uint32_t lsb = (u >> 16) & 1u;
  u += 0x7FFFu + lsb;
  u &= 0xFFFF0000u;
  float out;
  std::memcpy(&out, &u, 4);
  return out;
}

inline float elem(const float* P, int64_t r, int64_t c, int64_t ld,
                  int trans) {
  return trans ? P[c * ld + r] : P[r * ld + c];
}

}  // namespace

extern "C" {

const char* cmodel_version() { return "fp8tpu-cmodel-1"; }

int cmodel_gemm(const float* A, const float* B, float* C,
                int64_t M, int64_t N, int64_t K,
                int a_trans, int b_trans,
                float alpha, float beta,
                int tile, int kchunk, int round_bf16) {
  if (!A || !B || !C || M <= 0 || N <= 0 || K <= 0) return -1;
  if (tile <= 0) tile = 128;     // MXU systolic dimension
  if (kchunk <= 0) kchunk = K;   // accumulate whole K inside the tile
  const int64_t lda = a_trans ? M : K;
  const int64_t ldb = b_trans ? K : N;

  // C = alpha * A@B + beta * C, tile by tile.  Within a (tile x tile)
  // output tile, products of (optionally bf16-rounded) operands are
  // accumulated in fp32 over one k-chunk at a time into `acc`, then
  // accumulated into C — mirroring the reference's ctmp tile
  // (simple_gemm_impl.cpp:210-232) at TPU tile geometry.
  std::vector<float> acc(static_cast<size_t>(tile) * tile);
#pragma omp parallel for collapse(2) firstprivate(acc) \
    schedule(static)
  for (int64_t i0 = 0; i0 < M; i0 += tile) {
    for (int64_t j0 = 0; j0 < N; j0 += tile) {
      const int64_t mi = (M - i0 < tile) ? (M - i0) : tile;
      const int64_t nj = (N - j0 < tile) ? (N - j0) : tile;
      for (int64_t i = 0; i < mi; ++i)
        for (int64_t j = 0; j < nj; ++j)
          acc[i * tile + j] = 0.0f;
      for (int64_t k0 = 0; k0 < K; k0 += kchunk) {
        const int64_t kk = (K - k0 < kchunk) ? (K - k0) : kchunk;
        for (int64_t i = 0; i < mi; ++i) {
          for (int64_t k = 0; k < kk; ++k) {
            float a = elem(A, i0 + i, k0 + k, lda, a_trans);
            if (round_bf16) a = to_bf16(a);
            for (int64_t j = 0; j < nj; ++j) {
              float b = elem(B, k0 + k, j0 + j, ldb, b_trans);
              if (round_bf16) b = to_bf16(b);
              acc[i * tile + j] += a * b;
            }
          }
        }
      }
      for (int64_t i = 0; i < mi; ++i)
        for (int64_t j = 0; j < nj; ++j) {
          float* c = &C[(i0 + i) * N + (j0 + j)];
          *c = alpha * acc[i * tile + j] + beta * (*c);
        }
    }
  }
  return 0;
}

// NHWC conv2d forward via im2col onto the tile engine — the TPU lowers
// convs to MXU matmuls the same way (the reference instead hand-blocks
// NCHW, simple_conv2d_impl.cpp:373-470).
int cmodel_conv2d_fp(const float* X, const float* W, float* Y,
                     int64_t N, int64_t H, int64_t Wd, int64_t Cin,
                     int64_t KH, int64_t KW, int64_t Cout,
                     int64_t stride, int64_t pad, int round_bf16) {
  if (!X || !W || !Y || stride <= 0) return -1;
  const int64_t OH = (H + 2 * pad - KH) / stride + 1;
  const int64_t OW = (Wd + 2 * pad - KW) / stride + 1;
  if (OH <= 0 || OW <= 0) return -2;
  const int64_t M = N * OH * OW;
  const int64_t Kdim = KH * KW * Cin;

  std::vector<float> col(static_cast<size_t>(M) * Kdim, 0.0f);
#pragma omp parallel for schedule(static)
  for (int64_t m = 0; m < M; ++m) {
    const int64_t n = m / (OH * OW);
    const int64_t oh = (m / OW) % OH;
    const int64_t ow = m % OW;
    float* row = &col[m * Kdim];
    for (int64_t kh = 0; kh < KH; ++kh) {
      const int64_t ih = oh * stride + kh - pad;
      if (ih < 0 || ih >= H) continue;
      for (int64_t kw = 0; kw < KW; ++kw) {
        const int64_t iw = ow * stride + kw - pad;
        if (iw < 0 || iw >= Wd) continue;
        const float* src = &X[((n * H + ih) * Wd + iw) * Cin];
        std::memcpy(&row[(kh * KW + kw) * Cin], src,
                    sizeof(float) * Cin);
      }
    }
  }
  // Y (M, Cout) = col (M, Kdim) @ W (Kdim, Cout)
  return cmodel_gemm(col.data(), W, Y, M, Cout, Kdim, 0, 0, 1.0f, 0.0f,
                     128, 0, round_bf16);
}

// Backward-data: dX (N,H,Wd,Cin) from dY (N,OH,OW,Cout) and
// W (KH*KW*Cin, Cout).  One engine GEMM (dY @ W^T) then the col2im
// scatter-add inverse of the forward's im2col gather.
int cmodel_conv2d_bp(const float* dY, const float* W, float* dX,
                     int64_t N, int64_t H, int64_t Wd, int64_t Cin,
                     int64_t KH, int64_t KW, int64_t Cout,
                     int64_t stride, int64_t pad, int round_bf16) {
  if (!dY || !W || !dX || stride <= 0) return -1;
  const int64_t OH = (H + 2 * pad - KH) / stride + 1;
  const int64_t OW = (Wd + 2 * pad - KW) / stride + 1;
  if (OH <= 0 || OW <= 0) return -2;
  const int64_t M = N * OH * OW;
  const int64_t Kdim = KH * KW * Cin;

  // dcol (M, Kdim) = dY (M, Cout) @ W^T (Cout, Kdim)
  std::vector<float> dcol(static_cast<size_t>(M) * Kdim, 0.0f);
  int rc = cmodel_gemm(dY, W, dcol.data(), M, Kdim, Cout, 0, /*b_trans=*/1,
                       1.0f, 0.0f, 128, 0, round_bf16);
  if (rc != 0) return rc;

  std::memset(dX, 0, sizeof(float) * N * H * Wd * Cin);
  // Parallelize over images: each image's scatter targets are disjoint.
#pragma omp parallel for schedule(static)
  for (int64_t n = 0; n < N; ++n) {
    for (int64_t oh = 0; oh < OH; ++oh) {
      for (int64_t ow = 0; ow < OW; ++ow) {
        const float* row = &dcol[((n * OH + oh) * OW + ow) * Kdim];
        for (int64_t kh = 0; kh < KH; ++kh) {
          const int64_t ih = oh * stride + kh - pad;
          if (ih < 0 || ih >= H) continue;
          for (int64_t kw = 0; kw < KW; ++kw) {
            const int64_t iw = ow * stride + kw - pad;
            if (iw < 0 || iw >= Wd) continue;
            float* dst = &dX[((n * H + ih) * Wd + iw) * Cin];
            const float* src = &row[(kh * KW + kw) * Cin];
            for (int64_t c = 0; c < Cin; ++c) dst[c] += src[c];
          }
        }
      }
    }
  }
  return 0;
}

// Backward-weight: dW (KH*KW*Cin, Cout) = col(X)^T (Kdim, M) @ dY (M, Cout)
// — the forward's im2col followed by one transposed engine GEMM.
int cmodel_conv2d_wu(const float* X, const float* dY, float* dW,
                     int64_t N, int64_t H, int64_t Wd, int64_t Cin,
                     int64_t KH, int64_t KW, int64_t Cout,
                     int64_t stride, int64_t pad, int round_bf16) {
  if (!X || !dY || !dW || stride <= 0) return -1;
  const int64_t OH = (H + 2 * pad - KH) / stride + 1;
  const int64_t OW = (Wd + 2 * pad - KW) / stride + 1;
  if (OH <= 0 || OW <= 0) return -2;
  const int64_t M = N * OH * OW;
  const int64_t Kdim = KH * KW * Cin;

  std::vector<float> col(static_cast<size_t>(M) * Kdim, 0.0f);
#pragma omp parallel for schedule(static)
  for (int64_t m = 0; m < M; ++m) {
    const int64_t n = m / (OH * OW);
    const int64_t oh = (m / OW) % OH;
    const int64_t ow = m % OW;
    float* row = &col[m * Kdim];
    for (int64_t kh = 0; kh < KH; ++kh) {
      const int64_t ih = oh * stride + kh - pad;
      if (ih < 0 || ih >= H) continue;
      for (int64_t kw = 0; kw < KW; ++kw) {
        const int64_t iw = ow * stride + kw - pad;
        if (iw < 0 || iw >= Wd) continue;
        const float* src = &X[((n * H + ih) * Wd + iw) * Cin];
        std::memcpy(&row[(kh * KW + kw) * Cin], src, sizeof(float) * Cin);
      }
    }
  }
  std::memset(dW, 0, sizeof(float) * Kdim * Cout);
  return cmodel_gemm(col.data(), dY, dW, Kdim, Cout, M, /*a_trans=*/1, 0,
                     1.0f, 0.0f, 128, 0, round_bf16);
}

}  // extern "C"
