// Native sparse-ingest kernels for lsqr_tpu.
//
// The reference library is 100% compiled Fortran (SURVEY.md §2.1); in the
// TPU build the device math is compiled by XLA/Mosaic, and THIS file is the
// compiled host-side runtime: packing COO triplets into the TPU-friendly
// layouts (ELL, blocked-ELL, CSR) and preparing row partitions. These are
// the O(nnz) host loops that would otherwise run as interpreted Python for
// matrices with 10M+ nonzeros.
//
// Plain C ABI (called via ctypes); all index arrays are int32 (device
// convention), sizes are int64.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Row/column histogram; returns the max count (the ELL width k).
// ---------------------------------------------------------------------------
int64_t lsqr_row_counts(const int32_t* rows, int64_t nnz, int32_t m,
                        int64_t* counts /* size m, zeroed by caller */) {
  int64_t maxc = 0;
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t c = ++counts[rows[i]];
    if (c > maxc) maxc = c;
  }
  return maxc;
}

// ---------------------------------------------------------------------------
// ELL packing: out_vals/out_cols are (m, k) row-major, pre-zeroed.
// ---------------------------------------------------------------------------
#define DEFINE_ELL_PACK(SUFFIX, T)                                            \
  void lsqr_ell_pack_##SUFFIX(const int32_t* rows, const int32_t* cols,       \
                              const T* vals, int64_t nnz, int32_t m,          \
                              int64_t k, T* out_vals, int32_t* out_cols,      \
                              int64_t* fill /* size m, zeroed */) {           \
    (void)m;                                                                  \
    for (int64_t i = 0; i < nnz; ++i) {                                       \
      int32_t r = rows[i];                                                    \
      int64_t slot = fill[r]++;                                               \
      out_vals[r * k + slot] = vals[i];                                       \
      out_cols[r * k + slot] = cols[i];                                       \
    }                                                                         \
  }

DEFINE_ELL_PACK(f32, float)
DEFINE_ELL_PACK(f64, double)

// ---------------------------------------------------------------------------
// CSR from COO (rows need not be sorted): builds indptr and permutes
// cols/vals into CSR order. indptr has size m+1.
// ---------------------------------------------------------------------------
#define DEFINE_CSR_PACK(SUFFIX, T)                                            \
  void lsqr_csr_from_coo_##SUFFIX(                                            \
      const int32_t* rows, const int32_t* cols, const T* vals, int64_t nnz,   \
      int32_t m, int64_t* indptr /* m+1, zeroed */, int32_t* out_cols,        \
      T* out_vals) {                                                          \
    for (int64_t i = 0; i < nnz; ++i) indptr[rows[i] + 1]++;                  \
    for (int32_t r = 0; r < m; ++r) indptr[r + 1] += indptr[r];               \
    std::vector<int64_t> fill(indptr, indptr + m);                            \
    for (int64_t i = 0; i < nnz; ++i) {                                       \
      int64_t p = fill[rows[i]]++;                                            \
      out_cols[p] = cols[i];                                                  \
      out_vals[p] = vals[i];                                                  \
    }                                                                         \
  }

DEFINE_CSR_PACK(f32, float)
DEFINE_CSR_PACK(f64, double)

// ---------------------------------------------------------------------------
// Blocked-ELL packing.
// Pass 1 (count): number of distinct blocks per block-row; returns kb (max).
// Pass 2 (pack): fill blocks (mb, kb, bh, bw) and bcols (mb, kb), pre-zeroed.
// A slot map (block id -> slot) is rebuilt identically in both passes.
// ---------------------------------------------------------------------------
static inline int64_t block_id(int32_t br, int32_t bc, int64_t stride) {
  return (int64_t)br * stride + bc;
}

int64_t lsqr_block_count(const int32_t* rows, const int32_t* cols, int64_t nnz,
                         int32_t bh, int32_t bw, int32_t mb, int64_t stride,
                         int64_t* counts /* size mb, zeroed */) {
  std::unordered_map<int64_t, int32_t> seen;
  seen.reserve(nnz / 8 + 16);
  int64_t maxc = 0;
  for (int64_t i = 0; i < nnz; ++i) {
    int32_t br = rows[i] / bh, bc = cols[i] / bw;
    int64_t id = block_id(br, bc, stride);
    auto it = seen.find(id);
    if (it == seen.end()) {
      seen.emplace(id, 1);
      int64_t c = ++counts[br];
      if (c > maxc) maxc = c;
    }
  }
  return maxc;
}

#define DEFINE_BLOCK_PACK(SUFFIX, T)                                          \
  void lsqr_block_pack_##SUFFIX(                                              \
      const int32_t* rows, const int32_t* cols, const T* vals, int64_t nnz,   \
      int32_t bh, int32_t bw, int32_t mb, int64_t stride, int64_t kb,         \
      T* blocks /* (mb, kb, bh, bw), zeroed */,                               \
      int32_t* bcols /* (mb, kb), zeroed */) {                                \
    std::unordered_map<int64_t, int64_t> slot_of;                             \
    slot_of.reserve(nnz / 8 + 16);                                            \
    std::vector<int64_t> next(mb, 0);                                         \
    const int64_t bsz = (int64_t)bh * bw;                                     \
    for (int64_t i = 0; i < nnz; ++i) {                                       \
      int32_t br = rows[i] / bh, bc = cols[i] / bw;                           \
      int64_t id = block_id(br, bc, stride);                                  \
      auto it = slot_of.find(id);                                             \
      int64_t slot;                                                           \
      if (it == slot_of.end()) {                                              \
        slot = next[br]++;                                                    \
        slot_of.emplace(id, slot);                                            \
        bcols[br * kb + slot] = bc;                                           \
      } else {                                                                \
        slot = it->second;                                                    \
      }                                                                       \
      int64_t lr = rows[i] - (int64_t)br * bh;                                \
      int64_t lc = cols[i] - (int64_t)bc * bw;                                \
      blocks[((int64_t)br * kb + slot) * bsz + lr * bw + lc] += vals[i];      \
    }                                                                         \
  }

DEFINE_BLOCK_PACK(f32, float)
DEFINE_BLOCK_PACK(f64, double)

// ---------------------------------------------------------------------------
// COO duplicate-sum: sorts by (row, col) and sums duplicates in place.
// Returns the deduplicated nnz.
// ---------------------------------------------------------------------------
#define DEFINE_DEDUP(SUFFIX, T)                                               \
  int64_t lsqr_coo_dedup_##SUFFIX(int32_t* rows, int32_t* cols, T* vals,      \
                                  int64_t nnz) {                              \
    if (nnz == 0) return 0;                                                   \
    std::vector<int64_t> order(nnz);                                          \
    for (int64_t i = 0; i < nnz; ++i) order[i] = i;                           \
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {         \
      if (rows[a] != rows[b]) return rows[a] < rows[b];                       \
      return cols[a] < cols[b];                                               \
    });                                                                       \
    std::vector<int32_t> r2(nnz), c2(nnz);                                    \
    std::vector<T> v2(nnz);                                                   \
    for (int64_t i = 0; i < nnz; ++i) {                                       \
      r2[i] = rows[order[i]];                                                 \
      c2[i] = cols[order[i]];                                                 \
      v2[i] = vals[order[i]];                                                 \
    }                                                                         \
    int64_t out = 0;                                                          \
    rows[0] = r2[0]; cols[0] = c2[0]; vals[0] = v2[0];                        \
    for (int64_t i = 1; i < nnz; ++i) {                                       \
      if (r2[i] == rows[out] && c2[i] == cols[out]) {                         \
        vals[out] += v2[i];                                                   \
      } else {                                                                \
        ++out;                                                                \
        rows[out] = r2[i]; cols[out] = c2[i]; vals[out] = v2[i];              \
      }                                                                       \
    }                                                                         \
    return out + 1;                                                           \
  }

DEFINE_DEDUP(f32, float)
DEFINE_DEDUP(f64, double)

}  // extern "C"
