// First-party native kernels for host-side evaluation.
//
// Replaces the reference's OR-Tools C++ KnapsackSolver dependency
// (summarizer/utils/knapsack.py:5-23) with an in-tree exact 0/1-knapsack DP,
// plus an average-tie rankdata used by the fast host eval path.
//
// Exposed through a plain C ABI and loaded from Python with ctypes
// (summarizer_tpu/native/__init__.py); traceback semantics match the
// numpy fallback in summarizer_tpu/ops/knapsack.py bit-for-bit.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Exact 0/1 knapsack. Writes selected item indices (ascending) into
// out_picks (caller-allocated, size >= n) and returns the pick count.
int64_t knapsack_dp(const int64_t* values, const int64_t* weights, int64_t n,
                    int64_t capacity, int64_t* out_picks) {
  if (n <= 0 || capacity <= 0) return 0;
  const int64_t C = capacity;
  std::vector<int64_t> dp(C + 1, 0);
  // Bit-packed keep table: n rows of (C+1) decisions.
  const int64_t row_words = (C + 1 + 63) / 64;
  std::vector<uint64_t> keep(static_cast<size_t>(n) * row_words, 0);

  for (int64_t i = 0; i < n; ++i) {
    const int64_t w = weights[i];
    const int64_t v = values[i];
    if (w > C || w < 0) continue;
    uint64_t* row = keep.data() + i * row_words;
    // Descending capacity so dp stays the "previous items" row in-place.
    for (int64_t c = C; c >= w; --c) {
      const int64_t cand = dp[c - w] + v;
      if (cand > dp[c]) {
        dp[c] = cand;
        row[c >> 6] |= (uint64_t(1) << (c & 63));
      }
    }
  }

  int64_t count = 0;
  int64_t c = C;
  for (int64_t i = n - 1; i >= 0; --i) {
    const uint64_t* row = keep.data() + i * row_words;
    if (row[c >> 6] & (uint64_t(1) << (c & 63))) {
      out_picks[count++] = i;
      c -= weights[i];
    }
  }
  std::reverse(out_picks, out_picks + count);
  return count;
}

// Average-tie ranks (1-based), the semantics of scipy.stats.rankdata's
// default "average" method used by the reference's correlation metric
// (summarizer/utils/eval.py:61-63). order must hold argsort(x) indices.
void rankdata_average(const float* x, const int64_t* order, int64_t n,
                      double* out_ranks) {
  int64_t i = 0;
  while (i < n) {
    int64_t j = i;
    while (j + 1 < n && x[order[j + 1]] == x[order[i]]) ++j;
    const double avg = 0.5 * (double)(i + j) + 1.0;
    for (int64_t k = i; k <= j; ++k) out_ranks[order[k]] = avg;
    i = j + 1;
  }
}

}  // extern "C"
