// Native host-side data pipeline for sea_tpu.
//
// C++ analogue of the reference's corpus windowing + batch assembly
// (reference src/dataset/wikitext2.py:129-189: tokenize-once cache, strided
// windows with trg_len target masking, mp.Pool parallel chunking). The
// device compute path is JAX/XLA/Pallas; this is the host runtime piece:
// zero-copy batch assembly into caller-owned buffers, parallel across the
// batch with std::thread.
//
// Built on demand by sea_tpu/native/__init__.py (g++ -O3 -shared -fPIC) and
// bound via ctypes; a numpy fallback exists for compiler-less environments.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// Fill one strided-window batch.
//   tokens:      flat corpus (int32), length total
//   window_idx:  batch_size window indices
//   max_length, stride: window geometry (stride <= max_length)
//   out_ids (batch, max_length) int32  — padded with pad_id
//   out_mask (batch, max_length) int32 — 1 where valid
//   out_labels (batch, max_length) int64 — -100 outside the supervised tail
void window_batch(const int32_t* tokens, int64_t total,
                  const int64_t* window_idx, int64_t batch_size,
                  int64_t max_length, int64_t stride, int32_t pad_id,
                  int32_t* out_ids, int32_t* out_mask, int64_t* out_labels) {
  auto fill_one = [&](int64_t b) {
    const int64_t idx = window_idx[b];
    int64_t begin = std::min(idx * stride, std::max<int64_t>(total - max_length, 0));
    int64_t end = std::min(begin + max_length, total);
    int64_t prev_end =
        idx == 0 ? begin
                 : std::min((idx - 1) * stride + max_length, total);
    int64_t trg_len = idx > 0 ? end - prev_end : end - begin;
    int64_t n = end - begin;

    int32_t* ids = out_ids + b * max_length;
    int32_t* mask = out_mask + b * max_length;
    int64_t* labels = out_labels + b * max_length;
    for (int64_t i = 0; i < max_length; ++i) {
      ids[i] = pad_id;
      mask[i] = 0;
      labels[i] = -100;
    }
    std::memcpy(ids, tokens + begin, n * sizeof(int32_t));
    for (int64_t i = 0; i < n; ++i) mask[i] = 1;
    for (int64_t i = std::max<int64_t>(n - trg_len, 0); i < n; ++i)
      labels[i] = ids[i];
  };

  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t n_threads = std::min<int64_t>(hw, batch_size);
  if (n_threads <= 1) {
    for (int64_t b = 0; b < batch_size; ++b) fill_one(b);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t] {
      for (int64_t b = t; b < batch_size; b += n_threads) fill_one(b);
    });
  }
  for (auto& th : threads) th.join();
}

// Deterministic Zipf-ish synthetic corpus with local repetition structure
// (mirrors sea_tpu/data/wikitext2.py synthetic_corpus so either path can
// serve offline CI).
void zipf_corpus(int64_t total, int32_t vocab_size, uint64_t seed,
                 double alpha, double repeat_p, int32_t* out) {
  std::mt19937_64 rng(seed);
  // inverse-CDF table for the Zipf distribution over vocab_size - 4 ranks
  const int32_t n = vocab_size - 4;
  std::vector<double> cdf(n);
  double z = 0.0;
  for (int32_t i = 0; i < n; ++i) z += 1.0 / std::pow((double)(i + 1), alpha);
  double acc = 0.0;
  for (int32_t i = 0; i < n; ++i) {
    acc += 1.0 / std::pow((double)(i + 1), alpha) / z;
    cdf[i] = acc;
  }
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int64_t i = 0; i < total; ++i) {
    if (i > 0 && uni(rng) < repeat_p) {
      out[i] = out[i - 1];
      continue;
    }
    double u = uni(rng);
    auto it = std::lower_bound(cdf.begin(), cdf.end(), u);
    out[i] = (int32_t)(it - cdf.begin()) + 4;
  }
}

}  // extern "C"
