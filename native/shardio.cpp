// Native data-path kernels for the host-side pipeline.
//
// The reference's serialization stage is a per-row Python loop over
// tf.train.Example protos — its slowest component (SURVEY §3.4,
// ref: pkg/tfrecord_writer/tfrecord_writer.py:105-126). The TPU-native
// pipeline is vectorized Python already; these C++ kernels remove the
// remaining host bottlenecks so input ETL can't starve the chips
// (SURVEY §7 hard part #6):
//
//   * vocab_*: string-token -> int32 id encoding (0 = OOV) with a
//     flat hash map and thread-parallel lookup — the StringLookup
//     replacement that runs once per dataset at shard-write time.
//   * gather_rows: thread-parallel row gather for shuffled batch
//     assembly (numpy fancy indexing is single-threaded).
//
// Exposed as a plain C ABI consumed via ctypes
// (hm_retrieval_tpu/native_ext). Build: see native/Makefile.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  // token -> id (1-based; 0 reserved for OOV)
  std::unordered_map<std::string, int32_t> map;
};

int resolve_threads(int n_threads) {
  if (n_threads > 0) return n_threads;
  unsigned hw = std::thread::hardware_concurrency();
  return hw ? static_cast<int>(hw) : 4;
}

template <typename F>
void parallel_for(uint64_t n, int n_threads, F&& fn) {
  n_threads = resolve_threads(n_threads);
  if (n < 4096 || n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  uint64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    uint64_t lo = static_cast<uint64_t>(t) * chunk;
    if (lo >= n) break;
    uint64_t hi = std::min(n, lo + chunk);
    pool.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// vocab tokens arrive as one contiguous UTF-8 buffer plus n+1 offsets.
void* vocab_create(const char* data, const uint64_t* offsets,
                   uint32_t n) {
  auto* v = new Vocab();
  v->map.reserve(n * 2);
  for (uint32_t i = 0; i < n; ++i) {
    std::string tok(data + offsets[i], offsets[i + 1] - offsets[i]);
    // first occurrence wins (vocabs are unique anyway)
    v->map.emplace(std::move(tok), static_cast<int32_t>(i) + 1);
  }
  return v;
}

void vocab_destroy(void* handle) {
  delete static_cast<Vocab*>(handle);
}

uint32_t vocab_size(void* handle) {
  return static_cast<uint32_t>(
      static_cast<Vocab*>(handle)->map.size());
}

// Encode m tokens to int32 ids (0 when absent). Thread-parallel.
void vocab_encode(void* handle, const char* data,
                  const uint64_t* offsets, uint64_t m,
                  int32_t* out, int n_threads) {
  const auto* v = static_cast<Vocab*>(handle);
  parallel_for(m, n_threads, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; ++i) {
      std::string_view tok(data + offsets[i],
                           offsets[i + 1] - offsets[i]);
      // C++20 heterogenous lookup is not guaranteed for
      // unordered_map<string>; construct a key (small-string opt
      // covers typical ids).
      auto it = v->map.find(std::string(tok));
      out[i] = (it == v->map.end()) ? 0 : it->second;
    }
  });
}

// Fixed-width variants: tokens arrive as an (m, width) byte matrix
// (numpy S-dtype), right-padded with NULs — the numpy-side conversion is
// C-speed, unlike per-token python packing.
static inline std::string_view fixed_token(const char* data,
                                           uint64_t width,
                                           uint64_t i) {
  const char* p = data + i * width;
  uint64_t len = 0;
  while (len < width && p[len] != '\0') ++len;
  return std::string_view(p, len);
}

void* vocab_create_fixed(const char* data, uint64_t width,
                         uint32_t n) {
  auto* v = new Vocab();
  v->map.reserve(n * 2);
  for (uint32_t i = 0; i < n; ++i) {
    auto tok = fixed_token(data, width, i);
    v->map.emplace(std::string(tok), static_cast<int32_t>(i) + 1);
  }
  return v;
}

void vocab_encode_fixed(void* handle, const char* data,
                        uint64_t width, uint64_t m, int32_t* out,
                        int n_threads) {
  const auto* v = static_cast<Vocab*>(handle);
  parallel_for(m, n_threads, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; ++i) {
      auto tok = fixed_token(data, width, i);
      auto it = v->map.find(std::string(tok));
      out[i] = (it == v->map.end()) ? 0 : it->second;
    }
  });
}

// dst[i, :] = src[idx[i], :] over raw bytes; thread-parallel.
void gather_rows(const uint8_t* src, uint64_t row_bytes,
                 const int32_t* idx, uint64_t n_idx, uint8_t* dst,
                 int n_threads) {
  parallel_for(n_idx, n_threads, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_bytes,
                  src + static_cast<uint64_t>(idx[i]) * row_bytes,
                  row_bytes);
    }
  });
}

}  // extern "C"
