// Host-side data-feeding kernel: fused batch gather + uint8 -> float32
// normalize.
//
// The training loops' host hot path is assembling a shuffled batch from the
// in-RAM uint8 dataset and converting it to float32 in [0, 1] before the
// device transfer (data/loader.py). NumPy does this as two passes
// (fancy-index copy, then astype/divide); this kernel does one multi-
// threaded pass. Built on demand with g++ (see native.py); the framework
// falls back to the NumPy path when no toolchain is present.

#include <cstdint>
#include <cstddef>
#include <thread>
#include <vector>

extern "C" {

// src: flat uint8 array of n_rows * row_elems
// idx: n_sel row indices into src
// dst: n_sel * row_elems float32 output, scaled by 1/255
void gather_normalize_u8(const uint8_t* src, const int64_t* idx,
                         float* dst, int64_t n_sel, int64_t row_elems,
                         int n_threads) {
  if (n_threads < 1) n_threads = 1;
  const float scale = 1.0f / 255.0f;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t s = lo; s < hi; ++s) {
      const uint8_t* row = src + idx[s] * row_elems;
      float* out = dst + s * row_elems;
      for (int64_t j = 0; j < row_elems; ++j) {
        out[j] = static_cast<float>(row[j]) * scale;
      }
    }
  };
  if (n_threads == 1 || n_sel < 2) {
    worker(0, n_sel);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_sel + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_sel ? lo + chunk : n_sel;
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
