// Monotonic Alignment Search — host C++ kernel.
//
// Native equivalent of the reference's Cython/OpenMP extension
// (reference: Matcha-TTS/matcha/utils/monotonic_align/core.pyx:11-47):
// per-item Viterbi DP forward sweep over mel frames + argmax backtrace,
// batch-parallel via OpenMP.  Exposed through a C ABI consumed with
// ctypes (emojivoice_tpu/ops/mas_cpp.py) and bridged into jitted programs
// via jax.pure_callback.
//
// The DP recurrence and boundary rules match ops/mas.py (the on-device
// wavefront implementation) exactly; tests pin all three against a
// brute-force oracle.

#include <algorithm>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

void maximum_path_each(int32_t* path, float* value, int t_x, int t_y,
                       int stride_x, float max_neg_val) {
  // forward DP, in place on value
  for (int y = 0; y < t_y; ++y) {
    int x_lo = std::max(0, t_x + y - t_y);
    int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      float v_cur = (x == y) ? max_neg_val : value[x * stride_x + (y - 1)];
      float v_prev;
      if (x == 0) {
        v_prev = (y == 0) ? 0.0f : max_neg_val;
      } else {
        v_prev = value[(x - 1) * stride_x + (y - 1)];
      }
      value[x * stride_x + y] += std::max(v_cur, v_prev);
    }
  }
  // backtrace
  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[index * stride_x + y] = 1;
    if (index != 0 &&
        (index == y ||
         value[index * stride_x + (y - 1)] < value[(index - 1) * stride_x + (y - 1)])) {
      --index;
    }
  }
}

}  // namespace

extern "C" {

// paths: (b, t_x_max, t_y_max) int32, zero-initialized by the caller.
// values: (b, t_x_max, t_y_max) float32, log-prior pre-multiplied by mask;
//         clobbered with the cumulative DP values.
void maximum_path_c(int32_t* paths, float* values, const int32_t* t_xs,
                    const int32_t* t_ys, int b, int t_x_max, int t_y_max,
                    float max_neg_val) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < b; ++i) {
    maximum_path_each(paths + static_cast<int64_t>(i) * t_x_max * t_y_max,
                      values + static_cast<int64_t>(i) * t_x_max * t_y_max,
                      t_xs[i], t_ys[i], t_y_max, max_neg_val);
  }
}

}  // extern "C"
