// Native MATLAB-exact bicubic resize core (host data path).
//
// The Python host pipeline degrades HR images with the MATLAB-exact bicubic
// (mobilesuperresolution_tpu/data/imresize.py) on every training patch; on
// the single-core hosts driving the TPU this dominates input time. This C++
// core executes the same per-dimension gather+weighted-sum with float64
// accumulation and per-dimension uint8 rounding, given the tap weights and
// mirrored indices precomputed in Python — so it is bit-identical to the
// numpy path by construction (verified in tests/test_native.py).
//
// Build: make -C native   (produces libimresize.so; loaded via ctypes with a
// numpy fallback if absent).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Resize along dim 0 (rows). in: (h, w, c) uint8. out: (oh, w, c) uint8.
// weights: (oh, p) float64; indices: (oh, p) int32 (pre-mirrored).
void resize_rows_u8(const uint8_t* in, int h, int w, int c,
                    const double* weights, const int32_t* indices, int p,
                    uint8_t* out, int oh) {
  const int row_stride = w * c;
  for (int o = 0; o < oh; ++o) {
    const double* wt = weights + (size_t)o * p;
    const int32_t* ix = indices + (size_t)o * p;
    for (int col = 0; col < row_stride; ++col) {
      double acc = 0.0;
      for (int t = 0; t < p; ++t) {
        acc += wt[t] * in[(size_t)ix[t] * row_stride + col];
      }
      double v = acc < 0.0 ? 0.0 : (acc > 255.0 ? 255.0 : acc);
      // round-half-to-even, matching numpy's np.around
      double r = std::nearbyint(v);
      out[(size_t)o * row_stride + col] = (uint8_t)r;
    }
  }
}

// Resize along dim 1 (cols). in: (h, w, c) uint8. out: (h, ow, c) uint8.
void resize_cols_u8(const uint8_t* in, int h, int w, int c,
                    const double* weights, const int32_t* indices, int p,
                    uint8_t* out, int ow) {
  for (int row = 0; row < h; ++row) {
    const uint8_t* in_row = in + (size_t)row * w * c;
    uint8_t* out_row = out + (size_t)row * ow * c;
    for (int o = 0; o < ow; ++o) {
      const double* wt = weights + (size_t)o * p;
      const int32_t* ix = indices + (size_t)o * p;
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int t = 0; t < p; ++t) {
          acc += wt[t] * in_row[(size_t)ix[t] * c + ch];
        }
        double v = acc < 0.0 ? 0.0 : (acc > 255.0 ? 255.0 : acc);
        out_row[(size_t)o * c + ch] = (uint8_t)std::nearbyint(v);
      }
    }
  }
}

}  // extern "C"
