// Native data-loading core: multithreaded YUV420->RGB conversion and
// parallel raw-frame window reads.
//
// Role: the TPU-native equivalent of the reference's host-side frame
// pipeline — datasets/yuv420_to_bgr.py:5-24 (cv2 upsample+merge+cvtColor)
// and the per-frame np.fromfile reads of datasets/_vsr.py:461-489 — done in
// C++ with a thread pool so the host keeps the input queue ahead of the
// device. Bound from Python via ctypes (mobilesuperresolution_tpu/data/
// native_loader.py); every entry point has a pure-numpy fallback.
//
// yuv420_to_rgb_u8 is bit-identical to data/yuv.py::yuv420_to_rgb: double
// math, BT.601 full-range coefficients in the same expression order, clip to
// [0,255], then truncating cast (numpy's astype(np.uint8) after np.clip).
// Build with -ffp-contract=off so no FMA contraction changes the rounding.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int pick_threads(int64_t work_items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int t = static_cast<int>(std::min<int64_t>(hw, work_items));
  return std::max(t, 1);
}

inline uint8_t clip_u8(double v) {
  // np.clip(v, 0, 255).astype(np.uint8): clamp, then truncate toward zero.
  return static_cast<uint8_t>(std::min(255.0, std::max(0.0, v)));
}

void yuv_rows(const uint8_t* y, const uint8_t* u, const uint8_t* v, int h,
              int w, int row0, int row1, uint8_t* out) {
  const int cw = w / 2;
  for (int i = row0; i < row1; ++i) {
    const uint8_t* yrow = y + static_cast<int64_t>(i) * w;
    const uint8_t* urow = u + static_cast<int64_t>(i / 2) * cw;
    const uint8_t* vrow = v + static_cast<int64_t>(i / 2) * cw;
    uint8_t* orow = out + static_cast<int64_t>(i) * w * 3;
    for (int j = 0; j < w; ++j) {
      const double yf = static_cast<double>(yrow[j]);
      const double uf = static_cast<double>(urow[j / 2]) - 128.0;
      const double vf = static_cast<double>(vrow[j / 2]) - 128.0;
      orow[3 * j + 0] = clip_u8(yf + 1.403 * vf);
      orow[3 * j + 1] = clip_u8(yf - 0.344 * uf - 0.714 * vf);
      orow[3 * j + 2] = clip_u8(yf + 1.773 * uf);
    }
  }
}

// Read exactly `size` bytes of `path` into `dst`. Returns 0 on success.
int read_file(const char* path, uint8_t* dst, int64_t size) {
  std::FILE* f = std::fopen(path, "rb");
  if (f == nullptr) return 1;
  const size_t got = std::fread(dst, 1, static_cast<size_t>(size), f);
  // must be exactly `size` bytes and nothing more (layout check)
  const int extra = std::fgetc(f);
  std::fclose(f);
  if (got != static_cast<size_t>(size) || extra != EOF) return 2;
  return 0;
}

void bgr_to_rgb_inplace(uint8_t* p, int64_t pixels) {
  for (int64_t i = 0; i < pixels; ++i) std::swap(p[3 * i], p[3 * i + 2]);
}

}  // namespace

extern "C" {

// y: (h, w), u/v: (h/2, w/2) row-major uint8 -> out: (h, w, 3) RGB uint8.
// h and w must be even (the Python wrapper falls back otherwise).
void yuv420_to_rgb_u8(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                      int h, int w, uint8_t* out) {
  const int nt = pick_threads(h);
  if (nt == 1) {
    yuv_rows(y, u, v, h, w, 0, h, out);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nt);
  const int chunk = (h + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int r0 = t * chunk;
    const int r1 = std::min(h, r0 + chunk);
    if (r0 >= r1) break;
    ts.emplace_back(yuv_rows, y, u, v, h, w, r0, r1, out);
  }
  for (auto& t : ts) t.join();
}

// Read n raw frames (frame_bytes each, concatenated at paths[i]) into the
// contiguous buffer out[n * frame_bytes], one thread per frame (pooled).
// flip_bgr != 0 reverses every channel triplet (reference rawfiles are BGR —
// datasets/yuv420_to_bgr.py:20). Returns 0 on success, i+1 where frame i
// failed (missing file or size mismatch).
int load_raw_frames(const char** paths, int n, int64_t frame_bytes,
                    int flip_bgr, uint8_t* out) {
  std::vector<int> status(n, 0);
  const int nt = pick_threads(n);
  std::vector<std::thread> ts;
  ts.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([&, t]() {
      for (int i = t; i < n; i += nt) {
        uint8_t* dst = out + static_cast<int64_t>(i) * frame_bytes;
        status[i] = read_file(paths[i], dst, frame_bytes);
        if (status[i] == 0 && flip_bgr) {
          bgr_to_rgb_inplace(dst, frame_bytes / 3);
        }
      }
    });
  }
  for (auto& t : ts) t.join();
  for (int i = 0; i < n; ++i) {
    if (status[i] != 0) return i + 1;
  }
  return 0;
}

}  // extern "C"
