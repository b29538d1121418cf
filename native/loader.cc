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
// yuv420_to_rgb_u8 is bit-identical to data/yuv.py::yuv420_to_rgb AND to the
// reference's cv2 pipeline (resize INTER_LINEAR 2x chroma + YCrCb2RGB):
// all-integer replication of cv2's fixed-point arithmetic.

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

// cv2 fixed-point descale: (x + 2^(n-1)) >> n (arithmetic shift).
inline int64_t descale(int64_t x, int n) { return (x + (int64_t{1} << (n - 1))) >> n; }

// Horizontal pass of the chroma upsample (cv2.resize INTER_LINEAR 2x,
// uint8 fixed-point: coef scale 2048), computed ONCE per source row —
// adjacent output rows share source rows, so recomputing per output row
// (the old form) did up to 4x redundant arithmetic. Max value 2048*255
// fits int32.
void hpass_plane(const uint8_t* plane, int ch, int cw, int w, int32_t* dst) {
  for (int r = 0; r < ch; ++r) {
    const uint8_t* src = plane + static_cast<int64_t>(r) * cw;
    int32_t* d = dst + static_cast<int64_t>(r) * w;
    for (int j = 0; j < w; ++j) {
      const int k = j / 2;
      const int left = (j % 2 == 0) ? std::max(k - 1, 0) : k;
      const int right = (j % 2 == 0) ? k : std::min(k + 1, cw - 1);
      const int32_t wl = (j % 2 == 0) ? 512 : 1536;
      d[j] = wl * src[left] + (2048 - wl) * src[right];
    }
  }
}

// Vertical pass + color conversion for one upsampled chroma row (SIMD
// rounding path: per-term (b*(S>>4))>>16, (+2)>>2).
inline int64_t vpass(const int32_t* top, const int32_t* bot, int64_t wt,
                     int j) {
  const int64_t t = ((wt * (static_cast<int64_t>(top[j]) >> 4)) >> 16) +
                    (((2048 - wt) * (static_cast<int64_t>(bot[j]) >> 4)) >> 16);
  return std::min<int64_t>(255, std::max<int64_t>(0, (t + 2) >> 2));
}

void yuv_rows(const uint8_t* y, const int32_t* uh, const int32_t* vh, int h,
              int w, int row0, int row1, uint8_t* out) {
  const int ch = h / 2;
  for (int i = row0; i < row1; ++i) {
    const uint8_t* yrow = y + static_cast<int64_t>(i) * w;
    uint8_t* orow = out + static_cast<int64_t>(i) * w * 3;
    const int r = i / 2;
    const int top = (i % 2 == 0) ? std::max(r - 1, 0) : r;
    const int bot = (i % 2 == 0) ? r : std::min(r + 1, ch - 1);
    const int64_t wt = (i % 2 == 0) ? 512 : 1536;
    const int32_t* ut = uh + static_cast<int64_t>(top) * w;
    const int32_t* ub = uh + static_cast<int64_t>(bot) * w;
    const int32_t* vt = vh + static_cast<int64_t>(top) * w;
    const int32_t* vb = vh + static_cast<int64_t>(bot) * w;
    for (int j = 0; j < w; ++j) {
      const int64_t Y = yrow[j];
      const int64_t CB = vpass(ut, ub, wt, j) - 128;
      const int64_t CR = vpass(vt, vb, wt, j) - 128;
      // cvtColor YCrCb2RGB 14-bit fixed point (bit-identical to cv2)
      const int64_t r = Y + descale(22987 * CR, 14);
      const int64_t g = Y + descale(-11698 * CR - 5636 * CB, 14);
      const int64_t b = Y + descale(29049 * CB, 14);
      orow[3 * j + 0] = static_cast<uint8_t>(std::min<int64_t>(255, std::max<int64_t>(0, r)));
      orow[3 * j + 1] = static_cast<uint8_t>(std::min<int64_t>(255, std::max<int64_t>(0, g)));
      orow[3 * j + 2] = static_cast<uint8_t>(std::min<int64_t>(255, std::max<int64_t>(0, b)));
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
  const int cw = w / 2;
  const int ch = h / 2;
  // shared horizontal chroma pass, once per source row
  std::vector<int32_t> uh(static_cast<int64_t>(ch) * w);
  std::vector<int32_t> vh(static_cast<int64_t>(ch) * w);
  hpass_plane(u, ch, cw, w, uh.data());
  hpass_plane(v, ch, cw, w, vh.data());
  const int nt = pick_threads(h);
  if (nt == 1) {
    yuv_rows(y, uh.data(), vh.data(), h, w, 0, h, out);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nt);
  const int chunk = (h + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int r0 = t * chunk;
    const int r1 = std::min(h, r0 + chunk);
    if (r0 >= r1) break;
    ts.emplace_back(yuv_rows, y, uh.data(), vh.data(), h, w, r0, r1, out);
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
