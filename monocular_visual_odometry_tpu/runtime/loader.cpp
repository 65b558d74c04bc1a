// Native host runtime: PNG decode + multi-threaded prefetching frame loader.
//
// TPU-native counterpart of the reference's synchronous per-frame
// cv::imread (/root/reference/run_vo.cpp:114): while the device crunches
// frame i, a worker pool decodes frames i+1..i+depth into a bounded ring,
// so host image IO never stalls the accelerator (SURVEY.md §2.3 "pipeline
// analogue": the frame stream double-buffered host<->device).
//
// C ABI (consumed from Python via ctypes, monocular_visual_odometry_tpu/
// runtime/__init__.py):
//   mvo_decode_png(path, out, H, W)             one grayscale frame
//   mvo_loader_open(paths, n, H, W, depth, thr) start prefetching loader
//   mvo_loader_next(handle, out)                blocking ordered fetch
//   mvo_loader_close(handle)
//
// Build: make -C monocular_visual_odometry_tpu/runtime  (g++ + libpng).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// Decode an 8-bit PNG to grayscale float32 [H, W] (0..255). Returns 0 on
// success. Any color type is converted to gray via the standard luma
// weights libpng uses for rgb_to_gray.
int decode_png_gray(const char* path, float* out, int height, int width) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return -2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  if ((int)w != width || (int)h != height) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  std::vector<uint8_t> row(width);
  for (int y = 0; y < height; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (size_t)y * width;
    for (int x = 0; x < width; ++x) dst[x] = (float)row[x];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

struct Loader {
  std::vector<std::string> paths;
  int height = 0, width = 0, depth = 4;
  std::atomic<int> next_to_schedule{0};
  int next_to_emit = 0;
  std::map<int, std::vector<float>> ready;  // decoded frames by index
  std::map<int, int> status;                // decode rc by index
  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for next frame
  std::condition_variable cv_space;   // workers wait for ring space
  std::vector<std::thread> workers;
  bool closing = false;

  void worker() {
    for (;;) {
      int idx = next_to_schedule.fetch_add(1);
      if (idx >= (int)paths.size()) return;
      std::vector<float> buf((size_t)height * width);
      int rc = decode_png_gray(paths[idx].c_str(), buf.data(), height, width);
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return closing || idx < next_to_emit + depth; });
      if (closing) return;
      ready.emplace(idx, std::move(buf));
      status[idx] = rc;
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int mvo_decode_png(const char* path, float* out, int height, int width) {
  return decode_png_gray(path, out, height, width);
}

void* mvo_loader_open(const char** paths, int n, int height, int width,
                      int depth, int n_threads) {
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->height = height;
  L->width = width;
  L->depth = depth < 1 ? 1 : depth;
  int nt = n_threads < 1 ? 1 : n_threads;
  for (int i = 0; i < nt; ++i) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// Blocking fetch of the next frame in order. Returns the libpng rc (0 ok),
// or -100 if the sequence is exhausted.
int mvo_loader_next(void* handle, float* out) {
  Loader* L = (Loader*)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_emit >= (int)L->paths.size()) return -100;
  int idx = L->next_to_emit;
  L->cv_ready.wait(lk, [&] { return L->ready.count(idx) > 0; });
  auto it = L->ready.find(idx);
  std::memcpy(out, it->second.data(),
              sizeof(float) * (size_t)L->height * L->width);
  int rc = L->status[idx];
  L->ready.erase(it);
  L->status.erase(idx);
  L->next_to_emit++;
  L->cv_space.notify_all();
  return rc;
}

void mvo_loader_close(void* handle) {
  Loader* L = (Loader*)handle;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->closing = true;
    L->next_to_schedule.store((int)L->paths.size());
    L->cv_space.notify_all();
  }
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
