// faithdiff_io: native host-side runtime for the TPU framework.
//
// The reference's performance-critical host substrate is external native
// code (OpenCV / torchvision decoders, basicsr C++ ops — SURVEY.md §2.9).
// This library is our equivalent: a threaded image decode/resize pipeline
// and the Gaussian tile blend-merge for host-side assembly of ultra-high-res
// (8K+) outputs where the full canvas should not live in HBM.
//
// C ABI, consumed from Python via ctypes (faithdiff_tpu/native.py).

#include <csetjmp>
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

bool decode_jpeg(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                 int* width, int* height) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr cinfo) { longjmp(*(jmp_buf*)cinfo->client_data, 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  out->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* data;
  size_t size;
  size_t offset;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->offset + count > st->size) {
    png_error(png, "png: read past end");
  }
  memcpy(out, st->data + st->offset, count);
  st->offset += count;
}

bool decode_png(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                int* width, int* height) {
  if (size < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{data, size, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  *width = int(w);
  *height = int(h);
  out->resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------------------------------------------------------------------
// resize (bilinear, float32 out in [0, 1])
// ---------------------------------------------------------------------------

void resize_bilinear(const uint8_t* src, int sw, int sh, float* dst, int dw,
                     int dh) {
  const float sx = float(sw) / dw;
  const float sy = float(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::clamp(int(std::floor(fy)), 0, sh - 1);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::clamp(int(std::floor(fx)), 0, sw - 1);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(size_t(y0) * sw + x0) * 3 + c];
        float v01 = src[(size_t(y0) * sw + x1) * 3 + c];
        float v10 = src[(size_t(y1) * sw + x0) * 3 + c];
        float v11 = src[(size_t(y1) * sw + x1) * 3 + c];
        float top = v00 * (1 - wx) + v01 * wx;
        float bot = v10 * (1 - wx) + v11 * wx;
        dst[(size_t(y) * dw + x) * 3 + c] = (top * (1 - wy) + bot * wy) / 255.f;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      threads_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> threads_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size);
  bool ok = fread(out->data(), 1, size, f) == size_t(size);
  fclose(f);
  return ok;
}

}  // namespace

extern "C" {

// Decode one image file (JPEG or PNG) into float32 [0,1] RGB at (dw, dh).
// Returns 0 on success.
int fd_decode_resize(const char* path, float* dst, int dw, int dh) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return 1;
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  bool ok = false;
  if (raw.size() >= 2 && raw[0] == 0xFF && raw[1] == 0xD8) {
    ok = decode_jpeg(raw.data(), raw.size(), &rgb, &w, &h);
  } else {
    ok = decode_png(raw.data(), raw.size(), &rgb, &w, &h);
    if (!ok) ok = decode_jpeg(raw.data(), raw.size(), &rgb, &w, &h);
  }
  if (!ok) return 2;
  resize_bilinear(rgb.data(), w, h, dst, dw, dh);
  return 0;
}

// Batched threaded decode+resize: paths is n null-terminated strings
// concatenated; dst is [n, dh, dw, 3] float32. Returns number of failures.
int fd_decode_batch(const char* const* paths, int n, float* dst, int dw,
                    int dh, int num_threads) {
  ThreadPool pool(std::max(num_threads, 1));
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    pool.submit([&, i] {
      float* out = dst + size_t(i) * dw * dh * 3;
      if (fd_decode_resize(paths[i], out, dw, dh) != 0) failures++;
      if (++done == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

// Gaussian-weighted tile merge on the host (float32):
//   canvas [H, W, C] accumulates tiles [T, k1, k2, C] at offsets [T, 2]
//   with the reference's Gaussian mask (var=0.01, asymmetric midpoints —
//   pipeline_FaithDiff_tlc.py:207-228), then normalises by the accumulated
//   weight. Used to assemble 8K+ outputs streamed tile-by-tile off-device.
void fd_tile_merge(const float* tiles, const int* offsets, int num_tiles,
                   int k1, int k2, int channels, float* canvas, float* weight,
                   int H, int W) {
  // build the Gaussian mask
  std::vector<float> mask(size_t(k1) * k2);
  const double var = 0.01;
  const double mx = (k2 - 1) / 2.0, my = k1 / 2.0;
  std::vector<double> xp(k2), yp(k1);
  for (int x = 0; x < k2; ++x)
    xp[x] = std::exp(-(x - mx) * (x - mx) / (double(k2) * k2) / (2 * var)) /
            std::sqrt(2 * M_PI * var);
  for (int y = 0; y < k1; ++y)
    yp[y] = std::exp(-(y - my) * (y - my) / (double(k1) * k1) / (2 * var)) /
            std::sqrt(2 * M_PI * var);
  for (int y = 0; y < k1; ++y)
    for (int x = 0; x < k2; ++x) mask[size_t(y) * k2 + x] = float(yp[y] * xp[x]);

  memset(canvas, 0, sizeof(float) * size_t(H) * W * channels);
  memset(weight, 0, sizeof(float) * size_t(H) * W);
  for (int t = 0; t < num_tiles; ++t) {
    int oi = offsets[t * 2], oj = offsets[t * 2 + 1];
    const float* tile = tiles + size_t(t) * k1 * k2 * channels;
    for (int y = 0; y < k1; ++y) {
      for (int x = 0; x < k2; ++x) {
        float m = mask[size_t(y) * k2 + x];
        size_t ci = (size_t(oi + y) * W + (oj + x));
        weight[ci] += m;
        for (int c = 0; c < channels; ++c) {
          canvas[ci * channels + c] +=
              tile[(size_t(y) * k2 + x) * channels + c] * m;
        }
      }
    }
  }
  for (size_t i = 0; i < size_t(H) * W; ++i) {
    float wsum = std::max(weight[i], 1e-12f);
    for (int c = 0; c < channels; ++c) canvas[i * channels + c] /= wsum;
  }
}

}  // extern "C"
