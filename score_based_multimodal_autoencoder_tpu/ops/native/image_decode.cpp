// Host-side data-loading kernel: threaded PNG/JPEG batch decode + resample.
//
// Both datasets are EAGERLY decoded into RAM at startup (the reference does
// the same through serial PIL loops: polymnist_dataset.py:60-89 decodes
// 10 x 60k PNGs, celeba_hq_mask_dataset.py:36-64 decodes 30k JPG/PNG pairs
// with a resize to 128x128). This module replaces that host bottleneck with
// a std::thread pool over libpng/libjpeg plus a PIL-compatible separable
// triangle ("bilinear") resampler. Built on demand with g++ (see
// native.py); the loaders fall back to PIL when the build is unavailable.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  out->resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

// Decode to 8-bit RGB using libpng's simplified API.
bool decode_png_rgb(const std::vector<uint8_t>& mem, std::vector<uint8_t>* rgb,
                    int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, mem.data(), mem.size()))
    return false;
  image.format = PNG_FORMAT_RGB;
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  rgb->resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgb->data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr pub;
  std::jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg_rgb(const std::vector<uint8_t>& mem,
                     std::vector<uint8_t>* rgb, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, mem.data(), mem.size());
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) *
                                     *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// PIL-style separable triangle resampling along one axis (the BILINEAR
// filter of ImagingResample: support scales with the downscale factor, so
// large reductions average - plain corner bilinear would alias).
void resample_axis(const float* src, int in_len, int other, int ch,
                   int in_stride, int out_stride_unused, float* dst,
                   int out_len) {
  (void)out_stride_unused;
  const double scale = static_cast<double>(in_len) / out_len;
  const double fscale = std::max(scale, 1.0);
  const double support = 1.0 * fscale;
  std::vector<double> weights;
  for (int xx = 0; xx < out_len; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(
        std::min(static_cast<double>(in_len), std::ceil(center + support)));
    weights.assign(xmax - xmin, 0.0);
    double wsum = 0.0;
    for (int i = xmin; i < xmax; ++i) {
      double x = (i + 0.5 - center) / fscale;
      double wgt = (x < 0) ? 1.0 + x : 1.0 - x;
      if (wgt < 0) wgt = 0;
      weights[i - xmin] = wgt;
      wsum += wgt;
    }
    for (double& wgt : weights) wgt /= (wsum > 0 ? wsum : 1.0);
    // src layout: (other, in_len, ch) rows; dst: (other, out_len, ch).
    for (int o = 0; o < other; ++o) {
      const float* srow = src + static_cast<size_t>(o) * in_stride * ch;
      float* drow = dst + (static_cast<size_t>(o) * out_len + xx) * ch;
      for (int c = 0; c < ch; ++c) {
        double acc = 0.0;
        for (int i = xmin; i < xmax; ++i)
          acc += srow[static_cast<size_t>(i) * ch + c] * weights[i - xmin];
        drow[c] = static_cast<float>(acc);
      }
    }
  }
}

// (h, w, ch) uint8 -> (H, W, ch) uint8, PIL BILINEAR semantics.
void resize_triangle(const uint8_t* src, int w, int h, int ch, uint8_t* dst,
                     int W, int H) {
  std::vector<float> a(static_cast<size_t>(h) * w * ch);
  for (size_t i = 0; i < a.size(); ++i) a[i] = src[i];
  // Horizontal pass: (h, w, ch) -> (h, W, ch).
  std::vector<float> b(static_cast<size_t>(h) * W * ch);
  resample_axis(a.data(), w, h, ch, w, W, b.data(), W);
  // Vertical pass: treat columns as the resample axis by transposing.
  std::vector<float> bt(static_cast<size_t>(W) * h * ch);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < W; ++x)
      for (int c = 0; c < ch; ++c)
        bt[(static_cast<size_t>(x) * h + y) * ch + c] =
            b[(static_cast<size_t>(y) * W + x) * ch + c];
  std::vector<float> ct(static_cast<size_t>(W) * H * ch);
  resample_axis(bt.data(), h, W, ch, h, H, ct.data(), H);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x)
      for (int c = 0; c < ch; ++c) {
        float v = ct[(static_cast<size_t>(x) * H + y) * ch + c];
        v = std::min(255.0f, std::max(0.0f, std::roundf(v)));
        dst[(static_cast<size_t>(y) * W + x) * ch + c] =
            static_cast<uint8_t>(v);
      }
}

bool decode_one(const char* path, uint8_t* out, int H, int W, int C) {
  std::vector<uint8_t> mem;
  if (!read_file(path, &mem) || mem.size() < 4) return false;
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  bool ok = false;
  if (mem[0] == 0x89 && mem[1] == 'P')
    ok = decode_png_rgb(mem, &rgb, &w, &h);
  else if (mem[0] == 0xFF && mem[1] == 0xD8)
    ok = decode_jpeg_rgb(mem, &rgb, &w, &h);
  if (!ok || w <= 0 || h <= 0) return false;

  std::vector<uint8_t> chan;
  const uint8_t* px = rgb.data();
  if (C == 1) {
    // PIL "L": L = (R*299 + G*587 + B*114) / 1000 (ITU-R 601-2).
    chan.resize(static_cast<size_t>(w) * h);
    for (size_t i = 0; i < chan.size(); ++i) {
      const uint8_t* p = rgb.data() + i * 3;
      chan[i] = static_cast<uint8_t>(
          (p[0] * 299L + p[1] * 587L + p[2] * 114L) / 1000);
    }
    px = chan.data();
  }
  if (w == W && h == H) {
    std::memcpy(out, px, static_cast<size_t>(H) * W * C);
  } else {
    resize_triangle(px, w, h, C, out, W, H);
  }
  return true;
}

}  // namespace

extern "C" {

// Decode n image files into out (n, H, W, C) uint8, resampling to (H, W)
// when needed. C = 3 (RGB) or 1 (PIL-"L" grayscale). Returns 0 on success
// or the 1-based index of the first file that failed.
int64_t decode_images(const char** paths, int64_t n, uint8_t* out, int H,
                      int W, int C, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0), failed(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      uint8_t* dst = out + static_cast<size_t>(i) * H * W * C;
      if (!decode_one(paths[i], dst, H, W, C)) {
        int64_t expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
        return;
      }
    }
  };
  std::vector<std::thread> pool;
  int k = std::min<int64_t>(n_threads, n);
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
