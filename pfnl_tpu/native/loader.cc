// Native data-loader: parallel PNG decode + crop.
//
// The reference's input pipeline was TF1's C++ queue runners feeding
// decode_png graph ops (base_model.py:196-198); this is the framework's
// native equivalent: a libpng-based decoder with a std::thread pool that
// decodes and crops a whole batch of frames into one contiguous uint8
// buffer, called from Python via ctypes (no pybind11 dependency).
//
// Only 8-bit RGB/RGBA/gray non-interlaced PNGs are produced by the
// datasets; libpng transforms normalize everything to 8-bit RGB.

#include <png.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<unsigned char> data;  // RGB8
  int h = 0;
  int w = 0;
};

bool decode_png_file(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  // normalize to 8-bit RGB
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->data.resize(static_cast<size_t>(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 r = 0; r < h; ++r)
    rows[r] = out->data.data() + static_cast<size_t>(r) * w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

}  // namespace

extern "C" {

// Reads only the header; returns 0 on success.
int pfnl_png_size(const char* path, int* h, int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_uint_32 ww, hh;
  int bd, ct;
  png_get_IHDR(png, info, &ww, &hh, &bd, &ct, nullptr, nullptr, nullptr);
  *h = static_cast<int>(hh);
  *w = static_cast<int>(ww);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode n PNGs in parallel, crop [y0[i]:y0[i]+crop_h, x0[i]:x0[i]+crop_w],
// write RGB8 into out (contiguous [n, crop_h, crop_w, 3]).
// crop_h/crop_w <= 0 means full frame (all images must then share a size,
// given by full_h/full_w). Returns number of failures.
int pfnl_decode_crop_batch(const char** paths, int n, const int* y0,
                           const int* x0, int crop_h, int crop_w,
                           unsigned char* out, int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const bool full = crop_h <= 0 || crop_w <= 0;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      if (!decode_png_file(paths[i], &img)) {
        failures.fetch_add(1);
        continue;
      }
      int ch = full ? img.h : crop_h;
      int cw = full ? img.w : crop_w;
      int oy = full ? 0 : y0[i];
      int ox = full ? 0 : x0[i];
      if (oy + ch > img.h || ox + cw > img.w) {
        failures.fetch_add(1);
        continue;
      }
      unsigned char* dst = out + static_cast<size_t>(i) * ch * cw * 3;
      for (int r = 0; r < ch; ++r) {
        std::memcpy(dst + static_cast<size_t>(r) * cw * 3,
                    img.data.data() +
                        (static_cast<size_t>(oy + r) * img.w + ox) * 3,
                    static_cast<size_t>(cw) * 3);
      }
    }
  };

  int nt = num_threads > 0 ? num_threads : 1;
  if (nt > n) nt = n;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Encode RGB8 [h, w, 3] to a PNG file. Returns 0 on success.
int pfnl_encode_png(const char* path, const unsigned char* data, int h,
                    int w) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return 1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  // speed over size: SR result dumps are throughput-sensitive
  png_set_compression_level(png, 1);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int r = 0; r < h; ++r)
    rows[r] = const_cast<png_bytep>(data + static_cast<size_t>(r) * w * 3);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

}  // extern "C"
