// Native image decoder for the ingest hot path.
//
// The reference decodes with the native Rust `image` crate under rayon
// (/root/reference/server/src/clip.rs:94-105). This is the C++ equivalent
// covering the reference's full extension whitelist (clip.rs:63-64):
//   - JPEG via libjpeg, with DCT-domain scaling (scale_denom 1/2,1/4,1/8)
//     so a 24 MP photo destined for a 224px model is never fully decoded;
//   - PNG via libpng (RGB/RGBA/gray/palette -> RGB8);
//   - WebP/TIFF/GIF/BMP in codecs_extra.cpp (libwebp, libtiff, and
//     from-scratch GIF-LZW/BMP decoders — no giflib in this image).
//
// Exposed as a plain C ABI consumed through ctypes
// (image_search_tpu/ingest/native_decode.py). Python's ThreadPoolExecutor
// provides the parallelism: ctypes calls release the GIL, so N decode
// threads run truly concurrently. Build: `make -C native`.
//
// Protocol (two calls, header parse is microseconds):
//   isx_probe(data, n, max_side, &w, &h)  -> codec id or <0 on error;
//     w/h are the post-scaling output dims.
//   isx_decode(data, n, max_side, out, w, h) -> 0 on success; out must be
//     w*h*3 bytes (RGB, row-major).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>
#include <png.h>

#include "codecs_extra.h"

namespace {

constexpr int kErrBadArgs = -1;
constexpr int kErrUnknownFormat = -2;
constexpr int kErrDecode = -3;
constexpr int kErrDims = -4;

constexpr int kFmtJpeg = 1;
constexpr int kFmtPng = 2;

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void jpeg_output_silence(j_common_ptr) {}

// Pick the largest libjpeg scale_denom (1,2,4,8) keeping
// min(w, h)/denom >= max_side — PIL `draft` semantics: both edges stay at or
// above the target so the downstream bicubic resample never upscales.
int pick_denom(int w, int h, int max_side) {
  if (max_side <= 0) return 1;
  int shortest = w < h ? w : h;
  int denom = 1;
  while (denom < 8 && shortest / (denom * 2) >= max_side) denom *= 2;
  return denom;
}

int jpeg_dims(const uint8_t* data, size_t n, int max_side, int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_error_exit;
  err.mgr.output_message = jpeg_output_silence;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  int denom = pick_denom(cinfo.image_width, cinfo.image_height, max_side);
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_RGB;
  jpeg_calc_output_dimensions(&cinfo);
  *out_w = cinfo.output_width;
  *out_h = cinfo.output_height;
  jpeg_destroy_decompress(&cinfo);
  return kFmtJpeg;
}

int jpeg_decode(const uint8_t* data, size_t n, int max_side, uint8_t* out,
                int want_w, int want_h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_error_exit;
  err.mgr.output_message = jpeg_output_silence;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.scale_num = 1;
  cinfo.scale_denom = pick_denom(cinfo.image_width, cinfo.image_height, max_side);
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_ISLOW;  // full-quality IDCT (parity with PIL)
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != want_w ||
      static_cast<int>(cinfo.output_height) != want_h ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return kErrDims;
  }
  const size_t stride = static_cast<size_t>(want_w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

struct PngReadState {
  const uint8_t* data;
  size_t size;
  size_t offset;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->offset + count > s->size) {
    png_error(png, "read past end");
  }
  memcpy(out, s->data + s->offset, count);
  s->offset += count;
}

int png_run(const uint8_t* data, size_t n, uint8_t* out, int want_w, int want_h,
            int* out_w, int* out_h) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return kErrDecode;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return kErrDecode;
  }
  png_bytep* rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    delete[] rows;
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrDecode;
  }
  PngReadState state{data, n, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // normalize every layout to 8-bit RGB
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  if (out == nullptr) {  // probe
    *out_w = static_cast<int>(w);
    *out_h = static_cast<int>(h);
    png_destroy_read_struct(&png, &info, nullptr);
    return kFmtPng;
  }
  if (static_cast<int>(w) != want_w || static_cast<int>(h) != want_h ||
      png_get_rowbytes(png, info) != static_cast<size_t>(want_w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrDims;
  }
  rows = new png_bytep[h];
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows);
  delete[] rows;
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

bool is_jpeg(const uint8_t* d, size_t n) {
  return n >= 3 && d[0] == 0xFF && d[1] == 0xD8 && d[2] == 0xFF;
}

bool is_png(const uint8_t* d, size_t n) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  return n >= 8 && memcmp(d, sig, 8) == 0;
}

}  // namespace

extern "C" {

// Returns codec id (>0) and post-scaling output dims, or <0 on error.
int isx_probe(const uint8_t* data, size_t n, int max_side, int* out_w, int* out_h) {
  if (!data || !out_w || !out_h) return kErrBadArgs;
  if (is_jpeg(data, n)) return jpeg_dims(data, n, max_side, out_w, out_h);
  if (is_png(data, n)) return png_run(data, n, nullptr, 0, 0, out_w, out_h);
  if (isx::is_webp(data, n)) return isx::webp_probe(data, n, out_w, out_h);
  if (isx::is_gif(data, n)) return isx::gif_probe(data, n, out_w, out_h);
  if (isx::is_bmp(data, n)) return isx::bmp_probe(data, n, out_w, out_h);
  if (isx::is_tiff(data, n)) return isx::tiff_probe(data, n, out_w, out_h);
  return kErrUnknownFormat;
}

// Decodes into caller-allocated RGB8 buffer of exactly w*h*3 bytes.
// w/h MUST come from isx_probe with the same max_side.
int isx_decode(const uint8_t* data, size_t n, int max_side, uint8_t* out, int w, int h) {
  if (!data || !out || w <= 0 || h <= 0) return kErrBadArgs;
  if (is_jpeg(data, n)) return jpeg_decode(data, n, max_side, out, w, h);
  if (is_png(data, n)) {
    int pw, ph;
    return png_run(data, n, out, w, h, &pw, &ph);
  }
  if (isx::is_webp(data, n)) return isx::webp_decode(data, n, out, w, h);
  if (isx::is_gif(data, n)) return isx::gif_decode(data, n, out, w, h);
  if (isx::is_bmp(data, n)) return isx::bmp_decode(data, n, out, w, h);
  if (isx::is_tiff(data, n)) return isx::tiff_decode(data, n, out, w, h);
  return kErrUnknownFormat;
}

const char* isx_version() {
  return "image_search_tpu native decoder 2.0 "
         "(libjpeg+libpng+libwebp+libtiff+own GIF/BMP)";
}

}  // extern "C"
