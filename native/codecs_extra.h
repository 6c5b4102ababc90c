// Declarations for the WebP/TIFF/GIF/BMP codecs (codecs_extra.cpp).
#pragma once
#include <cstddef>
#include <cstdint>

namespace isx {
bool is_webp(const uint8_t* d, size_t n);
bool is_tiff(const uint8_t* d, size_t n);
bool is_gif(const uint8_t* d, size_t n);
bool is_bmp(const uint8_t* d, size_t n);
int webp_probe(const uint8_t* d, size_t n, int* w, int* h);
int webp_decode(const uint8_t* d, size_t n, uint8_t* out, int w, int h);
int tiff_probe(const uint8_t* d, size_t n, int* w, int* h);
int tiff_decode(const uint8_t* d, size_t n, uint8_t* out, int w, int h);
int gif_probe(const uint8_t* d, size_t n, int* w, int* h);
int gif_decode(const uint8_t* d, size_t n, uint8_t* out, int w, int h);
int bmp_probe(const uint8_t* d, size_t n, int* w, int* h);
int bmp_decode(const uint8_t* d, size_t n, uint8_t* out, int w, int h);
}  // namespace isx
