// WebP / TIFF / GIF / BMP decoding for the ingest hot path — covers the
// rest of the reference's extension whitelist (clip.rs:63-64) natively so
// no format falls back to the GIL-bound PIL path.
//
//   - WebP via libwebp (WebPDecodeRGBInto);
//   - TIFF via libtiff's stable RGBA interface. The sandbox ships the
//     library but no tiffio.h, so the handful of public prototypes are
//     declared here verbatim (TIFFClientOpen/TIFFReadRGBAImageOriented are
//     frozen ABI since libtiff 4.0);
//   - GIF87a/89a with a from-scratch LZW decoder (first frame, interlace
//     handled) — no giflib exists in the image;
//   - BMP (BITMAPINFOHEADER family, 1/4/8-bit palette + 16/24/32-bit,
//     BI_RGB and standard-mask BI_BITFIELDS, top-down and bottom-up).
//
// Same probe/decode protocol as decoder.cpp; wired into isx_probe/isx_decode.

#include <cstdarg>
#include <cstdint>
#include <cstring>
#include <vector>

#include <webp/decode.h>

namespace isx {

constexpr int kErrDecode = -3;
constexpr int kErrDims = -4;

constexpr int kFmtWebp = 3;
constexpr int kFmtGif = 4;
constexpr int kFmtBmp = 5;
constexpr int kFmtTiff = 6;

constexpr int64_t kMaxPixels = 256LL * 1024 * 1024;  // 256 MP sanity cap

// ---------------------------------------------------------------------------
// WebP
// ---------------------------------------------------------------------------

bool is_webp(const uint8_t* d, size_t n) {
  return n >= 12 && memcmp(d, "RIFF", 4) == 0 && memcmp(d + 8, "WEBP", 4) == 0;
}

int webp_probe(const uint8_t* d, size_t n, int* w, int* h) {
  if (!WebPGetInfo(d, n, w, h)) return kErrDecode;
  if (static_cast<int64_t>(*w) * *h > kMaxPixels) return kErrDims;
  return kFmtWebp;
}

int webp_decode(const uint8_t* d, size_t n, uint8_t* out, int w, int h) {
  int pw, ph;
  if (!WebPGetInfo(d, n, &pw, &ph) || pw != w || ph != h) return kErrDims;
  size_t stride = static_cast<size_t>(w) * 3;
  if (WebPDecodeRGBInto(d, n, out, stride * h, stride) == nullptr) return kErrDecode;
  return 0;
}

// ---------------------------------------------------------------------------
// TIFF — minimal public-ABI declarations (no tiffio.h in this image)
// ---------------------------------------------------------------------------

extern "C" {
typedef int64_t tmsize_t;
typedef uint64_t toff_t;
typedef void* thandle_t;
typedef tmsize_t (*TIFFReadWriteProc)(thandle_t, void*, tmsize_t);
typedef toff_t (*TIFFSeekProc)(thandle_t, toff_t, int);
typedef int (*TIFFCloseProc)(thandle_t);
typedef toff_t (*TIFFSizeProc)(thandle_t);
typedef int (*TIFFMapFileProc)(thandle_t, void**, toff_t*);
typedef void (*TIFFUnmapFileProc)(thandle_t, void*, toff_t);
typedef void (*TIFFErrorHandler)(const char*, const char*, va_list);

typedef struct tiff TIFF;
TIFF* TIFFClientOpen(const char*, const char*, thandle_t, TIFFReadWriteProc,
                     TIFFReadWriteProc, TIFFSeekProc, TIFFCloseProc,
                     TIFFSizeProc, TIFFMapFileProc, TIFFUnmapFileProc);
void TIFFClose(TIFF*);
int TIFFGetField(TIFF*, uint32_t, ...);
int TIFFReadRGBAImageOriented(TIFF*, uint32_t, uint32_t, uint32_t*, int, int);
TIFFErrorHandler TIFFSetErrorHandler(TIFFErrorHandler);
TIFFErrorHandler TIFFSetWarningHandler(TIFFErrorHandler);
}

constexpr uint32_t kTiffTagWidth = 256;   // TIFFTAG_IMAGEWIDTH
constexpr uint32_t kTiffTagLength = 257;  // TIFFTAG_IMAGELENGTH
constexpr int kOrientTopLeft = 1;         // ORIENTATION_TOPLEFT

struct TiffMem {
  const uint8_t* data;
  toff_t size;
  toff_t off;
};

tmsize_t tiff_read(thandle_t h, void* buf, tmsize_t n) {
  TiffMem* m = static_cast<TiffMem*>(h);
  if (m->off >= m->size) return 0;
  toff_t avail = m->size - m->off;
  tmsize_t take = n < static_cast<tmsize_t>(avail) ? n : static_cast<tmsize_t>(avail);
  memcpy(buf, m->data + m->off, take);
  m->off += take;
  return take;
}
tmsize_t tiff_write(thandle_t, void*, tmsize_t) { return 0; }
toff_t tiff_seek(thandle_t h, toff_t off, int whence) {
  TiffMem* m = static_cast<TiffMem*>(h);
  if (whence == 0) m->off = off;            // SEEK_SET
  else if (whence == 1) m->off += off;      // SEEK_CUR
  else m->off = m->size + off;              // SEEK_END
  return m->off;
}
int tiff_close(thandle_t) { return 0; }
toff_t tiff_size(thandle_t h) { return static_cast<TiffMem*>(h)->size; }
void tiff_silence(const char*, const char*, va_list) {}

bool is_tiff(const uint8_t* d, size_t n) {
  if (n < 4) return false;
  return (d[0] == 'I' && d[1] == 'I' && d[2] == 42 && d[3] == 0) ||
         (d[0] == 'M' && d[1] == 'M' && d[2] == 0 && d[3] == 42);
}

TIFF* tiff_open(TiffMem* mem) {
  TIFFSetErrorHandler(tiff_silence);
  TIFFSetWarningHandler(tiff_silence);
  return TIFFClientOpen("mem", "rm", mem, tiff_read, tiff_write, tiff_seek,
                        tiff_close, tiff_size, nullptr, nullptr);
}

int tiff_probe(const uint8_t* d, size_t n, int* w, int* h) {
  TiffMem mem{d, n, 0};
  TIFF* tif = tiff_open(&mem);
  if (!tif) return kErrDecode;
  uint32_t tw = 0, th = 0;
  int ok = TIFFGetField(tif, kTiffTagWidth, &tw) && TIFFGetField(tif, kTiffTagLength, &th);
  TIFFClose(tif);
  if (!ok || tw == 0 || th == 0) return kErrDecode;
  if (static_cast<int64_t>(tw) * th > kMaxPixels) return kErrDims;
  *w = static_cast<int>(tw);
  *h = static_cast<int>(th);
  return kFmtTiff;
}

int tiff_decode(const uint8_t* d, size_t n, uint8_t* out, int w, int h) {
  TiffMem mem{d, n, 0};
  TIFF* tif = tiff_open(&mem);
  if (!tif) return kErrDecode;
  std::vector<uint32_t> raster;
  raster.resize(static_cast<size_t>(w) * h);
  // top-left orientation: raster rows already top-down
  int ok = TIFFReadRGBAImageOriented(tif, w, h, raster.data(), kOrientTopLeft, 1);
  TIFFClose(tif);
  if (!ok) return kErrDecode;
  const size_t count = static_cast<size_t>(w) * h;
  for (size_t i = 0; i < count; ++i) {
    uint32_t px = raster[i];  // packed ABGR (TIFFGetR = px & 0xff)
    out[i * 3 + 0] = px & 0xff;
    out[i * 3 + 1] = (px >> 8) & 0xff;
    out[i * 3 + 2] = (px >> 16) & 0xff;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// GIF — from-scratch first-frame decoder (header, palettes, LZW, interlace)
// ---------------------------------------------------------------------------

bool is_gif(const uint8_t* d, size_t n) {
  return n >= 6 && memcmp(d, "GIF8", 4) == 0 && (d[4] == '7' || d[4] == '9') && d[5] == 'a';
}

struct ByteReader {
  const uint8_t* d;
  size_t n;
  size_t off = 0;
  bool ok = true;
  uint8_t u8() {
    if (off >= n) { ok = false; return 0; }
    return d[off++];
  }
  uint16_t u16() {  // little-endian
    uint16_t lo = u8(), hi = u8();
    return static_cast<uint16_t>(lo | (hi << 8));
  }
  void skip(size_t k) {
    if (off + k > n) { off = n; ok = false; } else off += k;
  }
};

// collect the concatenated LZW data sub-blocks
bool gif_subblocks(ByteReader& r, std::vector<uint8_t>& out) {
  for (;;) {
    uint8_t len = r.u8();
    if (!r.ok) return false;
    if (len == 0) return true;
    if (r.off + len > r.n) return false;
    out.insert(out.end(), r.d + r.off, r.d + r.off + len);
    r.off += len;
  }
}

// GIF-flavoured LZW: variable code width 3..12 bits, clear/eoi codes.
bool gif_lzw(const std::vector<uint8_t>& src, int min_code_size,
             std::vector<uint8_t>& pixels, size_t want) {
  if (min_code_size < 1 || min_code_size > 11) return false;
  const int clear = 1 << min_code_size;
  const int eoi = clear + 1;
  // dictionary as (prefix, suffix) pairs
  std::vector<int> prefix(4096);
  std::vector<uint8_t> suffix(4096), stack(4097);
  int next = eoi + 1, width = min_code_size + 1, prev = -1;
  uint32_t bits = 0;
  int nbits = 0;
  size_t pos = 0;
  uint8_t first = 0;
  pixels.reserve(want);
  while (true) {
    while (nbits < width) {
      if (pos >= src.size()) return pixels.size() >= want;  // tolerate missing EOI
      bits |= static_cast<uint32_t>(src[pos++]) << nbits;
      nbits += 8;
    }
    int code = bits & ((1 << width) - 1);
    bits >>= width;
    nbits -= width;
    if (code == clear) {
      next = eoi + 1;
      width = min_code_size + 1;
      prev = -1;
      continue;
    }
    if (code == eoi) return true;
    int sp = 0;
    int cur = code;
    if (cur >= next) {  // KwKwK case: emit prev + first(prev)
      if (prev < 0 || cur > next) return false;
      stack[sp++] = first;
      cur = prev;
    }
    while (cur >= clear + 2) {
      if (sp >= 4096) return false;
      stack[sp++] = suffix[cur];
      cur = prefix[cur];
    }
    first = static_cast<uint8_t>(cur);
    stack[sp++] = first;
    while (sp > 0) {
      if (pixels.size() >= want) return true;
      pixels.push_back(stack[--sp]);
    }
    if (prev >= 0 && next < 4096) {
      prefix[next] = prev;
      suffix[next] = first;
      ++next;
      if (next == (1 << width) && width < 12) ++width;
    }
    prev = code;
  }
}

struct GifHeader {
  int screen_w, screen_h;
  int frame_x, frame_y, frame_w, frame_h;
  bool interlaced;
  int lzw_min;
  const uint8_t* palette;  // 256*3 max, active table for frame 1
  int palette_len;
  size_t data_off;  // reader offset at the first LZW sub-block
};

// parse up to (and including) the first image descriptor
bool gif_parse(const uint8_t* d, size_t n, GifHeader* out) {
  ByteReader r{d, n};
  r.skip(6);
  out->screen_w = r.u16();
  out->screen_h = r.u16();
  uint8_t flags = r.u8();
  r.skip(2);  // bg color index + aspect
  const uint8_t* gct = nullptr;
  int gct_len = 0;
  if (flags & 0x80) {
    gct_len = 2 << (flags & 0x07);
    gct = d + r.off;
    r.skip(static_cast<size_t>(gct_len) * 3);
  }
  while (r.ok) {
    uint8_t block = r.u8();
    if (block == 0x21) {  // extension: label + sub-blocks, all skippable
      r.u8();
      for (;;) {
        uint8_t len = r.u8();
        if (!r.ok) return false;
        if (len == 0) break;
        r.skip(len);
      }
    } else if (block == 0x2C) {  // image descriptor
      out->frame_x = r.u16();
      out->frame_y = r.u16();
      out->frame_w = r.u16();
      out->frame_h = r.u16();
      // frame dims are attacker-controlled independently of the screen
      // dims checked by the caller: cap them too, or gif_lzw's reserve()
      // can demand multi-GB (bad_alloc across the C ABI = process abort)
      if (static_cast<int64_t>(out->frame_w) * out->frame_h > kMaxPixels)
        return false;
      uint8_t iflags = r.u8();
      out->interlaced = (iflags & 0x40) != 0;
      const uint8_t* pal = gct;
      int pal_len = gct_len;
      if (iflags & 0x80) {  // local color table wins
        pal_len = 2 << (iflags & 0x07);
        pal = d + r.off;
        r.skip(static_cast<size_t>(pal_len) * 3);
      }
      if (!pal || !r.ok) return false;
      out->lzw_min = r.u8();
      out->palette = pal;
      out->palette_len = pal_len;
      out->data_off = r.off;
      return r.ok;
    } else {
      return false;  // trailer (0x3B) before any image, or garbage
    }
  }
  return false;
}

int gif_probe(const uint8_t* d, size_t n, int* w, int* h) {
  GifHeader g;
  if (!gif_parse(d, n, &g)) return kErrDecode;
  // PIL reports the frame at logical-screen size for frame 1 when the frame
  // covers the screen; decode the FRAME (the common single-frame case has
  // frame == screen). Mismatched sub-frames are composited onto the screen.
  if (g.screen_w <= 0 || g.screen_h <= 0) return kErrDecode;
  if (static_cast<int64_t>(g.screen_w) * g.screen_h > kMaxPixels) return kErrDims;
  *w = g.screen_w;
  *h = g.screen_h;
  return kFmtGif;
}

int gif_decode(const uint8_t* d, size_t n, uint8_t* out, int w, int h) {
  GifHeader g;
  if (!gif_parse(d, n, &g)) return kErrDecode;
  if (g.screen_w != w || g.screen_h != h) return kErrDims;
  ByteReader r{d, n};
  r.off = g.data_off;
  std::vector<uint8_t> lzw;
  if (!gif_subblocks(r, lzw)) return kErrDecode;
  const size_t want = static_cast<size_t>(g.frame_w) * g.frame_h;
  std::vector<uint8_t> idx;
  if (!gif_lzw(lzw, g.lzw_min, idx, want) || idx.size() < want) return kErrDecode;

  memset(out, 0, static_cast<size_t>(w) * h * 3);  // background: black
  // interlace pass order: rows 0,8,16.. then 4,12.. then 2,6.. then 1,3..
  static const int start[4] = {0, 4, 2, 1};
  static const int step[4] = {8, 8, 4, 2};
  size_t src_row = 0;
  auto emit_row = [&](int fy) {
    int y = g.frame_y + fy;
    if (y < 0 || y >= h) { ++src_row; return; }
    const uint8_t* src = idx.data() + src_row * g.frame_w;
    uint8_t* dst = out + (static_cast<size_t>(y) * w + g.frame_x) * 3;
    int copy_w = g.frame_w;
    if (g.frame_x + copy_w > w) copy_w = w - g.frame_x;
    for (int x = 0; x < copy_w; ++x) {
      int ci = src[x] < g.palette_len ? src[x] : 0;
      dst[x * 3 + 0] = g.palette[ci * 3 + 0];
      dst[x * 3 + 1] = g.palette[ci * 3 + 1];
      dst[x * 3 + 2] = g.palette[ci * 3 + 2];
    }
    ++src_row;
  };
  if (g.interlaced) {
    for (int pass = 0; pass < 4; ++pass)
      for (int fy = start[pass]; fy < g.frame_h; fy += step[pass]) emit_row(fy);
  } else {
    for (int fy = 0; fy < g.frame_h; ++fy) emit_row(fy);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// BMP — BITMAPINFOHEADER family, uncompressed + standard-mask bitfields
// ---------------------------------------------------------------------------

bool is_bmp(const uint8_t* d, size_t n) { return n >= 2 && d[0] == 'B' && d[1] == 'M'; }

uint32_t rd32(const uint8_t* d) {
  return d[0] | (d[1] << 8) | (d[2] << 16) | (static_cast<uint32_t>(d[3]) << 24);
}
int32_t rds32(const uint8_t* d) { return static_cast<int32_t>(rd32(d)); }
uint16_t rd16(const uint8_t* d) { return static_cast<uint16_t>(d[0] | (d[1] << 8)); }

struct BmpInfo {
  int w, h;
  bool top_down;
  int bpp;
  uint32_t compression;
  size_t pixel_off;
  const uint8_t* palette;  // BGRA quads
  int palette_len;
};

bool bmp_parse(const uint8_t* d, size_t n, BmpInfo* b) {
  if (n < 54) return false;
  b->pixel_off = rd32(d + 10);
  uint32_t hdr = rd32(d + 14);
  if (hdr < 40) return false;  // BITMAPCOREHEADER unsupported
  b->w = rds32(d + 18);
  int32_t rawh = rds32(d + 22);
  b->top_down = rawh < 0;
  b->h = b->top_down ? -rawh : rawh;
  b->bpp = rd16(d + 28);
  b->compression = rd32(d + 30);
  uint32_t colors_used = rd32(d + 46);
  b->palette = d + 14 + hdr;
  if (b->bpp <= 8) {
    b->palette_len = colors_used ? static_cast<int>(colors_used) : (1 << b->bpp);
    if (14 + hdr + static_cast<size_t>(b->palette_len) * 4 > n) return false;
  } else {
    b->palette_len = 0;
  }
  if (b->w <= 0 || b->h <= 0) return false;
  if (static_cast<int64_t>(b->w) * b->h > kMaxPixels) return false;
  if (b->compression == 3) {
    // accept only the standard 8-bit masks (equivalent to BI_RGB layout)
    if (b->bpp != 32 && b->bpp != 16) return false;
    if (n < 66) return false;  // masks live at d+54..65; n>=54 isn't enough
    uint32_t rm = rd32(d + 54), gm = rd32(d + 58), bm = rd32(d + 62);
    if (b->bpp == 32 && !(rm == 0xff0000 && gm == 0xff00 && bm == 0xff)) return false;
    if (b->bpp == 16 && !(rm == 0x7c00 && gm == 0x3e0 && bm == 0x1f)) return false;
  } else if (b->compression != 0) {
    return false;  // RLE etc -> PIL fallback
  }
  switch (b->bpp) {
    case 1: case 4: case 8: case 16: case 24: case 32: break;
    default: return false;
  }
  return true;
}

int bmp_probe(const uint8_t* d, size_t n, int* w, int* h) {
  BmpInfo b;
  if (!bmp_parse(d, n, &b)) return kErrDecode;
  *w = b.w;
  *h = b.h;
  return kFmtBmp;
}

int bmp_decode(const uint8_t* d, size_t n, uint8_t* out, int w, int h) {
  BmpInfo b;
  if (!bmp_parse(d, n, &b)) return kErrDecode;
  if (b.w != w || b.h != h) return kErrDims;
  const size_t stride = ((static_cast<size_t>(w) * b.bpp + 31) / 32) * 4;
  if (b.pixel_off + stride * h > n) return kErrDecode;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = d + b.pixel_off + stride * (b.top_down ? y : h - 1 - y);
    uint8_t* dst = out + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      uint8_t r8, g8, b8;
      if (b.bpp == 24 || b.bpp == 32) {
        const uint8_t* p = row + x * (b.bpp / 8);
        b8 = p[0]; g8 = p[1]; r8 = p[2];
      } else if (b.bpp == 16) {
        uint16_t px = rd16(row + x * 2);
        r8 = ((px >> 10) & 0x1f) * 255 / 31;
        g8 = ((px >> 5) & 0x1f) * 255 / 31;
        b8 = (px & 0x1f) * 255 / 31;
      } else {  // palette: 1/4/8 bpp
        int ci;
        if (b.bpp == 8) ci = row[x];
        else if (b.bpp == 4) ci = (row[x / 2] >> (x % 2 ? 0 : 4)) & 0x0f;
        else ci = (row[x / 8] >> (7 - x % 8)) & 1;
        if (ci >= b.palette_len) ci = 0;
        const uint8_t* q = b.palette + ci * 4;  // BGRA quad
        b8 = q[0]; g8 = q[1]; r8 = q[2];
      }
      dst[x * 3 + 0] = r8;
      dst[x * 3 + 1] = g8;
      dst[x * 3 + 2] = b8;
    }
  }
  return 0;
}

}  // namespace isx
