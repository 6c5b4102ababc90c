// Standalone fuzz driver for the decoder, built with AddressSanitizer:
//   make -C native fuzz && ./native/isx_fuzz 200000
// Feeds the probe/decode entry points (the exact C ABI the server uses)
// with random blobs behind every codec magic plus structured BMP/GIF
// headers; ASan aborts on any overread/overflow/leak-on-error. This is the
// memory-safety net for the two from-scratch parsers (GIF LZW, BMP) that
// the Rust reference gets from the borrow checker via the `image` crate.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" {
int isx_probe(const uint8_t* data, size_t n, int max_side, int* out_w, int* out_h);
int isx_decode(const uint8_t* data, size_t n, int max_side, uint8_t* out, int w, int h);
}

namespace {

std::mt19937_64 rng(0xC0FFEE);

uint8_t rnd_byte() { return static_cast<uint8_t>(rng()); }

void drive(const std::vector<uint8_t>& blob) {
  int w = 0, h = 0;
  for (int max_side : {0, 224}) {
    int fmt = isx_probe(blob.data(), blob.size(), max_side, &w, &h);
    if (fmt >= 0 && w > 0 && h > 0 &&
        static_cast<int64_t>(w) * h <= 16 * 1024 * 1024) {
      std::vector<uint8_t> out(static_cast<size_t>(w) * h * 3);
      isx_decode(blob.data(), blob.size(), max_side, out.data(), w, h);
    }
  }
}

void put16(std::vector<uint8_t>& v, uint16_t x) {
  v.push_back(x & 0xff);
  v.push_back(x >> 8);
}
void put32(std::vector<uint8_t>& v, uint32_t x) {
  put16(v, x & 0xffff);
  put16(v, x >> 16);
}

std::vector<uint8_t> random_tail(size_t n) {
  std::vector<uint8_t> t(n);
  for (auto& b : t) b = rnd_byte();
  return t;
}

}  // namespace

int main(int argc, char** argv) {
  long iters = argc > 1 ? atol(argv[1]) : 50000;
  // length-annotated: several magics contain embedded NULs, so strlen()
  // would truncate them and silently skip the WebP/TIFF paths (review
  // finding)
  struct Magic { const char* bytes; size_t len; };
  const Magic magics[] = {
      {"\xff\xd8\xff", 3},
      {"\x89PNG\r\n\x1a\n", 8},
      {"RIFF\x20\x00\x00\x00WEBP", 12},
      {"GIF89a", 6},
      {"BM", 2},
      {"II*\x00", 4},
      {"MM\x00*", 4},
  };
  for (long i = 0; i < iters; ++i) {
    std::vector<uint8_t> blob;
    switch (i % 4) {
      case 0: {  // magic + noise
        const Magic& m = magics[rng() % 7];
        blob.assign(m.bytes, m.bytes + m.len);
        auto t = random_tail(rng() % 512);
        blob.insert(blob.end(), t.begin(), t.end());
        break;
      }
      case 1: {  // structured BMP header + noise
        blob = {'B', 'M'};
        put32(blob, static_cast<uint32_t>(rng()));  // file size
        put32(blob, 0);
        put32(blob, static_cast<uint32_t>(rng() % 4096));  // pixel offset
        put32(blob, 40 + (rng() % 3) * 16);                // header size
        put32(blob, static_cast<uint32_t>(rng() % 200000) - 100000);  // w
        put32(blob, static_cast<uint32_t>(rng() % 200000) - 100000);  // h
        put16(blob, 1);
        put16(blob, static_cast<uint16_t>(1 << (rng() % 7)));  // bpp
        put32(blob, static_cast<uint32_t>(rng() % 7));         // compression
        put32(blob, 0);
        put32(blob, 2835);
        put32(blob, 2835);
        put32(blob, static_cast<uint32_t>(rng() % 2048));  // colors used
        put32(blob, 0);
        {
          auto t = random_tail(rng() % 1024);
          blob.insert(blob.end(), t.begin(), t.end());
        }
        break;
      }
      case 2: {  // structured GIF: screen + descriptor + LZW noise
        blob = {'G', 'I', 'F', '8', '9', 'a'};
        put16(blob, static_cast<uint16_t>(rng() % 1024));  // screen w
        put16(blob, static_cast<uint16_t>(rng() % 1024));  // screen h
        blob.push_back(rnd_byte());                        // flags (maybe GCT)
        blob.push_back(0);
        blob.push_back(0);
        {
          auto t = random_tail(rng() % 2048);
          blob.insert(blob.end(), t.begin(), t.end());
        }
        break;
      }
      default:  // pure noise, no magic
        blob = random_tail(rng() % 256);
    }
    drive(blob);
  }
  printf("fuzz ok: %ld iterations, no ASan findings\n", iters);
  return 0;
}
