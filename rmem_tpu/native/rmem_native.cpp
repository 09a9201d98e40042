// Native host data-plane kernels for rmem_tpu.
//
// The device side is JAX/XLA/Pallas; the host side of a 300+ FPS VOS
// pipeline is mask PNG writeback and frame normalization, which in Python
// (PIL/numpy) cost milliseconds per frame on low-core hosts. This module
// provides:
//   - encode_png_pal8: palettized 8-bit PNG encoder (PLTE + zlib IDAT),
//     the output format of the reference evaluator (aot_plus/utils/
//     image.py:90-105)
//   - normalize_u8:   fused uint8 HWC -> float32 (x/255 - mean)/std
//
// Built on demand with g++ (see rmem_tpu/native/__init__.py); zlib only.

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

inline void put_u32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back((x >> 24) & 0xff);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back(x & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, uint32_t len) {
  put_u32(out, len);
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, len + 4);
  put_u32(out, crc);
}

}  // namespace

extern "C" {

// Returns the number of bytes written to `out` (caller allocates
// h*w + 4096 + 768*2 bytes, always enough for filter-0 + zlib overhead),
// or -1 on failure.
long encode_png_pal8(const uint8_t* mask, int h, int w,
                     const uint8_t* palette /* 768 bytes RGB */,
                     uint8_t* out, long out_capacity) {
  // raw scanlines with filter byte 0
  std::vector<uint8_t> raw((size_t)h * (w + 1));
  for (int y = 0; y < h; ++y) {
    raw[(size_t)y * (w + 1)] = 0;
    std::memcpy(&raw[(size_t)y * (w + 1) + 1], mask + (size_t)y * w, w);
  }
  uLongf comp_cap = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 6) != Z_OK)
    return -1;

  std::vector<uint8_t> png;
  png.reserve(comp_cap + 1024);
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  png.insert(png.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 3;   // color type: palette
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "PLTE", palette, 768);
  put_chunk(png, "IDAT", comp.data(), (uint32_t)comp_cap);
  put_chunk(png, "IEND", nullptr, 0);

  if ((long)png.size() > out_capacity) return -1;
  std::memcpy(out, png.data(), png.size());
  return (long)png.size();
}

// Fused uint8 HWC -> float32 normalize: (x/255 - mean[c]) / std[c].
void normalize_u8(const uint8_t* in, float* out, long n_pixels,
                  const float* mean, const float* stdv) {
  float scale[3], bias[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = 1.0f / (255.0f * stdv[c]);
    bias[c] = -mean[c] / stdv[c];
  }
  for (long i = 0; i < n_pixels; ++i) {
    const uint8_t* p = in + i * 3;
    float* q = out + i * 3;
    q[0] = p[0] * scale[0] + bias[0];
    q[1] = p[1] * scale[1] + bias[1];
    q[2] = p[2] * scale[2] + bias[2];
  }
}

}  // extern "C"
