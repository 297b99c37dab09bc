// Host-side transport codecs for the serving input path (native data-loader
// component; see quber_tpu/predictor.py pack/unpack layout docs).
//
// The producer (packer) thread runs these per frame. At the chip's measured
// ~145 FPS refine throughput the host has < 7 ms/frame of budget on a
// directly-attached (PCIe) TPU host; the numpy formulation of the pack stage
// costs several full passes (plus temporaries) over the 0.9 MB RGB plane and
// the N*H*W mask stack per frame. Each codec here is one fused pass that
// writes straight into the pinned transfer buffer. The mirror image of the
// reference's native input pipeline (its data loader + CUDA ext ops are
// C++/CUDA; here the device side is XLA/Pallas and the host side is this).
//
// Exposed via ctypes (quber_tpu/transport_native.py) with the numpy
// implementation kept as a byte-identical fallback.
//
// Build: make -C csrc   (produces libquber_codec.so)

#include <cstdint>
#include <cstring>

extern "C" {

// Planar first-difference 4-bit RGB codec (quber_tpu/predictor.py
// _encode_rgb_nibbles). Input: interleaved HWC uint8 RGB. The planar
// (channel-major) mod-256 first difference travels as signed nibbles;
// nibble 0b1000 (-8) is the escape marker whose raw residual byte is
// appended densely in scan order. Writes the full
// [n_esc u32 LE | nibbles 3hw/2 | esc u8 x max_esc] block (block_cap
// bytes, zero-padded) into `out`. Returns n_esc, or -1 if the escape
// budget is exceeded (incompressible RGB; caller falls back to raw).
int rgb_nibble_encode(const uint8_t* rgb_hwc, int h, int w, int max_esc,
                      uint8_t* out, int64_t block_cap) {
  const int64_t hw = (int64_t)h * w;
  const int64_t n = 3 * hw;
  const int64_t nbytes = n / 2;
  if (block_cap < 4 + nbytes + max_esc) return -1;
  std::memset(out, 0, (size_t)block_cap);
  uint8_t* nib_out = out + 4;
  uint8_t* esc_out = out + 4 + nbytes;
  int n_esc = 0;
  uint8_t prev = 0;
  uint8_t pending = 0;  // high nibble of the current output byte
  for (int c = 0; c < 3; ++c) {
    const uint8_t* p = rgb_hwc + c;
    for (int64_t i = 0; i < hw; ++i) {
      const uint8_t v = p[i * 3];
      const uint8_t delta = (uint8_t)(v - prev);
      prev = v;
      // escape iff the residual, read as int8, falls outside [-7, 7]
      const int8_t s = (int8_t)delta;
      uint8_t nib;
      if (s < -7 || s > 7) {
        if (n_esc >= max_esc) return -1;
        esc_out[n_esc++] = delta;
        nib = 8;
      } else {
        nib = delta & 0x0F;
      }
      const int64_t j = c * hw + i;
      if ((j & 1) == 0) {
        pending = (uint8_t)(nib << 4);
      } else {
        nib_out[j >> 1] = (uint8_t)(pending | nib);
      }
    }
  }
  uint32_t ne = (uint32_t)n_esc;
  std::memcpy(out, &ne, 4);
  return n_esc;
}

// Planar first-difference 5-bit RGB codec (quber_tpu/predictor.py
// _encode_rgb_5bit). Same residual stream as the 4-bit codec but each
// residual travels as a signed 5-bit field in [-15, 15], with 0b10000
// (-16) the escape marker. Fields are packed LSB-first into the byte
// stream (value i occupies stream bits [5i, 5i+5)), matching the device
// decode's little-endian two-byte window extraction. Escape rate on the
// hardened synthetic textures is ~6% (vs ~26% at 4 bits, which blows the
// 12.5% nibble budget and forced raw RGB on the wire); on camera RGB both
// codecs hold, the 4-bit one smaller. Writes the full
// [n_esc u32 LE | fields ceil(3hw*5/8) | esc u8 x max_esc] block
// (block_cap bytes, zero-padded). Returns n_esc, or -1 on budget overflow.
int rgb_5bit_encode(const uint8_t* rgb_hwc, int h, int w, int max_esc,
                    uint8_t* out, int64_t block_cap) {
  const int64_t hw = (int64_t)h * w;
  const int64_t n = 3 * hw;
  const int64_t nbytes = (n * 5 + 7) / 8;
  if (block_cap < 4 + nbytes + max_esc) return -1;
  std::memset(out, 0, (size_t)block_cap);
  uint8_t* field_out = out + 4;
  uint8_t* esc_out = out + 4 + nbytes;
  int n_esc = 0;
  uint8_t prev = 0;
  uint32_t acc = 0;
  int nbits = 0;
  for (int c = 0; c < 3; ++c) {
    const uint8_t* p = rgb_hwc + c;
    for (int64_t i = 0; i < hw; ++i) {
      const uint8_t v = p[i * 3];
      const uint8_t delta = (uint8_t)(v - prev);
      prev = v;
      const int8_t s = (int8_t)delta;
      uint32_t field;
      if (s < -15 || s > 15) {
        if (n_esc >= max_esc) return -1;
        esc_out[n_esc++] = delta;
        field = 16;  // 0b10000 = -16, the escape marker
      } else {
        field = delta & 0x1F;
      }
      acc |= field << nbits;
      nbits += 5;
      while (nbits >= 8) {
        *field_out++ = (uint8_t)(acc & 0xFF);
        acc >>= 8;
        nbits -= 8;
      }
    }
  }
  if (nbits > 0) *field_out++ = (uint8_t)(acc & 0xFF);
  uint32_t ne = (uint32_t)n_esc;
  std::memcpy(out, &ne, 4);
  return n_esc;
}

// Sparse mod-256 first-difference depth codec (predictor._pack_inputs_rle
// depth block). Input: mono uint8 depth, hw elements. Writes positions of
// the nonzero deltas (u32, sentinel-filled with `sentinel` past the last)
// and their values (u8, zero-filled) into pos/val (each dmax entries).
// Returns the nonzero-delta count, or -1 if it exceeds dmax.
int depth_delta_encode(const uint8_t* depth, int64_t hw, int dmax,
                       uint32_t sentinel, uint8_t* pos, uint8_t* val) {
  // pos is a u32 LE array that may live at an unaligned offset inside the
  // packed transfer buffer; store via memcpy (plain mov on x86/arm).
  int k = 0;
  uint8_t prev = 0;
  for (int64_t i = 0; i < hw; ++i) {
    const uint8_t delta = (uint8_t)(depth[i] - prev);
    prev = depth[i];
    if (delta) {
      if (k >= dmax) return -1;
      const uint32_t p = (uint32_t)i;
      std::memcpy(pos + 4 * (int64_t)k, &p, 4);
      val[k] = delta;
      ++k;
    }
  }
  for (int j = k; j < dmax; ++j) {
    std::memcpy(pos + 4 * (int64_t)j, &sentinel, 4);
    val[j] = 0;
  }
  return k;
}

// Run boundaries of a flattened binary mask stack (predictor._pack_inputs_rle
// starts/ends block). Input: `flat` = count*h*w bytes (0 = background,
// nonzero = set). Emits absolute [start, end) positions of the set runs as
// u32, both arrays sentinel-filled with `sentinel` (= N*H*W, which decodes
// to nothing) past the last run. Returns the run count, or -1 if it exceeds
// max_runs.
int mask_runs_encode(const uint8_t* flat, int64_t n, int max_runs,
                     uint32_t sentinel, uint8_t* starts, uint8_t* ends) {
  // starts/ends are u32 LE arrays at possibly-unaligned buffer offsets.
  int k = 0;
  int inside = 0;
  int64_t i = 0;
  while (i < n) {
    // word-at-a-time skip: runs are long, transitions rare. A whole 8-byte
    // word can be skipped when it is all-zero (outside a run) or all-nonzero
    // (inside one); the all-nonzero test is the classic haszero bit trick.
    while (i + 8 <= n) {
      uint64_t wrd;
      std::memcpy(&wrd, flat + i, 8);
      if (inside) {
        const uint64_t haszero =
            (wrd - 0x0101010101010101ULL) & ~wrd & 0x8080808080808080ULL;
        if (haszero) break;
      } else {
        if (wrd) break;
      }
      i += 8;
    }
    if (i >= n) break;
    const int v = flat[i] != 0;
    if (v != inside) {
      const uint32_t p = (uint32_t)i;
      if (v) {
        if (k >= max_runs) return -1;
        std::memcpy(starts + 4 * (int64_t)k, &p, 4);
      } else {
        std::memcpy(ends + 4 * (int64_t)k, &p, 4);
        ++k;
      }
      inside = v;
    }
    ++i;
  }
  if (inside) {
    const uint32_t p = (uint32_t)n;
    std::memcpy(ends + 4 * (int64_t)k, &p, 4);
    ++k;
  }
  for (int j = k; j < max_runs; ++j) {
    std::memcpy(starts + 4 * (int64_t)j, &sentinel, 4);
    std::memcpy(ends + 4 * (int64_t)j, &sentinel, 4);
  }
  return k;
}

// Dense fallback layout helper (predictor._pack_inputs): interleave RGB with
// mono depth into the [h, w, 4] device image block in one pass.
void pack_rgbd(const uint8_t* rgb_hwc, const uint8_t* depth_mono, int64_t hw,
               uint8_t* out_hw4) {
  for (int64_t i = 0; i < hw; ++i) {
    out_hw4[i * 4 + 0] = rgb_hwc[i * 3 + 0];
    out_hw4[i * 4 + 1] = rgb_hwc[i * 3 + 1];
    out_hw4[i * 4 + 2] = rgb_hwc[i * 3 + 2];
    out_hw4[i * 4 + 3] = depth_mono[i];
  }
}

}  // extern "C"
