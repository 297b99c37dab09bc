// COCO run-length-encoding codec (column-major RLE with the standard
// LEB128-style base-32 string compression used by the COCO API).
//
// Native data-loader component: the training datasets store perturbed masks
// and the 8 TP/TN/FP/FN error maps as compressed RLE strings inside JSON
// (reference format written by tools/ours/panoptic2eee.py:125-132); decoding
// dozens of 480x640 masks per sample is on the input-pipeline hot path, so
// it lives in C++ (exposed via ctypes, with a numpy fallback in
// quber_tpu/data/rle.py).
//
// Build: make -C csrc   (produces libquber_rle.so)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode a binary mask (C-order, row-major, h*w bytes of 0/1) into the COCO
// compressed-counts string. Returns the string length, or -1 if out_cap is
// too small. Counts are column-major runs starting with the zero run.
int rle_encode(const uint8_t* mask, int h, int w, char* out, int out_cap) {
  std::vector<int64_t> cnts;
  cnts.reserve(1024);
  int64_t run = 0;
  uint8_t cur = 0;  // runs start with zeros
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y) {
      uint8_t v = mask[y * w + x] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        cnts.push_back(run);
        run = 1;
        cur = v;
      }
    }
  }
  cnts.push_back(run);

  int p = 0;
  for (size_t i = 0; i < cnts.size(); ++i) {
    int64_t x = cnts[i];
    if (i > 2) x -= cnts[i - 2];
    bool more = true;
    while (more) {
      char c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? x != -1 : x != 0;
      if (more) c |= 0x20;
      c += 48;
      if (p >= out_cap) return -1;
      out[p++] = c;
    }
  }
  return p;
}

// Decode a COCO compressed-counts string into a binary mask (C-order,
// row-major, h*w bytes). Returns 0 on success, -1 on malformed input.
int rle_decode(const char* s, int n, int h, int w, uint8_t* out) {
  std::vector<int64_t> cnts;
  cnts.reserve(1024);
  int p = 0;
  while (p < n) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (p >= n) return -1;
      char c = s[p] - 48;
      x |= (int64_t)(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= -((int64_t)1 << (5 * k));
    }
    if (cnts.size() > 2) x += cnts[cnts.size() - 2];
    cnts.push_back(x);
  }

  std::memset(out, 0, (size_t)h * w);
  int64_t pos = 0;
  uint8_t v = 0;
  for (size_t i = 0; i < cnts.size(); ++i) {
    int64_t run = cnts[i];
    if (run < 0 || pos + run > (int64_t)h * w) return -1;
    if (v) {
      for (int64_t j = pos; j < pos + run; ++j) {
        int64_t x = j / h, y = j % h;  // column-major
        out[y * w + x] = 1;
      }
    }
    pos += run;
    v ^= 1;
  }
  return pos == (int64_t)h * w ? 0 : -1;
}

// Batched decode: k strings (concatenated, with offsets) into [k, h, w].
int rle_decode_batch(const char* s, const int64_t* offsets, int k, int h,
                     int w, uint8_t* out) {
  for (int i = 0; i < k; ++i) {
    int n = (int)(offsets[i + 1] - offsets[i]);
    int rc = rle_decode(s + offsets[i], n, h, w, out + (int64_t)i * h * w);
    if (rc != 0) return rc;
  }
  return 0;
}

}  // extern "C"
