// apda_io: native host-side data-loader kernels for apda_fft_tpu.
//
// The gateway's host hot path is pure string/byte churn: decoding binary16
// radio payloads (reference protocol_decoder.py:116-175), rendering samples
// as "%8.6f" log-file tokens, and parsing those tokens back for analysis
// (reference utils/load_data.py:67-77).  The reference does all of this one
// value at a time in interpreted Python; these C implementations process
// whole payloads/files per call and are loaded via ctypes (no pybind11 in
// this image).
//
// Semantics match apda_fft_tpu.io.halffloat exactly, including the reference
// quirks: truncated subnormal constant 0.00006103515 (not 2^-14) and +inf
// regardless of sign bit.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Decode big-endian binary16 byte pairs to float64, adding `first`.
// Returns the number of samples written to out (= n_bytes / 2).
long apda_decode_half(const uint8_t* buf, long n_bytes, double first, double* out) {
  const long n = n_bytes / 2;
  for (long i = 0; i < n; ++i) {
    const uint16_t w = (uint16_t)((buf[2 * i] << 8) | buf[2 * i + 1]);
    const int exp = (w >> 10) & 0x1F;
    const double sign = (w & 0x8000) ? -1.0 : 1.0;
    const double mant = (double)(w & 0x03FF) / 1024.0;
    double v;
    if (exp == 31) {
      v = (mant != 0.0) ? NAN : INFINITY;  // +inf even when sign bit set
    } else if (exp == 0) {
      v = (mant != 0.0) ? sign * 0.00006103515 * mant : 0.0;
    } else {
      v = sign * ldexp(1.0 + mant, exp - 15);
    }
    out[i] = v + first;
  }
  return n;
}

// Render samples as the log-file token stream "v1;v2;...;" using "%8.6f".
// Returns bytes written (excluding NUL), or -1 if cap would overflow.
// snprintf returns the UNtruncated length, so w >= cap-used means the token
// was clipped: that must report overflow (the caller falls back to Python),
// never return silently corrupt bytes destined for an acquisition log.
long apda_format_samples(const double* vals, long n, char* out, long cap) {
  long used = 0;
  for (long i = 0; i < n; ++i) {
    const int w = snprintf(out + used, (size_t)(cap - used), "%8.6f;", vals[i]);
    if (w < 0 || (long)w >= cap - used) return -1;
    used += w;
  }
  return used;
}

// Parse a ';'-separated sample region (log-file rows 4+): numeric tokens
// become samples, non-finite values are dropped, anything unparsable
// (e.g. "* MISSING PACKETS ... *" markers) is skipped - load_data.py:67-77.
//
// Tokens are parsed in place (the ctypes buffer is NUL-terminated and ';'
// / '\n' stop strtod anyway), so there is no token-length limit; a fixed
// 64-byte copy here once truncated long tokens to wrong values.  Tokens
// containing 'x'/'X' are rejected up front: strtod accepts hex floats that
// Python's float() (the fallback and the reference) does not.
long apda_parse_samples(const char* text, long len, double* out, long cap) {
  long count = 0;
  long i = 0;
  while (i < len && count < cap) {
    // token spans up to the next ';' or newline
    long j = i;
    bool hexlike = false;
    while (j < len && text[j] != ';' && text[j] != '\n') {
      if (text[j] == 'x' || text[j] == 'X') hexlike = true;
      ++j;
    }
    if (j > i && !hexlike) {
      char* end = nullptr;
      const double v = strtod(text + i, &end);
      if (end && end != text + i && end <= text + j) {
        // token must be fully consumed (modulo trailing spaces)
        while (end < text + j && (*end == ' ' || *end == '\r' || *end == '\t')) ++end;
        if (end == text + j && std::isfinite(v)) out[count++] = v;
      }
    }
    i = j + 1;
  }
  return count;
}

}  // extern "C"
