// Timestamped complex-int16 sample ring buffer.
// Mirrors the behavior of the reference's USRP receive ring
// (Transceiver52M/USRPDevice.{h,cpp}: a power-of-two ring of interleaved
// I/Q int16 samples addressed by a 64-bit sample timestamp, with gaps
// zero-filled and stale reads clamped).
#include "runtime.h"

#include <algorithm>
#include <cstring>
#include <mutex>
#include <vector>

struct sample_ring {
  std::vector<int16_t> buf;  // 2*capacity int16
  size_t cap = 0;            // samples
  int64_t start = -1;        // oldest valid timestamp
  int64_t end = -1;          // next timestamp to write
  std::mutex lock;
};

extern "C" sample_ring *ring_create(size_t capacity_samples) {
  auto *r = new sample_ring;
  r->cap = capacity_samples;
  r->buf.assign(2 * capacity_samples, 0);
  return r;
}

extern "C" void ring_destroy(sample_ring *r) { delete r; }

static inline size_t slot(const sample_ring *r, int64_t ts) {
  int64_t m = ts % (int64_t)r->cap;
  return (size_t)(m < 0 ? m + (int64_t)r->cap : m);
}

extern "C" int64_t ring_write(sample_ring *r, const int16_t *iq, int64_t n,
                              int64_t ts) {
  if (!r || n <= 0) return 0;
  std::lock_guard<std::mutex> g(r->lock);
  if (r->start < 0) {
    r->start = ts;
    r->end = ts;
  }
  // zero-fill a gap between end and ts (timestamp jump, like the
  // reference's underrun/overrun handling)
  if (ts > r->end) {
    int64_t gap = std::min<int64_t>(ts - r->end, (int64_t)r->cap);
    for (int64_t i = 0; i < gap; i++) {
      size_t s = slot(r, r->end + i);
      r->buf[2 * s] = 0;
      r->buf[2 * s + 1] = 0;
    }
  }
  for (int64_t i = 0; i < n; i++) {
    size_t s = slot(r, ts + i);
    r->buf[2 * s] = iq[2 * i];
    r->buf[2 * s + 1] = iq[2 * i + 1];
  }
  r->end = std::max(r->end, ts + n);
  r->start = std::max(r->start, r->end - (int64_t)r->cap);
  return n;
}

extern "C" int64_t ring_read(sample_ring *r, int16_t *iq_out, int64_t n,
                             int64_t ts) {
  if (!r || n <= 0) return 0;
  std::lock_guard<std::mutex> g(r->lock);
  std::memset(iq_out, 0, (size_t)(2 * n * sizeof(int16_t)));
  if (r->start < 0) return 0;
  int64_t lo = std::max(ts, r->start);
  int64_t hi = std::min(ts + n, r->end);
  if (hi <= lo) return (ts >= r->end || ts + n <= r->start) ? -1 : 0;
  for (int64_t t = lo; t < hi; t++) {
    size_t s = slot(r, t);
    iq_out[2 * (t - ts)] = r->buf[2 * s];
    iq_out[2 * (t - ts) + 1] = r->buf[2 * s + 1];
  }
  return hi - lo;
}

extern "C" int64_t ring_end_ts(const sample_ring *r) {
  return r ? r->end : -1;
}
extern "C" int64_t ring_start_ts(const sample_ring *r) {
  return r ? r->start : -1;
}
