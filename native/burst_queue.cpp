// Transmit burst priority queue ordered by GSM time.
// Mirrors the reference's VectorQueue (Transceiver52M/radioInterface.cpp:
// 30-73): bursts sorted by (FN, TN) with modular hyperframe comparison,
// getStaleBurst (pop anything scheduled before a deadline) and
// getCurrentBurst (pop an exact (FN, TN) match), plus the
// InterthreadPriorityQueue locking discipline (CommonLibs/Interthread.h:453).
#include "runtime.h"

#include <cstring>
#include <map>
#include <mutex>
#include <vector>

namespace {
constexpr int64_t kHyper = 2715648;  // GSM hyperframe (GSMCommon.h:306)

// Modular signed distance a-b in frames, in (-kHyper/2, kHyper/2].
inline int64_t fn_delta(int64_t a, int64_t b) {
  int64_t d = (a - b) % kHyper;
  if (d < 0) d += kHyper;
  if (d > kHyper / 2) d -= kHyper;
  return d;
}

struct Key {
  int64_t fn;
  int chan;
  int tn;
  bool operator<(const Key &o) const {
    if (fn != o.fn) return fn < o.fn;
    if (chan != o.chan) return chan < o.chan;
    return tn < o.tn;
  }
};
}  // namespace

struct burst_pq {
  std::map<Key, std::vector<uint8_t>> q;
  size_t max_bursts = 0;
  std::mutex lock;
};

extern "C" burst_pq *bpq_create(size_t max_bursts) {
  auto *p = new burst_pq;
  p->max_bursts = max_bursts ? max_bursts : SIZE_MAX;
  return p;
}

extern "C" void bpq_destroy(burst_pq *p) { delete p; }

extern "C" int bpq_push(burst_pq *p, int64_t fn, int chan, int tn,
                        const uint8_t *data, int len) {
  if (!p || len < 0) return -1;
  std::lock_guard<std::mutex> g(p->lock);
  if (p->q.size() >= p->max_bursts) return -1;
  Key k{((fn % kHyper) + kHyper) % kHyper, chan, tn};
  p->q[k].assign(data, data + len);  // latest write wins (filler refresh)
  return 0;
}

// Pop the burst scheduled exactly at (fn, chan, tn); returns its length,
// 0 if absent (getCurrentBurst).
extern "C" int bpq_pop_exact(burst_pq *p, int64_t fn, int chan, int tn,
                             uint8_t *out, int maxlen) {
  if (!p) return 0;
  std::lock_guard<std::mutex> g(p->lock);
  Key k{((fn % kHyper) + kHyper) % kHyper, chan, tn};
  auto it = p->q.find(k);
  if (it == p->q.end()) return 0;
  int n = (int)it->second.size();
  if (n > maxlen) n = maxlen;
  std::memcpy(out, it->second.data(), n);
  p->q.erase(it);
  return n;
}

// Drop every burst scheduled before `fn` in modular time; returns the
// number dropped (getStaleBurst's drain).
extern "C" int bpq_dump_stale(burst_pq *p, int64_t fn) {
  if (!p) return 0;
  std::lock_guard<std::mutex> g(p->lock);
  int dropped = 0;
  for (auto it = p->q.begin(); it != p->q.end();) {
    if (fn_delta(it->first.fn, fn) < 0) {
      it = p->q.erase(it);
      ++dropped;
    } else {
      ++it;
    }
  }
  return dropped;
}

extern "C" int bpq_size(const burst_pq *p) {
  if (!p) return 0;
  std::lock_guard<std::mutex> g(const_cast<burst_pq *>(p)->lock);
  return (int)p->q.size();
}

// Earliest scheduled FN relative to `ref` (modular), or -1 when empty.
extern "C" int64_t bpq_min_fn(const burst_pq *p, int64_t ref) {
  if (!p) return -1;
  std::lock_guard<std::mutex> g(const_cast<burst_pq *>(p)->lock);
  if (p->q.empty()) return -1;
  int64_t best = -1;
  int64_t best_d = 0;
  for (const auto &kv : p->q) {
    int64_t d = fn_delta(kv.first.fn, ref);
    if (best < 0 || d < best_d) {
      best = kv.first.fn;
      best_d = d;
    }
  }
  return best;
}
