// Native eval accelerator: single-pass panoptic confusion histogram.
//
// Replaces the numpy `np.unique(gt * OFFSET + pred, return_counts=True)`
// sort (plus the two per-map area uniques) in the PQ evaluator
// (ldmseg_tpu/eval/panoptic.py; reference: panopticapi's
// pq_compute_single_core via ldmseg/evaluations/panoptic_evaluation_agnostic.py:194)
// with one hash-map scan over the two id maps. Pair counts are returned as
// (key = gt * offset + pred, count); per-map areas are derived from the
// pairs by the Python caller.
//
// Build: g++ -O3 -shared -fPIC (see ldmseg_tpu/native/__init__.py).

#include <cstdint>
#include <unordered_map>

extern "C" {

// Returns the total number of unique (gt, pred) pairs. At most `max_out`
// entries are written to out_keys/out_counts; if the return value exceeds
// max_out the caller must fall back (never happens for real panoptic maps,
// which have tens of segments).
int64_t pq_pair_confusion(const uint32_t* gt, const uint32_t* pred,
                          int64_t n, uint64_t offset, uint64_t* out_keys,
                          int64_t* out_counts, int64_t max_out) {
  std::unordered_map<uint64_t, int64_t> counts;
  counts.reserve(256);
  // Manual 1-entry memoization: panoptic maps are piecewise constant, so
  // consecutive pixels almost always hit the same (gt, pred) pair.
  uint64_t last_key = ~(uint64_t)0;
  int64_t last_run = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t key = (uint64_t)gt[i] * offset + (uint64_t)pred[i];
    if (key == last_key) {
      ++last_run;
      continue;
    }
    if (last_run) counts[last_key] += last_run;
    last_key = key;
    last_run = 1;
  }
  if (last_run) counts[last_key] += last_run;

  int64_t m = 0;
  for (const auto& kv : counts) {
    if (m >= max_out) break;
    out_keys[m] = kv.first;
    out_counts[m] = kv.second;
    ++m;
  }
  return (int64_t)counts.size();
}

}  // extern "C"
