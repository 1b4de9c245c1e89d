// Native priority-flood watershed kernel.
//
// One kernel serves both flood variants the framework needs:
//  * affinity mode  — re-derivation of iterseg watershed.py:95-159
//    (raveled_affinity_watershed): pushed value = affinity of the crossed
//    edge, seeds pushed with value 0.
//  * image mode     — skimage.segmentation.watershed semantics
//    (connectivity 1, compactness 0): pushed value = image value at the
//    claimed voxel, seeds pushed with the image value at the seed.
//
// Exact heap-order semantics: a binary min-heap over (value, age, index)
// compared lexicographically; ages increase monotonically with pushes so
// insertion order breaks value ties, and index breaks the initial
// all-age-zero seed ties — identical to Python heapq over
// Element(value, age, index, source).
//
// Claim-at-push: when an element pops, every in-mask unlabelled neighbour
// immediately takes its label and is enqueued. This is the sequential hot
// loop of inference; it runs on host while the TPU computes the next
// frame's feature maps.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Elem {
  float value;
  int64_t age;
  int64_t index;
};

inline bool greater_than(const Elem& a, const Elem& b) {
  if (a.value != b.value) return a.value > b.value;
  if (a.age != b.age) return a.age > b.age;
  return a.index > b.index;
}

// Hand-rolled binary min-heap over a preallocated vector: ~2x faster than
// std::priority_queue for this workload (no indirection, reserve once).
class MinHeap {
 public:
  explicit MinHeap(size_t reserve) { data_.reserve(reserve); }

  bool empty() const { return data_.empty(); }

  void push(Elem e) {
    data_.push_back(e);
    size_t i = data_.size() - 1;
    while (i > 0) {
      size_t parent = (i - 1) >> 1;
      if (greater_than(data_[parent], data_[i])) {
        Elem tmp = data_[parent];
        data_[parent] = data_[i];
        data_[i] = tmp;
        i = parent;
      } else {
        break;
      }
    }
  }

  Elem pop() {
    Elem top = data_[0];
    data_[0] = data_.back();
    data_.pop_back();
    size_t n = data_.size();
    size_t i = 0;
    while (true) {
      size_t l = 2 * i + 1;
      size_t r = l + 1;
      size_t smallest = i;
      if (l < n && greater_than(data_[smallest], data_[l])) smallest = l;
      if (r < n && greater_than(data_[smallest], data_[r])) smallest = r;
      if (smallest == i) break;
      Elem tmp = data_[smallest];
      data_[smallest] = data_[i];
      data_[i] = tmp;
      i = smallest;
    }
    return top;
  }

 private:
  std::vector<Elem> data_;
};

}  // namespace

extern "C" {

// values:     (n_chan, n) row-major raveled value channels
// offsets:    (n_nbr,) signed raveled neighbour offsets
// val_chan:   (n_nbr,) value channel per direction
// val_off:    (n_nbr,) value sample offset added to the POPPED index
// markers:    (n_markers,) raveled seed indices; output must be pre-seeded
// seed_values:(n_markers,) heap value for each seed push
// mask:       (n,) uint8; border ring must be 0 (callers pad)
// output:     (n,) int32 labels, pre-seeded at markers
void priority_flood(const float* values, const int64_t* offsets,
                    const int64_t* val_chan, const int64_t* val_off,
                    int32_t n_nbr, const int64_t* markers, int64_t n_markers,
                    const float* seed_values, const uint8_t* mask,
                    int32_t* output, int64_t n) {
  MinHeap heap(static_cast<size_t>(n_markers) + 1024);
  for (int64_t i = 0; i < n_markers; ++i) {
    heap.push(Elem{seed_values[i], 0, markers[i]});
  }
  int64_t age = 0;
  while (!heap.empty()) {
    Elem e = heap.pop();
    int32_t lab = output[e.index];
    for (int32_t k = 0; k < n_nbr; ++k) {
      int64_t nbr = e.index + offsets[k];
      if (nbr < 0 || nbr >= n) continue;
      if (!mask[nbr]) continue;
      if (output[nbr]) continue;
      output[nbr] = lab;
      float v = values[val_chan[k] * n + e.index + val_off[k]];
      ++age;
      heap.push(Elem{v, age, nbr});
    }
  }
}

}  // extern "C"
