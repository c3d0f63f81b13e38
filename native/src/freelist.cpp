// Free-list arena allocator - native core of the HBM residency layer.
//
// Capability parity with the reference's GPU buffer allocator
// (LinkedFreeChunkList: coalescing give + first-fit take,
// src/Allocator.cpp:191-266).  Same semantics as the Python fallback in
// octree_raymarcher_tpu/world/alloc.py (FreeList), which doubles as the
// test oracle for this implementation.  Exposed as a C API for ctypes.

#include <cstdint>
#include <map>
#include <new>

namespace {

// Sorted offset -> size map; invariants: spans disjoint, never adjacent
// (adjacent spans are coalesced on give).
struct FreeList {
    std::map<int64_t, int64_t> spans;
    int64_t capacity;

    explicit FreeList(int64_t cap) : capacity(cap) {
        if (cap > 0) spans.emplace(0, cap);
    }

    int64_t take(int64_t size) {
        for (auto it = spans.begin(); it != spans.end(); ++it) {
            if (it->second >= size) {
                int64_t off = it->first;
                int64_t rest = it->second - size;
                spans.erase(it);
                if (rest > 0) spans.emplace(off + size, rest);
                return off;
            }
        }
        return -1;
    }

    void give(int64_t off, int64_t size) {
        auto next = spans.lower_bound(off);
        // merge with right neighbour
        if (next != spans.end() && off + size == next->first) {
            size += next->second;
            next = spans.erase(next);
        }
        // merge with left neighbour
        if (next != spans.begin()) {
            auto prev = std::prev(next);
            if (prev->first + prev->second == off) {
                prev->second += size;
                return;
            }
        }
        spans.emplace(off, size);
    }

    void extend(int64_t new_capacity) {
        if (new_capacity <= capacity) return;
        give(capacity, new_capacity - capacity);
        capacity = new_capacity;
    }

    int64_t free_total() const {
        int64_t t = 0;
        for (auto &kv : spans) t += kv.second;
        return t;
    }
};

}  // namespace

extern "C" {

void *fl_create(int64_t capacity) { return new (std::nothrow) FreeList(capacity); }
void fl_destroy(void *h) { delete static_cast<FreeList *>(h); }

int64_t fl_take(void *h, int64_t size) {
    return static_cast<FreeList *>(h)->take(size);
}
void fl_give(void *h, int64_t off, int64_t size) {
    static_cast<FreeList *>(h)->give(off, size);
}
void fl_extend(void *h, int64_t new_capacity) {
    static_cast<FreeList *>(h)->extend(new_capacity);
}
int64_t fl_capacity(void *h) { return static_cast<FreeList *>(h)->capacity; }
int64_t fl_free_total(void *h) { return static_cast<FreeList *>(h)->free_total(); }
int64_t fl_num_spans(void *h) {
    return static_cast<int64_t>(static_cast<FreeList *>(h)->spans.size());
}
// Fill out_off/out_size (caller-allocated, length >= num_spans); returns count.
int64_t fl_spans(void *h, int64_t *out_off, int64_t *out_size, int64_t max_n) {
    auto *fl = static_cast<FreeList *>(h);
    int64_t n = 0;
    for (auto &kv : fl->spans) {
        if (n >= max_n) break;
        out_off[n] = kv.first;
        out_size[n] = kv.second;
        ++n;
    }
    return n;
}

}  // extern "C"
