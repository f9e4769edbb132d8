// Native host runtime: KV block allocators for the decoding scheduler.
//
// TPU-native counterpart of the reference's native runtime layer: where the
// reference spends its C++ on CUDA kernels and a CPU backend (reference:
// csrc/), the TPU build's device code is Pallas/XLA — so the native layer
// moves to where this framework is actually hot on the host: the
// block-allocation bookkeeping that runs inside every scheduling step
// (allocate / append / free / prefix-cache lookups across thousands of
// sequences). Exposed as a C ABI consumed via ctypes
// (light_vllm_tpu/native/__init__.py); behavior mirrors
// light_vllm_tpu/decoding/block_manager.py exactly (tested against it).
//
// Build: csrc/Makefile → libhost_runtime.so

#include <algorithm>
#include <cstdint>
#include <map>
#include <tuple>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

using BlockId = int32_t;
using Hash = int64_t;

struct Allocator {
  bool prefix_caching = false;
  int64_t tick = 0;

  std::vector<BlockId> free_list;
  std::unordered_map<BlockId, int32_t> refcount;

  // prefix caching state
  std::unordered_map<Hash, BlockId> cached;
  std::unordered_map<BlockId, Hash> hash_of;
  std::unordered_map<BlockId, int32_t> num_hashed;
  // Blocks whose KV a completed forward pass has written; lookups may only
  // hit computed blocks (mirrors block_manager.py computed gate).
  std::unordered_set<BlockId> computed;
  // evictable (refcount-0 cached) blocks: key (last_accessed,
  // -num_hashed_tokens, id) → LRU order with longest-chain tiebreak.
  std::map<std::tuple<int64_t, int32_t, BlockId>, BlockId> evictor;
  std::unordered_map<BlockId, std::tuple<int64_t, int32_t, BlockId>>
      evictor_keys;

  int64_t hits = 0, misses = 0;
};

void evictor_add(Allocator* a, BlockId id, int64_t ts, int32_t nh) {
  auto key = std::make_tuple(ts, -nh, id);
  a->evictor.emplace(key, id);
  a->evictor_keys[id] = key;
}

bool evictor_remove(Allocator* a, BlockId id) {
  auto it = a->evictor_keys.find(id);
  if (it == a->evictor_keys.end()) return false;
  a->evictor.erase(it->second);
  a->evictor_keys.erase(it);
  return true;
}

}  // namespace

extern "C" {

void* lvt_allocator_create(int32_t num_blocks, int32_t first_id,
                           int32_t prefix_caching) {
  auto* a = new Allocator();
  a->prefix_caching = prefix_caching != 0;
  a->free_list.reserve(num_blocks);
  for (BlockId i = first_id + num_blocks - 1; i >= first_id; --i)
    a->free_list.push_back(i);
  // Python allocator pops from the back of a forward-filled list; match its
  // hand-out order so tests can compare traces exactly.
  std::reverse(a->free_list.begin(), a->free_list.end());
  return a;
}

void lvt_allocator_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t lvt_num_free(void* h) {
  auto* a = static_cast<Allocator*>(h);
  return static_cast<int32_t>(a->free_list.size() + a->evictor.size());
}

int32_t lvt_allocate(void* h) {
  auto* a = static_cast<Allocator*>(h);
  BlockId id;
  if (!a->free_list.empty()) {
    id = a->free_list.back();
    a->free_list.pop_back();
  } else if (!a->evictor.empty()) {
    auto it = a->evictor.begin();
    id = it->second;
    a->evictor.erase(it);
    a->evictor_keys.erase(id);
    auto hit = a->hash_of.find(id);
    if (hit != a->hash_of.end()) {
      auto c = a->cached.find(hit->second);
      if (c != a->cached.end() && c->second == id) a->cached.erase(c);
      a->hash_of.erase(hit);
    }
    a->num_hashed.erase(id);
    a->computed.erase(id);
  } else {
    return -1;  // out of blocks
  }
  a->refcount[id] = 1;
  return id;
}

int32_t lvt_incr(void* h, int32_t id) {
  auto* a = static_cast<Allocator*>(h);
  return ++a->refcount[id];
}

int32_t lvt_refcount(void* h, int32_t id) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->refcount.find(id);
  return it == a->refcount.end() ? 0 : it->second;
}

void lvt_free(void* h, int32_t id) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->refcount.find(id);
  if (it == a->refcount.end()) return;
  if (--it->second > 0) return;
  a->refcount.erase(it);
  auto hit = a->hash_of.find(id);
  if (a->prefix_caching && hit != a->hash_of.end() &&
      a->cached.count(hit->second) && a->cached[hit->second] == id) {
    evictor_add(a, id, ++a->tick, a->num_hashed[id]);
  } else {
    a->computed.erase(id);
    a->free_list.push_back(id);
  }
}

int32_t lvt_lookup(void* h, int64_t content_hash) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->cached.find(content_hash);
  if (it == a->cached.end() || !a->computed.count(it->second)) {
    ++a->misses;
    return -1;
  }
  ++a->hits;
  return it->second;
}

void lvt_mark_computed(void* h, int32_t id) {
  auto* a = static_cast<Allocator*>(h);
  a->computed.insert(id);
}

void lvt_touch(void* h, int32_t id) {
  auto* a = static_cast<Allocator*>(h);
  if (evictor_remove(a, id)) {
    a->refcount[id] = 1;
  } else {
    ++a->refcount[id];
  }
}

int32_t lvt_mark_full(void* h, int32_t id, int64_t content_hash,
                      int32_t num_hashed_tokens) {
  auto* a = static_cast<Allocator*>(h);
  auto it = a->cached.find(content_hash);
  if (it != a->cached.end() && it->second != id) {
    lvt_touch(h, it->second);
    lvt_free(h, id);
    return it->second;
  }
  a->cached[content_hash] = id;
  a->hash_of[id] = content_hash;
  a->num_hashed[id] = num_hashed_tokens;
  return id;
}

void lvt_stats(void* h, int64_t* hits, int64_t* misses) {
  auto* a = static_cast<Allocator*>(h);
  *hits = a->hits;
  *misses = a->misses;
}

}  // extern "C"
