// Minimal stand-in for the reference's vendored parallel-hashmap
// (gtl/phmap; the submodule is not checked out in this container).
// Used ONLY to compile the golden C++ reference for parity testing
// (parity/build_reference.sh). Implements exactly the API surface the
// reference touches: parallel_node_hash_map / parallel_flat_hash_map as
// aliases of std::unordered_map (node-based => pointer-stable, matching
// the property MapGradPixelSdf.h:65-68 relies on), the
// priv::hash_default_{hash,eq} aliases, and the HashState combiner used by
// the std::hash<Vec3i> specialization (hash_map.h:49).
#pragma once

#include <cstddef>
#include <functional>
#include <memory>
#include <unordered_map>

namespace phmap {

struct HashState {
    std::size_t state = 0xcbf29ce484222325ULL;
    template <typename... Ts>
    std::size_t combine(Ts... vals) {
        (mix(static_cast<std::size_t>(vals)), ...);
        return state;
    }
    void mix(std::size_t v) {
        state ^= v + 0x9e3779b97f4a7c15ULL + (state << 6) + (state >> 2);
    }
};

namespace priv {
template <class K> using hash_default_hash = std::hash<K>;
template <class K> using hash_default_eq = std::equal_to<K>;
}  // namespace priv

template <class K, class V,
          class Hash = priv::hash_default_hash<K>,
          class Eq = priv::hash_default_eq<K>,
          class Alloc = std::allocator<std::pair<const K, V>>>
using parallel_node_hash_map = std::unordered_map<K, V, Hash, Eq, Alloc>;

template <class K, class V,
          class Hash = priv::hash_default_hash<K>,
          class Eq = priv::hash_default_eq<K>,
          class Alloc = std::allocator<std::pair<const K, V>>>
using parallel_flat_hash_map = std::unordered_map<K, V, Hash, Eq, Alloc>;

}  // namespace phmap
