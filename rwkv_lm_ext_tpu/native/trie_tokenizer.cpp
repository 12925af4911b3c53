// Native greedy longest-match byte-trie tokenizer core.
//
// The data-loader hot path of the framework: the reference tokenizes with a
// pure-Python linked trie (tokenizer/rwkv_tokenizer.py) which bottlenecks
// corpus preprocessing; this is the C++ equivalent, exposed via a C ABI for
// ctypes (no pybind11 in the image). Python keeps vocab parsing and
// decoding; only encode() is hot.
//
// Structure: transitions in one open-addressing hash table keyed by
// (node << 8) | byte — O(1) child steps, no pointer chasing; the root's
// 256 transitions get a dedicated dense table.
//
// Build: g++ -O3 -shared -fPIC trie_tokenizer.cpp -o libtrietok.so
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Trie {
    // open-addressing table: key -> child node (+1; 0 = empty)
    std::vector<uint64_t> keys;
    std::vector<int32_t> vals;
    uint64_t mask = 0;
    size_t used = 0;
    std::vector<int32_t> token_id;  // node -> terminal id or -1
    int32_t root_children[256];
    int32_t n_nodes = 1;

    Trie() {
        token_id.push_back(-1);
        for (int i = 0; i < 256; ++i) root_children[i] = -1;
        rehash(1 << 20);
    }

    static uint64_t hash(uint64_t k) {
        k ^= k >> 33;
        k *= 0xff51afd7ed558ccdULL;
        k ^= k >> 33;
        return k;
    }

    void rehash(size_t n) {
        std::vector<uint64_t> old_keys = std::move(keys);
        std::vector<int32_t> old_vals = std::move(vals);
        keys.assign(n, 0);
        vals.assign(n, 0);
        mask = n - 1;
        used = 0;
        for (size_t i = 0; i < old_keys.size(); ++i) {
            if (old_vals[i]) put(old_keys[i], old_vals[i] - 1);
        }
    }

    void put(uint64_t key, int32_t node) {
        if ((used + 1) * 10 > (mask + 1) * 7) rehash((mask + 1) * 2);
        uint64_t i = hash(key) & mask;
        while (vals[i] && keys[i] != key) i = (i + 1) & mask;
        if (!vals[i]) ++used;
        keys[i] = key;
        vals[i] = node + 1;
    }

    int32_t get(uint64_t key) const {
        uint64_t i = hash(key) & mask;
        while (vals[i]) {
            if (keys[i] == key) return vals[i] - 1;
            i = (i + 1) & mask;
        }
        return -1;
    }

    int32_t child(int32_t node, uint8_t b) const {
        if (node == 0) return root_children[b];
        return get((static_cast<uint64_t>(node) << 8) | b);
    }

    void insert(const uint8_t* bytes, int32_t len, int32_t id) {
        int32_t node = 0;
        for (int32_t i = 0; i < len; ++i) {
            int32_t c = child(node, bytes[i]);
            if (c == -1) {
                c = n_nodes++;
                token_id.push_back(-1);
                if (node == 0) {
                    root_children[bytes[i]] = c;
                } else {
                    put((static_cast<uint64_t>(node) << 8) | bytes[i], c);
                }
            }
            node = c;
        }
        token_id[node] = id;
    }
};

}  // namespace

extern "C" {

// vocab blob layout: repeated records [id:int32][len:int32][bytes:len]
void* tok_create(const uint8_t* blob, int64_t blob_len) {
    auto* t = new Trie();
    int64_t off = 0;
    while (off + 8 <= blob_len) {
        int32_t id, len;
        std::memcpy(&id, blob + off, 4);
        std::memcpy(&len, blob + off + 4, 4);
        off += 8;
        if (off + len > blob_len) break;
        t->insert(blob + off, len, id);
        off += len;
    }
    return t;
}

void tok_destroy(void* handle) { delete static_cast<Trie*>(handle); }

// Greedy longest match. Returns number of ids written, or -1-pos on an
// unmatchable byte at `pos`. out must have room for `len` ids.
int64_t tok_encode(void* handle, const uint8_t* data, int64_t len,
                   int32_t* out) {
    const Trie& t = *static_cast<Trie*>(handle);
    int64_t i = 0, n = 0;
    while (i < len) {
        int32_t node = t.child(0, data[i]);
        if (node == -1) return -1 - i;
        int32_t best_id = t.token_id[node];
        int64_t best_end = i + 1;
        for (int64_t j = i + 1; j < len && node != -1; ++j) {
            node = t.child(node, data[j]);
            if (node != -1 && t.token_id[node] != -1) {
                best_id = t.token_id[node];
                best_end = j + 1;
            }
        }
        if (best_id == -1) return -1 - i;
        out[n++] = best_id;
        i = best_end;
    }
    return n;
}

}  // extern "C"
