// Native data-plumbing runtime for exprgrad-tpu.
//
// Role: the host-side counterpart of the reference's native components
// (LLVM JIT + OpenCL runtime + thread pool).  On TPU the compute path is
// XLA/Mosaic (already native); what remains hot on the host is feeding the
// chip: dataset decoding, normalization, batch assembly and checkpoint
// payload IO.  These loops run in C++ and are exposed over a C ABI consumed
// via ctypes (exprgrad_tpu/utils/native.py), with pure-numpy fallbacks.
//
// Build: see native/build.sh (g++ -O3 -march=native -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cstdio>

extern "C" {

// --- byte order -----------------------------------------------------------

void egtpu_byteswap32(uint32_t* data, int64_t count) {
    for (int64_t i = 0; i < count; ++i) {
        uint32_t v = data[i];
        data[i] = (v >> 24) | ((v >> 8) & 0xff00u) | ((v << 8) & 0xff0000u)
                | (v << 24);
    }
}

void egtpu_byteswap64(uint64_t* data, int64_t count) {
    for (int64_t i = 0; i < count; ++i) {
        uint64_t v = data[i];
        v = ((v & 0x00ff00ff00ff00ffull) << 8) | ((v >> 8) & 0x00ff00ff00ff00ffull);
        v = ((v & 0x0000ffff0000ffffull) << 16) | ((v >> 16) & 0x0000ffff0000ffffull);
        data[i] = (v << 32) | (v >> 32);
    }
}

// --- dataset normalization ------------------------------------------------

// dst[i] = src[i] * scale + bias  (u8 image -> f32 features)
void egtpu_u8_to_f32(const uint8_t* src, float* dst, int64_t count,
                     float scale, float bias) {
    for (int64_t i = 0; i < count; ++i) {
        dst[i] = static_cast<float>(src[i]) * scale + bias;
    }
}

// one-hot encode integer labels into a zeroed [count x classes] f32 matrix
void egtpu_one_hot(const int64_t* labels, float* dst, int64_t count,
                   int64_t classes) {
    std::memset(dst, 0, sizeof(float) * count * classes);
    for (int64_t i = 0; i < count; ++i) {
        int64_t label = labels[i];
        if (label >= 0 && label < classes) {
            dst[i * classes + label] = 1.0f;
        }
    }
}

// --- batch assembly -------------------------------------------------------

// gather rows: dst[i, :] = src[indices[i], :]   (row_bytes per sample)
void egtpu_gather_rows(const uint8_t* src, const int64_t* indices,
                       uint8_t* dst, int64_t count, int64_t row_bytes) {
    for (int64_t i = 0; i < count; ++i) {
        std::memcpy(dst + i * row_bytes, src + indices[i] * row_bytes,
                    static_cast<size_t>(row_bytes));
    }
}

// Fisher-Yates shuffle of an index permutation with SplitMix64; fills
// indices with a permutation of [0, count).
void egtpu_shuffle_indices(int64_t* indices, int64_t count, uint64_t seed) {
    for (int64_t i = 0; i < count; ++i) indices[i] = i;
    uint64_t state = seed + 0x9e3779b97f4a7c15ull;
    for (int64_t i = count - 1; i > 0; --i) {
        state += 0x9e3779b97f4a7c15ull;
        uint64_t z = state;
        z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
        z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
        z = z ^ (z >> 31);
        int64_t j = static_cast<int64_t>(z % static_cast<uint64_t>(i + 1));
        int64_t tmp = indices[i];
        indices[i] = indices[j];
        indices[j] = tmp;
    }
}

// --- checkpoint payload IO ------------------------------------------------

// CRC32 (IEEE 802.3) for checkpoint integrity checking.
uint32_t egtpu_crc32(const uint8_t* data, int64_t count, uint32_t seed) {
    static uint32_t table[256];
    static bool have_table = false;
    if (!have_table) {
        for (uint32_t i = 0; i < 256; ++i) {
            uint32_t rem = i;
            for (int b = 0; b < 8; ++b) {
                rem = (rem & 1u) ? (rem >> 1) ^ 0xedb88320u : rem >> 1;
            }
            table[i] = rem;
        }
        have_table = true;
    }
    uint32_t crc = ~seed;
    for (int64_t i = 0; i < count; ++i) {
        crc = (crc >> 8) ^ table[(crc ^ data[i]) & 0xffu];
    }
    return ~crc;
}

// --- tokenization ----------------------------------------------------------

// Byte-level BPE encode (io/tokenizer.py semantics, bit-exact): within
// each pre-tokenized chunk, repeatedly merge the LEFTMOST occurrence of
// the LOWEST-RANK adjacent pair until no mergeable pair remains.  The
// serving stack tokenizes on the host's single core, so this loop is the
// text-side hot path.
//
// data          : concatenated utf-8 chunk bytes
// chunk_offs    : n_chunks + 1 offsets into data
// merge_a/b     : merge table (rank r merges (a[r], b[r]) -> 256 + r)
// out           : caller-allocated, >= data_len entries
// returns the number of token ids written.
int64_t egtpu_bpe_encode(const uint8_t* data, const int64_t* chunk_offs,
                         int64_t n_chunks, const int32_t* merge_a,
                         const int32_t* merge_b, int64_t n_merges,
                         int32_t* out) {
    // open-addressed pair -> rank map (keys are (a << 21) | b: token ids
    // stay far below 2^21 for any realistic vocab)
    int64_t cap = 1;
    while (cap < n_merges * 2 + 8) cap <<= 1;
    uint64_t* keys = new uint64_t[cap];
    int32_t* ranks = new int32_t[cap];
    memset(keys, 0xff, cap * sizeof(uint64_t));
    const uint64_t mask = (uint64_t)cap - 1;
    for (int64_t r = 0; r < n_merges; ++r) {
        uint64_t key = ((uint64_t)merge_a[r] << 21) | (uint64_t)merge_b[r];
        uint64_t h = (key * 0x9e3779b97f4a7c15ull) & mask;
        while (keys[h] != ~0ull) h = (h + 1) & mask;
        keys[h] = key;
        ranks[h] = (int32_t)r;
    }
    auto lookup = [&](int32_t a, int32_t b) -> int32_t {
        uint64_t key = ((uint64_t)a << 21) | (uint64_t)b;
        uint64_t h = (key * 0x9e3779b97f4a7c15ull) & mask;
        while (keys[h] != ~0ull) {
            if (keys[h] == key) return ranks[h];
            h = (h + 1) & mask;
        }
        return -1;
    };

    int64_t written = 0;
    int32_t buf[4096];
    for (int64_t c = 0; c < n_chunks; ++c) {
        int64_t lo = chunk_offs[c], hi = chunk_offs[c + 1];
        int64_t len = hi - lo;
        int32_t* ids = buf;
        bool heap = len > 4096;
        if (heap) ids = new int32_t[len];
        for (int64_t i = 0; i < len; ++i) ids[i] = data[lo + i];
        while (len > 1) {
            int32_t best_rank = -1;
            int64_t best_at = -1;
            for (int64_t i = 0; i + 1 < len; ++i) {
                int32_t r = lookup(ids[i], ids[i + 1]);
                if (r >= 0 && (best_rank < 0 || r < best_rank)) {
                    best_rank = r;
                    best_at = i;
                }
            }
            if (best_rank < 0) break;
            ids[best_at] = 256 + best_rank;
            memmove(ids + best_at + 1, ids + best_at + 2,
                    (len - best_at - 2) * sizeof(int32_t));
            --len;
        }
        memcpy(out + written, ids, len * sizeof(int32_t));
        written += len;
        if (heap) delete[] ids;
    }
    delete[] keys;
    delete[] ranks;
    return written;
}

int32_t egtpu_version() { return 2; }

}  // extern "C"
