// Native batch tokenizer: the hashing-trick fast path.
//
// Byte-exact with the Python reference implementation in
// models/tokenizer.py: ASCII lowercase, tokens matching
// [a-z0-9]+(?:'[a-z]+)?, 64-bit FNV-1a seeded per hash function,
// ids in [NUM_RESERVED, vocab_size). The Python side validates parity in
// tests/test_native.py and falls back transparently when the shared
// library is unavailable.
//
// Build: g++ -O3 -shared -fPIC -o libtokenizer.so tokenizer.cpp
// ABI: plain C, driven via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t kFnvOffset = 0xCBF29CE484222325ULL;
constexpr uint64_t kFnvPrime = 0x100000001B3ULL;
constexpr int32_t kPadId = 0;
constexpr int32_t kClsId = 1;
constexpr int32_t kNumReserved = 2;

constexpr uint64_t kHashSeeds[8] = {
    0x9E3779B97F4A7C15ULL, 0xC2B2AE3D27D4EB4FULL, 0x165667B19E3779F9ULL,
    0x27D4EB2F165667C5ULL, 0x85EBCA77C2B2AE63ULL, 0x2545F4914F6CDD1DULL,
    0xFF51AFD7ED558CCDULL, 0xC4CEB9FE1A85EC53ULL,
};

inline uint64_t fnv1a(const char* data, int len, uint64_t seed) {
  uint64_t h = kFnvOffset ^ seed;
  for (int i = 0; i < len; ++i) {
    h = (h ^ static_cast<unsigned char>(data[i])) * kFnvPrime;
  }
  return h;
}

inline bool is_lower_alnum(char c) {
  return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
}

inline bool is_lower_alpha(char c) { return c >= 'a' && c <= 'z'; }

}  // namespace

extern "C" {

// texts: concatenated UTF-8 bytes; offsets: n+1 boundaries into texts.
// out: (n, max_length, num_hashes) int32, caller-allocated and zeroed.
void encode_batch(const char* texts, const int64_t* offsets, int64_t n,
                  int32_t max_length, int32_t num_hashes, int32_t vocab_size,
                  int32_t lowercase, int32_t add_cls, int32_t* out) {
  const uint64_t space = static_cast<uint64_t>(vocab_size - kNumReserved);
  // scratch for the lowercased text (heap per call keeps this re-entrant)
  for (int64_t row = 0; row < n; ++row) {
    const char* src = texts + offsets[row];
    const int64_t len = offsets[row + 1] - offsets[row];
    int32_t* out_row = out + row * max_length * num_hashes;
    int32_t pos = 0;
    if (add_cls) {
      for (int32_t h = 0; h < num_hashes; ++h) out_row[h] = kClsId;
      pos = 1;
    }
    char buf[4096];
    int64_t i = 0;
    while (i < len && pos < max_length) {
      char c = src[i];
      if (lowercase && c >= 'A' && c <= 'Z') c += 32;
      if (!is_lower_alnum(c)) {
        ++i;
        continue;
      }
      // token: [a-z0-9]+ then optional '[a-z]+
      int tlen = 0;
      while (i < len && tlen < static_cast<int>(sizeof(buf))) {
        char tc = src[i];
        if (lowercase && tc >= 'A' && tc <= 'Z') tc += 32;
        if (!is_lower_alnum(tc)) break;
        buf[tlen++] = tc;
        ++i;
      }
      if (i + 1 < len && src[i] == '\'') {
        char nc = src[i + 1];
        if (lowercase && nc >= 'A' && nc <= 'Z') nc += 32;
        if (is_lower_alpha(nc)) {
          buf[tlen++] = '\'';
          ++i;
          while (i < len && tlen < static_cast<int>(sizeof(buf))) {
            char tc = src[i];
            if (lowercase && tc >= 'A' && tc <= 'Z') tc += 32;
            if (!is_lower_alpha(tc)) break;
            buf[tlen++] = tc;
            ++i;
          }
        }
      }
      int32_t* slot = out_row + pos * num_hashes;
      for (int32_t h = 0; h < num_hashes; ++h) {
        slot[h] =
            kNumReserved + static_cast<int32_t>(fnv1a(buf, tlen,
                                                      kHashSeeds[h]) % space);
      }
      ++pos;
    }
    // remaining slots stay kPadId (caller zeroes the buffer)
    (void)kPadId;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------
// Vocab-lookup fast path (corpus-trained vocab tokenizer).
//
// Handle-based: `vocab_create` builds the token->id map once (serving
// calls encode per request; rebuilding a 30k-entry map per call would
// dominate), `vocab_encode_batch` streams texts through it with the
// same [a-z0-9]+(?:'[a-z]+)? tokenization as the hashing path, and OOV
// tokens hash (seed-0 FNV-1a) into the trailing `oov_buckets` ids —
// byte-exact with models/tokenizer.py VocabTokenizer.

#include <string>
#include <unordered_map>

namespace {
struct VocabHandle {
  std::unordered_map<std::string, int32_t> ids;
};
}  // namespace

extern "C" {

// tokens: concatenated UTF-8 bytes; offsets: n+1 boundaries.
// Returned pointer is owned by the caller via vocab_destroy.
void* vocab_create(const char* tokens, const int64_t* offsets, int64_t n) {
  auto* handle = new VocabHandle();
  handle->ids.reserve(static_cast<size_t>(n) * 2);
  for (int64_t i = 0; i < n; ++i) {
    handle->ids.emplace(
        std::string(tokens + offsets[i],
                    static_cast<size_t>(offsets[i + 1] - offsets[i])),
        kNumReserved + static_cast<int32_t>(i));
  }
  return handle;
}

void vocab_destroy(void* handle) {
  delete static_cast<VocabHandle*>(handle);
}

void vocab_encode_batch(const void* handle, const char* texts,
                        const int64_t* offsets, int64_t n,
                        int32_t max_length, int32_t oov_start,
                        int32_t oov_buckets, int32_t lowercase,
                        int32_t add_cls, int32_t* out) {
  const auto& ids = static_cast<const VocabHandle*>(handle)->ids;
  for (int64_t row = 0; row < n; ++row) {
    const char* src = texts + offsets[row];
    const int64_t len = offsets[row + 1] - offsets[row];
    int32_t* out_row = out + row * max_length;
    int32_t pos = 0;
    if (add_cls) {
      out_row[0] = kClsId;
      pos = 1;
    }
    char buf[4096];
    int64_t i = 0;
    while (i < len && pos < max_length) {
      char c = src[i];
      if (lowercase && c >= 'A' && c <= 'Z') c += 32;
      if (!is_lower_alnum(c)) {
        ++i;
        continue;
      }
      int tlen = 0;
      while (i < len && tlen < static_cast<int>(sizeof(buf))) {
        char tc = src[i];
        if (lowercase && tc >= 'A' && tc <= 'Z') tc += 32;
        if (!is_lower_alnum(tc)) break;
        buf[tlen++] = tc;
        ++i;
      }
      if (i + 1 < len && src[i] == '\'') {
        char nc = src[i + 1];
        if (lowercase && nc >= 'A' && nc <= 'Z') nc += 32;
        if (is_lower_alpha(nc)) {
          buf[tlen++] = '\'';
          ++i;
          while (i < len && tlen < static_cast<int>(sizeof(buf))) {
            char tc = src[i];
            if (lowercase && tc >= 'A' && tc <= 'Z') tc += 32;
            if (!is_lower_alpha(tc)) break;
            buf[tlen++] = tc;
            ++i;
          }
        }
      }
      auto it = ids.find(std::string(buf, static_cast<size_t>(tlen)));
      if (it != ids.end()) {
        out_row[pos] = it->second;
      } else {
        out_row[pos] =
            oov_start + static_cast<int32_t>(
                            fnv1a(buf, tlen, kHashSeeds[0]) %
                            static_cast<uint64_t>(oov_buckets));
      }
      ++pos;
    }
  }
}

int32_t tokenizer_abi_version() { return 2; }

}  // extern "C"
