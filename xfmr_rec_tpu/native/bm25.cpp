// Native BM25 full-text index (build + search) for item/user metadata.
//
// The reference's FTS capability lives inside LanceDB's Rust engine
// (/root/reference/xfmr_rec/data/lightning.py:221,298); this is the
// framework's native equivalent behind the same BM25Index surface
// (index/mips.py). Semantics mirror the Python implementation exactly:
// tokens = [a-z0-9]+ runs of the lowercased text, Okapi BM25 with
// k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)), empty docs
// count length 1, results are positive-score rows ordered by
// (score desc, row asc).
//
// Marshaling follows tokenizer.cpp: documents arrive as one UTF-8 blob
// + (n_docs + 1) offsets; the handle owns the postings. Thread-safe
// for concurrent searches after build (read-only state).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kK1 = 1.2;
constexpr double kB = 0.75;

struct Posting {
  int32_t row;
  int32_t tf;
};

struct BM25Handle {
  std::unordered_map<std::string, std::vector<Posting>> postings;
  std::vector<float> doc_lens;
  double avg_len = 1.0;
};

// [a-z0-9]+ runs of the lowercased bytes — identical to the Python
// re.compile(r"[a-z0-9]+").findall(text.lower()) for ASCII; non-ASCII
// bytes never match either implementation's class.
template <typename Fn>
void tokenize(const char* text, int64_t len, Fn&& emit) {
  std::string tok;
  for (int64_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (c >= 'A' && c <= 'Z') c = static_cast<unsigned char>(c - 'A' + 'a');
    bool word = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
    if (word) {
      tok.push_back(static_cast<char>(c));
    } else if (!tok.empty()) {
      emit(tok);
      tok.clear();
    }
  }
  if (!tok.empty()) emit(tok);
}

}  // namespace

extern "C" {

int32_t bm25_abi_version() { return 1; }

void* bm25_create(const char* blob, const int64_t* offsets,
                  int64_t n_docs) {
  auto* handle = new BM25Handle();
  handle->doc_lens.resize(static_cast<size_t>(n_docs), 1.0f);
  std::unordered_map<std::string, int32_t> counts;
  double total_len = 0.0;
  for (int64_t row = 0; row < n_docs; ++row) {
    counts.clear();
    int64_t len = offsets[row + 1] - offsets[row];
    int32_t n_tokens = 0;
    tokenize(blob + offsets[row], len, [&](const std::string& tok) {
      ++counts[tok];
      ++n_tokens;
    });
    handle->doc_lens[static_cast<size_t>(row)] =
        static_cast<float>(n_tokens ? n_tokens : 1);
    total_len += handle->doc_lens[static_cast<size_t>(row)];
    for (const auto& [tok, tf] : counts) {
      handle->postings[tok].push_back(
          {static_cast<int32_t>(row), tf});
    }
  }
  handle->avg_len = n_docs ? total_len / static_cast<double>(n_docs) : 1.0;
  // postings in row order (insertion preserves it; enforce anyway so
  // accumulation order is deterministic)
  for (auto& [tok, plist] : handle->postings) {
    std::sort(plist.begin(), plist.end(),
              [](const Posting& a, const Posting& b) {
                return a.row < b.row;
              });
  }
  return handle;
}

void bm25_destroy(void* ptr) { delete static_cast<BM25Handle*>(ptr); }

// Returns the number of results written (<= top_k): positive-score rows
// ordered by (score desc, row asc).
int32_t bm25_search(void* ptr, const char* query, int64_t query_len,
                    int32_t top_k, int32_t* out_rows, float* out_scores) {
  auto* handle = static_cast<BM25Handle*>(ptr);
  const int64_t n_docs = static_cast<int64_t>(handle->doc_lens.size());
  if (n_docs == 0 || top_k <= 0) return 0;
  std::vector<float> scores(static_cast<size_t>(n_docs), 0.0f);
  tokenize(query, query_len, [&](const std::string& tok) {
    auto it = handle->postings.find(tok);
    if (it == handle->postings.end()) return;
    const auto& plist = it->second;
    const double df = static_cast<double>(plist.size());
    const double idf =
        std::log(1.0 + (static_cast<double>(n_docs) - df + 0.5) / (df + 0.5));
    for (const Posting& p : plist) {
      const double denom =
          p.tf + kK1 * (1.0 - kB +
                        kB * handle->doc_lens[static_cast<size_t>(p.row)] /
                            handle->avg_len);
      scores[static_cast<size_t>(p.row)] += static_cast<float>(
          idf * p.tf * (kK1 + 1.0) / denom);
    }
  });
  std::vector<int32_t> rows;
  rows.reserve(256);
  for (int64_t row = 0; row < n_docs; ++row) {
    if (scores[static_cast<size_t>(row)] > 0.0f)
      rows.push_back(static_cast<int32_t>(row));
  }
  const size_t keep = std::min<size_t>(rows.size(),
                                       static_cast<size_t>(top_k));
  std::partial_sort(
      rows.begin(), rows.begin() + static_cast<int64_t>(keep), rows.end(),
      [&](int32_t a, int32_t b) {
        float sa = scores[static_cast<size_t>(a)];
        float sb = scores[static_cast<size_t>(b)];
        if (sa != sb) return sa > sb;
        return a < b;
      });
  for (size_t i = 0; i < keep; ++i) {
    out_rows[i] = rows[i];
    out_scores[i] = scores[static_cast<size_t>(rows[i])];
  }
  return static_cast<int32_t>(keep);
}

}  // extern "C"
