// Native host-side kernels for tpualign.
//
// The reference has no first-party native code (SURVEY.md §2.2); its native
// heavy lifting lived in third-party binaries (pgvector's C cosine ops,
// MuPDF). In the rebuild, device math is JAX/XLA/Pallas; these C++ kernels
// cover the *host-side* hot loops that feed the TPU:
//
//  - lexical_counts: substring-match counting of a noun vocabulary against
//    chunk texts (the string-domain half of the lexical weak-supervision
//    score, ref:src/insert_clip_embeddings.py:144-156). O(V*C*len) in
//    Python; memchr-accelerated here.
//  - topk_merge: k-way merge of per-shard top-k candidate lists when
//    retrieval results come back from the mesh.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Count, for each text, how many terms appear as substrings.
// texts/terms are UTF-8, caller pre-lowercases. out has n_texts entries.
void tpua_lexical_counts(const char** texts, int32_t n_texts,
                         const char** terms, int32_t n_terms,
                         int32_t* out) {
  for (int32_t i = 0; i < n_texts; ++i) {
    const char* text = texts[i];
    const size_t text_len = strlen(text);
    int32_t count = 0;
    for (int32_t j = 0; j < n_terms; ++j) {
      const char* term = terms[j];
      const size_t term_len = strlen(term);
      if (term_len == 0 || term_len > text_len) continue;
      // memchr-skip scan: find first-byte candidates, memcmp the rest.
      const char first = term[0];
      const char* p = text;
      const char* end = text + text_len - term_len + 1;
      while (p < end) {
        p = static_cast<const char*>(memchr(p, first, end - p));
        if (p == nullptr) break;
        if (memcmp(p, term, term_len) == 0) {
          ++count;
          break;
        }
        ++p;
      }
    }
    out[i] = count;
  }
}

// Merge per-row candidate lists into global top-k.
// vals/idx: (rows, cols) row-major — cols = n_shards * k_local candidates.
// out_vals/out_idx: (rows, k). Descending by value; ties by ascending index
// (the deterministic tie-break pinned in tpualign.ops.similarity).
void tpua_topk_merge(const float* vals, const int64_t* idx,
                     int32_t rows, int32_t cols, int32_t k,
                     float* out_vals, int64_t* out_idx) {
  std::vector<int32_t> order(cols);
  for (int32_t r = 0; r < rows; ++r) {
    const float* v = vals + static_cast<int64_t>(r) * cols;
    const int64_t* id = idx + static_cast<int64_t>(r) * cols;
    for (int32_t c = 0; c < cols; ++c) order[c] = c;
    const int32_t kk = std::min(k, cols);
    std::partial_sort(order.begin(), order.begin() + kk, order.end(),
                      [&](int32_t a, int32_t b) {
                        if (v[a] != v[b]) return v[a] > v[b];
                        return id[a] < id[b];
                      });
    for (int32_t j = 0; j < kk; ++j) {
      out_vals[static_cast<int64_t>(r) * k + j] = v[order[j]];
      out_idx[static_cast<int64_t>(r) * k + j] = id[order[j]];
    }
    for (int32_t j = kk; j < k; ++j) {
      out_vals[static_cast<int64_t>(r) * k + j] = -1e30f;
      out_idx[static_cast<int64_t>(r) * k + j] = -1;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// BPE merge loop (the tokenizer hot path).
//
// Works at the symbol-id level: Python precomputes byte->base-id tables and
// the merge triples (left_id, right_id, merged_id, rank); the C++ side runs
// the greedy lowest-rank merge loop per word. One instance per merges table.

#include <unordered_map>

namespace {

struct BpeTable {
  // (left<<32 | right) -> (rank, merged_id)
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> merges;
};

inline uint64_t pair_key(int32_t l, int32_t r) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(l)) << 32) |
         static_cast<uint32_t>(r);
}

}  // namespace

extern "C" {

void* tpua_bpe_create(const int32_t* lefts, const int32_t* rights,
                      const int32_t* merged, int32_t n_merges) {
  auto* table = new BpeTable();
  table->merges.reserve(static_cast<size_t>(n_merges) * 2);
  for (int32_t i = 0; i < n_merges; ++i) {
    table->merges.emplace(pair_key(lefts[i], rights[i]),
                          std::make_pair(i, merged[i]));
  }
  return table;
}

void tpua_bpe_destroy(void* handle) {
  delete static_cast<BpeTable*>(handle);
}

// In-place greedy merge. symbols: initial ids (byte ids, last already the
// </w> variant); n: initial count. Returns the final symbol count.
int32_t tpua_bpe_word(void* handle, int32_t* symbols, int32_t n) {
  auto* table = static_cast<BpeTable*>(handle);
  if (n < 2) return n;
  while (n >= 2) {
    int32_t best_rank = INT32_MAX;
    int32_t best_pos = -1;
    int32_t best_id = -1;
    for (int32_t i = 0; i + 1 < n; ++i) {
      auto it = table->merges.find(pair_key(symbols[i], symbols[i + 1]));
      if (it != table->merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_pos = i;
        best_id = it->second.second;
      }
    }
    if (best_pos < 0) break;
    // merge ALL (non-overlapping, left-to-right) occurrences of that pair —
    // matching the reference algorithm's whole-word pass per bigram.
    const int32_t l = symbols[best_pos];
    const int32_t r = symbols[best_pos + 1];
    int32_t w = 0;
    for (int32_t i = 0; i < n;) {
      if (i + 1 < n && symbols[i] == l && symbols[i + 1] == r) {
        symbols[w++] = best_id;
        i += 2;
      } else {
        symbols[w++] = symbols[i++];
      }
    }
    n = w;
  }
  return n;
}

}  // extern "C"
