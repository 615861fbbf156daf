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
