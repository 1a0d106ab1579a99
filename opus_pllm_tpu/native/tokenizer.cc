// Native host-side data plumbing: ESM2 amino-acid tokenization + batch
// padding, exposed through a C ABI for ctypes.
//
// The eval/precompute pipelines tokenize millions of protein sequences on
// the host before anything reaches the TPU (reference does this through
// fair-esm's Python batch converter, cstp_v3/modelling.py:37-57); this is
// the C++ fast path — one pass per sequence, no Python object churn. The
// Python fallback in native/__init__.py keeps behavior identical.
//
// Alphabet must match opus_pllm_tpu/models/esm2.py ALPHABET (fair-esm
// ESM-1b/ESM2 ordering): <cls>=0 <pad>=1 <eos>=2 <unk>=3, residues from 4.

#include <cstdint>
#include <cstring>

namespace {

constexpr int32_t kCls = 0;
constexpr int32_t kPad = 1;
constexpr int32_t kEos = 2;
constexpr int32_t kUnk = 3;

// lookup table: ASCII byte -> token id (uppercase handled by folding)
struct AlphabetTable {
  int32_t map[256];
  AlphabetTable() {
    for (int i = 0; i < 256; ++i) map[i] = kUnk;
    const char* tokens = "LAGVSERTIDPKQNFYMHWCXBUZO.-";
    for (int i = 0; tokens[i]; ++i) {
      unsigned char c = static_cast<unsigned char>(tokens[i]);
      map[c] = 4 + i;
      if (c >= 'A' && c <= 'Z') map[c - 'A' + 'a'] = 4 + i;  // lowercase fold
    }
  }
};
const AlphabetTable kTable;

}  // namespace

extern "C" {

// Tokenize a batch of sequences into a right-padded (n, max_len) int32
// buffer: <cls> seq <eos>, padded with <pad>; sequences longer than
// max_len - 2 truncate (keeping <cls>, dropping the tail before <eos> when
// it no longer fits — matching the Python `e[:pad_to]` slice semantics).
//
// seqs:      concatenated sequence bytes
// offsets:   (n + 1) byte offsets into seqs
// out:       (n * max_len) int32, caller-allocated
// lengths:   (n) int32 non-pad token counts, caller-allocated
void esm_tokenize_batch(const char* seqs, const int64_t* offsets, int64_t n,
                        int64_t max_len, int32_t* out, int32_t* lengths) {
  for (int64_t i = 0; i < n; ++i) {
    const char* s = seqs + offsets[i];
    int64_t slen = offsets[i + 1] - offsets[i];
    int32_t* row = out + i * max_len;
    int64_t pos = 0;
    if (pos < max_len) row[pos++] = kCls;
    for (int64_t j = 0; j < slen && pos < max_len; ++j) {
      row[pos++] = kTable.map[static_cast<unsigned char>(s[j])];
    }
    if (pos < max_len) {
      row[pos++] = kEos;
    } else if (slen + 2 > max_len) {
      // truncation: the Python path slices the encoded list, so the final
      // slot holds a residue, not <eos>; keep identical behavior (row full).
    }
    lengths[i] = static_cast<int32_t>(pos);
    for (; pos < max_len; ++pos) row[pos] = kPad;
  }
}

// Left/right pad a ragged int32 id batch into (n, pad_to); mask_out gets
// 1 at valid slots. Truncation keeps the tail when left-padding and the
// head when right-padding (infer/tokenization.pad_batch semantics).
void pad_id_batch(const int32_t* ids, const int64_t* offsets, int64_t n,
                  int64_t pad_to, int32_t pad_id, int32_t left,
                  int32_t* out, uint8_t* mask_out) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* s = ids + offsets[i];
    int64_t slen = offsets[i + 1] - offsets[i];
    const int32_t* src = s;
    if (slen > pad_to) {
      if (left) src = s + (slen - pad_to);
      slen = pad_to;
    }
    int32_t* row = out + i * pad_to;
    uint8_t* mrow = mask_out + i * pad_to;
    int64_t start = left ? pad_to - slen : 0;
    for (int64_t j = 0; j < pad_to; ++j) {
      row[j] = pad_id;
      mrow[j] = 0;
    }
    std::memcpy(row + start, src, slen * sizeof(int32_t));
    for (int64_t j = 0; j < slen; ++j) mrow[start + j] = 1;
  }
}

int32_t opus_native_abi_version() { return 1; }

}  // extern "C"
