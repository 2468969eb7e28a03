// Native WordPiece tokenizer (BERT-uncased semantics) for the host input
// path.
//
// The reference tokenizes with HF BertTokenizer inside every Dataset
// __getitem__ (reference: pipelines/data_processing/lmdb_dataset.py:273,
// pipelines/model_training/nodes.py:110-127). On this framework's host —
// a single CPU core feeding a TPU — Python-loop tokenization is a real cost
// in the host-fed loader path, so the hot path is C++: basic tokenization
// (clean / whitespace split / punctuation split / lowercase) + greedy
// longest-match WordPiece over a hash-map vocab, batch-encoding straight
// into caller-provided numpy buffers.
//
// Scope: EXACT parity with data/tokenizer.py::WordPieceTokenizer for ASCII
// input (meme text is overwhelmingly ASCII). Texts containing non-ASCII
// bytes are rejected with rc=1 per text and the Python binding falls back to
// the pure-Python implementation for those, so observable behavior is
// always identical to the Python tokenizer. (Full Unicode NFD/category
// tables are what ICU is for; duplicating them here would be bulk without
// speed.)
//
// Build: g++ -O3 -shared -fPIC -std=c++17 (see data/tokenizer_native.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  bool lowercase = true;
  int32_t cls_id = -1, sep_id = -1, pad_id = 0, unk_id = -1;
  int max_chars_per_word = 100;
};

inline bool is_ascii_ws(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

inline bool is_ascii_control(unsigned char c) {
  if (c == '\t' || c == '\n' || c == '\r') return false;
  return c < 0x20 || c == 0x7f;
}

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
         (c >= 123 && c <= 126);
}

// basic_tokenize for ASCII text: clean → whitespace split → lowercase →
// punctuation split (mirrors data/tokenizer.py basic_tokenize; no CJK or
// accent handling needed in the ASCII subset).
void basic_tokenize(const Tokenizer& tok, std::string_view text,
                    std::vector<std::string>* out) {
  std::string word;
  auto flush = [&]() {
    if (!word.empty()) {
      out->push_back(word);
      word.clear();
    }
  };
  for (unsigned char c : text) {
    if (c == 0 || is_ascii_control(c)) continue;
    if (is_ascii_ws(c)) {
      flush();
      continue;
    }
    if (tok.lowercase && c >= 'A' && c <= 'Z') c = c - 'A' + 'a';
    if (is_ascii_punct(c)) {
      flush();
      out->emplace_back(1, static_cast<char>(c));
    } else {
      word.push_back(static_cast<char>(c));
    }
  }
  flush();
}

// Greedy longest-match WordPiece (mirrors data/tokenizer.py wordpiece).
void wordpiece(const Tokenizer& tok, const std::string& word,
               std::vector<int32_t>* ids) {
  if (static_cast<int>(word.size()) > tok.max_chars_per_word) {
    ids->push_back(tok.unk_id);
    return;
  }
  size_t start = 0;
  std::vector<int32_t> pieces;
  std::string probe;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur = -1;
    while (start < end) {
      probe.clear();
      if (start > 0) probe = "##";
      probe.append(word, start, end - start);
      auto it = tok.vocab.find(probe);
      if (it != tok.vocab.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      ids->push_back(tok.unk_id);
      return;
    }
    pieces.push_back(cur);
    start = end;
  }
  ids->insert(ids->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

// vocab: newline-separated tokens, id = line index (the vocab.txt format).
void* mmc_tok_create(const char* vocab_data, size_t vocab_len, int lowercase) {
  auto* tok = new Tokenizer();
  tok->lowercase = lowercase != 0;
  std::string_view data(vocab_data, vocab_len);
  int32_t id = 0;
  size_t pos = 0;
  while (pos <= data.size()) {
    size_t nl = data.find('\n', pos);
    if (nl == std::string_view::npos) nl = data.size();
    std::string_view line = data.substr(pos, nl - pos);
    if (!line.empty() && line.back() == '\r') line.remove_suffix(1);
    if (!line.empty()) tok->vocab.emplace(std::string(line), id);
    ++id;
    if (nl == data.size()) break;
    pos = nl + 1;
  }
  auto get = [&](const char* t) -> int32_t {
    auto it = tok->vocab.find(t);
    return it == tok->vocab.end() ? -1 : it->second;
  };
  tok->cls_id = get("[CLS]");
  tok->sep_id = get("[SEP]");
  tok->unk_id = get("[UNK]");
  int32_t pad = get("[PAD]");
  tok->pad_id = pad < 0 ? 0 : pad;
  if (tok->cls_id < 0 || tok->sep_id < 0 || tok->unk_id < 0) {
    delete tok;
    return nullptr;
  }
  return tok;
}

void mmc_tok_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode one text into ids[max_length] / mask[max_length].
// rc: 0 ok; 1 = non-ASCII input (caller should use the Python fallback).
int mmc_tok_encode(void* handle, const char* text, size_t text_len,
                   int max_length, int32_t* ids, float* mask) {
  const auto& tok = *static_cast<Tokenizer*>(handle);
  std::string_view sv(text, text_len);
  for (unsigned char c : sv)
    if (c >= 0x80) return 1;

  std::vector<std::string> words;
  basic_tokenize(tok, sv, &words);
  std::vector<int32_t> piece_ids;
  piece_ids.reserve(words.size() + 2);
  for (const auto& w : words) {
    wordpiece(tok, w, &piece_ids);
    if (static_cast<int>(piece_ids.size()) >= max_length - 2) break;
  }
  int body = std::min<int>(piece_ids.size(), max_length - 2);
  int n = 0;
  ids[n++] = tok.cls_id;
  for (int i = 0; i < body; ++i) ids[n++] = piece_ids[i];
  ids[n++] = tok.sep_id;
  for (int i = 0; i < n; ++i) mask[i] = 1.0f;
  for (int i = n; i < max_length; ++i) {
    ids[i] = tok.pad_id;
    mask[i] = 0.0f;
  }
  return 0;
}

// Batch encode: texts are concatenated with offsets[n+1] delimiting them.
// out_ids is [n, max_length] int32, out_mask [n, max_length] float32,
// rcs[n] per-text return codes (see mmc_tok_encode).
void mmc_tok_encode_batch(void* handle, const char* texts,
                          const int64_t* offsets, int n, int max_length,
                          int32_t* out_ids, float* out_mask, int32_t* rcs) {
  for (int i = 0; i < n; ++i) {
    rcs[i] = mmc_tok_encode(handle, texts + offsets[i],
                            static_cast<size_t>(offsets[i + 1] - offsets[i]),
                            max_length, out_ids + int64_t(i) * max_length,
                            out_mask + int64_t(i) * max_length);
  }
}

}  // extern "C"
