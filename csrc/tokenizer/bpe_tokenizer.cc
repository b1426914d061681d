// SentencePiece-compatible tokenizer — native engine (all four model
// types: unigram / BPE / word / char).
//
// The reference vendors the full SentencePiece C++ library (~13k LoC,
// sentencepiece/src) and calls it through SWIG bindings (util/conf.py:473).
// This is our from-scratch replacement: read the binary `.model` protobuf
// directly, normalize through the model's precompiled charsmap (the
// artifacts embed nmt_nfkc), encode with the model type's algorithm
// (agenda-based best-pair merge for BPE, Viterbi max-likelihood for
// unigram, per-word / per-char lookup otherwise), decode pieces to text.
// Exposed as a plain C API for ctypes (no pybind11 in the image); the
// `eet_bpe_` prefix is kept for ABI stability across model types.
//
// Byte-compatibility is pinned by tests against the reference artifacts
// (sentencepiece/build/libri.bpe-256.*, python/test/test_model.model)
// and the 89k-entry golden lexicon; engine semantics are pinned by
// cross-checks against the pure-Python oracle (tokenizer/spm.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

#include "charsmap.h"

namespace {

using eet_spm::Charsmap;

constexpr int kNormal = 1, kUnknown = 2, kControl = 3, kUserDefined = 4,
              kByte = 6;

size_t utf8_len(uint8_t b);

struct Piece {
  std::string text;
  float score = 0.f;
  int type = kNormal;
};

// ---------------------------------------------------------------- proto ---
struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;
  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      v |= uint64_t(b & 0x7f) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
    ok = false;
    return v;
  }
};

struct Model {
  std::vector<Piece> pieces;
  std::unordered_map<std::string, int> piece_to_id;
  std::unordered_map<std::string, float> merge_score;
  std::vector<std::string> user_defined;
  Charsmap charsmap;
  int unk_id = 0, bos_id = 1, eos_id = 2, pad_id = -1;
  bool add_dummy_prefix = true, remove_extra_ws = true;
  // TrainerSpec.model_type: UNIGRAM=1 (proto default), BPE=2, WORD=3,
  // CHAR=4 — all four are supported; anything else is rejected at load.
  int model_type = 1;
  // unigram: unk penalty and Viterbi window (chars)
  double unk_score = -10.0;
  size_t max_piece_chars = 1;
  // byte fallback (TrainerSpec.byte_fallback, field 35): unknown
  // surfaces encode through the 256 <0xXX> BYTE pieces
  bool byte_fallback = false;
  int byte_ids[256];       // byte value -> piece id (-1 when absent)
  std::vector<int> id_byte;  // piece id -> byte value (-1 for non-byte)
};

void parse_piece(const uint8_t* buf, size_t len, Piece* out) {
  Reader r{buf, buf + len};
  while (r.p < r.end && r.ok) {
    uint64_t key = r.varint();
    int field = int(key >> 3), wt = int(key & 7);
    if (wt == 2) {
      uint64_t n = r.varint();
      if (r.p + n > r.end) return;
      if (field == 1) out->text.assign((const char*)r.p, n);
      r.p += n;
    } else if (wt == 5) {
      if (field == 2) memcpy(&out->score, r.p, 4);
      r.p += 4;
    } else if (wt == 0) {
      uint64_t v = r.varint();
      if (field == 3) out->type = int(v);
    } else if (wt == 1) {
      r.p += 8;
    } else {
      return;
    }
  }
}

void parse_spec(const uint8_t* buf, size_t len, Model* m, bool trainer) {
  Reader r{buf, buf + len};
  while (r.p < r.end && r.ok) {
    uint64_t key = r.varint();
    int field = int(key >> 3), wt = int(key & 7);
    if (wt == 2) {
      uint64_t n = r.varint();
      if (r.p + n > r.end) return;
      if (!trainer && field == 2 && n > 0)   // precompiled_charsmap
        m->charsmap.load(r.p, size_t(n));
      r.p += n;
    } else if (wt == 0) {
      uint64_t v = r.varint();
      if (trainer) {
        if (field == 3) m->model_type = int(v);
        if (field == 35) m->byte_fallback = v != 0;
        if (field == 40) m->unk_id = int(v);
        if (field == 41) m->bos_id = int(v);
        if (field == 42) m->eos_id = int(v);
        if (field == 43) m->pad_id = int(v);
      } else {
        if (field == 3) m->add_dummy_prefix = v != 0;
        if (field == 4) m->remove_extra_ws = v != 0;
      }
    } else if (wt == 5) {
      r.p += 4;
    } else if (wt == 1) {
      r.p += 8;
    } else {
      return;
    }
  }
}

Model* load_model(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return nullptr;
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  auto* m = new Model();
  Reader r{buf.data(), buf.data() + buf.size()};
  while (r.p < r.end && r.ok) {
    uint64_t key = r.varint();
    int field = int(key >> 3), wt = int(key & 7);
    if (wt == 2) {
      uint64_t n = r.varint();
      if (r.p + n > r.end) break;
      if (field == 1) {
        Piece pc;
        parse_piece(r.p, n, &pc);
        m->pieces.push_back(std::move(pc));
      } else if (field == 2) {
        parse_spec(r.p, n, m, true);
      } else if (field == 3) {
        parse_spec(r.p, n, m, false);
      }
      r.p += n;
    } else if (wt == 0) {
      r.varint();
    } else if (wt == 5) {
      r.p += 4;
    } else if (wt == 1) {
      r.p += 8;
    } else {
      break;
    }
  }
  float min_normal_score = 0.f;
  bool any_normal = false;
  for (int b = 0; b < 256; ++b) m->byte_ids[b] = -1;
  m->id_byte.assign(m->pieces.size(), -1);
  int n_bytes = 0;
  for (size_t i = 0; i < m->pieces.size(); ++i) {
    const Piece& pc = m->pieces[i];
    m->piece_to_id.emplace(pc.text, int(i));
    if (pc.type == kNormal || pc.type == kUserDefined)
      m->merge_score[pc.text] = pc.score;
    if (pc.type == kNormal) {
      if (!any_normal || pc.score < min_normal_score)
        min_normal_score = pc.score;
      any_normal = true;
    }
    if (pc.type == kUserDefined) m->user_defined.push_back(pc.text);
    if (pc.type == kByte) {
      // byte pieces are named <0xXX> (model_interface.cc:193)
      const std::string& t = pc.text;
      auto hex = [](char c) -> int {
        if (c >= '0' && c <= '9') return c - '0';
        if (c >= 'A' && c <= 'F') return c - 'A' + 10;
        if (c >= 'a' && c <= 'f') return c - 'a' + 10;
        return -1;
      };
      int b = -1;
      if (t.size() == 6 && t.compare(0, 3, "<0x") == 0 && t[5] == '>' &&
          hex(t[3]) >= 0 && hex(t[4]) >= 0)
        b = hex(t[3]) * 16 + hex(t[4]);
      if (b < 0 || !m->byte_fallback) {  // invalid or unexpected BYTE
        delete m;
        return nullptr;
      }
      if (m->byte_ids[b] < 0) ++n_bytes;
      m->byte_ids[b] = int(i);
      m->id_byte[i] = b;
    }
  }
  if (m->byte_fallback && n_bytes != 256) {  // spm: all 256 required
    delete m;
    return nullptr;
  }
  // unigram: unk penalty below the worst in-vocab piece (spm semantics)
  m->unk_score = double(any_normal ? min_normal_score : 0.f) - 10.0;
  for (const auto& kv : m->merge_score) {
    size_t chars = 0;
    for (size_t i = 0; i < kv.first.size();
         i += utf8_len(uint8_t(kv.first[i])))
      ++chars;
    if (chars > m->max_piece_chars) m->max_piece_chars = chars;
  }
  if (m->model_type < 1 || m->model_type > 4) {  // unknown type: fail loud
    delete m;
    return nullptr;
  }
  return m;
}

// -------------------------------------------------------------- encoding ---
const char* kWs = "\xe2\x96\x81";  // ▁ U+2581

// charsmap + whitespace collapse, before dummy-prefix/▁-escaping (this
// half is what spm_normalize outputs; the C API exposes it)
std::string normalize_plain(const Model& m, const std::string& text_in) {
  std::string text;
  if (!m.charsmap.empty()) {
    // longest-match replacement through the model's charsmap (nmt_nfkc
    // in the reference artifacts); unmatched UTF-8 chars copy through
    text.reserve(text_in.size());
    size_t i = 0;
    while (i < text_in.size()) {
      size_t mlen, rlen;
      const char* repl;
      if (m.charsmap.longest_match(text_in.data(), text_in.size(), i,
                                   &mlen, &repl, &rlen)) {
        text.append(repl, rlen);
        i += mlen;
      } else {
        size_t n = utf8_len(uint8_t(text_in[i]));
        if (i + n > text_in.size()) n = 1;
        text.append(text_in, i, n);
        i += n;
      }
    }
  } else {
    text = text_in;
  }
  std::string collapsed;
  collapsed.reserve(text.size() + 4);
  bool prev_space = true;  // strips leading spaces
  for (char c : text) {
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      if (!prev_space) collapsed.push_back(' ');
      prev_space = true;
    } else {
      collapsed.push_back(c);
      prev_space = false;
    }
  }
  if (m.remove_extra_ws && !collapsed.empty() &&
      collapsed.back() == ' ')
    collapsed.pop_back();
  return collapsed;
}

std::string normalize(const Model& m, const std::string& text_in) {
  std::string collapsed = normalize_plain(m, text_in);
  std::string out;
  if (m.add_dummy_prefix && !collapsed.empty()) out = " " + collapsed;
  else out = collapsed;
  std::string esc;
  esc.reserve(out.size() * 2);
  for (char c : out) {
    if (c == ' ') esc += kWs;
    else esc.push_back(c);
  }
  return esc;
}

size_t utf8_len(uint8_t b) {
  if (b < 0x80) return 1;
  if ((b >> 5) == 0x6) return 2;
  if ((b >> 4) == 0xe) return 3;
  if ((b >> 3) == 0x1e) return 4;
  return 1;
}

// Agenda-based merge: repeatedly merge the adjacent pair whose merged
// string is in the vocab with the highest score; ties -> leftmost.
struct Sym {
  int prev, next;
  const char* p;
  size_t len;
  bool alive = true;
};

struct Cand {
  float score;
  int left;
  size_t merged_len;
  bool operator<(const Cand& o) const {
    if (score != o.score) return score < o.score;   // max-heap by score
    return left > o.left;                           // then leftmost
  }
};

void bpe_segment(const Model& m, const std::string& chunk,
                 std::vector<std::string>* out) {
  std::vector<Sym> syms;
  size_t i = 0;
  while (i < chunk.size()) {
    size_t n = utf8_len(uint8_t(chunk[i]));
    if (i + n > chunk.size()) n = 1;
    Sym s;
    s.prev = int(syms.size()) - 1;
    s.next = int(syms.size()) + 1;
    s.p = chunk.data() + i;
    s.len = n;
    syms.push_back(s);
    i += n;
  }
  if (!syms.empty()) syms.back().next = -1;

  std::priority_queue<Cand> agenda;
  auto push_pair = [&](int left) {
    if (left < 0) return;
    int right = syms[left].next;
    if (right < 0) return;
    std::string merged(syms[left].p,
                       syms[left].len + syms[right].len);
    auto it = m.merge_score.find(merged);
    if (it != m.merge_score.end())
      agenda.push({it->second, left, merged.size()});
  };
  for (int k = 0; k + 1 < int(syms.size()); ++k) push_pair(k);

  while (!agenda.empty()) {
    Cand c = agenda.top();
    agenda.pop();
    Sym& L = syms[c.left];
    if (!L.alive) continue;
    int ri = L.next;
    if (ri < 0) continue;
    Sym& R = syms[ri];
    if (!R.alive || L.len + R.len != c.merged_len) continue;
    // merge R into L
    L.len += R.len;
    R.alive = false;
    L.next = R.next;
    if (R.next >= 0) syms[R.next].prev = c.left;
    push_pair(L.prev);
    push_pair(c.left);
  }
  for (const Sym& s : syms)
    if (s.alive) out->emplace_back(s.p, s.len);
}

// Unigram: Viterbi max-likelihood segmentation over UTF-8 characters.
// Unknown characters connect the lattice with unk_score; adjacent
// unknowns merge into one unk piece. Mirrors tokenizer/spm.py exactly
// (same iteration order and strict-improvement updates, so ties break
// identically across engines).
void unigram_segment(const Model& m, const std::string& chunk,
                     std::vector<std::string>* out) {
  std::vector<size_t> bnd;  // byte offset of each char start, plus end
  for (size_t i = 0; i < chunk.size();) {
    bnd.push_back(i);
    size_t n = utf8_len(uint8_t(chunk[i]));
    i += (i + n > chunk.size()) ? 1 : n;
  }
  bnd.push_back(chunk.size());
  size_t n = bnd.size() - 1;
  if (n == 0) return;

  const double neg_inf = -HUGE_VAL;
  std::vector<double> best(n + 1, neg_inf);
  std::vector<int> back(n + 1, -1);
  std::vector<uint8_t> via_unk(n + 1, 0);
  best[0] = 0.0;
  for (size_t i = 0; i < n; ++i) {
    if (best[i] == neg_inf) continue;
    size_t limit = std::min(n, i + m.max_piece_chars);
    for (size_t j = i + 1; j <= limit; ++j) {
      std::string piece = chunk.substr(bnd[i], bnd[j] - bnd[i]);
      auto it = m.merge_score.find(piece);
      if (it != m.merge_score.end() &&
          best[i] + double(it->second) > best[j]) {
        best[j] = best[i] + double(it->second);
        back[j] = int(i);
        via_unk[j] = 0;
      }
    }
    if (best[i] + m.unk_score > best[i + 1]) {
      best[i + 1] = best[i] + m.unk_score;
      back[i + 1] = int(i);
      via_unk[i + 1] = 1;
    }
  }
  std::vector<std::pair<std::string, bool>> rev;
  for (size_t j = n; j > 0;) {
    size_t i = size_t(back[j]);
    rev.emplace_back(chunk.substr(bnd[i], bnd[j] - bnd[i]), via_unk[j]);
    j = i;
  }
  bool prev_unk = false;
  for (auto it = rev.rbegin(); it != rev.rend(); ++it) {
    if (it->second && prev_unk)
      out->back() += it->first;
    else
      out->push_back(it->first);
    prev_unk = it->second;
  }
}

// Char model: one piece per normalized character.
void char_segment(const std::string& norm, std::vector<std::string>* out) {
  for (size_t i = 0; i < norm.size();) {
    size_t n = utf8_len(uint8_t(norm[i]));
    if (i + n > norm.size()) n = 1;
    out->emplace_back(norm, i, n);
    i += n;
  }
}

// Word model: split on the ▁ markers; each word keeps its leading ▁.
void word_segment(const std::string& norm, std::vector<std::string>* out) {
  size_t i = 0;
  std::string cur;
  auto flush = [&] {
    if (!cur.empty()) {
      out->push_back(std::string(kWs) + cur);
      cur.clear();
    }
  };
  while (i < norm.size()) {
    if (norm.compare(i, 3, kWs) == 0) {
      flush();
      i += 3;
    } else {
      size_t n = utf8_len(uint8_t(norm[i]));
      if (i + n > norm.size()) n = 1;
      cur.append(norm, i, n);
      i += n;
    }
  }
  flush();
}

std::vector<std::string> encode_pieces(const Model& m,
                                       const std::string& text) {
  std::string norm = normalize(m, text);
  std::vector<std::string> pieces;
  if (m.model_type == 3) {  // WORD
    word_segment(norm, &pieces);
    return pieces;
  }
  if (m.model_type == 4) {  // CHAR
    char_segment(norm, &pieces);
    return pieces;
  }
  size_t i = 0;
  std::string buf;
  while (i < norm.size()) {
    const std::string* matched = nullptr;
    for (const auto& ud : m.user_defined) {
      if (norm.compare(i, ud.size(), ud) == 0) {
        matched = &ud;
        break;
      }
    }
    if (matched) {
      if (!buf.empty()) {
        if (m.model_type == 1)
          unigram_segment(m, buf, &pieces);
        else
          bpe_segment(m, buf, &pieces);
        buf.clear();
      }
      pieces.push_back(*matched);
      i += matched->size();
    } else {
      size_t n = utf8_len(uint8_t(norm[i]));
      buf.append(norm, i, n);
      i += n;
    }
  }
  if (!buf.empty()) {
    if (m.model_type == 1)
      unigram_segment(m, buf, &pieces);
    else
      bpe_segment(m, buf, &pieces);
  }
  return pieces;
}

}  // namespace

// ----------------------------------------------------------------- C API ---
extern "C" {

void* eet_bpe_load(const char* path) { return load_model(path); }

// Normalization only (charsmap + whitespace collapse) — the
// spm_normalize surface for a loaded model's rule set.
int eet_bpe_normalize(void* h, const char* text, char* out, int max_out) {
  auto* m = static_cast<Model*>(h);
  std::string norm = normalize_plain(*m, text);
  int n = int(norm.size());
  if (n >= max_out) return -1;
  memcpy(out, norm.data(), n);
  out[n] = 0;
  return n;
}

void eet_bpe_free(void* h) { delete static_cast<Model*>(h); }

int eet_bpe_piece_size(void* h) {
  return int(static_cast<Model*>(h)->pieces.size());
}

int eet_bpe_special(void* h, int which) {
  auto* m = static_cast<Model*>(h);
  switch (which) {
    case 0: return m->unk_id;
    case 1: return m->bos_id;
    case 2: return m->eos_id;
    case 3: return m->pad_id;
  }
  return -1;
}

int eet_bpe_piece_type(void* h, int id) {
  auto* m = static_cast<Model*>(h);
  if (id < 0 || id >= int(m->pieces.size())) return -1;
  return m->pieces[id].type;
}

int eet_bpe_id_to_piece(void* h, int id, char* out, int max_out) {
  auto* m = static_cast<Model*>(h);
  if (id < 0 || id >= int(m->pieces.size())) return -1;
  const std::string& s = m->pieces[id].text;
  int n = int(s.size());
  if (n >= max_out) return -1;
  memcpy(out, s.data(), n);
  out[n] = 0;
  return n;
}

// Length-delimited variant: embedded NUL bytes are legal input (they
// encode through the <0x00> piece when byte_fallback is on).
int eet_bpe_encode_n(void* h, const char* text, long text_len,
                     int* out_ids, int max_out) {
  auto* m = static_cast<Model*>(h);
  auto pieces = encode_pieces(
      *m, std::string(text, size_t(text_len < 0 ? 0 : text_len)));
  int n = 0;
  for (const auto& p : pieces) {
    auto it = m->piece_to_id.find(p);
    int id = it == m->piece_to_id.end() ? m->unk_id : it->second;
    if (id == m->unk_id && m->byte_fallback) {
      // decompose the unknown surface into UTF-8 byte pieces
      // (sentencepiece_processor.cc:576-598)
      for (unsigned char c : p) {
        if (n >= max_out) return -1;
        out_ids[n++] = m->byte_ids[c];
      }
      continue;
    }
    if (n >= max_out) return -1;
    out_ids[n++] = id;
  }
  return n;
}

int eet_bpe_encode(void* h, const char* text, int* out_ids, int max_out) {
  return eet_bpe_encode_n(h, text, long(strlen(text)), out_ids, max_out);
}

// Strict UTF-8 validation over a byte-piece run: valid characters copy
// through; every structurally invalid byte (bad trail byte, overlong,
// surrogate, out of range, truncated) becomes one U+FFFD — mirrors
// sentencepiece's DecodeUTF8 (util.cc:44) + ProcessBytePieces
// (sentencepiece_processor.cc:819-869).
std::string decode_byte_run(const std::string& bs) {
  auto trail = [](unsigned char c) { return (c & 0xC0) == 0x80; };
  auto valid_cp = [](uint32_t cp) {
    return cp < 0xD800 || (cp >= 0xE000 && cp <= 0x10FFFF);
  };
  std::string out;
  out.reserve(bs.size());
  size_t i = 0, n = bs.size();
  while (i < n) {
    unsigned char b0 = bs[i];
    if (b0 < 0x80) {
      out.push_back(char(b0));
      ++i;
      continue;
    }
    if ((b0 & 0xE0) == 0xC0 && i + 1 < n) {
      unsigned char b1 = bs[i + 1];
      uint32_t cp = ((b0 & 0x1F) << 6) | (b1 & 0x3F);
      if (trail(b1) && cp >= 0x80 && valid_cp(cp)) {
        out.append(bs, i, 2);
        i += 2;
        continue;
      }
    }
    if ((b0 & 0xF0) == 0xE0 && i + 2 < n) {
      unsigned char b1 = bs[i + 1], b2 = bs[i + 2];
      uint32_t cp = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F);
      if (trail(b1) && trail(b2) && cp >= 0x800 && valid_cp(cp)) {
        out.append(bs, i, 3);
        i += 3;
        continue;
      }
    }
    if ((b0 & 0xF8) == 0xF0 && i + 3 < n) {
      unsigned char b1 = bs[i + 1], b2 = bs[i + 2], b3 = bs[i + 3];
      uint32_t cp = ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) |
                    ((b2 & 0x3F) << 6) | (b3 & 0x3F);
      if (trail(b1) && trail(b2) && trail(b3) && cp >= 0x10000 &&
          valid_cp(cp)) {
        out.append(bs, i, 4);
        i += 4;
        continue;
      }
    }
    out += "\xEF\xBF\xBD";  // U+FFFD
    ++i;
  }
  return out;
}

int eet_bpe_decode(void* h, const int* ids, int n, char* out, int max_out) {
  auto* m = static_cast<Model*>(h);
  std::string text;
  std::string run;  // pending consecutive byte pieces
  auto flush = [&] {
    if (!run.empty()) {
      text += decode_byte_run(run);  // verbatim, no ▁ processing
      run.clear();
    }
  };
  auto append_piece = [&](const std::string& s) {
    size_t i = 0;
    while (i < s.size()) {
      if (s.compare(i, 3, kWs) == 0) {
        text.push_back(' ');
        i += 3;
      } else {
        text.push_back(s[i]);
        i += 1;
      }
    }
  };
  for (int k = 0; k < n; ++k) {
    int id = ids[k];
    if (id < 0 || id >= int(m->pieces.size())) continue;
    if (m->id_byte[id] >= 0) {
      run.push_back(char(m->id_byte[id]));
      continue;
    }
    flush();
    const Piece& pc = m->pieces[id];
    if (pc.type == kControl) continue;
    if (pc.type == kUnknown) {
      text += " \xe2\x81\x87 ";  // spm renders unk as ' ⁇ '
      continue;
    }
    append_piece(pc.text);
  }
  flush();
  if (!text.empty() && text[0] == ' ') text.erase(0, 1);
  int sz = int(text.size());
  if (sz >= max_out) return -1;
  memcpy(out, text.data(), sz);
  out[sz] = 0;
  return sz;
}

}  // extern "C"
