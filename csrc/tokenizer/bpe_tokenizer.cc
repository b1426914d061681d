// SentencePiece-compatible BPE tokenizer — native engine.
//
// The reference vendors the full SentencePiece C++ library (~13k LoC,
// sentencepiece/src) and calls it through SWIG bindings (util/conf.py:473).
// This is our from-scratch replacement for the inference surface the
// framework needs: read the binary `.model` protobuf directly, encode with
// an agenda-based best-pair-merge (O(n log n)), decode pieces to text.
// Exposed as a plain C API for ctypes (no pybind11 in the image).
//
// Byte-compatibility is pinned by tests against the reference artifacts
// (sentencepiece/build/libri.bpe-256.*) and the 89k-entry golden lexicon.

#include <cstdint>
#include <cstring>
#include <fstream>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kNormal = 1, kUnknown = 2, kControl = 3, kUserDefined = 4;

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
  int unk_id = 0, bos_id = 1, eos_id = 2, pad_id = -1;
  bool add_dummy_prefix = true, remove_extra_ws = true;
  // TrainerSpec.model_type (proto default UNIGRAM=1); only BPE=2 is
  // supported — non-BPE models are rejected at load rather than silently
  // mis-tokenized (PARITY.md: SentencePiece scope)
  int model_type = 1;
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
      r.p += n;
    } else if (wt == 0) {
      uint64_t v = r.varint();
      if (trainer) {
        if (field == 3) m->model_type = int(v);
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
  for (size_t i = 0; i < m->pieces.size(); ++i) {
    const Piece& pc = m->pieces[i];
    m->piece_to_id.emplace(pc.text, int(i));
    if (pc.type == kNormal || pc.type == kUserDefined)
      m->merge_score[pc.text] = pc.score;
    if (pc.type == kUserDefined) m->user_defined.push_back(pc.text);
  }
  if (m->model_type != 2) {  // only BPE is in scope — fail loudly
    delete m;
    return nullptr;
  }
  return m;
}

// -------------------------------------------------------------- encoding ---
const char* kWs = "\xe2\x96\x81";  // ▁ U+2581

std::string normalize(const Model& m, const std::string& text) {
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

std::vector<std::string> encode_pieces(const Model& m,
                                       const std::string& text) {
  std::string norm = normalize(m, text);
  std::vector<std::string> pieces;
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
  if (!buf.empty()) bpe_segment(m, buf, &pieces);
  return pieces;
}

}  // namespace

// ----------------------------------------------------------------- C API ---
extern "C" {

void* eet_bpe_load(const char* path) { return load_model(path); }

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

int eet_bpe_encode(void* h, const char* text, int* out_ids, int max_out) {
  auto* m = static_cast<Model*>(h);
  auto pieces = encode_pieces(*m, text);
  int n = 0;
  for (const auto& p : pieces) {
    if (n >= max_out) return -1;
    auto it = m->piece_to_id.find(p);
    out_ids[n++] = it == m->piece_to_id.end() ? m->unk_id : it->second;
  }
  return n;
}

int eet_bpe_decode(void* h, const int* ids, int n, char* out, int max_out) {
  auto* m = static_cast<Model*>(h);
  std::string joined;
  for (int k = 0; k < n; ++k) {
    int id = ids[k];
    if (id < 0 || id >= int(m->pieces.size())) continue;
    const Piece& pc = m->pieces[id];
    if (pc.type == kControl) continue;
    if (pc.type == kUnknown) {
      joined += " \xe2\x81\x87 ";  // spm renders unk as ' ⁇ '
      continue;
    }
    joined += pc.text;
  }
  // ▁ -> space, strip one leading space
  std::string text;
  text.reserve(joined.size());
  size_t i = 0;
  while (i < joined.size()) {
    if (joined.compare(i, 3, kWs) == 0) {
      text.push_back(' ');
      i += 3;
    } else {
      text.push_back(joined[i]);
      i += 1;
    }
  }
  if (!text.empty() && text[0] == ' ') text.erase(0, 1);
  int sz = int(text.size());
  if (sz >= max_out) return -1;
  memcpy(out, text.data(), sz);
  out[sz] = 0;
  return sz;
}

}  // extern "C"
