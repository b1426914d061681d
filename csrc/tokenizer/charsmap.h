// Precompiled character-map normalizer — shared reader.
//
// Blob layout (SentencePiece NormalizerSpec.precompiled_charsmap):
//   [uint32 LE trie bytes][darts-clone uint32 units][NUL-terminated pool]
// Unit semantics: label = low byte (bit31 poisons mismatches), has_leaf =
// bit8, offset = (u >> 10) << ((u & 0x200) >> 6); the child of the node
// at position p via byte c sits at p ^ offset ^ c, the node's value unit
// at p ^ offset.  Used by the tokenizer engine (bpe_tokenizer.cc), the
// rule compiler round-trip, and the eet_spm normalize CLI; mirrored in
// Python by tokenizer/charsmap.py.
#ifndef EET_CHARSMAP_H_
#define EET_CHARSMAP_H_

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace eet_spm {

inline size_t cm_utf8_len(uint8_t b) {
  if (b < 0x80) return 1;
  if ((b >> 5) == 0x6) return 2;
  if ((b >> 4) == 0xe) return 3;
  if ((b >> 3) == 0x1e) return 4;
  return 1;
}

struct Charsmap {
  std::vector<uint32_t> units;
  std::string pool;

  bool empty() const { return units.empty(); }

  bool load(const uint8_t* buf, size_t len) {
    if (len < 4) return false;
    uint32_t trie_bytes;
    memcpy(&trie_bytes, buf, 4);
    if (4 + size_t(trie_bytes) > len || trie_bytes % 4 != 0) return false;
    units.resize(trie_bytes / 4);
    memcpy(units.data(), buf + 4, trie_bytes);
    pool.assign((const char*)buf + 4 + trie_bytes, len - 4 - trie_bytes);
    return !units.empty();
  }

  static uint32_t offset_of(uint32_t u) {
    return (u >> 10) << ((u & 0x200) >> 6);
  }

  // Longest key matching data[start..); returns length and replacement.
  bool longest_match(const char* data, size_t len, size_t start,
                     size_t* match_len, const char** repl,
                     size_t* repl_len) const {
    size_t node_pos = offset_of(units[0]);
    bool found = false;
    for (size_t i = start; i < len; ++i) {
      uint8_t c = uint8_t(data[i]);
      size_t pos = node_pos ^ c;
      if (pos >= units.size()) break;
      uint32_t u = units[pos];
      if ((u & 0x800000ffu) != c) break;
      node_pos = pos ^ offset_of(u);
      if ((u >> 8) & 1) {
        uint32_t off = units[node_pos] & 0x7fffffffu;
        if (off >= pool.size()) break;
        size_t end = pool.find('\0', off);
        if (end == std::string::npos) end = pool.size();
        *match_len = i - start + 1;
        *repl = pool.data() + off;
        *repl_len = end - off;
        found = true;
      }
    }
    return found;
  }

  // Leftmost-longest-match replacement; unmatched UTF-8 chars copy through.
  std::string normalize_text(const std::string& in) const {
    std::string out;
    out.reserve(in.size());
    size_t i = 0;
    while (i < in.size()) {
      size_t mlen, rlen;
      const char* repl;
      if (longest_match(in.data(), in.size(), i, &mlen, &repl, &rlen)) {
        out.append(repl, rlen);
        i += mlen;
      } else {
        size_t n = cm_utf8_len(uint8_t(in[i]));
        if (i + n > in.size()) n = 1;
        out.append(in, i, n);
        i += n;
      }
    }
    return out;
  }
};

// charsmap_builder.cc
std::string compile_charsmap(
    const std::vector<std::pair<std::string, std::string>>& rules);
bool load_rule_tsv(const char* path,
                   std::vector<std::pair<std::string, std::string>>* rules);

}  // namespace eet_spm

#endif  // EET_CHARSMAP_H_
