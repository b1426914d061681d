// Normalizer-rule compiler: rule TSV → precompiled charsmap blob.
//
// The reference's normalizer framework (sentencepiece/src/normalizer.cc +
// builder.cc) compiles normalization rule sets into the double-array blob
// stored in NormalizerSpec.precompiled_charsmap; its artifacts ship with
// nmt_nfkc compiled in.  This is our from-scratch compiler for the same
// blob format (darts-clone unit encoding, XOR-addressed children), so:
//   - models we train can embed any rule set (--normalization_rule_tsv,
//     or the generated nmt_nfkc rules under csrc/tokenizer/data/)
//   - the blobs we emit are readable by our own engines (bpe_tokenizer.cc,
//     tokenizer/charsmap.py) AND by SentencePiece itself.
//
// TSV format (the public spm format): one rule per line,
//   <hex cp> [<hex cp>...] \t <hex cp> [<hex cp>...]
// mapping the source codepoint sequence to its replacement (which may be
// empty).  Unit encoding produced (must mirror the readers exactly):
//   label  = low byte; bit31 marks value units (poisons label compares)
//   has_leaf = bit8 (node has a value; value unit sits at node ^ offset)
//   offset = bits 10..30 (we always emit offsets < 2^21, ext bit9 unused)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

void utf8_append(uint32_t cp, std::string* out) {
  if (cp < 0x80) {
    out->push_back(char(cp));
  } else if (cp < 0x800) {
    out->push_back(char(0xC0 | (cp >> 6)));
    out->push_back(char(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back(char(0xE0 | (cp >> 12)));
    out->push_back(char(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(char(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(char(0xF0 | (cp >> 18)));
    out->push_back(char(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back(char(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(char(0x80 | (cp & 0x3F)));
  }
}

bool parse_cp_list(const std::string& s, std::string* out) {
  std::istringstream iss(s);
  std::string tok;
  while (iss >> tok) {
    char* end = nullptr;
    unsigned long cp = strtoul(tok.c_str(), &end, 16);
    if (end == tok.c_str() || cp > 0x10FFFF) return false;
    utf8_append(uint32_t(cp), out);
  }
  return true;
}

struct TrieNode {
  std::map<uint8_t, int> kids;
  int32_t value = -1;
};

struct DartsBuilder {
  std::vector<TrieNode> nodes;

  DartsBuilder() : nodes(1) {}

  void add(const std::string& key, int32_t value) {
    int cur = 0;
    for (unsigned char c : key) {
      auto it = nodes[cur].kids.find(c);
      if (it == nodes[cur].kids.end()) {
        nodes.emplace_back();
        int nid = int(nodes.size()) - 1;
        nodes[cur].kids.emplace(c, nid);
        cur = nid;
      } else {
        cur = it->second;
      }
    }
    nodes[cur].value = value;
  }

  // Breadth-first placement with first-fit base search.  Returns the unit
  // array, or empty if an offset exceeds the 21-bit direct encoding (no
  // realistic rule set comes close: full NFKC lands well under 2^21).
  std::vector<uint32_t> build() {
    std::vector<uint32_t> units(1, 0);
    std::vector<bool> used(1, true);
    // each base may be owned by at most ONE node: otherwise a probe from
    // a different parent whose label coincides would falsely transition
    // into another node's child (phantom subtrees / wrong values)
    std::vector<bool> base_used(1, false);
    auto ensure = [&](size_t n) {
      if (units.size() < n) {
        units.resize(n, 0);
        used.resize(n, false);
        base_used.resize(n, false);
      }
    };
    size_t search_start = 1;
    std::deque<std::pair<int, uint32_t>> queue;
    queue.emplace_back(0, 0);
    while (!queue.empty()) {
      int nid = queue.front().first;
      uint32_t pos = queue.front().second;
      queue.pop_front();
      const TrieNode& nd = nodes[nid];

      std::vector<uint8_t> labels;
      if (nd.value >= 0) labels.push_back(0);
      for (const auto& kv : nd.kids) labels.push_back(kv.first);
      if (labels.empty()) continue;

      uint32_t base = uint32_t(search_start);
      for (;; ++base) {
        if ((base ^ pos) >= (1u << 21)) return {};
        ensure(base + 1);
        if (base_used[base]) continue;
        bool fits = true;
        for (uint8_t c : labels) {
          size_t slot = base ^ c;
          ensure(slot + 1);
          if (used[slot]) {
            fits = false;
            break;
          }
        }
        if (fits) break;
      }

      base_used[base] = true;
      units[pos] |= (base ^ pos) << 10;
      if (nd.value >= 0) {
        units[pos] |= 1u << 8;                       // has_leaf
        used[base] = true;
        units[base] = 0x80000000u | uint32_t(nd.value);
      }
      for (const auto& kv : nd.kids) {
        size_t slot = base ^ kv.first;
        used[slot] = true;
        units[slot] = kv.first;                      // offset filled later
        queue.emplace_back(kv.second, uint32_t(slot));
      }
      while (search_start < used.size() && used[search_start])
        ++search_start;
    }
    return units;
  }
};

}  // namespace

namespace eet_spm {

// Compiles source→replacement rules into the charsmap blob
// ([uint32 LE trie bytes][units][NUL-terminated replacement pool]).
std::string compile_charsmap(
    const std::vector<std::pair<std::string, std::string>>& rules) {
  // dedupe replacements into the pool
  std::string pool;
  std::map<std::string, uint32_t> pool_offset;
  DartsBuilder builder;
  // darts requires keys added once; rules map is already deduped by caller
  for (const auto& kv : rules) {
    auto it = pool_offset.find(kv.second);
    uint32_t off;
    if (it == pool_offset.end()) {
      off = uint32_t(pool.size());
      pool += kv.second;
      pool.push_back('\0');
      pool_offset.emplace(kv.second, off);
    } else {
      off = it->second;
    }
    builder.add(kv.first, int32_t(off));
  }
  std::vector<uint32_t> units = builder.build();
  if (units.empty()) return "";
  std::string blob;
  uint32_t trie_bytes = uint32_t(units.size() * 4);
  blob.append((const char*)&trie_bytes, 4);
  blob.append((const char*)units.data(), trie_bytes);
  blob += pool;
  return blob;
}

// Loads a rule TSV; returns false on parse errors.  Later rules for the
// same source override earlier ones (spm builder semantics).
bool load_rule_tsv(const char* path,
                   std::vector<std::pair<std::string, std::string>>* rules) {
  std::ifstream f(path);
  if (!f) return false;
  std::map<std::string, std::string> uniq;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    size_t tab = line.find('\t');
    std::string src, dst;
    if (!parse_cp_list(line.substr(0, tab), &src)) return false;
    if (tab != std::string::npos &&
        !parse_cp_list(line.substr(tab + 1), &dst))
      return false;
    if (src.empty()) continue;
    uniq[src] = dst;
  }
  rules->assign(uniq.begin(), uniq.end());
  return true;
}

}  // namespace eet_spm

extern "C" {

// Compiles a rule TSV into a charsmap blob file; returns the blob size in
// bytes, or -1 on failure.
long eet_charsmap_compile(const char* tsv_path, const char* out_path) {
  std::vector<std::pair<std::string, std::string>> rules;
  if (!eet_spm::load_rule_tsv(tsv_path, &rules)) return -1;
  std::string blob = eet_spm::compile_charsmap(rules);
  if (blob.empty()) return -1;
  std::ofstream f(out_path, std::ios::binary);
  if (!f) return -1;
  f.write(blob.data(), std::streamsize(blob.size()));
  return long(blob.size());
}

}  // extern "C"
