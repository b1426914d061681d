// Lexicon OOV snapper — native edit-distance engine.
//
// Replaces the reference's apply_lex hot spot (util/tokenizer.py:35-50:
// a Python O(|lexicon| · |w|²) scan over 89,114 entries per OOV word)
// with banded Levenshtein + length-difference pruning in C++.

#include <algorithm>
#include <cstring>
#include <limits>
#include <map>
#include <string>
#include <vector>

namespace {

struct Lexicon {
  std::vector<std::string> entries;
  std::map<int, std::vector<int>> by_len;  // length -> entry indices
};

// Levenshtein with early-abandon: returns > bound when distance > bound.
int bounded_edit_distance(const std::string& a, const std::string& b,
                          int bound) {
  int n = int(a.size()), m = int(b.size());
  if (std::abs(n - m) > bound) return bound + 1;
  std::vector<int> prev(m + 1), cur(m + 1);
  for (int j = 0; j <= m; ++j) prev[j] = j;
  for (int i = 1; i <= n; ++i) {
    cur[0] = i;
    int row_min = cur[0];
    int lo = std::max(1, i - bound), hi = std::min(m, i + bound);
    for (int j = 1; j < lo; ++j) cur[j] = bound + 1;
    for (int j = lo; j <= hi; ++j) {
      int sub = prev[j - 1] + (a[i - 1] != b[j - 1]);
      int del = prev[j] + 1;
      int ins = cur[j - 1] + 1;
      cur[j] = std::min({sub, del, ins});
      row_min = std::min(row_min, cur[j]);
    }
    for (int j = hi + 1; j <= m; ++j) cur[j] = bound + 1;
    if (row_min > bound) return bound + 1;
    std::swap(prev, cur);
  }
  return prev[m];
}

}  // namespace

extern "C" {

void* eet_lex_create() { return new Lexicon(); }

void eet_lex_free(void* h) { delete static_cast<Lexicon*>(h); }

void eet_lex_add(void* h, const char* word) {
  auto* lx = static_cast<Lexicon*>(h);
  lx->by_len[int(strlen(word))].push_back(int(lx->entries.size()));
  lx->entries.emplace_back(word);
}

int eet_lex_contains(void* h, const char* word) {
  auto* lx = static_cast<Lexicon*>(h);
  std::string w(word);
  auto it = lx->by_len.find(int(w.size()));
  if (it == lx->by_len.end()) return 0;
  for (int idx : it->second)
    if (lx->entries[idx] == w) return 1;
  return 0;
}

// Finds the minimum-edit-distance entry; result written to `out`.
// Returns the distance, or -1 on failure.
int eet_lex_closest(void* h, const char* word, char* out, int max_out) {
  auto* lx = static_cast<Lexicon*>(h);
  if (lx->entries.empty()) return -1;
  std::string w(word);
  int n = int(w.size());
  int best_d = std::numeric_limits<int>::max();
  int best_idx = -1;
  // search outward by length difference; any candidate at |len-n| = dl
  // has distance >= dl, so once dl >= best_d we are done
  int max_len = lx->by_len.rbegin()->first;
  for (int dl = 0; dl <= std::max(n, max_len); ++dl) {
    if (dl >= best_d) break;
    for (int sign = 0; sign < (dl == 0 ? 1 : 2); ++sign) {
      int len = dl == 0 ? n : (sign == 0 ? n - dl : n + dl);
      if (len < 0) continue;
      auto it = lx->by_len.find(len);
      if (it == lx->by_len.end()) continue;
      for (int idx : it->second) {
        int bound = best_d == std::numeric_limits<int>::max()
                        ? std::max(n, len)
                        : best_d - 1;
        int d = bounded_edit_distance(w, lx->entries[idx], bound);
        if (d < best_d) {
          best_d = d;
          best_idx = idx;
          if (best_d == dl) break;  // cannot beat the length lower bound
        }
      }
    }
  }
  if (best_idx < 0) return -1;
  const std::string& s = lx->entries[best_idx];
  if (int(s.size()) >= max_out) return -1;
  memcpy(out, s.data(), s.size());
  out[s.size()] = 0;
  return best_d;
}

}  // extern "C"
