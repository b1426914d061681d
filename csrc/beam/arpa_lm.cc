// ARPA n-gram LM implementation (see arpa_lm.h).

#include "arpa_lm.h"

#include <cmath>
#include <cstdio>
#include <cstring>

namespace eet_lm {

namespace {
constexpr float kLn10 = 2.302585092994046f;
constexpr float kOovFloor = -23.02585f;  // ln(1e-10): no-<unk> fallback

// Splits a line on spaces/tabs into tokens (in place, no allocation churn).
void split_ws(const std::string& line, std::vector<std::string>* out) {
  out->clear();
  size_t i = 0, n = line.size();
  while (i < n) {
    while (i < n && (line[i] == ' ' || line[i] == '\t')) ++i;
    size_t j = i;
    while (j < n && line[j] != ' ' && line[j] != '\t') ++j;
    if (j > i) out->emplace_back(line, i, j - i);
    i = j;
  }
}
}  // namespace

std::string ArpaLM::pack(const int* ids, int n) {
  std::string key(size_t(n) * 4, '\0');
  std::memcpy(key.data(), ids, size_t(n) * 4);
  return key;
}

int ArpaLM::word_id(const std::string& w) const {
  auto it = vocab_.find(w);
  return it == vocab_.end() ? -1 : it->second;
}

bool ArpaLM::load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  enum { PREAMBLE, DATA, NGRAMS } section = PREAMBLE;
  int cur_order = 0;
  std::vector<std::string> toks;
  std::vector<int> ids;
  char buf[1 << 16];
  std::string line;

  auto intern = [&](const std::string& w) {
    auto it = vocab_.find(w);
    if (it != vocab_.end()) return it->second;
    int id = int(words_.size());
    vocab_.emplace(w, id);
    words_.push_back(w);
    return id;
  };

  while (std::fgets(buf, sizeof(buf), f)) {
    line.assign(buf);
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    if (line.empty()) continue;

    if (line == "\\data\\") {
      section = DATA;
      continue;
    }
    if (line == "\\end\\") break;
    if (line.size() > 1 && line[0] == '\\') {
      // "\N-grams:" header
      int n = std::atoi(line.c_str() + 1);
      if (n >= 1 && line.find("-grams:") != std::string::npos) {
        cur_order = n;
        if (int(tables_.size()) < n) tables_.resize(n);
        if (n > order_) order_ = n;
        section = NGRAMS;
        continue;
      }
    }
    if (section == DATA) {
      // "ngram N=count" — counts are advisory; table sizes come from data
      continue;
    }
    if (section != NGRAMS || cur_order == 0) continue;

    split_ws(line, &toks);
    // logp w1 ... wN [backoff]
    if (int(toks.size()) < cur_order + 1) continue;
    bool has_backoff = int(toks.size()) >= cur_order + 2;
    Entry e;
    e.prob = std::strtof(toks[0].c_str(), nullptr) * kLn10;
    e.backoff = has_backoff
                    ? std::strtof(toks[cur_order + 1].c_str(), nullptr) *
                          kLn10
                    : 0.f;
    ids.clear();
    for (int i = 1; i <= cur_order; ++i) ids.push_back(intern(toks[i]));
    tables_[cur_order - 1].emplace(pack(ids.data(), cur_order), e);
  }
  std::fclose(f);
  if (order_ == 0) return false;
  bos_ = word_id("<s>");
  eos_ = word_id("</s>");
  unk_ = word_id("<unk>");
  return true;
}

float ArpaLM::score(const std::vector<int>& ctx, int word,
                    std::vector<int>* next_ctx) const {
  int w = word;
  if (w < 0) w = unk_;

  float backoff_acc = 0.f;
  float prob;
  bool found = false;
  if (w >= 0) {
    // longest usable context first; on miss, accumulate that context's
    // backoff weight and retry one word shorter (Katz backoff)
    int max_ctx = std::min<int>(int(ctx.size()), order_ - 1);
    std::vector<int> key;
    for (int k = max_ctx; k >= 0; --k) {
      key.assign(ctx.end() - k, ctx.end());
      key.push_back(w);
      auto& tab = tables_[k];
      auto it = tab.find(pack(key.data(), k + 1));
      if (it != tab.end()) {
        prob = it->second.prob;
        found = true;
        break;
      }
      if (k > 0) {
        auto& ctab = tables_[k - 1];
        auto cit = ctab.find(pack(ctx.data() + (ctx.size() - k), k));
        if (cit != ctab.end()) backoff_acc += cit->second.backoff;
      }
    }
  }
  if (!found) prob = kOovFloor - backoff_acc;  // net result = floor

  if (next_ctx) {
    next_ctx->assign(ctx.begin(), ctx.end());
    if (w >= 0)
      next_ctx->push_back(w);
    else
      next_ctx->clear();  // OOV breaks the context
    if (int(next_ctx->size()) > order_ - 1)
      next_ctx->erase(next_ctx->begin(),
                      next_ctx->end() - (order_ - 1));
    // truncate to the longest context the model knows — states that
    // cannot extend any ngram are equivalent to their suffixes
    while (!next_ctx->empty() &&
           tables_[next_ctx->size() - 1].find(
               pack(next_ctx->data(), int(next_ctx->size()))) ==
               tables_[next_ctx->size() - 1].end())
      next_ctx->erase(next_ctx->begin());
  }
  return backoff_acc + prob;
}

float ArpaLM::score_sequence(const int* words, int n, bool add_eos) const {
  std::vector<int> ctx = begin_context(), next;
  float total = 0.f;
  for (int i = 0; i < n; ++i) {
    total += score(ctx, words[i], &next);
    ctx.swap(next);
  }
  if (add_eos && eos_ >= 0) total += score(ctx, eos_, nullptr);
  return total;
}

std::vector<int> ArpaLM::begin_context() const {
  std::vector<int> ctx;
  if (bos_ >= 0) ctx.push_back(bos_);
  return ctx;
}

}  // namespace eet_lm

extern "C" {

void* eet_lm_load(const char* path) {
  auto* lm = new eet_lm::ArpaLM();
  if (!lm->load(path)) {
    delete lm;
    return nullptr;
  }
  return lm;
}

void eet_lm_free(void* h) { delete static_cast<eet_lm::ArpaLM*>(h); }

int eet_lm_order(void* h) {
  return static_cast<eet_lm::ArpaLM*>(h)->order();
}

int eet_lm_vocab_size(void* h) {
  return static_cast<eet_lm::ArpaLM*>(h)->vocab_size();
}

int eet_lm_word_id(void* h, const char* word) {
  return static_cast<eet_lm::ArpaLM*>(h)->word_id(word);
}

// Natural-log score of a word-id sequence from <s> (ids from
// eet_lm_word_id; -1 = OOV), optionally closed with </s>.
float eet_lm_score_sequence(void* h, const int* words, int n, int add_eos) {
  return static_cast<eet_lm::ArpaLM*>(h)->score_sequence(words, n,
                                                         add_eos != 0);
}

}  // extern "C"
