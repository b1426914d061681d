// Lexicon-constrained CTC beam search — native decoder.
//
// Replaces the flashlight-text `ctc_decoder` the reference binds through
// torchaudio (util/beam_infer.py:6, 56-75: lexicon, tokens, nbest,
// beam_size, word_score, lm_weight with no LM => ZeroLM, blank/sil
// tokens). Hypotheses walk a token trie built from the lexicon, so output
// is constrained to sequences of lexicon words; completing a word adds
// `word_score` and returns to the trie root. States with equal
// (trie node, previous token, blank flag, word history) merge in the
// log-semiring; the beam is pruned to `beam_size` by score.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <memory>
#include <unordered_map>
#include <vector>

namespace {

struct TrieNode {
  std::unordered_map<int, int> children;  // token id -> node index
  int word_id = -1;                       // >= 0 when a word ends here
};

struct WordChain {
  int word_id;
  const WordChain* parent;
};

struct Decoder {
  std::vector<TrieNode> nodes;   // 0 = root
  int vocab = 0;

  Decoder() { nodes.emplace_back(); }

  void add_word(const int* toks, int n, int word_id) {
    int cur = 0;
    for (int i = 0; i < n; ++i) {
      auto it = nodes[cur].children.find(toks[i]);
      if (it == nodes[cur].children.end()) {
        nodes[cur].children.emplace(toks[i], int(nodes.size()));
        cur = int(nodes.size());
        nodes.emplace_back();
      } else {
        cur = it->second;
      }
    }
    if (nodes[cur].word_id < 0) nodes[cur].word_id = word_id;
  }
};

struct Hyp {
  int node = 0;
  int prev_tok = -1;
  bool blank = true;
  float score = 0.f;
  const WordChain* words = nullptr;
};

struct HypKey {
  int node, prev_tok;
  bool blank;
  const WordChain* words;
  bool operator==(const HypKey& o) const {
    return node == o.node && prev_tok == o.prev_tok && blank == o.blank &&
           words == o.words;
  }
};

struct HypKeyHash {
  size_t operator()(const HypKey& k) const {
    size_t h = size_t(k.node) * 1000003u + size_t(k.prev_tok + 1);
    h = h * 31 + size_t(k.blank);
    h = h * 1000000007u + std::hash<const void*>()(k.words);
    return h;
  }
};

inline float logadd(float a, float b) {
  if (a < b) std::swap(a, b);
  if (b == -INFINITY) return a;
  return a + std::log1p(std::exp(b - a));
}

struct Arena {
  std::vector<std::unique_ptr<WordChain>> chains;
  const WordChain* push(int word_id, const WordChain* parent) {
    chains.emplace_back(new WordChain{word_id, parent});
    return chains.back().get();
  }
};

int decode(const Decoder& dec, const float* logp, int T, int V, int blank,
           float word_score, int beam_size, float beam_threshold,
           int* out_words, int max_words, float* out_score) {
  Arena arena;
  std::vector<Hyp> beam{Hyp{}};

  std::unordered_map<HypKey, float, HypKeyHash> merged;
  std::vector<Hyp> next;

  for (int t = 0; t < T; ++t) {
    const float* lp = logp + size_t(t) * V;
    merged.clear();
    next.clear();

    auto emit = [&](const Hyp& h) {
      HypKey key{h.node, h.prev_tok, h.blank, h.words};
      auto it = merged.find(key);
      if (it == merged.end()) {
        merged.emplace(key, h.score);
        next.push_back(h);
      } else {
        it->second = logadd(it->second, h.score);
      }
    };

    for (const Hyp& h : beam) {
      // 1) blank
      emit(Hyp{h.node, h.prev_tok, true, h.score + lp[blank], h.words});
      // 2) repeat previous token without an intervening blank
      if (h.prev_tok >= 0 && !h.blank)
        emit(Hyp{h.node, h.prev_tok, false, h.score + lp[h.prev_tok],
                 h.words});
      // 3) advance the trie
      for (const auto& kv : dec.nodes[h.node].children) {
        int tok = kv.first;
        if (tok == blank) continue;
        if (tok == h.prev_tok && !h.blank) continue;  // would be a repeat
        float s = h.score + lp[tok];
        const TrieNode& child = dec.nodes[kv.second];
        if (!child.children.empty())
          emit(Hyp{kv.second, tok, false, s, h.words});
        if (child.word_id >= 0)
          emit(Hyp{0, tok, false, s + word_score,
                   arena.push(child.word_id, h.words)});
      }
    }

    // write merged scores back and prune
    for (Hyp& h : next) {
      HypKey key{h.node, h.prev_tok, h.blank, h.words};
      h.score = merged[key];
    }
    float best = -INFINITY;
    for (const Hyp& h : next) best = std::max(best, h.score);
    std::vector<Hyp> kept;
    kept.reserve(next.size());
    for (const Hyp& h : next)
      if (h.score >= best - beam_threshold) kept.push_back(h);
    if (int(kept.size()) > beam_size) {
      std::nth_element(kept.begin(), kept.begin() + beam_size, kept.end(),
                       [](const Hyp& a, const Hyp& b) {
                         return a.score > b.score;
                       });
      kept.resize(beam_size);
    }
    beam.swap(kept);
    if (beam.empty()) break;
  }

  // best COMPLETE hypothesis (at trie root, i.e. not mid-word)
  const Hyp* best = nullptr;
  for (const Hyp& h : beam)
    if (h.node == 0 && (!best || h.score > best->score)) best = &h;
  if (!best) {  // fall back to the best partial
    for (const Hyp& h : beam)
      if (!best || h.score > best->score) best = &h;
  }
  if (!best) return -1;
  if (out_score) *out_score = best->score;

  std::vector<int> words;
  for (const WordChain* w = best->words; w; w = w->parent)
    words.push_back(w->word_id);
  std::reverse(words.begin(), words.end());
  int n = int(words.size());
  if (n > max_words) n = max_words;
  for (int i = 0; i < n; ++i) out_words[i] = words[i];
  return n;
}

// nbest variant: fills up to `nbest` complete hypotheses. For each, writes
// its word count into out_counts[i], its score into out_scores[i], and its
// words contiguously into out_words. Returns the number of hypotheses.
int decode_nbest(const Decoder& dec, const float* logp, int T, int V,
                 int blank, float word_score, int beam_size,
                 float beam_threshold, int nbest, int* out_words,
                 int max_words, int* out_counts, float* out_scores) {
  Arena arena;
  std::vector<Hyp> beam{Hyp{}};
  std::unordered_map<HypKey, float, HypKeyHash> merged;
  std::vector<Hyp> next;

  for (int t = 0; t < T; ++t) {
    const float* lp = logp + size_t(t) * V;
    merged.clear();
    next.clear();
    auto emit = [&](const Hyp& h) {
      HypKey key{h.node, h.prev_tok, h.blank, h.words};
      auto it = merged.find(key);
      if (it == merged.end()) {
        merged.emplace(key, h.score);
        next.push_back(h);
      } else {
        it->second = logadd(it->second, h.score);
      }
    };
    for (const Hyp& h : beam) {
      emit(Hyp{h.node, h.prev_tok, true, h.score + lp[blank], h.words});
      if (h.prev_tok >= 0 && !h.blank)
        emit(Hyp{h.node, h.prev_tok, false, h.score + lp[h.prev_tok],
                 h.words});
      for (const auto& kv : dec.nodes[h.node].children) {
        int tok = kv.first;
        if (tok == blank) continue;
        if (tok == h.prev_tok && !h.blank) continue;
        float s = h.score + lp[tok];
        const TrieNode& child = dec.nodes[kv.second];
        if (!child.children.empty())
          emit(Hyp{kv.second, tok, false, s, h.words});
        if (child.word_id >= 0)
          emit(Hyp{0, tok, false, s + word_score,
                   arena.push(child.word_id, h.words)});
      }
    }
    for (Hyp& h : next) {
      HypKey key{h.node, h.prev_tok, h.blank, h.words};
      h.score = merged[key];
    }
    float best = -INFINITY;
    for (const Hyp& h : next) best = std::max(best, h.score);
    std::vector<Hyp> kept;
    for (const Hyp& h : next)
      if (h.score >= best - beam_threshold) kept.push_back(h);
    if (int(kept.size()) > beam_size) {
      std::nth_element(kept.begin(), kept.begin() + beam_size, kept.end(),
                       [](const Hyp& a, const Hyp& b) {
                         return a.score > b.score;
                       });
      kept.resize(beam_size);
    }
    beam.swap(kept);
    if (beam.empty()) break;
  }

  std::vector<const Hyp*> finals;
  for (const Hyp& h : beam)
    if (h.node == 0) finals.push_back(&h);
  if (finals.empty())
    for (const Hyp& h : beam) finals.push_back(&h);
  std::sort(finals.begin(), finals.end(),
            [](const Hyp* a, const Hyp* b) { return a->score > b->score; });
  int n_out = std::min<int>(nbest, int(finals.size()));
  int pos = 0;
  for (int i = 0; i < n_out; ++i) {
    std::vector<int> words;
    for (const WordChain* w = finals[i]->words; w; w = w->parent)
      words.push_back(w->word_id);
    std::reverse(words.begin(), words.end());
    if (pos + int(words.size()) > max_words) {
      n_out = i;
      break;
    }
    out_counts[i] = int(words.size());
    out_scores[i] = finals[i]->score;
    for (int wid : words) out_words[pos++] = wid;
  }
  return n_out;
}

}  // namespace

extern "C" {

void* eet_trie_create(int vocab) {
  auto* d = new Decoder();
  d->vocab = vocab;
  return d;
}

void eet_trie_free(void* h) { delete static_cast<Decoder*>(h); }

void eet_trie_add_word(void* h, const int* toks, int n, int word_id) {
  static_cast<Decoder*>(h)->add_word(toks, n, word_id);
}

long eet_trie_num_nodes(void* h) {
  return long(static_cast<Decoder*>(h)->nodes.size());
}

// Returns the number of words written to out_words, -1 on failure.
int eet_trie_decode(void* h, const float* logp, int T, int V, int blank,
                    float word_score, int beam_size, float beam_threshold,
                    int* out_words, int max_words, float* out_score) {
  return decode(*static_cast<Decoder*>(h), logp, T, V, blank, word_score,
                beam_size, beam_threshold, out_words, max_words,
                out_score);
}

// nbest variant (ctc_predict parity, util/beam_infer.py:115-126): returns
// the number of complete hypotheses written (<= nbest).
int eet_trie_decode_nbest(void* h, const float* logp, int T, int V,
                          int blank, float word_score, int beam_size,
                          float beam_threshold, int nbest, int* out_words,
                          int max_words, int* out_counts,
                          float* out_scores) {
  return decode_nbest(*static_cast<Decoder*>(h), logp, T, V, blank,
                      word_score, beam_size, beam_threshold, nbest,
                      out_words, max_words, out_counts, out_scores);
}

}  // extern "C"
