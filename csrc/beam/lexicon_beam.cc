// Lexicon-constrained CTC beam search — native decoder.
//
// Replaces the flashlight-text `ctc_decoder` the reference binds through
// torchaudio (util/beam_infer.py:6, 56-75: lexicon, tokens, nbest,
// beam_size, word_score, lm_weight with no LM => ZeroLM, blank/sil
// tokens). Hypotheses walk a token trie built from the lexicon, so output
// is constrained to sequences of lexicon words; completing a word adds
// `word_score` plus, when an ARPA LM is attached (eet_trie_set_lm),
// `lm_weight * ln P(word | history)` — with the final `</s>` transition
// applied to complete hypotheses, as flashlight's LexiconDecoder does.
// States with equal (trie node, previous token, blank flag, word history)
// merge in the log-semiring; the beam is pruned to `beam_size` by score.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <memory>
#include <unordered_map>
#include <vector>

#include "arpa_lm.h"

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
  // optional LM fusion
  const eet_lm::ArpaLM* lm = nullptr;
  float lm_weight = 0.f;
  std::vector<int> lex2lm;       // lexicon word_id -> LM word id (-1 OOV)
  // tokens used by at least one lexicon word; every other token is
  // "silence-like": the acoustic model may emit it (<s>, </s>, <pad> —
  // CTC targets include bos/eos, so converged models emit them peaked
  // at utterance edges) but no word can explain it. Such tokens are
  // consumable at word boundaries without producing output, the
  // generalization of flashlight's sil_token (the reference passes
  // sil_token="<pad>", util/beam_infer.py:65). Without this, every
  // hypothesis pays the near -inf blank log-prob at <s>/</s>-peaked
  // frames and junk short words become cheaper than blanks there.
  std::vector<char> in_lexicon;

  Decoder() { nodes.emplace_back(); }

  void add_word(const int* toks, int n, int word_id) {
    int cur = 0;
    for (int i = 0; i < n; ++i) {
      if (toks[i] >= 0 && toks[i] < int(in_lexicon.size()))
        in_lexicon[toks[i]] = 1;
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

// Interned LM contexts + memoised (state, word) transitions, per decode.
struct LMStates {
  const eet_lm::ArpaLM* lm;
  float weight;
  std::vector<std::vector<int>> ctxs;
  std::unordered_map<std::string, int> ids;
  std::unordered_map<uint64_t, std::pair<float, int>> trans;

  explicit LMStates(const eet_lm::ArpaLM* lm, float weight)
      : lm(lm), weight(weight) {
    if (lm) intern(lm->begin_context());
  }

  static std::string pack(const std::vector<int>& c) {
    std::string k(c.size() * 4, '\0');
    std::memcpy(k.data(), c.data(), c.size() * 4);
    return k;
  }

  int intern(const std::vector<int>& c) {
    auto key = pack(c);
    auto it = ids.find(key);
    if (it != ids.end()) return it->second;
    int id = int(ctxs.size());
    ids.emplace(std::move(key), id);
    ctxs.push_back(c);
    return id;
  }

  // weighted score + successor state for appending `lm_word`
  std::pair<float, int> step(int state, int lm_word) {
    uint64_t k = (uint64_t(uint32_t(state)) << 32) | uint32_t(lm_word + 1);
    auto it = trans.find(k);
    if (it != trans.end()) return it->second;
    std::vector<int> next;
    float s = weight * lm->score(ctxs[state], lm_word, &next);
    auto out = std::make_pair(s, intern(next));
    trans.emplace(k, out);
    return out;
  }

  // weighted </s> score for finalising a hypothesis
  float finish(int state) {
    if (lm->eos_id() < 0) return 0.f;
    return weight * lm->score(ctxs[state], lm->eos_id(), nullptr);
  }
};

struct Hyp {
  int node = 0;
  int prev_tok = -1;
  bool blank = true;
  float score = 0.f;
  const WordChain* words = nullptr;
  int lm_state = 0;
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
  // chains are interned: the same (parent, word) pair always returns the
  // same pointer, so pointer equality == word-sequence equality and
  // hypotheses with equal transcripts merge in the log-semiring
  using Key = std::pair<const WordChain*, int>;
  struct KeyHash {
    size_t operator()(const Key& k) const {
      return std::hash<const void*>()(k.first) * 1000003u ^
             size_t(uint32_t(k.second));
    }
  };
  std::vector<std::unique_ptr<WordChain>> chains;
  std::unordered_map<Key, const WordChain*, KeyHash> interned;
  const WordChain* push(int word_id, const WordChain* parent) {
    auto [it, fresh] = interned.emplace(Key{parent, word_id}, nullptr);
    if (fresh) {
      chains.emplace_back(new WordChain{word_id, parent});
      it->second = chains.back().get();
    }
    return it->second;
  }
};

// Core beam search: fills up to `nbest` complete hypotheses. For each,
// writes its word count into out_counts[i], its score into out_scores[i],
// and its words contiguously into out_words. Returns the hypothesis count.
int decode_nbest(const Decoder& dec, const float* logp, int T, int V,
                 int blank, float word_score, int beam_size,
                 float beam_threshold, int nbest, int* out_words,
                 int max_words, int* out_counts, float* out_scores) {
  Arena arena;
  LMStates lms(dec.lm, dec.lm_weight);
  std::vector<Hyp> beam{Hyp{}};
  std::unordered_map<HypKey, float, HypKeyHash> merged;
  std::vector<Hyp> next;

  // silence-like tokens (see Decoder::in_lexicon)
  std::vector<int> sil_toks;
  for (int v = 0; v < V && v < int(dec.in_lexicon.size()); ++v)
    if (!dec.in_lexicon[v] && v != blank) sil_toks.push_back(v);

  for (int t = 0; t < T; ++t) {
    const float* lp = logp + size_t(t) * V;
    float lp_max = -INFINITY;
    for (int v = 0; v < V; ++v) lp_max = std::max(lp_max, lp[v]);
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
      emit(Hyp{h.node, h.prev_tok, true, h.score + lp[blank], h.words,
               h.lm_state});
      // 2) repeat previous token without an intervening blank
      if (h.prev_tok >= 0 && !h.blank)
        emit(Hyp{h.node, h.prev_tok, false, h.score + lp[h.prev_tok],
                 h.words, h.lm_state});
      // 2b) silence-like tokens at word boundaries: consumed, no output
      // (pruned against the frame max — far-below-max sil emissions
      // cannot survive the beam threshold anyway)
      if (h.node == 0)
        for (int s : sil_toks) {
          if (s == h.prev_tok && !h.blank) continue;  // rule 2 covers
          if (lp[s] < lp_max - beam_threshold) continue;
          emit(Hyp{0, s, false, h.score + lp[s], h.words, h.lm_state});
        }
      // 3) advance the trie
      for (const auto& kv : dec.nodes[h.node].children) {
        int tok = kv.first;
        if (tok == blank) continue;
        if (tok == h.prev_tok && !h.blank) continue;  // would be a repeat
        float s = h.score + lp[tok];
        const TrieNode& child = dec.nodes[kv.second];
        if (!child.children.empty())
          emit(Hyp{kv.second, tok, false, s, h.words, h.lm_state});
        if (child.word_id >= 0) {
          float ws = s + word_score;
          int lm_state = h.lm_state;
          if (dec.lm) {
            auto [lscore, lnext] =
                lms.step(h.lm_state, dec.lex2lm[child.word_id]);
            ws += lscore;
            lm_state = lnext;
          }
          emit(Hyp{0, tok, false, ws,
                   arena.push(child.word_id, h.words), lm_state});
        }
      }
    }
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

  // complete hypotheses (at trie root, i.e. not mid-word) get the LM's
  // sentence-end transition; CTC states sharing a transcript (word
  // chain) merge in the log-semiring; fall back to partials if none
  // completed
  std::vector<Hyp> finals;
  std::unordered_map<const WordChain*, size_t> by_chain;
  for (const Hyp& h : beam)
    if (h.node == 0) {
      float s = h.score + (dec.lm ? lms.finish(h.lm_state) : 0.f);
      auto [it, fresh] = by_chain.emplace(h.words, finals.size());
      if (fresh) {
        finals.push_back(h);
        finals.back().score = s;
      } else {
        finals[it->second].score = logadd(finals[it->second].score, s);
      }
    }
  if (finals.empty())
    for (const Hyp& h : beam) finals.push_back(h);
  std::sort(finals.begin(), finals.end(),
            [](const Hyp& a, const Hyp& b) { return a.score > b.score; });
  int n_out = std::min<int>(nbest, int(finals.size()));
  int pos = 0;
  for (int i = 0; i < n_out; ++i) {
    std::vector<int> words;
    for (const WordChain* w = finals[i].words; w; w = w->parent)
      words.push_back(w->word_id);
    std::reverse(words.begin(), words.end());
    if (pos + int(words.size()) > max_words) {
      n_out = i;
      break;
    }
    out_counts[i] = int(words.size());
    out_scores[i] = finals[i].score;
    for (int wid : words) out_words[pos++] = wid;
  }
  return n_out;
}

}  // namespace

extern "C" {

void* eet_trie_create(int vocab) {
  auto* d = new Decoder();
  d->vocab = vocab;
  d->in_lexicon.assign(std::max(vocab, 0), 0);
  return d;
}

void eet_trie_free(void* h) { delete static_cast<Decoder*>(h); }

void eet_trie_add_word(void* h, const int* toks, int n, int word_id) {
  static_cast<Decoder*>(h)->add_word(toks, n, word_id);
}

long eet_trie_num_nodes(void* h) {
  return long(static_cast<Decoder*>(h)->nodes.size());
}

// Attach an ARPA LM (from eet_lm_load) for shallow fusion. lex2lm maps
// each lexicon word_id (insertion order of eet_trie_add_word) to an LM
// word id, -1 for LM-OOV. The LM handle must outlive the trie. Pass
// lm == nullptr to detach.
void eet_trie_set_lm(void* h, void* lm, float lm_weight,
                     const int* lex2lm, int n_words) {
  auto* d = static_cast<Decoder*>(h);
  d->lm = static_cast<const eet_lm::ArpaLM*>(lm);
  d->lm_weight = lm_weight;
  d->lex2lm.assign(lex2lm, lex2lm + n_words);
}

// Returns the number of words written to out_words, -1 on failure.
int eet_trie_decode(void* h, const float* logp, int T, int V, int blank,
                    float word_score, int beam_size, float beam_threshold,
                    int* out_words, int max_words, float* out_score) {
  int count = 0;
  float score = 0.f;
  int n = decode_nbest(*static_cast<Decoder*>(h), logp, T, V, blank,
                       word_score, beam_size, beam_threshold, 1, out_words,
                       max_words, &count, &score);
  if (n < 1) return -1;
  if (out_score) *out_score = score;
  return count;
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
