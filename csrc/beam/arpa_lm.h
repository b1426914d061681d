// ARPA n-gram language model with Katz backoff — native loader + scorer.
//
// Fills the LM slot of the reference's flashlight ctc_decoder bank
// (util/beam_infer.py:56-75: LM_WEIGHT=1.0 and the commented
// lm="lm.bin" / 4gram_small.arpa.lm show the intended KenLM use; the
// reference ships no LM file, so decoders run with ZeroLM). This is a
// self-contained ARPA reader — no KenLM dependency — scoring in natural
// log (ARPA's log10 values are converted on load).

#pragma once

#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace eet_lm {

class ArpaLM {
 public:
  // Returns false on parse failure.
  bool load(const char* path);

  int order() const { return order_; }
  int vocab_size() const { return int(words_.size()); }
  // -1 when the word is not in the LM vocabulary.
  int word_id(const std::string& w) const;
  int bos_id() const { return bos_; }
  int eos_id() const { return eos_; }
  int unk_id() const { return unk_; }

  // Natural-log P(word | ctx); ctx holds LM word ids, most recent last,
  // length <= order-1. word == -1 (OOV) scores as <unk> when the model
  // has one, else a fixed floor. If next_ctx != nullptr it receives the
  // successor context (<= order-1 most recent words, truncated to the
  // longest context known to the model).
  float score(const std::vector<int>& ctx, int word,
              std::vector<int>* next_ctx) const;

  // Convenience (tests / rescoring): total natural-log score of a word
  // sequence conditioned on <s>, optionally terminated by </s>.
  float score_sequence(const int* words, int n, bool add_eos) const;

  // Initial decoder context: [<s>] when the model has one.
  std::vector<int> begin_context() const;

 private:
  struct Entry {
    float prob = 0.f;      // natural log
    float backoff = 0.f;   // natural log
  };
  static std::string pack(const int* ids, int n);

  int order_ = 0;
  int bos_ = -1, eos_ = -1, unk_ = -1;
  std::unordered_map<std::string, int> vocab_;
  std::vector<std::string> words_;
  // tables_[k]: k-gram table (k = 1..order_), key = packed id sequence
  std::vector<std::unordered_map<std::string, Entry>> tables_;
};

}  // namespace eet_lm
