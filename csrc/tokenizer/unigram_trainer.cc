// Unigram / char / word trainers — spm_train equivalents for
// model_type={unigram,char,word} (the vendored library trains these in
// sentencepiece/src/unigram_model_trainer.cc, char_model_trainer.cc,
// word_model_trainer.cc; our BPE trainer lives in bpe_trainer.cc).
//
// The unigram trainer implements the subword-regularization training
// algorithm (Kudo 2018): seed a large candidate vocabulary from frequent
// substrings, run EM where the E-step computes expected piece counts by
// forward-backward over each word's segmentation lattice, then
// iteratively prune the pieces whose removal costs the least likelihood
// until the target vocabulary size is reached.  Single characters are
// never pruned so every input stays encodable.  Scores in the emitted
// model are the final log-probabilities, which is exactly what the
// Viterbi encoder (bpe_tokenizer.cc) consumes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <map>
#include <set>
#include <string>
#include <unordered_map>
#include <vector>

#include "charsmap.h"
#include "spm_train_common.h"

namespace {

using eet_spm::TrainedPiece;
using eet_spm::to_chars;

constexpr size_t kMaxPieceChars = 8;     // seed substring window (chars)
constexpr double kPruneKeep = 0.75;      // fraction kept per prune round
constexpr int kEmIters = 2;              // EM sub-iterations per round

struct Word {
  std::vector<std::string> chars;
  int64_t freq;
};

double logsumexp(double a, double b) {
  if (a == -HUGE_VAL) return b;
  if (b == -HUGE_VAL) return a;
  double hi = a > b ? a : b;
  return hi + std::log(std::exp(a - hi) + std::exp(b - hi));
}

struct UnigramTrainer {
  std::vector<Word> words;
  std::unordered_map<std::string, double> logp;  // current vocabulary
  std::set<std::string> required;                // single chars, never pruned
  size_t max_chars = 1;

  void seed(int target_pieces) {
    // candidate substrings scored by freq * char-length
    std::unordered_map<std::string, int64_t> cand;
    for (const auto& w : words) {
      size_t n = w.chars.size();
      for (size_t i = 0; i < n; ++i) {
        std::string s;
        for (size_t j = i; j < std::min(n, i + kMaxPieceChars); ++j) {
          s += w.chars[j];
          cand[s] += w.freq;
        }
      }
      for (const auto& c : w.chars) required.insert(c);
    }
    size_t seed_size = std::max<size_t>(size_t(target_pieces) * 8, 1024);
    std::vector<std::pair<double, std::string>> scored;
    scored.reserve(cand.size());
    for (auto& kv : cand) {
      size_t chars = to_chars(kv.first).size();
      if (chars < 2) continue;           // single chars added below
      scored.emplace_back(double(kv.second) * double(chars), kv.first);
    }
    std::sort(scored.begin(), scored.end(),
              [](const auto& a, const auto& b) {
                return a.first != b.first ? a.first > b.first
                                          : a.second < b.second;
              });
    if (scored.size() > seed_size) scored.resize(seed_size);

    double total = 0;
    for (const auto& sv : scored) total += sv.first;
    for (const auto& c : required) {
      auto it = cand.find(c);
      total += it == cand.end() ? 1.0 : double(it->second);
    }
    for (const auto& sv : scored)
      logp[sv.second] = std::log(sv.first / total);
    for (const auto& c : required) {
      auto it = cand.find(c);
      double f = it == cand.end() ? 1.0 : double(it->second);
      logp[c] = std::log(f / total);
    }
    for (const auto& kv : logp)
      max_chars = std::max(max_chars, to_chars(kv.first).size());
  }

  // One EM iteration; returns expected piece counts (the E-step) already
  // folded into new probabilities (the M-step).
  void em_step() {
    std::unordered_map<std::string, double> counts;
    for (const auto& w : words) {
      size_t n = w.chars.size();
      // byte offsets of char boundaries
      std::vector<std::string> prefix(n + 1);
      for (size_t i = 0; i < n; ++i) prefix[i + 1] = prefix[i] + w.chars[i];
      auto piece_at = [&](size_t i, size_t j) {
        return prefix[j].substr(prefix[i].size());
      };
      std::vector<double> alpha(n + 1, -HUGE_VAL), beta(n + 1, -HUGE_VAL);
      alpha[0] = 0.0;
      for (size_t j = 1; j <= n; ++j)
        for (size_t i = j > max_chars ? j - max_chars : 0; i < j; ++i) {
          if (alpha[i] == -HUGE_VAL) continue;
          auto it = logp.find(piece_at(i, j));
          if (it != logp.end())
            alpha[j] = logsumexp(alpha[j], alpha[i] + it->second);
        }
      double z = alpha[n];
      if (z == -HUGE_VAL) continue;      // unencodable (cannot happen
                                         // while single chars survive)
      beta[n] = 0.0;
      for (size_t i = n; i-- > 0;)
        for (size_t j = i + 1; j <= std::min(n, i + max_chars); ++j) {
          if (beta[j] == -HUGE_VAL) continue;
          auto it = logp.find(piece_at(i, j));
          if (it != logp.end())
            beta[i] = logsumexp(beta[i], it->second + beta[j]);
        }
      for (size_t i = 0; i < n; ++i) {
        if (alpha[i] == -HUGE_VAL) continue;
        for (size_t j = i + 1; j <= std::min(n, i + max_chars); ++j) {
          auto it = logp.find(piece_at(i, j));
          if (it == logp.end() || beta[j] == -HUGE_VAL) continue;
          double post = alpha[i] + it->second + beta[j] - z;
          if (post > -30.0)
            counts[it->first] += double(w.freq) * std::exp(post);
        }
      }
    }
    double total = 0;
    for (const auto& kv : counts) total += kv.second;
    if (total <= 0) return;
    std::unordered_map<std::string, double> next;
    for (const auto& kv : logp) {
      auto it = counts.find(kv.first);
      // unused pieces get a floor instead of -inf so pruning can rank them
      double c = it == counts.end() ? 1e-6 : std::max(it->second, 1e-6);
      next[kv.first] = std::log(c / total);
    }
    logp.swap(next);
  }

  // Viterbi segmentation score of `surface` using the current vocabulary,
  // excluding the piece equal to the full surface (its pruning alternative).
  double alt_score(const std::string& surface) {
    auto chars = to_chars(surface);
    size_t n = chars.size();
    std::vector<std::string> prefix(n + 1);
    for (size_t i = 0; i < n; ++i) prefix[i + 1] = prefix[i] + chars[i];
    std::vector<double> best(n + 1, -HUGE_VAL);
    best[0] = 0.0;
    for (size_t j = 1; j <= n; ++j)
      for (size_t i = j > max_chars ? j - max_chars : 0; i < j; ++i) {
        if (best[i] == -HUGE_VAL) continue;
        if (i == 0 && j == n) continue;  // the piece itself
        auto it = logp.find(prefix[j].substr(prefix[i].size()));
        if (it != logp.end())
          best[j] = std::max(best[j], best[i] + it->second);
      }
    return best[n];
  }

  void prune_to(size_t target) {
    while (logp.size() > target) {
      for (int e = 0; e < kEmIters; ++e) em_step();
      // rank multi-char pieces by how much likelihood their removal costs:
      // usage-weighted gap between the piece's own logp and its best
      // alternative segmentation
      std::vector<std::pair<double, std::string>> loss;
      for (const auto& kv : logp) {
        if (required.count(kv.first)) continue;
        double alt = alt_score(kv.first);
        // usage-weighted likelihood loss: exp(logp) is the piece's usage
        // share, (logp - alt) the per-use cost of segmenting it instead
        double l = alt == -HUGE_VAL
                       ? HUGE_VAL
                       : std::exp(kv.second) * (kv.second - alt);
        loss.emplace_back(l, kv.first);
      }
      if (loss.empty()) break;
      std::sort(loss.begin(), loss.end(), [](const auto& a, const auto& b) {
        return a.first != b.first ? a.first > b.first : a.second < b.second;
      });
      size_t keep = std::max(
          target > required.size() ? target - required.size() : 0,
          size_t(double(loss.size()) * kPruneKeep));
      if (keep >= loss.size()) keep = loss.size() - 1;
      for (size_t k = keep; k < loss.size(); ++k)
        logp.erase(loss[k].second);
    }
    for (int e = 0; e < kEmIters; ++e) em_step();
  }

  std::vector<std::pair<std::string, float>> train(int target_pieces) {
    seed(target_pieces);
    if (int(logp.size()) > target_pieces)
      prune_to(size_t(target_pieces));
    else
      for (int e = 0; e < 2 * kEmIters; ++e) em_step();
    std::vector<std::pair<std::string, float>> out;
    out.reserve(logp.size());
    for (const auto& kv : logp)
      out.emplace_back(kv.first, float(kv.second));
    std::sort(out.begin(), out.end(), [](const auto& a, const auto& b) {
      return a.second != b.second ? a.second > b.second
                                  : a.first < b.first;
    });
    if (int(out.size()) > target_pieces) out.resize(target_pieces);
    return out;
  }
};

// Char/word trainers: frequency-ranked vocabulary with log-prob scores.
std::vector<std::pair<std::string, float>> freq_vocab(
    const std::map<std::string, int64_t>& counts, int target_pieces) {
  std::vector<std::pair<std::string, int64_t>> by_freq(counts.begin(),
                                                       counts.end());
  std::sort(by_freq.begin(), by_freq.end(),
            [](const auto& a, const auto& b) {
              return a.second != b.second ? a.second > b.second
                                          : a.first < b.first;
            });
  if (int(by_freq.size()) > target_pieces) by_freq.resize(target_pieces);
  double total = 0;
  for (const auto& kv : by_freq) total += double(kv.second);
  std::vector<std::pair<std::string, float>> out;
  out.reserve(by_freq.size());
  for (const auto& kv : by_freq)
    out.emplace_back(kv.first,
                     float(std::log(double(kv.second) / total)));
  return out;
}

}  // namespace

extern "C" {

// Trains a unigram (model_type=1), word (3) or char (4) model over a
// corpus file; writes <prefix>.model and <prefix>.vocab.  BPE (2) lives
// in bpe_trainer.cc; eet_spm_train* dispatch there too so callers have
// one entry point for all four types.  The _norm variant additionally
// compiles a normalization rule TSV (tools/gen_norm_rules.py emits the
// nfkc / nmt_nfkc built-ins) into a charsmap that is applied to the
// corpus during training and embedded in the emitted model, exactly as
// the vendored spm_train does with --normalization_rule_{name,tsv}.
int eet_bpe_train_norm(const char*, const char*, int, int, int, int, int,
                       const char*, const char*, const char*, long);
int eet_spm_train_norm(const char* corpus_path, const char* model_prefix,
                       int vocab_size, int unk_id, int bos_id, int eos_id,
                       int pad_id, const char* user_defined, int model_type,
                       const char* norm_name, const char* norm_tsv);

int eet_spm_train(const char* corpus_path, const char* model_prefix,
                  int vocab_size, int unk_id, int bos_id, int eos_id,
                  int pad_id, const char* user_defined, int model_type) {
  return eet_spm_train_norm(corpus_path, model_prefix, vocab_size, unk_id,
                            bos_id, eos_id, pad_id, user_defined,
                            model_type, "identity", "");
}

int eet_spm_train_norm(const char* corpus_path, const char* model_prefix,
                       int vocab_size, int unk_id, int bos_id, int eos_id,
                       int pad_id, const char* user_defined, int model_type,
                       const char* norm_name, const char* norm_tsv) {
  std::string blob;
  if (norm_tsv && *norm_tsv) {
    std::vector<std::pair<std::string, std::string>> rules;
    if (!eet_spm::load_rule_tsv(norm_tsv, &rules)) return 4;
    blob = eet_spm::compile_charsmap(rules);
    if (blob.empty()) return 4;
  }
  std::string nname = (norm_name && *norm_name) ? norm_name : "identity";
  if (model_type == 2)
    return eet_bpe_train_norm(corpus_path, model_prefix, vocab_size,
                              unk_id, bos_id, eos_id, pad_id, user_defined,
                              nname.c_str(), blob.data(), long(blob.size()));
  if (model_type < 1 || model_type > 4) return 3;
  eet_spm::Charsmap cm;
  if (!blob.empty() &&
      !cm.load((const uint8_t*)blob.data(), blob.size()))
    return 4;

  std::vector<std::string> ud;
  if (user_defined && *user_defined) {
    std::string tok;
    for (const char* p = user_defined;; ++p) {
      if (*p == ',' || *p == '\0') {
        if (!tok.empty()) ud.push_back(tok);
        tok.clear();
        if (*p == '\0') break;
      } else {
        tok.push_back(*p);
      }
    }
  }

  std::map<std::string, int64_t> word_counts;
  if (!eet_spm::load_word_counts(corpus_path, &word_counts,
                                 cm.empty() ? nullptr : &cm))
    return 1;

  int n_special = 1 + (bos_id >= 0) + (eos_id >= 0) + (pad_id >= 0) +
                  int(ud.size());
  int target = vocab_size - n_special;
  if (target <= 0) return 3;

  std::vector<std::pair<std::string, float>> learned;
  if (model_type == 3) {                 // WORD: whole-word vocabulary
    learned = freq_vocab(word_counts, target);
  } else if (model_type == 4) {          // CHAR: character vocabulary
    std::map<std::string, int64_t> char_counts;
    for (const auto& kv : word_counts)
      for (const auto& c : to_chars(kv.first))
        char_counts[c] += kv.second;
    learned = freq_vocab(char_counts, target);
  } else {                               // UNIGRAM: EM + pruning
    UnigramTrainer tr;
    tr.words.reserve(word_counts.size());
    for (const auto& kv : word_counts)
      tr.words.push_back({to_chars(kv.first), kv.second});
    learned = tr.train(target);
  }

  auto table = eet_spm::assemble_table(learned, ud, vocab_size, unk_id,
                                       bos_id, eos_id, pad_id);
  std::string model = eet_spm::serialize_model(
      table, model_type, unk_id, bos_id, eos_id, pad_id, vocab_size,
      nname, blob);
  {
    std::ofstream mf(std::string(model_prefix) + ".model",
                     std::ios::binary);
    if (!mf) return 2;
    mf.write(model.data(), std::streamsize(model.size()));
  }
  {
    std::ofstream vf(std::string(model_prefix) + ".vocab");
    if (!vf) return 2;
    for (const auto& p : table)
      vf << p.piece << "\t" << p.score << "\n";
  }
  return 0;
}

}  // extern "C"
