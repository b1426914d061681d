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

constexpr size_t kMaxPieceChars = 16;    // max piece length in chars
                                         // (spm max_sentencepiece_length)
constexpr double kPruneKeep = 0.75;      // shrinking_factor per prune round
constexpr int kEmIters = 2;              // EM sub-iterations per round
constexpr double kMinExpected = 0.5;     // M-step expected-count filter
constexpr double kCharCoverage = 0.9995; // character_coverage

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

// digamma(x) via the standard recurrence + asymptotic series (the
// Bayesianified M-step uses exp(digamma(c)) in place of c, acting as a
// sparse prior — unigram_model_trainer.cc RunMStep).
double digamma(double x) {
  double acc = 0.0;
  while (x < 7.0) {
    acc -= 1.0 / x;
    x += 1.0;
  }
  x -= 0.5;
  const double inv = 1.0 / x;
  const double inv2 = inv * inv;
  const double inv4 = inv2 * inv2;
  acc += std::log(x) + inv2 / 24.0 - inv4 * (7.0 / 960.0) +
         inv4 * inv2 * (31.0 / 8064.0) - inv4 * inv4 * (127.0 / 30720.0);
  return acc;
}

struct UnigramTrainer {
  std::vector<Word> words;
  std::unordered_map<std::string, double> logp;  // current vocabulary
  std::set<std::string> required;   // chars inside character_coverage
  size_t max_chars = 1;

  // Exact repeated-substring seeding. The vendored trainer enumerates
  // repeated substrings with an enhanced suffix array (esaxx) over the
  // boundary-joined corpus; since our word list is deduplicated with
  // frequencies and pieces are capped at kMaxPieceChars, per-word hash
  // enumeration yields the identical candidate set (exact corpus counts,
  // freq >= 2, score = freq * chars) without the SA machinery.
  void seed(int target_pieces) {
    std::unordered_map<std::string, int64_t> cand;
    std::unordered_map<std::string, int64_t> char_freq;
    int64_t char_total = 0;
    for (const auto& w : words) {
      size_t n = w.chars.size();
      for (size_t i = 0; i < n; ++i) {
        std::string s;
        for (size_t j = i; j < std::min(n, i + kMaxPieceChars); ++j) {
          s += w.chars[j];
          cand[s] += w.freq;
        }
        char_freq[w.chars[i]] += w.freq;
        char_total += w.freq;
      }
    }
    // character_coverage: the most frequent chars covering 99.95% of
    // occurrences are required; the rare tail is dropped (encodes to
    // unk), matching the spm_train default.
    {
      std::vector<std::pair<int64_t, std::string>> by_freq;
      by_freq.reserve(char_freq.size());
      for (const auto& kv : char_freq)
        by_freq.emplace_back(kv.second, kv.first);
      std::sort(by_freq.begin(), by_freq.end(),
                [](const auto& a, const auto& b) {
                  return a.first != b.first ? a.first > b.first
                                            : a.second < b.second;
                });
      int64_t acc = 0;
      for (const auto& fv : by_freq) {
        if (double(acc) >= kCharCoverage * double(char_total)) break;
        required.insert(fv.second);
        acc += fv.first;
      }
    }
    size_t seed_size = 1000000;   // spm seed_sentencepiece_size default
    std::vector<std::pair<double, std::string>> scored;
    scored.reserve(cand.size());
    for (auto& kv : cand) {
      auto chars = to_chars(kv.first);
      if (chars.size() < 2) continue;    // single chars added below
      if (kv.second < 2) continue;       // repeated substrings only (ESA
                                         // internal nodes have freq >= 2)
      bool covered = true;
      for (const auto& c : chars)
        if (!required.count(c)) { covered = false; break; }
      if (!covered) continue;
      scored.emplace_back(double(kv.second) * double(chars.size()),
                          kv.first);
    }
    std::sort(scored.begin(), scored.end(),
              [](const auto& a, const auto& b) {
                return a.first != b.first ? a.first > b.first
                                          : a.second < b.second;
              });
    if (scored.size() > seed_size) scored.resize(seed_size);

    double total = 0;
    for (const auto& sv : scored) total += sv.first;
    for (const auto& c : required) total += double(char_freq[c]);
    for (const auto& sv : scored)
      logp[sv.second] = std::log(sv.first / total);
    for (const auto& c : required)
      logp[c] = std::log(double(char_freq[c]) / total);
    for (const auto& kv : logp)
      max_chars = std::max(max_chars, to_chars(kv.first).size());
  }

  // One EM iteration: forward-backward expected counts (E), then the
  // Bayesianified M-step — drop pieces with expected count < 0.5 and set
  // logp = digamma(c) - digamma(sum), a sparse prior (RunMStep).
  // Required single chars are exempt from the drop so every covered word
  // stays encodable mid-training (spm re-adds them at finalize instead).
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
      if (z == -HUGE_VAL) continue;      // word outside char coverage
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
    std::unordered_map<std::string, double> kept;
    double sum = 0;
    for (const auto& kv : logp) {
      auto it = counts.find(kv.first);
      double c = it == counts.end() ? 0.0 : it->second;
      if (c < kMinExpected) {
        if (!required.count(kv.first)) continue;
        c = kMinExpected;                // floor for required chars
      }
      kept[kv.first] = c;
      sum += c;
    }
    if (kept.empty() || sum <= 0) return;
    const double logz = digamma(sum);
    std::unordered_map<std::string, double> next;
    for (const auto& kv : kept)
      next[kv.first] = digamma(kv.second) - logz;
    logp.swap(next);
    max_chars = 1;
    for (const auto& kv : logp)
      max_chars = std::max(max_chars, to_chars(kv.first).size());
  }

  // Viterbi segmentation of `surface` under the current vocabulary.
  // skip_self: exclude the piece spanning the whole surface (to find the
  // best ALTERNATIVE segmentation, PruneSentencePieces' 2-best).
  std::vector<std::string> viterbi(const std::vector<std::string>& chars,
                                   bool skip_self) {
    size_t n = chars.size();
    std::vector<std::string> prefix(n + 1);
    for (size_t i = 0; i < n; ++i) prefix[i + 1] = prefix[i] + chars[i];
    std::vector<double> best(n + 1, -HUGE_VAL);
    std::vector<size_t> back(n + 1, 0);
    best[0] = 0.0;
    for (size_t j = 1; j <= n; ++j)
      for (size_t i = j > max_chars ? j - max_chars : 0; i < j; ++i) {
        if (best[i] == -HUGE_VAL) continue;
        if (skip_self && i == 0 && j == n) continue;
        auto it = logp.find(prefix[j].substr(prefix[i].size()));
        if (it != logp.end() && best[i] + it->second > best[j]) {
          best[j] = best[i] + it->second;
          back[j] = i;
        }
      }
    std::vector<std::string> out;
    if (best[n] == -HUGE_VAL) return out;
    for (size_t j = n; j > 0; j = back[j])
      out.push_back(prefix[j].substr(prefix[back[j]].size()));
    std::reverse(out.begin(), out.end());
    return out;
  }

  // One prune round (PruneSentencePieces): rank pieces by the corpus
  // likelihood lost if each is removed and its occurrences re-segmented
  // into its best alternative; keep the top shrinking_factor fraction
  // (never below `floor_size`).
  void prune_round(size_t floor_size) {
    // 1) each piece's best alternative segmentation of itself
    std::unordered_map<std::string, std::vector<std::string>> alts;
    std::vector<std::string> order;
    order.reserve(logp.size());
    for (const auto& kv : logp) order.push_back(kv.first);
    std::sort(order.begin(), order.end());
    for (const auto& p : order) {
      auto chars = to_chars(p);
      if (chars.size() < 2) continue;    // single chars handled via freq
      // if the piece's own Viterbi splits, it can be removed freely;
      // otherwise its 2nd-best (self-excluded Viterbi) is the alternative
      auto self_best = viterbi(chars, /*skip_self=*/false);
      if (self_best.size() >= 2) {
        alts[p] = {};                    // removable at zero modelled cost
      } else {
        alts[p] = viterbi(chars, /*skip_self=*/true);
      }
    }
    // 2) Viterbi-segment the corpus: piece frequencies + per-piece
    //    occurrence mass (F)
    std::unordered_map<std::string, double> vfreq;
    std::unordered_map<std::string, double> fmass;
    double vsum = 0;
    for (const auto& w : words) {
      auto segs = viterbi(w.chars, false);
      vsum += double(w.freq);
      for (const auto& s : segs) {
        vfreq[s] += double(w.freq);
        fmass[s] += double(w.freq);
      }
    }
    double sum = 0;
    for (const auto& kv : vfreq) sum += kv.second;
    const double logsum = std::log(std::max(sum, 1e-9));
    // 3) removal loss per piece
    std::vector<std::pair<double, std::string>> candidates;
    std::vector<std::string> keep_always;
    for (const auto& p : order) {
      auto chars = to_chars(p);
      if (chars.size() < 2) {
        keep_always.push_back(p);        // required/single chars
        continue;
      }
      auto ai = alts.find(p);
      double f = vfreq.count(p) ? vfreq[p] : 0.0;
      if (f == 0.0 || (ai != alts.end() && ai->second.empty() &&
                       viterbi(chars, false).size() >= 2)) {
        // unused on the Viterbi paths, or freely re-segmentable: drop
        continue;
      }
      if (ai == alts.end() || ai->second.empty()) {
        keep_always.push_back(p);        // no alternative: must keep
        continue;
      }
      const auto& alt = ai->second;
      double F = (fmass.count(p) ? fmass[p] : 0.0) / std::max(vsum, 1e-9);
      double logprob_sp = std::log(f) - logsum;
      double logsum_alt =
          std::log(sum + f * double(alt.size() ? alt.size() - 1 : 0));
      double logprob_alt = 0;
      for (const auto& a : alt)
        logprob_alt +=
            std::log((vfreq.count(a) ? vfreq[a] : 0.0) + f) - logsum_alt;
      candidates.emplace_back(F * (logprob_sp - logprob_alt), p);
    }
    std::sort(candidates.begin(), candidates.end(),
              [](const auto& a, const auto& b) {
                return a.first != b.first ? a.first > b.first
                                          : a.second < b.second;
              });
    size_t pruned_size = std::max(
        floor_size, size_t(kPruneKeep * double(logp.size())));
    std::unordered_map<std::string, double> next;
    for (const auto& p : keep_always) next.emplace(p, logp[p]);
    for (const auto& c : candidates) {
      if (next.size() >= pruned_size) break;
      next.emplace(c.second, logp[c.second]);
    }
    logp.swap(next);
    max_chars = 1;
    for (const auto& kv : logp)
      max_chars = std::max(max_chars, to_chars(kv.first).size());
  }

  std::vector<std::pair<std::string, float>> train(int target_pieces) {
    seed(target_pieces);
    // spm: shrink to desired = 1.1 * vocab, then finalize to vocab
    size_t desired = size_t(double(target_pieces) * 1.1);
    while (true) {
      for (int e = 0; e < kEmIters; ++e) em_step();
      if (logp.size() <= desired) break;
      prune_round(desired);
    }
    // finalize: required chars always present (re-added at min score if
    // the EM filter dropped them), then highest-scoring pieces to target
    double min_score = 0;
    for (const auto& kv : logp) min_score = std::min(min_score, kv.second);
    double penalty = 0;
    std::vector<std::pair<std::string, float>> out;
    std::set<std::string> in_out;
    for (const auto& c : required) {
      auto it = logp.find(c);
      double s = it != logp.end() ? it->second
                                  : min_score + (penalty += 1e-4);
      out.emplace_back(c, float(s));
      in_out.insert(c);
    }
    std::vector<std::pair<double, std::string>> rest;
    for (const auto& kv : logp)
      if (!in_out.count(kv.first)) rest.emplace_back(kv.second, kv.first);
    std::sort(rest.begin(), rest.end(), [](const auto& a, const auto& b) {
      return a.first != b.first ? a.first > b.first : a.second < b.second;
    });
    for (const auto& sv : rest) {
      if (int(out.size()) >= target_pieces) break;
      out.emplace_back(sv.second, float(sv.first));
    }
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
int eet_bpe_train_norm_ex(const char*, const char*, int, int, int, int,
                          int, const char*, const char*, const char*, long,
                          int);
int eet_spm_train_norm_ex(const char* corpus_path, const char* model_prefix,
                          int vocab_size, int unk_id, int bos_id,
                          int eos_id, int pad_id, const char* user_defined,
                          int model_type, const char* norm_name,
                          const char* norm_tsv, int byte_fallback);

int eet_spm_train(const char* corpus_path, const char* model_prefix,
                  int vocab_size, int unk_id, int bos_id, int eos_id,
                  int pad_id, const char* user_defined, int model_type) {
  return eet_spm_train_norm_ex(corpus_path, model_prefix, vocab_size,
                               unk_id, bos_id, eos_id, pad_id,
                               user_defined, model_type, "identity", "",
                               0);
}

int eet_spm_train_blob_ex(const char* corpus_path, const char* model_prefix,
                          int vocab_size, int unk_id, int bos_id,
                          int eos_id, int pad_id, const char* user_defined,
                          int model_type, const char* norm_name,
                          const char* blob_data, long blob_len,
                          int byte_fallback);

int eet_spm_train_norm(const char* corpus_path, const char* model_prefix,
                       int vocab_size, int unk_id, int bos_id, int eos_id,
                       int pad_id, const char* user_defined, int model_type,
                       const char* norm_name, const char* norm_tsv) {
  return eet_spm_train_norm_ex(corpus_path, model_prefix, vocab_size,
                               unk_id, bos_id, eos_id, pad_id,
                               user_defined, model_type, norm_name,
                               norm_tsv, 0);
}

int eet_spm_train_norm_ex(const char* corpus_path, const char* model_prefix,
                          int vocab_size, int unk_id, int bos_id,
                          int eos_id, int pad_id, const char* user_defined,
                          int model_type, const char* norm_name,
                          const char* norm_tsv, int byte_fallback) {
  std::string blob;
  if (norm_tsv && *norm_tsv) {
    std::vector<std::pair<std::string, std::string>> rules;
    if (!eet_spm::load_rule_tsv(norm_tsv, &rules)) return 4;
    blob = eet_spm::compile_charsmap(rules);
    if (blob.empty()) return 4;
  }
  return eet_spm_train_blob_ex(corpus_path, model_prefix, vocab_size,
                               unk_id, bos_id, eos_id, pad_id,
                               user_defined, model_type, norm_name,
                               blob.data(), long(blob.size()),
                               byte_fallback);
}

int eet_spm_train_blob(const char* corpus_path, const char* model_prefix,
                       int vocab_size, int unk_id, int bos_id, int eos_id,
                       int pad_id, const char* user_defined, int model_type,
                       const char* norm_name, const char* blob_data,
                       long blob_len) {
  return eet_spm_train_blob_ex(corpus_path, model_prefix, vocab_size,
                               unk_id, bos_id, eos_id, pad_id,
                               user_defined, model_type, norm_name,
                               blob_data, blob_len, 0);
}

// Variant taking a ready-made precompiled charsmap blob — e.g. the
// GENUINE nmt_nfkc blob (224,725 rules) extracted from an existing
// artifact's NormalizerSpec, rather than the generated rule TSVs.
int eet_spm_train_blob_ex(const char* corpus_path, const char* model_prefix,
                          int vocab_size, int unk_id, int bos_id,
                          int eos_id, int pad_id, const char* user_defined,
                          int model_type, const char* norm_name,
                          const char* blob_data, long blob_len,
                          int byte_fallback) {
  std::string blob(blob_data ? blob_data : "", size_t(std::max(blob_len,
                                                               0L)));
  std::string nname = (norm_name && *norm_name) ? norm_name : "identity";
  if (model_type == 2)
    return eet_bpe_train_norm_ex(corpus_path, model_prefix, vocab_size,
                                 unk_id, bos_id, eos_id, pad_id,
                                 user_defined, nname.c_str(), blob.data(),
                                 long(blob.size()), byte_fallback);
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
                  int(ud.size()) + (byte_fallback ? 256 : 0);
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
                                       bos_id, eos_id, pad_id,
                                       byte_fallback != 0);
  std::string model = eet_spm::serialize_model(
      table, model_type, unk_id, bos_id, eos_id, pad_id, vocab_size,
      nname, blob, byte_fallback != 0);
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
