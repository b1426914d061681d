// BPE trainer — spm_train-equivalent for model_type=bpe.
//
// The reference's BPE artifacts were produced with the vendored
// SentencePiece trainer (sentencepiece/build/commands:1: spm_train
// --vocab_size=... --model_type=bpe --character_coverage=1.0
// --pad_id --unk_id --bos_id --eos_id --user_defined_symbols="@").
// This is our native trainer with the same surface: it learns merges by
// iterative most-frequent-pair counting over whitespace-pretokenized,
// ▁-escaped text and serialises a `.model` protobuf that our own
// runtime engine (bpe_tokenizer.cc) and the reference's artifacts share.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "charsmap.h"
#include "spm_train_common.h"

namespace {

using eet_spm::kWs;
using eet_spm::to_chars;
using eet_spm::TrainedPiece;

// --------------------------------------------------------------- trainer ---
struct Trainer {
  int vocab_size = 256;
  int unk_id = 0, bos_id = 1, eos_id = 2, pad_id = -1;
  bool byte_fallback = false;
  std::vector<std::string> user_defined;
  // word (sequence of symbol ids) -> frequency
  std::vector<std::vector<int>> words;
  std::vector<int64_t> freqs;
  std::vector<std::string> symbols;        // id -> surface
  std::unordered_map<std::string, int> sym_id;

  int intern(const std::string& s) {
    auto it = sym_id.find(s);
    if (it != sym_id.end()) return it->second;
    sym_id.emplace(s, int(symbols.size()));
    symbols.push_back(s);
    return int(symbols.size()) - 1;
  }

  void add_sentence(const std::string& line) {
    // normalize: collapse whitespace; split into ▁-prefixed words
    std::istringstream iss(line);
    std::string w;
    while (iss >> w) {
      std::string word = std::string(kWs) + w;
      std::vector<int> ids;
      for (const auto& c : to_chars(word)) ids.push_back(intern(c));
      // merge identical words
      words.push_back(std::move(ids));
      freqs.push_back(1);
    }
  }

  void dedup_words() {
    std::map<std::vector<int>, int64_t> uniq;
    for (size_t i = 0; i < words.size(); ++i) uniq[words[i]] += freqs[i];
    words.clear();
    freqs.clear();
    for (auto& kv : uniq) {
      words.push_back(kv.first);
      freqs.push_back(kv.second);
    }
  }

  std::vector<TrainedPiece> train() {
    dedup_words();
    // character frequencies (always in the vocab, char coverage 1.0)
    std::vector<int64_t> char_freq(symbols.size(), 0);
    for (size_t i = 0; i < words.size(); ++i)
      for (int id : words[i]) char_freq[id] += freqs[i];

    int n_special = 1 /*unk*/ + (bos_id >= 0) + (eos_id >= 0) +
                    (pad_id >= 0) + int(user_defined.size()) +
                    (byte_fallback ? 256 : 0);
    int n_alphabet = int(symbols.size());
    int n_merges = vocab_size - n_special - n_alphabet;
    if (n_merges < 0) n_merges = 0;

    std::vector<std::pair<std::string, float>> merged;  // piece, score
    for (int it = 0; it < n_merges; ++it) {
      // count adjacent pairs
      std::map<std::pair<int, int>, int64_t> pair_freq;
      for (size_t wi = 0; wi < words.size(); ++wi) {
        const auto& w = words[wi];
        for (size_t j = 0; j + 1 < w.size(); ++j)
          pair_freq[{w[j], w[j + 1]}] += freqs[wi];
      }
      if (pair_freq.empty()) break;
      // pick the most frequent (ties: lexicographically first pair ids,
      // i.e. earliest-created symbols — deterministic)
      std::pair<int, int> best;
      int64_t best_f = -1;
      for (const auto& kv : pair_freq)
        if (kv.second > best_f) {
          best_f = kv.second;
          best = kv.first;
        }
      if (best_f < 2) break;  // nothing worth merging
      std::string piece = symbols[best.first] + symbols[best.second];
      int new_id = intern(piece);
      merged.emplace_back(piece, -float(it));
      // apply the merge to every word
      for (auto& w : words) {
        std::vector<int> nw;
        nw.reserve(w.size());
        for (size_t j = 0; j < w.size();) {
          if (j + 1 < w.size() && w[j] == best.first &&
              w[j + 1] == best.second) {
            nw.push_back(new_id);
            j += 2;
          } else {
            nw.push_back(w[j]);
            j += 1;
          }
        }
        w.swap(nw);
      }
    }

    // assemble the piece table with requested special ids
    int total = n_special + n_alphabet + int(merged.size());
    if (total > vocab_size) total = vocab_size;
    std::vector<TrainedPiece> table(std::max(total, vocab_size));
    std::vector<bool> used(table.size(), false);
    auto place = [&](int id, const std::string& s, float sc, int type) {
      if (id >= 0 && id < int(table.size()) && !used[id]) {
        table[id] = {s, sc, type};
        used[id] = true;
      }
    };
    place(unk_id, "<unk>", 0.f, 2);
    place(bos_id, "<s>", 0.f, 3);
    place(eos_id, "</s>", 0.f, 3);
    place(pad_id, "<pad>", 0.f, 3);
    for (const auto& ud : user_defined) {
      // user-defined symbols take the first free slots
      for (size_t i = 0; i < table.size(); ++i)
        if (!used[i]) {
          place(int(i), ud, 0.f, 4);
          break;
        }
    }
    if (byte_fallback)
      // 256 BYTE meta pieces after the user-defined symbols
      // (trainer_interface.cc:800-804)
      for (int b = 0; b < 256; ++b)
        for (size_t i = 0; i < table.size(); ++i)
          if (!used[i]) {
            place(int(i), eet_spm::byte_piece(b), 0.f, 6);
            break;
          }
    // merged pieces by rank, then single characters by frequency
    std::vector<std::pair<std::string, float>> rest = merged;
    {
      std::vector<int> char_ids;
      for (int i = 0; i < n_alphabet; ++i) char_ids.push_back(i);
      std::sort(char_ids.begin(), char_ids.end(), [&](int a, int b) {
        return char_freq[a] > char_freq[b];
      });
      float sc = -float(merged.size());
      for (int id : char_ids) {
        bool is_ud = false;
        for (const auto& ud : user_defined)
          if (symbols[id] == ud) is_ud = true;
        if (is_ud) continue;
        rest.emplace_back(symbols[id], sc);
        sc -= 1.f;
      }
    }
    size_t ri = 0;
    for (size_t i = 0; i < table.size() && ri < rest.size(); ++i)
      if (!used[i]) {
        table[i] = {rest[ri].first, rest[ri].second, 1};
        used[i] = true;
        ++ri;
      }
    for (size_t i = 0; i < table.size(); ++i)
      if (!used[i]) table[i] = {"<unused_" + std::to_string(i) + ">",
                                0.f, 5};
    return table;
  }
};

}  // namespace

extern "C" {

// Trains a BPE model over a corpus file; writes <prefix>.model and
// <prefix>.vocab. user_defined: comma-separated. Returns 0 on success.
// The _norm variant normalizes the corpus through a precompiled charsmap
// blob and embeds it (with its rule-set name) in the emitted model.
int eet_bpe_train_norm_ex(const char* corpus_path,
                          const char* model_prefix, int vocab_size,
                          int unk_id, int bos_id, int eos_id, int pad_id,
                          const char* user_defined, const char* norm_name,
                          const char* charsmap_blob, long blob_len,
                          int byte_fallback) {
  Trainer tr;
  tr.vocab_size = vocab_size;
  tr.unk_id = unk_id;
  tr.bos_id = bos_id;
  tr.eos_id = eos_id;
  tr.pad_id = pad_id;
  tr.byte_fallback = byte_fallback != 0;
  if (user_defined && *user_defined) {
    std::istringstream iss(user_defined);
    std::string tok;
    while (std::getline(iss, tok, ','))
      if (!tok.empty()) tr.user_defined.push_back(tok);
  }
  for (const auto& ud : tr.user_defined) tr.intern(ud);

  eet_spm::Charsmap cm;
  if (charsmap_blob && blob_len > 0 &&
      !cm.load((const uint8_t*)charsmap_blob, size_t(blob_len)))
    return 4;

  std::ifstream f(corpus_path);
  if (!f) return 1;
  std::string line;
  while (std::getline(f, line))
    tr.add_sentence(cm.empty() ? line : cm.normalize_text(line));

  auto table = tr.train();
  std::string nname = (norm_name && *norm_name) ? norm_name : "identity";
  std::string model = eet_spm::serialize_model(
      table, /*model_type=*/2, unk_id, bos_id, eos_id, pad_id, vocab_size,
      nname, std::string(charsmap_blob ? charsmap_blob : "",
                         charsmap_blob ? size_t(blob_len) : 0),
      byte_fallback != 0);
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
      vf << p.piece << "\t" << int(p.score) << "\n";
  }
  return 0;
}

int eet_bpe_train_norm(const char* corpus_path, const char* model_prefix,
                       int vocab_size, int unk_id, int bos_id, int eos_id,
                       int pad_id, const char* user_defined,
                       const char* norm_name, const char* charsmap_blob,
                       long blob_len) {
  return eet_bpe_train_norm_ex(corpus_path, model_prefix, vocab_size,
                               unk_id, bos_id, eos_id, pad_id,
                               user_defined, norm_name, charsmap_blob,
                               blob_len, 0);
}

int eet_bpe_train(const char* corpus_path, const char* model_prefix,
                  int vocab_size, int unk_id, int bos_id, int eos_id,
                  int pad_id, const char* user_defined) {
  return eet_bpe_train_norm_ex(corpus_path, model_prefix, vocab_size,
                               unk_id, bos_id, eos_id, pad_id,
                               user_defined, "identity", nullptr, 0, 0);
}

}  // extern "C"
