// Shared pieces of the native SentencePiece-format trainers: protobuf
// writer, piece table serialization, UTF-8 helpers, and the whitespace
// pretokenizer (▁-escaped words with frequencies).  Used by the BPE
// trainer (bpe_trainer.cc) and the unigram/char/word trainers
// (unigram_trainer.cc); the model files they emit are read by our own
// engine (bpe_tokenizer.cc) and by SentencePiece itself.
#ifndef EET_SPM_TRAIN_COMMON_H_
#define EET_SPM_TRAIN_COMMON_H_

#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <type_traits>
#include <vector>

namespace eet_spm {

inline const char* kWs = "\xe2\x96\x81";  // ▁ U+2581

inline size_t utf8_len(uint8_t b) {
  if (b < 0x80) return 1;
  if ((b >> 5) == 0x6) return 2;
  if ((b >> 4) == 0xe) return 3;
  if ((b >> 3) == 0x1e) return 4;
  return 1;
}

// `<0xXX>` byte-piece name (sentencepiece ByteToPiece,
// model_interface.cc:193)
inline std::string byte_piece(int b) {
  static const char* hex = "0123456789ABCDEF";
  std::string s = "<0x00>";
  s[3] = hex[(b >> 4) & 0xf];
  s[4] = hex[b & 0xf];
  return s;
}

inline std::vector<std::string> to_chars(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    size_t n = utf8_len(uint8_t(s[i]));
    if (i + n > s.size()) n = 1;
    out.push_back(s.substr(i, n));
    i += n;
  }
  return out;
}

// ------------------------------------------------------------- protobuf ---
struct ProtoWriter {
  std::string buf;
  void varint(uint64_t v) {
    while (v >= 0x80) {
      buf.push_back(char((v & 0x7f) | 0x80));
      v >>= 7;
    }
    buf.push_back(char(v));
  }
  void key(int field, int wtype) { varint(uint64_t(field) << 3 | wtype); }
  void str(int field, const std::string& s) {
    key(field, 2);
    varint(s.size());
    buf += s;
  }
  void f32(int field, float f) {
    key(field, 5);
    char tmp[4];
    memcpy(tmp, &f, 4);
    buf.append(tmp, 4);
  }
  void u64(int field, uint64_t v) {
    key(field, 0);
    varint(v);
  }
};

struct TrainedPiece {
  std::string piece;
  float score;
  int type;  // 1 normal, 2 unk, 3 control, 4 user_defined, 5 unused
};

// model_type: 1 unigram, 2 bpe, 3 word, 4 char (TrainerSpec.ModelType).
// charsmap: optional precompiled normalizer blob (NormalizerSpec field 2);
// norm_name names the rule set it was compiled from.
inline std::string serialize_model(const std::vector<TrainedPiece>& pieces,
                                   int model_type, int unk_id, int bos_id,
                                   int eos_id, int pad_id, int vocab_size,
                                   const std::string& norm_name = "identity",
                                   const std::string& charsmap = "",
                                   bool byte_fallback = false) {
  ProtoWriter model;
  for (const auto& p : pieces) {
    ProtoWriter sp;
    sp.str(1, p.piece);
    sp.f32(2, p.score);
    if (p.type != 1) sp.u64(3, uint64_t(p.type));
    model.str(1, sp.buf);
  }
  ProtoWriter trainer;
  trainer.u64(3, uint64_t(model_type));
  trainer.u64(4, uint64_t(vocab_size));
  if (byte_fallback) trainer.u64(35, 1);  // TrainerSpec.byte_fallback
  trainer.u64(40, uint64_t(unk_id));
  trainer.u64(41, uint64_t(bos_id < 0 ? 0xffffffffffffffffull : bos_id));
  trainer.u64(42, uint64_t(eos_id < 0 ? 0xffffffffffffffffull : eos_id));
  trainer.u64(43, uint64_t(pad_id < 0 ? 0xffffffffffffffffull : pad_id));
  model.str(2, trainer.buf);
  ProtoWriter norm;
  norm.str(1, norm_name);
  if (!charsmap.empty()) norm.str(2, charsmap);
  norm.u64(3, 1);                        // add_dummy_prefix
  norm.u64(4, 1);                        // remove_extra_whitespaces
  norm.u64(5, 1);                        // escape_whitespaces
  model.str(3, norm.buf);
  return model.buf;
}

// Reads a corpus line by line, normalizes through the optional charsmap
// (any type with normalize_text(std::string) — charsmap.h's Charsmap),
// whitespace-pretokenizes, and returns the distinct ▁-escaped words with
// their frequencies.
template <typename CM = int>
inline bool load_word_counts(const char* corpus_path,
                             std::map<std::string, int64_t>* counts,
                             const CM* charsmap = nullptr) {
  std::ifstream f(corpus_path);
  if (!f) return false;
  std::string line;
  bool first = true;
  while (std::getline(f, line)) {
    if (first) {
      // strip a UTF-8 BOM (the vendored normalizer maps U+FEFF away)
      if (line.size() >= 3 && (unsigned char)line[0] == 0xEF &&
          (unsigned char)line[1] == 0xBB && (unsigned char)line[2] == 0xBF)
        line.erase(0, 3);
      first = false;
    }
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if constexpr (!std::is_same_v<CM, int>) {
      if (charsmap) line = charsmap->normalize_text(line);
    }
    std::istringstream iss(line);
    std::string w;
    while (iss >> w) (*counts)[std::string(kWs) + w] += 1;
  }
  return true;
}

// Places specials/user-defined pieces at their requested ids, fills the
// remaining slots with `learned` in order, pads with <unused_i>.
inline std::vector<TrainedPiece> assemble_table(
    const std::vector<std::pair<std::string, float>>& learned,
    const std::vector<std::string>& user_defined, int vocab_size,
    int unk_id, int bos_id, int eos_id, int pad_id,
    bool byte_fallback = false) {
  std::vector<TrainedPiece> table(vocab_size);
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
  for (const auto& ud : user_defined)
    for (size_t i = 0; i < table.size(); ++i)
      if (!used[i]) {
        place(int(i), ud, 0.f, 4);
        break;
      }
  if (byte_fallback)
    // 256 BYTE meta pieces right after the user-defined symbols
    // (trainer_interface.cc:800-804)
    for (int b = 0; b < 256; ++b)
      for (size_t i = 0; i < table.size(); ++i)
        if (!used[i]) {
          place(int(i), byte_piece(b), 0.f, 6);
          break;
        }
  size_t ri = 0;
  for (size_t i = 0; i < table.size() && ri < learned.size(); ++i)
    if (!used[i]) {
      table[i] = {learned[ri].first, learned[ri].second, 1};
      used[i] = true;
      ++ri;
    }
  for (size_t i = 0; i < table.size(); ++i)
    if (!used[i])
      table[i] = {"<unused_" + std::to_string(i) + ">", 0.f, 5};
  return table;
}

}  // namespace eet_spm

#endif  // EET_SPM_TRAIN_COMMON_H_
