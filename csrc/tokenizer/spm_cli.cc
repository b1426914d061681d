// eet_spm — native CLI with the reference's SentencePiece tool surface
// (sentencepiece/src/CMakeLists.txt:267-271: spm_train / spm_encode /
// spm_decode / spm_export_vocab), as used by the artifact recipe in
// sentencepiece/build/commands:1-2.
//
//   eet_spm train  --input=corpus.txt --model_prefix=m --vocab_size=256
//                  --pad_id=126 --unk_id=127 --bos_id=1 --eos_id=2
//                  --user_defined_symbols=@
//   eet_spm encode --model m.model   (stdin -> piece ids per line)
//   eet_spm encode --model m.model --output_format=piece
//   eet_spm decode --model m.model   (stdin ids -> text)
//   eet_spm export_vocab --model m.model
//   eet_spm normalize [--normalization_rule_name=identity|nfkc]
//                     [--remove_extra_whitespaces=true]
//
// normalize covers the spm_normalize tool (CMakeLists.txt:269):
//   --model=m.model applies the model's embedded charsmap;
//   --normalization_rule_tsv compiles and applies a rule file;
//   --normalization_rule_name={identity,nfkc,nmt_nfkc} resolves the
//   generated rule TSVs (tools/gen_norm_rules.py -> csrc/tokenizer/data/,
//   override the directory with EET_NORM_DATA), falling back to an
//   NFKC-lite subset if the data files are absent.
// train accepts the same --normalization_rule_{name,tsv} flags and embeds
// the compiled charsmap in the emitted model, like the vendored
// spm_train.

#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "charsmap.h"

extern "C" {
int eet_bpe_train(const char*, const char*, int, int, int, int, int,
                  const char*);
int eet_spm_train(const char*, const char*, int, int, int, int, int,
                  const char*, int);
int eet_spm_train_norm(const char*, const char*, int, int, int, int, int,
                       const char*, int, const char*, const char*);
int eet_spm_train_norm_ex(const char*, const char*, int, int, int, int,
                          int, const char*, int, const char*, const char*,
                          int);
int eet_spm_train_blob(const char*, const char*, int, int, int, int, int,
                       const char*, int, const char*, const char*, long);
int eet_spm_train_blob_ex(const char*, const char*, int, int, int, int,
                          int, const char*, int, const char*, const char*,
                          long, int);
int eet_bpe_normalize(void*, const char*, char*, int);
void* eet_bpe_load(const char*);
void eet_bpe_free(void*);
int eet_bpe_piece_size(void*);
int eet_bpe_encode(void*, const char*, int*, int);
int eet_bpe_decode(void*, const int*, int, char*, int);
int eet_bpe_id_to_piece(void*, int, char*, int);
}

namespace {

std::string flag(int argc, char** argv, const std::string& name,
                 const std::string& dflt = "") {
  std::string pref = "--" + name + "=";
  for (int i = 0; i < argc; ++i)
    if (strncmp(argv[i], pref.c_str(), pref.size()) == 0)
      return std::string(argv[i] + pref.size());
  return dflt;
}

int iflag(int argc, char** argv, const std::string& name, int dflt) {
  std::string v = flag(argc, argv, name);
  return v.empty() ? dflt : atoi(v.c_str());
}

// Decodes one UTF-8 codepoint at s[i]; advances i. Invalid bytes pass
// through as themselves (latin-1 fallback, never crashes).
uint32_t utf8_next(const std::string& s, size_t& i) {
  unsigned char c = s[i];
  int extra = c >= 0xF0 ? 3 : c >= 0xE0 ? 2 : c >= 0xC0 ? 1 : 0;
  if (extra == 0 || i + extra >= s.size()) {
    ++i;
    return c;
  }
  uint32_t cp = c & (0x3F >> extra);
  for (int k = 0; k < extra; ++k) cp = (cp << 6) | (s[i + 1 + k] & 0x3F);
  i += extra + 1;
  return cp;
}

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

// NFKC-lite codepoint map: fullwidth ASCII (U+FF01..U+FF5E), ideographic
// space, NBSP. Identity for everything else.
uint32_t nfkc_lite(uint32_t cp) {
  if (cp >= 0xFF01 && cp <= 0xFF5E) return cp - 0xFEE0;
  if (cp == 0x3000 || cp == 0x00A0) return 0x20;
  return cp;
}

std::string normalize_line(const std::string& line, bool nfkc,
                           bool remove_extra_ws) {
  std::string mapped;
  mapped.reserve(line.size());
  size_t i = 0;
  while (i < line.size()) {
    uint32_t cp = utf8_next(line, i);
    if (nfkc) cp = nfkc_lite(cp);
    utf8_append(cp, &mapped);
  }
  if (!remove_extra_ws) return mapped;
  // SentencePiece remove_extra_whitespaces: trim + collapse runs
  std::string out;
  out.reserve(mapped.size());
  bool in_ws = true;  // leading whitespace is dropped
  for (char c : mapped) {
    if (c == ' ' || c == '\t') {
      in_ws = true;
    } else {
      if (in_ws && !out.empty()) out.push_back(' ');
      out.push_back(c);
      in_ws = false;
    }
  }
  return out;
}

// Locates the generated rule TSV for a named rule set: $EET_NORM_DATA,
// then csrc/tokenizer/data relative to the executable and to the CWD.
std::string find_rule_tsv(const std::string& name) {
  std::vector<std::string> dirs;
  if (const char* env = getenv("EET_NORM_DATA")) dirs.push_back(env);
  char exe[4096];
  ssize_t n = readlink("/proc/self/exe", exe, sizeof(exe) - 1);
  if (n > 0) {
    exe[n] = 0;
    std::string d(exe);
    size_t slash = d.rfind('/');
    if (slash != std::string::npos) {
      d = d.substr(0, slash);
      dirs.push_back(d + "/../csrc/tokenizer/data");
    }
  }
  dirs.push_back("csrc/tokenizer/data");
  for (const auto& d : dirs) {
    std::string path = d + "/" + name + ".tsv";
    std::ifstream f(path);
    if (f) return path;
  }
  return "";
}

// Extracts the precompiled_charsmap blob (ModelProto field 3 =
// NormalizerSpec, its field 2) from a .model file. Returns empty when
// absent/unreadable.
std::string extract_charsmap_blob(const std::string& model_path) {
  std::ifstream f(model_path, std::ios::binary);
  if (!f) return "";
  std::string data((std::istreambuf_iterator<char>(f)),
                   std::istreambuf_iterator<char>());
  auto varint = [](const std::string& b, size_t* p, uint64_t* v) {
    *v = 0;
    int shift = 0;
    while (*p < b.size()) {
      uint8_t c = uint8_t(b[(*p)++]);
      *v |= uint64_t(c & 0x7f) << shift;
      if (!(c & 0x80)) return true;
      shift += 7;
      if (shift > 63) break;
    }
    return false;
  };
  auto walk = [&](const std::string& b, int want_field) -> std::string {
    size_t p = 0;
    while (p < b.size()) {
      uint64_t key;
      if (!varint(b, &p, &key)) return "";
      int field = int(key >> 3), wt = int(key & 7);
      if (wt == 2) {
        uint64_t n;
        if (!varint(b, &p, &n) || p + n > b.size()) return "";
        if (field == want_field) return b.substr(p, size_t(n));
        p += size_t(n);
      } else if (wt == 0) {
        uint64_t v;
        if (!varint(b, &p, &v)) return "";
      } else if (wt == 5) {
        p += 4;
      } else if (wt == 1) {
        p += 8;
      } else {
        return "";
      }
    }
    return "";
  };
  std::string norm = walk(data, 3);
  if (norm.empty()) return "";
  return walk(norm, 2);
}

// Donor artifacts whose NormalizerSpec carries the GENUINE nmt_nfkc
// blob (224,725 rules) — preferred over the generated rule TSVs (~17k
// rules) when training with --normalization_rule_name=nmt_nfkc.
std::string find_nmt_nfkc_blob() {
  std::vector<std::string> cands;
  if (const char* env = getenv("EET_NORM_DONOR")) cands.push_back(env);
  cands.push_back("sentencepiece/build/libri.bpe-256.model");
  cands.push_back(
      "/root/reference/sentencepiece/build/libri.bpe-256.model");
  for (const auto& c : cands) {
    std::string blob = extract_charsmap_blob(c);
    if (!blob.empty()) return blob;
  }
  return "";
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr,
            "usage: eet_spm {train|encode|decode|export_vocab|normalize}"
            " ...\n");
    return 1;
  }
  std::string cmd = argv[1];

  if (cmd == "normalize") {
    std::string rule =
        flag(argc, argv, "normalization_rule_name", "identity");
    std::string tsv = flag(argc, argv, "normalization_rule_tsv");
    std::string model = flag(argc, argv, "model");
    bool remove_ws =
        flag(argc, argv, "remove_extra_whitespaces", "true") != "false";

    if (!model.empty()) {              // the loaded model's own rule set
      void* h = eet_bpe_load(model.c_str());
      if (!h) {
        fprintf(stderr, "cannot load model: %s\n", model.c_str());
        return 1;
      }
      std::string line;
      std::vector<char> buf(1 << 20);
      while (std::getline(std::cin, line)) {
        int n = eet_bpe_normalize(h, line.c_str(), buf.data(),
                                  int(buf.size()));
        if (n >= 0) printf("%s\n", buf.data());
      }
      eet_bpe_free(h);
      return 0;
    }

    eet_spm::Charsmap cm;
    if (tsv.empty() && rule != "identity" && rule != "nfkc" &&
        rule != "nmt_nfkc") {
      fprintf(stderr,
              "unsupported normalization rule: %s "
              "(identity|nfkc|nmt_nfkc)\n",
              rule.c_str());
      return 1;
    }
    if (tsv.empty() && rule != "identity") tsv = find_rule_tsv(rule);
    if (!tsv.empty()) {
      std::vector<std::pair<std::string, std::string>> rules;
      if (!eet_spm::load_rule_tsv(tsv.c_str(), &rules)) {
        fprintf(stderr, "cannot read rule tsv: %s\n", tsv.c_str());
        return 1;
      }
      std::string blob = eet_spm::compile_charsmap(rules);
      cm.load((const uint8_t*)blob.data(), blob.size());
    }
    bool lite = cm.empty() && rule != "identity";  // data files absent
    std::string line;
    while (std::getline(std::cin, line)) {
      std::string mapped =
          cm.empty() ? normalize_line(line, lite, false)
                     : cm.normalize_text(line);
      if (remove_ws) mapped = normalize_line(mapped, false, true);
      printf("%s\n", mapped.c_str());
    }
    return 0;
  }

  if (cmd == "train") {
    std::string input = flag(argc, argv, "input");
    std::string prefix = flag(argc, argv, "model_prefix", "bpe");
    int vocab = iflag(argc, argv, "vocab_size", 256);
    int unk = iflag(argc, argv, "unk_id", 0);
    int bos = iflag(argc, argv, "bos_id", 1);
    int eos = iflag(argc, argv, "eos_id", 2);
    int pad = iflag(argc, argv, "pad_id", -1);
    std::string ud = flag(argc, argv, "user_defined_symbols");
    // --byte_fallback=true adds the 256 <0xXX> BYTE pieces so unknown
    // characters encode as UTF-8 bytes (spm_train's flag of the same
    // name, sentencepiece_model.proto:187)
    int byte_fallback =
        flag(argc, argv, "byte_fallback", "false") == "true" ? 1 : 0;
    std::string mtype = flag(argc, argv, "model_type", "bpe");
    int model_type = mtype == "unigram" ? 1
                     : mtype == "bpe"   ? 2
                     : mtype == "word"  ? 3
                     : mtype == "char"  ? 4
                                        : 0;
    if (model_type == 0) {
      fprintf(stderr, "unknown model_type: %s (unigram|bpe|word|char)\n",
              mtype.c_str());
      return 1;
    }
    std::string norm_name =
        flag(argc, argv, "normalization_rule_name", "identity");
    std::string norm_tsv = flag(argc, argv, "normalization_rule_tsv");
    if (norm_tsv.empty() && norm_name == "nmt_nfkc") {
      // prefer the genuine blob from a donor artifact over the
      // generated (~17k-rule) TSV — closes the deep combining-mark gap
      std::string blob = find_nmt_nfkc_blob();
      if (!blob.empty()) {
        int rc = eet_spm_train_blob_ex(input.c_str(), prefix.c_str(),
                                       vocab, unk, bos, eos, pad,
                                       ud.c_str(), model_type,
                                       norm_name.c_str(), blob.data(),
                                       long(blob.size()), byte_fallback);
        if (rc) fprintf(stderr, "train failed (%d)\n", rc);
        return rc;
      }
    }
    if (norm_tsv.empty() && norm_name != "identity") {
      norm_tsv = find_rule_tsv(norm_name);
      if (norm_tsv.empty()) {
        fprintf(stderr,
                "no rule tsv for %s (run tools/gen_norm_rules.py or set "
                "EET_NORM_DATA)\n", norm_name.c_str());
        return 1;
      }
    }
    int rc = eet_spm_train_norm_ex(input.c_str(), prefix.c_str(), vocab,
                                   unk, bos, eos, pad, ud.c_str(),
                                   model_type, norm_name.c_str(),
                                   norm_tsv.c_str(), byte_fallback);
    if (rc) fprintf(stderr, "train failed (%d)\n", rc);
    return rc;
  }

  std::string model = flag(argc, argv, "model");
  void* h = eet_bpe_load(model.c_str());
  if (!h) {
    fprintf(stderr, "cannot load model: %s\n", model.c_str());
    return 1;
  }

  if (cmd == "export_vocab") {
    char buf[4096];
    for (int i = 0; i < eet_bpe_piece_size(h); ++i) {
      eet_bpe_id_to_piece(h, i, buf, sizeof(buf));
      printf("%s\n", buf);
    }
  } else if (cmd == "encode") {
    bool as_piece = flag(argc, argv, "output_format", "id") == "piece";
    std::string line;
    std::vector<int> ids(1 << 16);
    char buf[4096];
    while (std::getline(std::cin, line)) {
      int n = eet_bpe_encode(h, line.c_str(), ids.data(),
                             int(ids.size()));
      std::string out;
      for (int i = 0; i < n; ++i) {
        if (i) out += " ";
        if (as_piece) {
          eet_bpe_id_to_piece(h, ids[i], buf, sizeof(buf));
          out += buf;
        } else {
          out += std::to_string(ids[i]);
        }
      }
      printf("%s\n", out.c_str());
    }
  } else if (cmd == "decode") {
    std::string line;
    std::vector<char> buf(1 << 20);
    while (std::getline(std::cin, line)) {
      std::istringstream iss(line);
      std::vector<int> ids;
      int v;
      while (iss >> v) ids.push_back(v);
      int n = eet_bpe_decode(h, ids.data(), int(ids.size()), buf.data(),
                             int(buf.size()));
      if (n >= 0) printf("%s\n", buf.data());
    }
  } else {
    fprintf(stderr, "unknown command: %s\n", cmd.c_str());
    eet_bpe_free(h);
    return 1;
  }
  eet_bpe_free(h);
  return 0;
}
