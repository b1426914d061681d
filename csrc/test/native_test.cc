// Sanitizer test driver for the native components (built with
// -fsanitize=address,undefined by `make -C csrc check`). Exercises the
// tokenizer, lexicon and trie-beam C APIs end-to-end; functional
// correctness is pinned by the Python test-suite — this binary exists to
// run the same code paths under ASan/UBSan.

#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

extern "C" {
int eet_bpe_train(const char*, const char*, int, int, int, int, int,
                  const char*);
int eet_spm_train(const char*, const char*, int, int, int, int, int,
                  const char*, int);
void* eet_bpe_load(const char*);
void eet_bpe_free(void*);
int eet_bpe_piece_size(void*);
int eet_bpe_encode(void*, const char*, int*, int);
int eet_bpe_decode(void*, const int*, int, char*, int);
int eet_bpe_id_to_piece(void*, int, char*, int);

void* eet_lex_create();
void eet_lex_free(void*);
void eet_lex_add(void*, const char*);
int eet_lex_contains(void*, const char*);
int eet_lex_closest(void*, const char*, char*, int);

void* eet_trie_create(int);
void eet_trie_free(void*);
void eet_trie_add_word(void*, const int*, int, int);
int eet_trie_decode(void*, const float*, int, int, int, float, int,
                    float, int*, int, float*);
}

static int failures = 0;
#define CHECK(cond)                                              \
  do {                                                           \
    if (!(cond)) {                                               \
      fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__,    \
              #cond);                                            \
      ++failures;                                                \
    }                                                            \
  } while (0)

static void test_tokenizer() {
  const char* corpus = "/tmp/eet_test_corpus.txt";
  {
    std::ofstream f(corpus);
    f << "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG\n"
         "THE CAT SAT ON THE MAT AND THE DOG BARKED\n";
  }
  CHECK(eet_bpe_train(corpus, "/tmp/eet_test_bpe", 48, 47, 1, 2, 46,
                      "@") == 0);
  void* h = eet_bpe_load("/tmp/eet_test_bpe.model");
  CHECK(h != nullptr);
  CHECK(eet_bpe_piece_size(h) == 48);
  int ids[256];
  int n = eet_bpe_encode(h, "THE QUICK CAT", ids, 256);
  CHECK(n > 0);
  char buf[1024];
  CHECK(eet_bpe_decode(h, ids, n, buf, sizeof(buf)) >= 0);
  CHECK(std::string(buf) == "THE QUICK CAT");
  // empty string, long string, overflow guard
  CHECK(eet_bpe_encode(h, "", ids, 256) == 0);
  std::string longs(3000, 'A');
  CHECK(eet_bpe_encode(h, longs.c_str(), ids, 8) == -1);  // overflow -> -1
  CHECK(eet_bpe_id_to_piece(h, 9999, buf, sizeof(buf)) == -1);
  eet_bpe_free(h);
}

static void test_spm_model_types() {
  const char* corpus = "/tmp/eet_test_corpus.txt";  // written above
  // unigram (EM), word, char trainers + their encoders under sanitizers
  const int types[] = {1, 3, 4};
  for (int mt : types) {
    std::string prefix = "/tmp/eet_test_mt" + std::to_string(mt);
    CHECK(eet_spm_train(corpus, prefix.c_str(), 40, 0, 1, 2, -1, "",
                        mt) == 0);
    void* h = eet_bpe_load((prefix + ".model").c_str());
    CHECK(h != nullptr);
    CHECK(eet_bpe_piece_size(h) == 40);
    int ids[256];
    int n = eet_bpe_encode(h, "THE CAT SAT", ids, 256);
    CHECK(n > 0);
    char buf[1024];
    CHECK(eet_bpe_decode(h, ids, n, buf, sizeof(buf)) >= 0);
    if (mt != 3)  // word models map OOV words to unk, lossy by design
      CHECK(std::string(buf) == "THE CAT SAT");
    eet_bpe_free(h);
  }
  CHECK(eet_spm_train(corpus, "/tmp/eet_test_bad", 40, 0, 1, 2, -1, "",
                      9) == 3);
}

static void test_lexicon() {
  void* lx = eet_lex_create();
  const char* words[] = {"the", "cat", "hat", "hello", "threshold"};
  for (const char* w : words) eet_lex_add(lx, w);
  CHECK(eet_lex_contains(lx, "cat") == 1);
  CHECK(eet_lex_contains(lx, "dog") == 0);
  char out[256];
  CHECK(eet_lex_closest(lx, "teh", out, sizeof(out)) >= 1);
  CHECK(eet_lex_closest(lx, "helo", out, sizeof(out)) == 1);
  CHECK(std::string(out) == "hello");
  CHECK(eet_lex_closest(lx, "", out, sizeof(out)) >= 0);
  eet_lex_free(lx);
}

static void test_trie_beam() {
  void* t = eet_trie_create(4);
  int ab[] = {1, 2}, c[] = {3};
  eet_trie_add_word(t, ab, 2, 0);
  eet_trie_add_word(t, c, 1, 1);
  const int T = 5, V = 4;
  std::vector<float> lp(T * V, -8.f);
  int path[T] = {1, 2, 0, 3, 0};
  for (int i = 0; i < T; ++i) lp[i * V + path[i]] = -0.01f;
  int words[16];
  float score;
  int n = eet_trie_decode(t, lp.data(), T, V, 0, 0.f, 8, 50.f, words, 16,
                          &score);
  CHECK(n == 2);
  CHECK(words[0] == 0 && words[1] == 1);
  CHECK(std::isfinite(score));
  eet_trie_free(t);
}

extern "C" {
void* eet_flac_decode(const char*);
void eet_flac_free(void*);
}

static void test_flac_fuzz() {
  // malformed inputs must fail cleanly (no OOB reads under ASan)
  unsigned seed = 12345;
  for (int trial = 0; trial < 200; ++trial) {
    std::string path = "/tmp/eet_fuzz.flac";
    std::ofstream f(path, std::ios::binary);
    int len = 8 + (seed % 512);
    std::string buf;
    if (trial % 3 == 0) buf = "fLaC";     // valid magic, garbage body
    for (int i = int(buf.size()); i < len; ++i) {
      seed = seed * 1103515245u + 12345u;
      buf.push_back(char(seed >> 16));
    }
    f.write(buf.data(), std::streamsize(buf.size()));
    f.close();
    void* h = eet_flac_decode(path.c_str());
    if (h) eet_flac_free(h);               // decoded something — fine
  }
}

int main() {
  test_tokenizer();
  test_spm_model_types();
  test_lexicon();
  test_trie_beam();
  test_flac_fuzz();
  if (failures) {
    fprintf(stderr, "%d failure(s)\n", failures);
    return 1;
  }
  printf("native_test: all checks passed\n");
  return 0;
}
