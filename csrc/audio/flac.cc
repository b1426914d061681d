// Minimal FLAC decoder — native audio ingestion for LibriSpeech.
//
// The reference reads FLAC through torchaudio/libsndfile; this image has
// no Python FLAC decoder, so the data loader's audio path is native C++
// (the analogous component). Supports the subset FLAC actually used by
// LibriSpeech and standard encoders: 8/16/24-bit, 1-2 channels, all
// channel assignments (independent, left/side, right/side, mid/side),
// CONSTANT / VERBATIM / FIXED / LPC subframes, rice + rice2 residuals,
// wasted bits. CRCs are not verified (integrity is the filesystem's job).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7)
  bool ok = true;

  bool eof() const { return byte >= size; }

  uint32_t read_bit() {
    if (byte >= size) {
      ok = false;
      return 0;
    }
    uint32_t v = (data[byte] >> (7 - bit)) & 1;
    if (++bit == 8) {
      bit = 0;
      ++byte;
    }
    return v;
  }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n == 0) return 0;
    if (v & (1ull << (n - 1))) return int64_t(v) - (1ll << n);
    return int64_t(v);
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (ok && read_bit() == 0) ++q;
    return q;
  }

  void align() {
    if (bit) {
      bit = 0;
      ++byte;
    }
  }
};

// UTF-8-style coded number in frame headers (up to 36 bits)
uint64_t read_utf8_number(BitReader& br) {
  uint32_t b0 = uint32_t(br.read_bits(8));
  int extra = 0;
  uint64_t v = 0;
  if (b0 < 0x80) return b0;
  else if ((b0 & 0xe0) == 0xc0) { v = b0 & 0x1f; extra = 1; }
  else if ((b0 & 0xf0) == 0xe0) { v = b0 & 0x0f; extra = 2; }
  else if ((b0 & 0xf8) == 0xf0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xfc) == 0xf8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xfe) == 0xfc) { v = b0 & 0x01; extra = 5; }
  else { v = 0; extra = 6; }
  for (int i = 0; i < extra; ++i)
    v = (v << 6) | (br.read_bits(8) & 0x3f);
  return v;
}

bool decode_residual(BitReader& br, int order, int block_size,
                     std::vector<int64_t>& out) {
  int method = int(br.read_bits(2));
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  int escape = method == 0 ? 15 : 31;
  int part_order = int(br.read_bits(4));
  int n_parts = 1 << part_order;
  int samples_per_part = block_size >> part_order;
  int idx = order;
  for (int p = 0; p < n_parts; ++p) {
    int count = samples_per_part - (p == 0 ? order : 0);
    if (count < 0) return false;
    int param = int(br.read_bits(plen));
    if (param == escape) {
      int bits = int(br.read_bits(5));
      for (int i = 0; i < count; ++i)
        out[idx++] = bits ? br.read_signed(bits) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint64_t r = br.read_bits(param);
        uint64_t u = (uint64_t(q) << param) | r;
        out[idx++] = (u & 1) ? -int64_t(u >> 1) - 1 : int64_t(u >> 1);
      }
    }
    if (!br.ok) return false;
  }
  return idx == block_size;
}

void restore_fixed(int order, std::vector<int64_t>& s) {
  // s holds warmup + residuals; apply the fixed predictor in place
  int n = int(s.size());
  switch (order) {
    case 0:
      break;
    case 1:
      for (int i = 1; i < n; ++i) s[i] += s[i - 1];
      break;
    case 2:
      for (int i = 2; i < n; ++i) s[i] += 2 * s[i - 1] - s[i - 2];
      break;
    case 3:
      for (int i = 3; i < n; ++i)
        s[i] += 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3];
      break;
    case 4:
      for (int i = 4; i < n; ++i)
        s[i] += 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3] - s[i - 4];
      break;
  }
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
  if (br.read_bit() != 0) return false;  // padding bit
  int type = int(br.read_bits(6));
  int wasted = 0;
  if (br.read_bit()) wasted = 1 + int(br.read_unary());
  bps -= wasted;
  out.assign(block_size, 0);

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (auto& s : out) s = v;
  } else if (type == 1) {  // VERBATIM
    for (auto& s : out) s = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED
    int order = type & 7;
    if (order > 4 || order > block_size) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!decode_residual(br, order, block_size, out)) return false;
    restore_fixed(order, out);
  } else if (type >= 32) {  // LPC
    int order = (type & 31) + 1;
    if (order > block_size) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    int precision = int(br.read_bits(4)) + 1;
    if (precision == 16) return false;  // 0b1111 invalid
    int shift = int(br.read_signed(5));
    if (shift < 0) shift = 0;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    if (!decode_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted)
    for (auto& s : out) s <<= wasted;
  return br.ok;
}

struct StreamInfo {
  int sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
};

const int kBlockSizes[16] = {0,     192,   576,  1152, 2304, 4608, -1, -2,
                             256,   512,   1024, 2048, 4096, 8192,
                             16384, 32768};
struct Decoded {
  std::vector<int32_t> samples;  // interleaved
  int sample_rate = 0;
  int channels = 0;
};

bool decode_stream(const uint8_t* data, size_t size, Decoded* out) {
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  StreamInfo info;
  bool last = false;
  while (!last && pos + 4 <= size) {
    uint8_t hdr = data[pos];
    last = hdr & 0x80;
    int btype = hdr & 0x7f;
    uint32_t blen = (uint32_t(data[pos + 1]) << 16) |
                    (uint32_t(data[pos + 2]) << 8) | data[pos + 3];
    pos += 4;
    if (btype == 0 && blen >= 34) {
      const uint8_t* b = data + pos;
      info.sample_rate =
          (uint32_t(b[10]) << 12) | (uint32_t(b[11]) << 4) | (b[12] >> 4);
      info.channels = ((b[12] >> 1) & 0x7) + 1;
      info.bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
      info.total_samples = (uint64_t(b[13] & 0x0f) << 32) |
                           (uint64_t(b[14]) << 24) |
                           (uint64_t(b[15]) << 16) |
                           (uint64_t(b[16]) << 8) | b[17];
    }
    pos += blen;
  }
  if (info.sample_rate == 0 || info.channels == 0 || info.channels > 8)
    return false;
  out->sample_rate = info.sample_rate;
  out->channels = info.channels;
  // STREAMINFO is untrusted input: cap the pre-allocation (a hostile
  // 36-bit total_samples field could otherwise demand ~256 GB) and bound
  // the decode by a generous expansion of the compressed size.
  const size_t max_total =
      std::max<size_t>(size * 16, 1 << 20) / sizeof(int32_t);
  if (info.total_samples) {
    size_t want = size_t(info.total_samples) * info.channels;
    out->samples.reserve(std::min(want, std::min<size_t>(
        max_total, 64u * 1024u * 1024u)));
  }

  BitReader br{data, size};
  br.byte = pos;

  std::vector<std::vector<int64_t>> ch(info.channels);
  while (br.byte < size && br.ok) {
    // frame sync
    uint32_t sync = uint32_t(br.read_bits(14));
    if (!br.ok) break;
    if (sync != 0x3ffe) return out->samples.size() > 0;
    br.read_bit();                      // reserved
    br.read_bit();                      // blocking strategy
    int bs_code = int(br.read_bits(4));
    int sr_code = int(br.read_bits(4));
    int ch_asgn = int(br.read_bits(4));
    int ss_code = int(br.read_bits(3));
    br.read_bit();                      // reserved
    read_utf8_number(br);               // frame/sample number

    int block_size = 0;
    if (bs_code == 6) block_size = int(br.read_bits(8)) + 1;
    else if (bs_code == 7) block_size = int(br.read_bits(16)) + 1;
    else block_size = kBlockSizes[bs_code];
    if (block_size <= 0) return false;

    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int bps = info.bps;
    switch (ss_code) {
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: break;
    }
    br.read_bits(8);  // CRC-8

    int n_ch = info.channels;
    if (ch_asgn >= 8 && ch_asgn <= 10) n_ch = 2;
    else if (ch_asgn <= 7) n_ch = ch_asgn + 1;
    if (n_ch != info.channels) return false;

    for (int c = 0; c < n_ch; ++c) {
      int sub_bps = bps;
      if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
          (ch_asgn == 10 && c == 1))
        sub_bps += 1;  // side channel has one extra bit
      if (!decode_subframe(br, block_size, sub_bps, ch[c])) return false;
    }
    br.align();
    br.read_bits(16);  // CRC-16

    // undo stereo decorrelation
    if (ch_asgn == 8) {        // left/side
      for (int i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_asgn == 9) { // right/side: ch0 = side, ch1 = right
      for (int i = 0; i < block_size; ++i) ch[0][i] += ch[1][i];
    } else if (ch_asgn == 10) {  // mid/side
      for (int i = 0; i < block_size; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }
    if (out->samples.size() + size_t(block_size) * n_ch > max_total)
      return false;  // decoded output absurdly larger than the input
    for (int i = 0; i < block_size; ++i)
      for (int c = 0; c < n_ch; ++c)
        out->samples.push_back(int32_t(ch[c][i]));
  }
  return true;
}

}  // namespace

extern "C" {

// Decodes a FLAC file. Returns a handle; query + copy out, then free.
void* eet_flac_decode(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return nullptr;
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  auto* d = new Decoded();
  if (!decode_stream(buf.data(), buf.size(), d)) {
    delete d;
    return nullptr;
  }
  return d;
}

long eet_flac_num_samples(void* h) {  // interleaved count
  return long(static_cast<Decoded*>(h)->samples.size());
}

int eet_flac_sample_rate(void* h) {
  return static_cast<Decoded*>(h)->sample_rate;
}

int eet_flac_channels(void* h) {
  return static_cast<Decoded*>(h)->channels;
}

void eet_flac_copy(void* h, int32_t* out) {
  auto* d = static_cast<Decoded*>(h);
  memcpy(out, d->samples.data(), d->samples.size() * sizeof(int32_t));
}

void eet_flac_free(void* h) { delete static_cast<Decoded*>(h); }

}  // extern "C"
