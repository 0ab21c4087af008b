// FLAC decoder (native fast path for the framework's audio IO).
//
// The reference reads its corpus via libsndfile (data_utils.py:64-65); this
// environment has none, so the framework ships its own codec: a pure-Python
// decoder (silent_speech_tpu/utils/flac.py) and this C++ implementation for
// speed on full-corpus featurization passes. Covers the standard encoder
// subset: constant/verbatim/fixed/LPC subframes, Rice/Rice2 residual
// partitions, independent + left/right/mid-side stereo, 8-24 bit.
//
// C ABI (ctypes-bound in silent_speech_tpu/utils/native.py):
//   ssp_flac_decode(data, len, *rate, *channels, **out) -> n_samples or <0
//   ssp_free(ptr)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

class BitReader {
 public:
  BitReader(const uint8_t* data, int64_t size, int64_t byte_pos = 0)
      : data_(data), size_(size), byte_pos_(byte_pos), bit_pos_(0) {}

  bool ok() const { return byte_pos_ < size_; }
  int64_t byte_pos() const { return byte_pos_; }

  uint64_t ReadBits(int n) {
    uint64_t result = 0;
    while (n > 0) {
      if (byte_pos_ >= size_) return 0;
      int avail = 8 - bit_pos_;
      int take = n < avail ? n : avail;
      int shift = avail - take;
      uint32_t bits = (data_[byte_pos_] >> shift) & ((1u << take) - 1);
      result = (result << take) | bits;
      bit_pos_ += take;
      if (bit_pos_ == 8) {
        bit_pos_ = 0;
        byte_pos_++;
      }
      n -= take;
    }
    return result;
  }

  int64_t ReadSigned(int n) {
    uint64_t v = ReadBits(n);
    if (n > 0 && (v >> (n - 1)) & 1) {
      return static_cast<int64_t>(v) - (int64_t(1) << n);
    }
    return static_cast<int64_t>(v);
  }

  int ReadUnary() {
    int count = 0;
    while (byte_pos_ < size_) {
      uint8_t byte = data_[byte_pos_];
      uint8_t remaining = byte & ((1u << (8 - bit_pos_)) - 1);
      if (remaining == 0) {
        count += 8 - bit_pos_;
        bit_pos_ = 0;
        byte_pos_++;
        continue;
      }
      int msb = 31 - __builtin_clz(remaining);  // highest set bit index
      int zeros = (8 - bit_pos_) - (msb + 1);
      count += zeros;
      bit_pos_ += zeros + 1;
      if (bit_pos_ >= 8) {
        bit_pos_ -= 8;
        byte_pos_++;
      }
      return count;
    }
    return count;
  }

  void AlignToByte() {
    if (bit_pos_) {
      bit_pos_ = 0;
      byte_pos_++;
    }
  }

  uint64_t ReadUtf8Number() {
    uint32_t first = static_cast<uint32_t>(ReadBits(8));
    if (first < 0x80) return first;
    int n_extra = 0;
    uint32_t mask = 0x40;
    while (first & mask) {
      n_extra++;
      mask >>= 1;
    }
    uint64_t value = first & (mask - 1);
    for (int i = 0; i < n_extra; i++) {
      value = (value << 6) | (ReadBits(8) & 0x3F);
    }
    return value;
  }

  void SkipBytes(int64_t n) { byte_pos_ += n; }

 private:
  const uint8_t* data_;
  int64_t size_;
  int64_t byte_pos_;
  int bit_pos_;
};

const int kBlocksizeTable[16] = {0,   192,  576,  1152, 2304, 4608, -1, -2,
                                 256, 512,  1024, 2048, 4096, 8192,
                                 16384, 32768};

bool DecodeResidual(BitReader& br, int blocksize, int predictor_order,
                    std::vector<int64_t>* residual) {
  int method = static_cast<int>(br.ReadBits(2));
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  int escape = (1 << param_bits) - 1;
  int partition_order = static_cast<int>(br.ReadBits(4));
  int n_partitions = 1 << partition_order;
  int samples_per_partition = blocksize >> partition_order;
  residual->clear();
  residual->reserve(blocksize - predictor_order);
  for (int p = 0; p < n_partitions; p++) {
    int count = samples_per_partition - (p == 0 ? predictor_order : 0);
    int param = static_cast<int>(br.ReadBits(param_bits));
    if (param == escape) {
      int raw_bits = static_cast<int>(br.ReadBits(5));
      for (int i = 0; i < count; i++) {
        residual->push_back(raw_bits ? br.ReadSigned(raw_bits) : 0);
      }
    } else {
      for (int i = 0; i < count; i++) {
        uint64_t q = br.ReadUnary();
        uint64_t r = param ? br.ReadBits(param) : 0;
        uint64_t v = (q << param) | r;
        residual->push_back((v >> 1) ^ -static_cast<int64_t>(v & 1));
      }
    }
  }
  return true;
}

const int kFixedCoeffs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool DecodeSubframe(BitReader& br, int blocksize, int bps,
                    std::vector<int64_t>* out) {
  if (br.ReadBits(1) != 0) return false;
  int sf_type = static_cast<int>(br.ReadBits(6));
  int wasted = 0;
  if (br.ReadBits(1)) {
    wasted = 1 + br.ReadUnary();
    bps -= wasted;
  }
  out->assign(blocksize, 0);
  std::vector<int64_t> residual;

  if (sf_type == 0) {  // CONSTANT
    int64_t value = br.ReadSigned(bps);
    for (int i = 0; i < blocksize; i++) (*out)[i] = value;
  } else if (sf_type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; i++) (*out)[i] = br.ReadSigned(bps);
  } else if (sf_type >= 8 && sf_type <= 12) {  // FIXED
    int order = sf_type - 8;
    for (int i = 0; i < order; i++) (*out)[i] = br.ReadSigned(bps);
    if (!DecodeResidual(br, blocksize, order, &residual)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t pred = 0;
      for (int c = 0; c < order; c++) {
        pred += kFixedCoeffs[order][c] * (*out)[i - 1 - c];
      }
      (*out)[i] = pred + residual[i - order];
    }
  } else if (sf_type >= 32) {  // LPC
    int order = sf_type - 31;
    for (int i = 0; i < order; i++) (*out)[i] = br.ReadSigned(bps);
    int precision = static_cast<int>(br.ReadBits(4)) + 1;
    int shift = static_cast<int>(br.ReadSigned(5));
    std::vector<int64_t> coeffs(order);
    for (int i = 0; i < order; i++) coeffs[i] = br.ReadSigned(precision);
    if (!DecodeResidual(br, blocksize, order, &residual)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t pred = 0;
      for (int c = 0; c < order; c++) {
        pred += coeffs[c] * (*out)[i - 1 - c];
      }
      (*out)[i] = (pred >> shift) + residual[i - order];
    }
  } else {
    return false;
  }
  if (wasted) {
    for (auto& v : *out) v <<= wasted;
  }
  return true;
}

}  // namespace

extern "C" {

// Returns number of frames decoded (per channel), or a negative error code.
// *out is malloc'd interleaved float32, length n_frames * channels.
int64_t ssp_flac_decode(const uint8_t* data, int64_t len,
                        int32_t* sample_rate, int32_t* channels,
                        float** out) {
  if (len < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
  int64_t pos = 4;
  int32_t rate = 0, n_channels = 0, bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  while (!last && pos + 4 <= len) {
    uint8_t header = data[pos];
    last = header & 0x80;
    int btype = header & 0x7F;
    int32_t length = (data[pos + 1] << 16) | (data[pos + 2] << 8)
                     | data[pos + 3];
    if (btype == 0) {  // STREAMINFO
      BitReader br(data + pos + 4, length);
      br.ReadBits(16); br.ReadBits(16); br.ReadBits(24); br.ReadBits(24);
      rate = static_cast<int32_t>(br.ReadBits(20));
      n_channels = static_cast<int32_t>(br.ReadBits(3)) + 1;
      bps = static_cast<int32_t>(br.ReadBits(5)) + 1;
      total_samples = br.ReadBits(36);
    }
    pos += 4 + length;
  }
  if (rate == 0 || n_channels == 0) return -2;

  std::vector<float> samples;
  if (total_samples) samples.reserve(total_samples * n_channels);
  double scale = 1.0 / (double)(int64_t(1) << (bps - 1));
  uint64_t decoded = 0;

  std::vector<std::vector<int64_t>> chans(2);
  while (pos + 2 < len && (!total_samples || decoded < total_samples)) {
    BitReader br(data, len, pos);
    if (br.ReadBits(14) != 0x3FFE) break;  // lost sync
    br.ReadBits(1);
    br.ReadBits(1);
    int bs_code = static_cast<int>(br.ReadBits(4));
    int sr_code = static_cast<int>(br.ReadBits(4));
    int ch_assign = static_cast<int>(br.ReadBits(4));
    int ss_code = static_cast<int>(br.ReadBits(3));
    br.ReadBits(1);
    br.ReadUtf8Number();

    int blocksize;
    if (bs_code == 6) blocksize = static_cast<int>(br.ReadBits(8)) + 1;
    else if (bs_code == 7) blocksize = static_cast<int>(br.ReadBits(16)) + 1;
    else blocksize = kBlocksizeTable[bs_code];
    if (blocksize <= 0) return -3;

    if (sr_code == 12) br.ReadBits(8);
    else if (sr_code == 13 || sr_code == 14) br.ReadBits(16);

    int fbps;
    switch (ss_code) {
      case 0: fbps = bps; break;
      case 1: fbps = 8; break;
      case 2: fbps = 12; break;
      case 4: fbps = 16; break;
      case 5: fbps = 20; break;
      case 6: fbps = 24; break;
      default: return -4;
    }
    br.ReadBits(8);  // CRC-8

    int nch;
    if (ch_assign < 8) {
      nch = ch_assign + 1;
      if (nch > (int)chans.size()) chans.resize(nch);
      for (int c = 0; c < nch; c++) {
        if (!DecodeSubframe(br, blocksize, fbps, &chans[c])) return -5;
      }
    } else if (ch_assign == 8) {  // left/side
      nch = 2;
      if (!DecodeSubframe(br, blocksize, fbps, &chans[0])) return -5;
      if (!DecodeSubframe(br, blocksize, fbps + 1, &chans[1])) return -5;
      for (int i = 0; i < blocksize; i++) chans[1][i] =
          chans[0][i] - chans[1][i];
    } else if (ch_assign == 9) {  // right/side
      nch = 2;
      if (!DecodeSubframe(br, blocksize, fbps + 1, &chans[0])) return -5;
      if (!DecodeSubframe(br, blocksize, fbps, &chans[1])) return -5;
      for (int i = 0; i < blocksize; i++) chans[0][i] =
          chans[1][i] + chans[0][i];
    } else if (ch_assign == 10) {  // mid/side
      nch = 2;
      if (!DecodeSubframe(br, blocksize, fbps, &chans[0])) return -5;
      if (!DecodeSubframe(br, blocksize, fbps + 1, &chans[1])) return -5;
      for (int i = 0; i < blocksize; i++) {
        int64_t mid = chans[0][i];
        int64_t side = chans[1][i];
        int64_t left = ((mid << 1) | (side & 1)) + side;
        chans[0][i] = left >> 1;
        chans[1][i] = (left - (side << 1)) >> 1;
      }
    } else {
      return -6;
    }

    br.AlignToByte();
    br.SkipBytes(2);  // CRC-16
    pos = br.byte_pos();

    int64_t take = blocksize;
    if (total_samples && decoded + take > total_samples) {
      take = total_samples - decoded;
    }
    for (int64_t i = 0; i < take; i++) {
      for (int c = 0; c < (n_channels < nch ? n_channels : nch); c++) {
        samples.push_back(static_cast<float>(chans[c][i] * scale));
      }
    }
    decoded += take;
  }

  int64_t n_frames = samples.size() / n_channels;
  float* buf = static_cast<float*>(malloc(samples.size() * sizeof(float)));
  if (!buf) return -7;
  memcpy(buf, samples.data(), samples.size() * sizeof(float));
  *out = buf;
  *sample_rate = rate;
  *channels = n_channels;
  return n_frames;
}

void ssp_free(void* p) { free(p); }

}  // extern "C"
