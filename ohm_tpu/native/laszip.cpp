// From-scratch LASzip (.laz) point codec — no third-party code.
//
// Reference parity: the reference reads .laz through PDAL
// (slamio/PointCloudReaderPdal.cpp); PDAL is unavailable here, so this
// implements the LASzip container itself (pointwise-chunked compressor 2,
// record version 2 item codecs: POINT10 / GPSTIME11 / RGB12 / BYTE) against
// the public LASzip specification: an adaptive binary/multi-symbol
// arithmetic coder (Said's FastAC scheme, as specified by LASzip), k-bit
// corrector "IntegerCompressor" models, streaming-median XY prediction and
// multi-sequence GPS-time prediction.  Compressor and decompressor are
// exact mirrors; tests pin lossless round-trips over adversarial inputs
// (tests/test_laz.py).  LAS 1.4 layered point formats (6+) use the v3/v4
// codecs and are not supported — callers get a clear error.
//
// Everything operates on in-memory buffers (the Python side owns file IO
// and LAS/VLR header parsing — ohm_tpu/io/las.py).

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;
typedef int8_t I8;
typedef int16_t I16;
typedef int32_t I32;
typedef int64_t I64;

// ------------------------------------------------------------------------ //
// Adaptive models (FastAC scheme; constants fixed by the LASzip spec).

constexpr U32 AC_MIN_LENGTH = 0x01000000u;
constexpr U32 AC_MAX_LENGTH = 0xFFFFFFFFu;
constexpr U32 BM_LENGTH_SHIFT = 13;
constexpr U32 BM_MAX_COUNT = 1u << BM_LENGTH_SHIFT;
constexpr U32 DM_LENGTH_SHIFT = 15;
constexpr U32 DM_MAX_COUNT = 1u << DM_LENGTH_SHIFT;

struct BitModel {
  U32 bit_0_prob = 0, bit_0_count = 0, bit_count = 0;
  U32 update_cycle = 0, bits_until_update = 0;

  void init() {
    bit_0_count = 1;
    bit_count = 2;
    bit_0_prob = 1u << (BM_LENGTH_SHIFT - 1);
    update_cycle = bits_until_update = 4;
  }
  void update() {
    if ((bit_count += update_cycle) > BM_MAX_COUNT) {
      bit_count = (bit_count + 1) >> 1;
      bit_0_count = (bit_0_count + 1) >> 1;
      if (bit_0_count == bit_count) ++bit_count;
    }
    const U32 scale = 0x80000000u / bit_count;
    bit_0_prob = (bit_0_count * scale) >> (31 - BM_LENGTH_SHIFT);
    update_cycle = (5 * update_cycle) >> 2;
    if (update_cycle > 64) update_cycle = 64;
    bits_until_update = update_cycle;
  }
};

struct SymbolModel {
  U32* distribution = nullptr;  // 2*symbols (+ table) allocation
  U32* symbol_count = nullptr;
  U32* decoder_table = nullptr;
  U32 symbols = 0, last_symbol = 0, table_size = 0, table_shift = 0;
  U32 total_count = 0, update_cycle = 0, symbols_until_update = 0;
  bool compress = false;

  ~SymbolModel() { delete[] distribution; }

  void setup(U32 n, bool for_compress) {
    symbols = n;
    compress = for_compress;
    last_symbol = n - 1;
    delete[] distribution;
    if (!compress && symbols > 16) {
      U32 table_bits = 3;
      while (symbols > (1u << (table_bits + 2))) ++table_bits;
      table_size = 1u << table_bits;
      table_shift = DM_LENGTH_SHIFT - table_bits;
      distribution = new U32[2 * symbols + table_size + 2];
      decoder_table = distribution + 2 * symbols;
    } else {
      decoder_table = nullptr;
      table_size = table_shift = 0;
      distribution = new U32[2 * symbols];
    }
    symbol_count = distribution + symbols;
  }

  void init() {
    total_count = 0;
    update_cycle = symbols;
    for (U32 k = 0; k < symbols; ++k) symbol_count[k] = 1;
    update();
    symbols_until_update = update_cycle = (symbols + 6) >> 1;
  }

  void update() {
    if ((total_count += update_cycle) > DM_MAX_COUNT) {
      total_count = 0;
      for (U32 n = 0; n < symbols; ++n) {
        total_count += (symbol_count[n] = (symbol_count[n] + 1) >> 1);
      }
    }
    U32 sum = 0, s = 0;
    const U32 scale = 0x80000000u / total_count;
    if (compress || table_size == 0) {
      for (U32 k = 0; k < symbols; ++k) {
        distribution[k] = (scale * sum) >> (31 - DM_LENGTH_SHIFT);
        sum += symbol_count[k];
      }
    } else {
      for (U32 k = 0; k < symbols; ++k) {
        distribution[k] = (scale * sum) >> (31 - DM_LENGTH_SHIFT);
        sum += symbol_count[k];
        const U32 w = distribution[k] >> table_shift;
        while (s < w) decoder_table[++s] = k - 1;
      }
      decoder_table[0] = 0;
      while (s <= table_size) decoder_table[++s] = symbols - 1;
    }
    update_cycle = (5 * update_cycle) >> 2;
    const U32 max_cycle = (symbols + 6) << 3;
    if (update_cycle > max_cycle) update_cycle = max_cycle;
    symbols_until_update = update_cycle;
  }
};

// ------------------------------------------------------------------------ //
// Arithmetic encoder / decoder over memory buffers.

struct Encoder {
  U8* out = nullptr;
  I64 cap = 0, pos = 0;
  bool overflow = false;
  U32 base = 0, length = 0;

  void init(U8* buf, I64 buf_cap, I64 start) {
    out = buf;
    cap = buf_cap;
    pos = start;
    overflow = false;
    base = 0;
    length = AC_MAX_LENGTH;
  }
  void put_byte(U8 b) {
    if (pos < cap) out[pos] = b; else overflow = true;
    ++pos;
  }
  void propagate_carry() {
    I64 p = pos - 1;
    while (p >= 0 && p < cap && out[p] == 0xFF) out[p--] = 0;
    if (p >= 0 && p < cap) ++out[p];
  }
  void renorm() {
    do {
      put_byte((U8)(base >> 24));
      base <<= 8;
    } while ((length <<= 8) < AC_MIN_LENGTH);
  }
  void encode_bit(BitModel& m, U32 bit) {
    const U32 x = m.bit_0_prob * (length >> BM_LENGTH_SHIFT);
    if (bit == 0) {
      length = x;
      ++m.bit_0_count;
    } else {
      const U32 init_base = base;
      base += x;
      length -= x;
      if (init_base > base) propagate_carry();
    }
    if (length < AC_MIN_LENGTH) renorm();
    if (--m.bits_until_update == 0) m.update();
  }
  void encode_symbol(SymbolModel& m, U32 sym) {
    U32 x;
    const U32 init_base = base;
    if (sym == m.last_symbol) {
      x = m.distribution[sym] * (length >> DM_LENGTH_SHIFT);
      base += x;
      length -= x;
    } else {
      x = m.distribution[sym] * (length >>= DM_LENGTH_SHIFT);
      base += x;
      length = m.distribution[sym + 1] * length - x;
    }
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
  }
  void write_bits(U32 bits, U32 sym) {
    if (bits > 19) {
      write_bits(16, sym & 0xFFFFu);
      sym >>= 16;
      bits -= 16;
    }
    const U32 init_base = base;
    base += sym * (length >>= bits);
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
  }
  void done() {
    const U32 init_base = base;
    if (length > 2 * AC_MIN_LENGTH) {
      base += AC_MIN_LENGTH;
      length = AC_MIN_LENGTH >> 1;
    } else {
      base += AC_MIN_LENGTH >> 1;
      length = AC_MIN_LENGTH >> 9;
    }
    if (init_base > base) propagate_carry();
    renorm();
  }
};

struct Decoder {
  const U8* in = nullptr;
  I64 len = 0, pos = 0;
  U32 value = 0, length = 0;

  U8 get_byte() { return pos < len ? in[pos++] : 0; }
  void init(const U8* buf, I64 buf_len, I64 start) {
    in = buf;
    len = buf_len;
    pos = start;
    value = ((U32)get_byte() << 24) | ((U32)get_byte() << 16)
            | ((U32)get_byte() << 8) | get_byte();
    length = AC_MAX_LENGTH;
  }
  void renorm() {
    do {
      value = (value << 8) | get_byte();
    } while ((length <<= 8) < AC_MIN_LENGTH);
  }
  U32 decode_bit(BitModel& m) {
    const U32 x = m.bit_0_prob * (length >> BM_LENGTH_SHIFT);
    const U32 sym = (value >= x);
    if (sym == 0) {
      length = x;
      ++m.bit_0_count;
    } else {
      value -= x;
      length -= x;
    }
    if (length < AC_MIN_LENGTH) renorm();
    if (--m.bits_until_update == 0) m.update();
    return sym;
  }
  U32 decode_symbol(SymbolModel& m) {
    U32 n, sym, x, y = length;
    if (m.decoder_table) {
      const U32 dv = value / (length >>= DM_LENGTH_SHIFT);
      const U32 t = dv >> m.table_shift;
      sym = m.decoder_table[t];
      n = m.decoder_table[t + 1] + 1;
      while (n > sym + 1) {
        const U32 k = (sym + n) >> 1;
        if (m.distribution[k] > dv) n = k; else sym = k;
      }
      x = m.distribution[sym] * length;
      if (sym != m.last_symbol) y = m.distribution[sym + 1] * length;
    } else {
      x = sym = 0;
      length >>= DM_LENGTH_SHIFT;
      U32 k = (n = m.symbols) >> 1;
      do {
        const U32 z = length * m.distribution[k];
        if (z > value) {
          n = k;
          y = z;
        } else {
          sym = k;
          x = z;
        }
      } while ((k = (sym + n) >> 1) != sym);
    }
    value -= x;
    length = y - x;
    if (length < AC_MIN_LENGTH) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
    return sym;
  }
  U32 read_bits(U32 bits) {
    if (bits > 19) {
      const U32 lo = read_bits(16);
      const U32 hi = read_bits(bits - 16);
      return (hi << 16) | lo;
    }
    const U32 sym = value / (length >>= bits);
    value -= length * sym;
    if (length < AC_MIN_LENGTH) renorm();
    return sym;
  }
};

// ------------------------------------------------------------------------ //
// IntegerCompressor: k-bit interval corrector coding.

struct IntegerCompressor {
  U32 bits, contexts, bits_high;
  U32 corr_bits;
  U32 corr_range;
  I32 corr_min, corr_max;
  U32 k = 0;
  SymbolModel* m_bits = nullptr;      // [contexts] models of corr_bits+1 syms
  BitModel corrector0;
  SymbolModel* m_corrector = nullptr;  // [corr_bits+1], index 1..corr_bits

  IntegerCompressor(U32 bits_ = 16, U32 contexts_ = 1, U32 bits_high_ = 8)
      : bits(bits_), contexts(contexts_), bits_high(bits_high_) {
    if (bits && bits < 32) {
      corr_bits = bits;
      corr_range = 1u << bits;
      corr_min = -(I32)(corr_range / 2);
      corr_max = corr_min + (I32)corr_range - 1;
    } else {
      corr_bits = 32;
      corr_range = 0;  // wrap via natural 32-bit overflow
      corr_min = INT32_MIN;
      corr_max = INT32_MAX;
    }
  }
  ~IntegerCompressor() {
    delete[] m_bits;
    delete[] m_corrector;
  }

  void setup(bool for_compress) {
    if (!m_bits) {
      m_bits = new SymbolModel[contexts];
      for (U32 c = 0; c < contexts; ++c) m_bits[c].setup(corr_bits + 1, for_compress);
      m_corrector = new SymbolModel[corr_bits + 1];
      for (U32 j = 1; j <= corr_bits; ++j) {
        m_corrector[j].setup(j <= bits_high ? (1u << j) : (1u << bits_high),
                             for_compress);
      }
    }
    for (U32 c = 0; c < contexts; ++c) m_bits[c].init();
    corrector0.init();
    for (U32 j = 1; j <= corr_bits; ++j) m_corrector[j].init();
  }

  I32 decompress(Decoder& dec, I32 pred, U32 context) {
    I32 real = pred + read_corrector(dec, m_bits[context]);
    if (corr_range) {
      if (real < 0) real += (I32)corr_range;
      else if ((U32)real >= corr_range) real -= (I32)corr_range;
    }
    return real;
  }
  void compress(Encoder& enc, I32 pred, I32 real, U32 context) {
    I32 corr = (I32)((U32)real - (U32)pred);
    if (corr_range) {
      if (corr < corr_min) corr += (I32)corr_range;
      else if (corr > corr_max) corr -= (I32)corr_range;
    }
    write_corrector(enc, corr, m_bits[context]);
  }

  I32 read_corrector(Decoder& dec, SymbolModel& mb) {
    I32 c;
    k = dec.decode_symbol(mb);
    if (k) {
      if (k < 32) {
        if (k <= bits_high) {
          c = (I32)dec.decode_symbol(m_corrector[k]);
        } else {
          const U32 k1 = k - bits_high;
          c = (I32)dec.decode_symbol(m_corrector[k]);
          const U32 c1 = dec.read_bits(k1);
          c = (I32)(((U32)c << k1) | c1);
        }
        if (c >= (1 << (k - 1))) c += 1;
        else c -= ((1 << k) - 1);
      } else {
        c = corr_min;
      }
    } else {
      c = (I32)dec.decode_bit(corrector0);
    }
    return c;
  }
  void write_corrector(Encoder& enc, I32 c, SymbolModel& mb) {
    k = 0;
    U32 c1 = (c <= 0) ? (U32)(-(I64)c) : (U32)(c - 1);
    while (c1) {
      c1 >>= 1;
      ++k;
    }
    enc.encode_symbol(mb, k);
    if (k) {
      if (k < 32) {
        if (c >= 0) c -= 1;           // [2^(k-1)+1 .. 2^k]      -> [2^(k-1) .. 2^k-1]
        else c += ((1 << k) - 1);     // [-(2^k-1) .. -2^(k-1)]  -> [0 .. 2^(k-1)-1]
        if (k <= bits_high) {
          enc.encode_symbol(m_corrector[k], (U32)c);
        } else {
          const U32 k1 = k - bits_high;
          enc.encode_symbol(m_corrector[k], (U32)c >> k1);
          enc.write_bits(k1, (U32)c & ((1u << k1) - 1));
        }
      }
    } else {
      enc.encode_bit(corrector0, (U32)c);
    }
  }
};

// ------------------------------------------------------------------------ //
// POINT10 v2.

struct StreamingMedian5 {
  I32 values[5];
  bool high;
  void init() {
    values[0] = values[1] = values[2] = values[3] = values[4] = 0;
    high = true;
  }
  void add(I32 v) {
    if (high) {
      if (v < values[2]) {
        values[4] = values[3];
        values[3] = values[2];
        if (v < values[0]) {
          values[2] = values[1];
          values[1] = values[0];
          values[0] = v;
        } else if (v < values[1]) {
          values[2] = values[1];
          values[1] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (v < values[3]) {
          values[4] = values[3];
          values[3] = v;
        } else {
          values[4] = v;
        }
        high = false;
      }
    } else {
      if (values[2] < v) {
        values[0] = values[1];
        values[1] = values[2];
        if (values[4] < v) {
          values[2] = values[3];
          values[3] = values[4];
          values[4] = v;
        } else if (values[3] < v) {
          values[2] = values[3];
          values[3] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (values[1] < v) {
          values[0] = values[1];
          values[1] = v;
        } else {
          values[0] = v;
        }
        high = true;
      }
    }
  }
  I32 get() const { return values[2]; }
};

const U8 kNumberReturnMap[8][8] = {
    {15, 14, 13, 12, 11, 10, 9, 8},  {14, 0, 1, 3, 6, 10, 10, 9},
    {13, 1, 2, 4, 7, 11, 11, 10},    {12, 3, 4, 5, 8, 12, 12, 11},
    {11, 6, 7, 8, 9, 13, 13, 12},    {10, 10, 11, 12, 13, 14, 14, 13},
    {9, 10, 11, 12, 13, 14, 15, 14}, {8, 9, 10, 11, 12, 13, 14, 15}};
const U8 kNumberReturnLevel[8][8] = {
    {0, 1, 2, 3, 4, 5, 6, 7}, {1, 0, 1, 2, 3, 4, 5, 6},
    {2, 1, 0, 1, 2, 3, 4, 5}, {3, 2, 1, 0, 1, 2, 3, 4},
    {4, 3, 2, 1, 0, 1, 2, 3}, {5, 4, 3, 2, 1, 0, 1, 2},
    {6, 5, 4, 3, 2, 1, 0, 1}, {7, 6, 5, 4, 3, 2, 1, 0}};

inline U8 u8_fold(I32 n) { return (U8)(n & 0xFF); }
inline U8 u8_clamp(I32 n) { return n <= 0 ? 0 : (n >= 255 ? 255 : (U8)n); }

// The raw 20-byte POINT10 record (little-endian field layout of LAS
// point data record format 0).
struct Point10 {
  I32 x, y, z;
  U16 intensity;
  U8 bit_byte;  // return#:3 | #returns:3 | scan dir:1 | edge:1
  U8 classification;
  I8 scan_angle_rank;
  U8 user_data;
  U16 point_source_id;

  void load(const U8* p) {
    std::memcpy(&x, p, 4);
    std::memcpy(&y, p + 4, 4);
    std::memcpy(&z, p + 8, 4);
    std::memcpy(&intensity, p + 12, 2);
    bit_byte = p[14];
    classification = p[15];
    scan_angle_rank = (I8)p[16];
    user_data = p[17];
    std::memcpy(&point_source_id, p + 18, 2);
  }
  void store(U8* p) const {
    std::memcpy(p, &x, 4);
    std::memcpy(p + 4, &y, 4);
    std::memcpy(p + 8, &z, 4);
    std::memcpy(p + 12, &intensity, 2);
    p[14] = bit_byte;
    p[15] = classification;
    p[16] = (U8)scan_angle_rank;
    p[17] = user_data;
    std::memcpy(p + 18, &point_source_id, 2);
  }
  U8 return_number() const { return bit_byte & 7; }
  U8 number_of_returns() const { return (bit_byte >> 3) & 7; }
  U8 scan_direction_flag() const { return (bit_byte >> 6) & 1; }
};

struct Point10v2 {
  SymbolModel m_changed_values;
  IntegerCompressor ic_intensity{16, 4};
  SymbolModel m_scan_angle_rank[2];
  IntegerCompressor ic_point_source_id{16, 1};
  SymbolModel* m_bit_byte[256] = {};
  SymbolModel* m_classification[256] = {};
  SymbolModel* m_user_data[256] = {};
  IntegerCompressor ic_dx{32, 2};
  IntegerCompressor ic_dy{32, 22};
  IntegerCompressor ic_z{32, 20};
  StreamingMedian5 last_x_diff_median5[16];
  StreamingMedian5 last_y_diff_median5[16];
  U16 last_intensity[16];
  I32 last_height[8];
  Point10 last;
  bool for_compress = false;
  bool allocated = false;

  ~Point10v2() {
    for (int i = 0; i < 256; ++i) {
      delete m_bit_byte[i];
      delete m_classification[i];
      delete m_user_data[i];
    }
  }

  void init(const U8* first_item, bool compress_mode) {
    if (!allocated || for_compress != compress_mode) {
      for (int i = 0; i < 256; ++i) {
        delete m_bit_byte[i];
        m_bit_byte[i] = nullptr;
        delete m_classification[i];
        m_classification[i] = nullptr;
        delete m_user_data[i];
        m_user_data[i] = nullptr;
      }
      m_changed_values.setup(64, compress_mode);
      m_scan_angle_rank[0].setup(256, compress_mode);
      m_scan_angle_rank[1].setup(256, compress_mode);
      allocated = true;
      for_compress = compress_mode;
    } else {
      // Lazily-created per-value models must reset between chunks too.
      for (int i = 0; i < 256; ++i) {
        if (m_bit_byte[i]) m_bit_byte[i]->init();
        if (m_classification[i]) m_classification[i]->init();
        if (m_user_data[i]) m_user_data[i]->init();
      }
    }
    m_changed_values.init();
    ic_intensity.setup(compress_mode);
    m_scan_angle_rank[0].init();
    m_scan_angle_rank[1].init();
    ic_point_source_id.setup(compress_mode);
    ic_dx.setup(compress_mode);
    ic_dy.setup(compress_mode);
    ic_z.setup(compress_mode);
    for (int i = 0; i < 16; ++i) {
      last_x_diff_median5[i].init();
      last_y_diff_median5[i].init();
      last_intensity[i] = 0;
    }
    for (int i = 0; i < 8; ++i) last_height[i] = 0;
    last.load(first_item);
  }

  SymbolModel* lazy(SymbolModel** arr, U8 idx) {
    if (!arr[idx]) {
      arr[idx] = new SymbolModel();
      arr[idx]->setup(256, for_compress);
      arr[idx]->init();
    }
    return arr[idx];
  }

  void read(Decoder& dec, U8* item) {
    const U32 changed_values = dec.decode_symbol(m_changed_values);
    if (changed_values) {
      if (changed_values & 32) {
        last.bit_byte = (U8)dec.decode_symbol(*lazy(m_bit_byte, last.bit_byte));
      }
      const U32 r = last.return_number(), n = last.number_of_returns();
      const U32 m = kNumberReturnMap[n][r];
      if (changed_values & 16) {
        last_intensity[m] = (U16)ic_intensity.decompress(
            dec, last_intensity[m], m < 3 ? m : 3u);
      }
      last.intensity = last_intensity[m];
      if (changed_values & 8) {
        last.classification =
            (U8)dec.decode_symbol(*lazy(m_classification, last.classification));
      }
      if (changed_values & 4) {
        const U32 val = dec.decode_symbol(m_scan_angle_rank[last.scan_direction_flag()]);
        last.scan_angle_rank = (I8)u8_fold((I32)val + (I32)(U8)last.scan_angle_rank);
      }
      if (changed_values & 2) {
        last.user_data = (U8)dec.decode_symbol(*lazy(m_user_data, last.user_data));
      }
      if (changed_values & 1) {
        last.point_source_id =
            (U16)ic_point_source_id.decompress(dec, last.point_source_id, 0);
      }
    } else {
      last.intensity = last_intensity[kNumberReturnMap[last.number_of_returns()][last.return_number()]];
    }
    const U32 r = last.return_number(), n = last.number_of_returns();
    const U32 m = kNumberReturnMap[n][r];
    const U32 l = kNumberReturnLevel[n][r];

    I32 median = last_x_diff_median5[m].get();
    I32 diff = ic_dx.decompress(dec, median, n == 1);
    last.x += diff;
    last_x_diff_median5[m].add(diff);

    median = last_y_diff_median5[m].get();
    U32 k_bits = ic_dx.k;
    diff = ic_dy.decompress(dec, median,
                            (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20u));
    last.y += diff;
    last_y_diff_median5[m].add(diff);

    k_bits = (ic_dx.k + ic_dy.k) / 2;
    last.z = ic_z.decompress(dec, last_height[l],
                             (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18u));
    last_height[l] = last.z;
    last.store(item);
  }

  void write(Encoder& enc, const U8* item) {
    Point10 cur;
    cur.load(item);
    const U32 r = cur.return_number(), n = cur.number_of_returns();
    const U32 m = kNumberReturnMap[n][r];
    const U32 l = kNumberReturnLevel[n][r];

    const U32 changed_values =
        (((U32)(last.bit_byte != cur.bit_byte)) << 5) |
        (((U32)(last_intensity[m] != cur.intensity)) << 4) |
        (((U32)(last.classification != cur.classification)) << 3) |
        (((U32)(last.scan_angle_rank != cur.scan_angle_rank)) << 2) |
        (((U32)(last.user_data != cur.user_data)) << 1) |
        ((U32)(last.point_source_id != cur.point_source_id));
    enc.encode_symbol(m_changed_values, changed_values);
    if (changed_values) {
      if (changed_values & 32) {
        enc.encode_symbol(*lazy(m_bit_byte, last.bit_byte), cur.bit_byte);
      }
      if (changed_values & 16) {
        ic_intensity.compress(enc, last_intensity[m], cur.intensity,
                              m < 3 ? m : 3u);
        last_intensity[m] = cur.intensity;
      }
      if (changed_values & 8) {
        enc.encode_symbol(*lazy(m_classification, last.classification),
                          cur.classification);
      }
      if (changed_values & 4) {
        // Context from the NEW bit byte (mirrors read, which decodes the
        // bit byte before the scan angle).
        enc.encode_symbol(m_scan_angle_rank[cur.scan_direction_flag()],
                          u8_fold((I32)(U8)cur.scan_angle_rank -
                                  (I32)(U8)last.scan_angle_rank));
      }
      if (changed_values & 2) {
        enc.encode_symbol(*lazy(m_user_data, last.user_data), cur.user_data);
      }
      if (changed_values & 1) {
        ic_point_source_id.compress(enc, last.point_source_id,
                                    cur.point_source_id, 0);
      }
    }

    I32 median = last_x_diff_median5[m].get();
    I32 diff = cur.x - last.x;
    ic_dx.compress(enc, median, diff, n == 1);
    last_x_diff_median5[m].add(diff);

    median = last_y_diff_median5[m].get();
    U32 k_bits = ic_dx.k;
    diff = cur.y - last.y;
    ic_dy.compress(enc, median, diff,
                   (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20u));
    last_y_diff_median5[m].add(diff);

    k_bits = (ic_dx.k + ic_dy.k) / 2;
    ic_z.compress(enc, last_height[l], cur.z,
                  (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18u));
    last_height[l] = cur.z;
    last = cur;
  }
};

// ------------------------------------------------------------------------ //
// GPSTIME11 v2.

constexpr I32 kGpsMulti = 500;
constexpr I32 kGpsMultiMinus = -10;
constexpr I32 kGpsMultiUnchanged = kGpsMulti - kGpsMultiMinus + 1;   // 511
constexpr I32 kGpsMultiCodeFull = kGpsMulti - kGpsMultiMinus + 2;    // 512
constexpr I32 kGpsMultiTotal = kGpsMulti - kGpsMultiMinus + 6;       // 516

inline I32 i32_quantize(double f) {
  if (f >= 2147483647.0) return INT32_MAX;
  if (f <= -2147483648.0) return INT32_MIN;
  return f >= 0 ? (I32)(f + 0.5) : (I32)(f - 0.5);
}

// Wrapping i32 multiply (the 32-bit corrector wraps mod 2^32, so prediction
// overflow must wrap identically on both codec sides; signed overflow is UB).
inline I32 mul_wrap(I32 a, I32 b) { return (I32)((U32)a * (U32)b); }

struct GpsTime11v2 {
  SymbolModel m_gpstime_multi;
  SymbolModel m_gpstime_0diff;
  IntegerCompressor ic_gpstime{32, 9};
  U32 last_seq = 0, next_seq = 0;
  I64 last_gpstime[4];
  I32 last_gpstime_diff[4];
  I32 multi_extreme_counter[4];
  bool allocated = false;

  void init(const U8* first_item, bool compress_mode) {
    if (!allocated) {
      m_gpstime_multi.setup(kGpsMultiTotal, compress_mode);
      m_gpstime_0diff.setup(6, compress_mode);
      allocated = true;
    }
    m_gpstime_multi.init();
    m_gpstime_0diff.init();
    ic_gpstime.setup(compress_mode);
    last_seq = next_seq = 0;
    for (int i = 0; i < 4; ++i) {
      last_gpstime[i] = 0;
      last_gpstime_diff[i] = 0;
      multi_extreme_counter[i] = 0;
    }
    std::memcpy(&last_gpstime[0], first_item, 8);
  }

  void read(Decoder& dec, U8* item) {
    if (last_gpstime_diff[last_seq] == 0) {
      const U32 multi = dec.decode_symbol(m_gpstime_0diff);
      if (multi == 1) {  // difference fits in 32 bits
        last_gpstime_diff[last_seq] = ic_gpstime.decompress(dec, 0, 0);
        last_gpstime[last_seq] += last_gpstime_diff[last_seq];
        multi_extreme_counter[last_seq] = 0;
      } else if (multi == 2) {  // full 64-bit value
        next_seq = (next_seq + 1) & 3;
        U64 hi = (U64)(U32)ic_gpstime.decompress(
            dec, (I32)(U32)((U64)last_gpstime[last_seq] >> 32), 8);
        U64 v = (hi << 32) | dec.read_bits(32);
        last_gpstime[next_seq] = (I64)v;
        last_seq = next_seq;
        last_gpstime_diff[last_seq] = 0;
        multi_extreme_counter[last_seq] = 0;
      } else if (multi > 2) {  // switch to another sequence
        last_seq = (last_seq + multi - 2) & 3;
        read(dec, item);
        return;
      }
      // multi == 0: unchanged
    } else {
      const I32 multi = (I32)dec.decode_symbol(m_gpstime_multi);
      if (multi == 1) {
        last_gpstime[last_seq] +=
            ic_gpstime.decompress(dec, last_gpstime_diff[last_seq], 1);
        multi_extreme_counter[last_seq] = 0;
      } else if (multi < kGpsMultiUnchanged) {
        I32 gpstime_diff;
        if (multi == 0) {
          gpstime_diff = ic_gpstime.decompress(dec, 0, 7);
          if (++multi_extreme_counter[last_seq] > 3) {
            last_gpstime_diff[last_seq] = gpstime_diff;
            multi_extreme_counter[last_seq] = 0;
          }
        } else if (multi < kGpsMulti) {
          gpstime_diff = ic_gpstime.decompress(
              dec, mul_wrap(multi, last_gpstime_diff[last_seq]), multi < 10 ? 2u : 3u);
        } else if (multi == kGpsMulti) {
          gpstime_diff = ic_gpstime.decompress(
              dec, mul_wrap(kGpsMulti, last_gpstime_diff[last_seq]), 4);
          if (++multi_extreme_counter[last_seq] > 3) {
            last_gpstime_diff[last_seq] = gpstime_diff;
            multi_extreme_counter[last_seq] = 0;
          }
        } else {  // 501..510: negative multipliers
          const I32 neg = kGpsMulti - multi;  // -1..-10
          if (neg > kGpsMultiMinus) {
            gpstime_diff = ic_gpstime.decompress(
                dec, mul_wrap(neg, last_gpstime_diff[last_seq]), 5);
          } else {
            gpstime_diff = ic_gpstime.decompress(
                dec, mul_wrap(kGpsMultiMinus, last_gpstime_diff[last_seq]), 6);
            if (++multi_extreme_counter[last_seq] > 3) {
              last_gpstime_diff[last_seq] = gpstime_diff;
              multi_extreme_counter[last_seq] = 0;
            }
          }
        }
        last_gpstime[last_seq] += gpstime_diff;
      } else if (multi == kGpsMultiUnchanged) {
        // no change
      } else if (multi == kGpsMultiCodeFull) {
        next_seq = (next_seq + 1) & 3;
        U64 hi = (U64)(U32)ic_gpstime.decompress(
            dec, (I32)(U32)((U64)last_gpstime[last_seq] >> 32), 8);
        U64 v = (hi << 32) | dec.read_bits(32);
        last_gpstime[next_seq] = (I64)v;
        last_seq = next_seq;
        last_gpstime_diff[last_seq] = 0;
        multi_extreme_counter[last_seq] = 0;
      } else {  // 513..515: switch sequence
        last_seq = (last_seq + multi - kGpsMultiCodeFull) & 3;
        read(dec, item);
        return;
      }
    }
    std::memcpy(item, &last_gpstime[last_seq], 8);
  }

  void write(Encoder& enc, const U8* item) {
    I64 cur;
    std::memcpy(&cur, item, 8);
    if (last_gpstime_diff[last_seq] == 0) {
      if (cur == last_gpstime[last_seq]) {
        enc.encode_symbol(m_gpstime_0diff, 0);
        return;
      }
      const I64 diff64 = cur - last_gpstime[last_seq];
      const I32 diff32 = (I32)diff64;
      if (diff64 == (I64)diff32) {
        enc.encode_symbol(m_gpstime_0diff, 1);
        ic_gpstime.compress(enc, 0, diff32, 0);
        last_gpstime_diff[last_seq] = diff32;
        last_gpstime[last_seq] = cur;
        multi_extreme_counter[last_seq] = 0;
        return;
      }
      // Try switching to a sequence whose value matches better.
      for (U32 i = 1; i < 4; ++i) {
        const I64 od = cur - last_gpstime[(last_seq + i) & 3];
        if (od == (I64)(I32)od || last_gpstime[(last_seq + i) & 3] == cur) {
          enc.encode_symbol(m_gpstime_0diff, i + 2);
          last_seq = (last_seq + i) & 3;
          write(enc, item);
          return;
        }
      }
      enc.encode_symbol(m_gpstime_0diff, 2);
      write_full(enc, cur);
    } else {
      if (cur == last_gpstime[last_seq]) {
        enc.encode_symbol(m_gpstime_multi, kGpsMultiUnchanged);
        return;
      }
      const I64 diff64 = cur - last_gpstime[last_seq];
      const I32 diff32 = (I32)diff64;
      if (diff64 == (I64)diff32) {
        const I32 multi =
            i32_quantize((double)diff32 / (double)last_gpstime_diff[last_seq]);
        if (multi == 1) {
          enc.encode_symbol(m_gpstime_multi, 1);
          ic_gpstime.compress(enc, last_gpstime_diff[last_seq], diff32, 1);
          multi_extreme_counter[last_seq] = 0;
        } else if (multi > 1) {
          if (multi < kGpsMulti) {
            enc.encode_symbol(m_gpstime_multi, (U32)multi);
            ic_gpstime.compress(enc, mul_wrap(multi, last_gpstime_diff[last_seq]),
                                diff32, multi < 10 ? 2u : 3u);
          } else {
            enc.encode_symbol(m_gpstime_multi, (U32)kGpsMulti);
            ic_gpstime.compress(enc, mul_wrap(kGpsMulti, last_gpstime_diff[last_seq]),
                                diff32, 4);
            if (++multi_extreme_counter[last_seq] > 3) {
              last_gpstime_diff[last_seq] = diff32;
              multi_extreme_counter[last_seq] = 0;
            }
          }
        } else if (multi < 0) {
          if (multi > kGpsMultiMinus) {  // -1..-9
            enc.encode_symbol(m_gpstime_multi, (U32)(kGpsMulti - multi));
            ic_gpstime.compress(enc, mul_wrap(multi, last_gpstime_diff[last_seq]),
                                diff32, 5);
          } else {
            enc.encode_symbol(m_gpstime_multi,
                              (U32)(kGpsMulti - kGpsMultiMinus));
            ic_gpstime.compress(enc,
                                mul_wrap(kGpsMultiMinus, last_gpstime_diff[last_seq]),
                                diff32, 6);
            if (++multi_extreme_counter[last_seq] > 3) {
              last_gpstime_diff[last_seq] = diff32;
              multi_extreme_counter[last_seq] = 0;
            }
          }
        } else {  // multi == 0
          enc.encode_symbol(m_gpstime_multi, 0);
          ic_gpstime.compress(enc, 0, diff32, 7);
          if (++multi_extreme_counter[last_seq] > 3) {
            last_gpstime_diff[last_seq] = diff32;
            multi_extreme_counter[last_seq] = 0;
          }
        }
        last_gpstime[last_seq] = cur;
      } else {
        for (U32 i = 1; i < 4; ++i) {
          const I64 od = cur - last_gpstime[(last_seq + i) & 3];
          if (od == (I64)(I32)od) {
            enc.encode_symbol(m_gpstime_multi,
                              (U32)(kGpsMultiCodeFull + i));
            last_seq = (last_seq + i) & 3;
            write(enc, item);
            return;
          }
        }
        enc.encode_symbol(m_gpstime_multi, (U32)kGpsMultiCodeFull);
        write_full(enc, cur);
      }
    }
  }

  void write_full(Encoder& enc, I64 cur) {
    next_seq = (next_seq + 1) & 3;
    ic_gpstime.compress(enc, (I32)(U32)((U64)last_gpstime[last_seq] >> 32),
                        (I32)(U32)((U64)cur >> 32), 8);
    enc.write_bits(32, (U32)(U64)cur);
    last_gpstime[next_seq] = cur;
    last_seq = next_seq;
    last_gpstime_diff[last_seq] = 0;
    multi_extreme_counter[last_seq] = 0;
  }
};

// ------------------------------------------------------------------------ //
// RGB12 v2.

struct Rgb12v2 {
  SymbolModel m_byte_used;
  SymbolModel m_rgb_diff[6];
  U16 last_r = 0, last_g = 0, last_b = 0;
  bool allocated = false;

  void init(const U8* first_item, bool compress_mode) {
    if (!allocated) {
      m_byte_used.setup(128, compress_mode);
      for (int i = 0; i < 6; ++i) m_rgb_diff[i].setup(256, compress_mode);
      allocated = true;
    }
    m_byte_used.init();
    for (int i = 0; i < 6; ++i) m_rgb_diff[i].init();
    std::memcpy(&last_r, first_item, 2);
    std::memcpy(&last_g, first_item + 2, 2);
    std::memcpy(&last_b, first_item + 4, 2);
  }

  void read(Decoder& dec, U8* item) {
    U8 corr;
    I32 diff = 0;
    const U32 sym = dec.decode_symbol(m_byte_used);
    U16 r, g, b;
    if (sym & 1) {
      corr = (U8)dec.decode_symbol(m_rgb_diff[0]);
      r = (U16)u8_fold(corr + (last_r & 0xFF));
    } else {
      r = last_r & 0xFF;
    }
    if (sym & 2) {
      corr = (U8)dec.decode_symbol(m_rgb_diff[1]);
      r |= ((U16)u8_fold(corr + (last_r >> 8))) << 8;
    } else {
      r |= last_r & 0xFF00;
    }
    if (sym & 64) {
      diff = (r & 0xFF) - (last_r & 0xFF);
      if (sym & 4) {
        corr = (U8)dec.decode_symbol(m_rgb_diff[2]);
        g = (U16)u8_fold(corr + u8_clamp(diff + (last_g & 0xFF)));
      } else {
        g = last_g & 0xFF;
      }
      if (sym & 16) {
        corr = (U8)dec.decode_symbol(m_rgb_diff[4]);
        diff = (diff + ((g & 0xFF) - (last_g & 0xFF))) / 2;
        b = (U16)u8_fold(corr + u8_clamp(diff + (last_b & 0xFF)));
      } else {
        b = last_b & 0xFF;
      }
      diff = (r >> 8) - (last_r >> 8);
      if (sym & 8) {
        corr = (U8)dec.decode_symbol(m_rgb_diff[3]);
        g |= ((U16)u8_fold(corr + u8_clamp(diff + (last_g >> 8)))) << 8;
      } else {
        g |= last_g & 0xFF00;
      }
      if (sym & 32) {
        corr = (U8)dec.decode_symbol(m_rgb_diff[5]);
        diff = (diff + ((g >> 8) - (last_g >> 8))) / 2;
        b |= ((U16)u8_fold(corr + u8_clamp(diff + (last_b >> 8)))) << 8;
      } else {
        b |= last_b & 0xFF00;
      }
    } else {
      g = r;
      b = r;
    }
    last_r = r;
    last_g = g;
    last_b = b;
    std::memcpy(item, &r, 2);
    std::memcpy(item + 2, &g, 2);
    std::memcpy(item + 4, &b, 2);
  }

  void write(Encoder& enc, const U8* item) {
    U16 r, g, b;
    std::memcpy(&r, item, 2);
    std::memcpy(&g, item + 2, 2);
    std::memcpy(&b, item + 4, 2);
    U32 sym = ((last_r & 0xFF) != (r & 0xFF)) ? 1u : 0u;
    if ((last_r >> 8) != (r >> 8)) sym |= 2;
    const bool grey = (r == g) && (r == b) && ((sym & 3) != 0 || (last_g == last_r && last_b == last_r));
    // "g/b differ from r" bit: set unless this point is grey AND the
    // predictor degenerates to r for both (mirror of the read path's
    // sym&64 branch).
    bool need_gb = !(r == g && r == b);
    if (need_gb) sym |= 64;
    (void)grey;
    I32 diff;
    if (sym & 64) {
      if ((last_g & 0xFF) != (g & 0xFF)) sym |= 4;
      if ((last_g >> 8) != (g >> 8)) sym |= 8;
      if ((last_b & 0xFF) != (b & 0xFF)) sym |= 16;
      if ((last_b >> 8) != (b >> 8)) sym |= 32;
      // The low/high G/B bytes are coded as corrections against CLAMPED
      // predictions; a clear bit means "equal to last", which the read
      // path honours independent of the prediction, so the bit flags
      // computed from plain equality are consistent.
    }
    enc.encode_symbol(m_byte_used, sym);
    if (sym & 1) {
      enc.encode_symbol(m_rgb_diff[0], u8_fold((I32)(r & 0xFF) - (I32)(last_r & 0xFF)));
    }
    if (sym & 2) {
      enc.encode_symbol(m_rgb_diff[1], u8_fold((I32)(r >> 8) - (I32)(last_r >> 8)));
    }
    if (sym & 64) {
      diff = (r & 0xFF) - (last_r & 0xFF);
      if (sym & 4) {
        enc.encode_symbol(m_rgb_diff[2],
                          u8_fold((I32)(g & 0xFF) - u8_clamp(diff + (last_g & 0xFF))));
      }
      if (sym & 16) {
        diff = (diff + ((g & 0xFF) - (last_g & 0xFF))) / 2;
        enc.encode_symbol(m_rgb_diff[4],
                          u8_fold((I32)(b & 0xFF) - u8_clamp(diff + (last_b & 0xFF))));
      }
      diff = (r >> 8) - (last_r >> 8);
      if (sym & 8) {
        enc.encode_symbol(m_rgb_diff[3],
                          u8_fold((I32)(g >> 8) - u8_clamp(diff + (last_g >> 8))));
      }
      if (sym & 32) {
        diff = (diff + ((g >> 8) - (last_g >> 8))) / 2;
        enc.encode_symbol(m_rgb_diff[5],
                          u8_fold((I32)(b >> 8) - u8_clamp(diff + (last_b >> 8))));
      }
    }
    last_r = r;
    last_g = g;
    last_b = b;
  }
};

// ------------------------------------------------------------------------ //
// BYTE v2 (extra bytes): per-byte delta symbol models.

struct Byte_v2 {
  SymbolModel* m_byte = nullptr;
  U8* last = nullptr;
  U32 count = 0;
  bool allocated = false;

  ~Byte_v2() {
    delete[] m_byte;
    delete[] last;
  }

  void init(const U8* first_item, U32 n, bool compress_mode) {
    if (!allocated || count != n) {
      delete[] m_byte;
      delete[] last;
      count = n;
      m_byte = new SymbolModel[n];
      for (U32 i = 0; i < n; ++i) m_byte[i].setup(256, compress_mode);
      last = new U8[n];
      allocated = true;
    }
    for (U32 i = 0; i < n; ++i) m_byte[i].init();
    std::memcpy(last, first_item, n);
  }

  void read(Decoder& dec, U8* item) {
    for (U32 i = 0; i < count; ++i) {
      last[i] = u8_fold((I32)dec.decode_symbol(m_byte[i]) + last[i]);
      item[i] = last[i];
    }
  }
  void write(Encoder& enc, const U8* item) {
    for (U32 i = 0; i < count; ++i) {
      enc.encode_symbol(m_byte[i], u8_fold((I32)item[i] - (I32)last[i]));
      last[i] = item[i];
    }
  }
};

// ------------------------------------------------------------------------ //
// Item dispatch.  LASzip item type ids.

enum ItemType { kByte = 0, kPoint10 = 6, kGpsTime11 = 7, kRgb12 = 8 };

struct ItemCodecs {
  Point10v2 point10;
  GpsTime11v2 gpstime;
  Rgb12v2 rgb;
  Byte_v2 bytes;
};

}  // namespace

// ------------------------------------------------------------------------ //
// C API.

extern "C" {

// Decompress a pointwise-chunked (compressor 2) LASzip point stream.
//   in/in_len: the compressed stream starting at the FIRST CHUNK (just past
//     the 8-byte chunk-table offset); chunk_starts[i] = byte offset of chunk
//     i within `in` (n_chunks entries; derived from the chunk table).
//   item_types/item_sizes: the LASzip VLR item list (POINT10/GPSTIME11/
//     RGB12/BYTE only).
//   out: n_points * point_size bytes.
// Returns 0 on success, <0 on error (-1 bad item, -2 chunk bounds).
int64_t laszip_decompress(const uint8_t* in, int64_t in_len,
                          const int32_t* item_types, const int32_t* item_sizes,
                          int32_t n_items, int64_t n_points,
                          uint32_t chunk_size, const int64_t* chunk_starts,
                          int32_t n_chunks, uint8_t* out) {
  I64 point_size = 0;
  for (I32 i = 0; i < n_items; ++i) {
    const I32 t = item_types[i];
    if (t != kPoint10 && t != kGpsTime11 && t != kRgb12 && t != kByte) return -1;
    point_size += item_sizes[i];
  }
  ItemCodecs codecs;
  Decoder dec;
  I64 p = 0;
  for (I32 c = 0; c < n_chunks && p < n_points; ++c) {
    I64 off = chunk_starts[c];
    if (off < 0 || off > in_len) return -2;
    // First point of the chunk is raw and (re)initialises every codec.
    U8* rec = out + p * point_size;
    for (I32 i = 0; i < n_items; ++i) {
      if (off + item_sizes[i] > in_len) return -2;
      std::memcpy(rec, in + off, item_sizes[i]);
      switch (item_types[i]) {
        case kPoint10: codecs.point10.init(rec, false); break;
        case kGpsTime11: codecs.gpstime.init(rec, false); break;
        case kRgb12: codecs.rgb.init(rec, false); break;
        case kByte: codecs.bytes.init(rec, item_sizes[i], false); break;
      }
      off += item_sizes[i];
      rec += item_sizes[i];
    }
    ++p;
    dec.init(in, in_len, off);
    const I64 chunk_end =
        (chunk_size == 0xFFFFFFFFu)
            ? n_points
            : ((p - 1) + (I64)chunk_size < n_points ? (p - 1) + (I64)chunk_size
                                                    : n_points);
    for (; p < chunk_end; ++p) {
      rec = out + p * point_size;
      for (I32 i = 0; i < n_items; ++i) {
        switch (item_types[i]) {
          case kPoint10: codecs.point10.read(dec, rec); break;
          case kGpsTime11: codecs.gpstime.read(dec, rec); break;
          case kRgb12: codecs.rgb.read(dec, rec); break;
          case kByte: codecs.bytes.read(dec, rec); break;
        }
        rec += item_sizes[i];
      }
    }
  }
  return p == n_points ? 0 : -3;
}

// Compress points into a pointwise-chunked LASzip stream (no chunk-table
// framing — the caller assembles offset field + stream + chunk table).
// chunk_bytes_out[i] receives the byte length of chunk i (capacity must be
// >= ceil(n_points/chunk_size)).  Returns total bytes written, or -1 if
// out_cap was too small (re-call with a larger buffer), -2 on a bad item.
int64_t laszip_compress(const uint8_t* in, int64_t n_points,
                        const int32_t* item_types, const int32_t* item_sizes,
                        int32_t n_items, uint32_t chunk_size, uint8_t* out,
                        int64_t out_cap, int64_t* chunk_bytes_out,
                        int32_t* n_chunks_out) {
  I64 point_size = 0;
  for (I32 i = 0; i < n_items; ++i) {
    const I32 t = item_types[i];
    if (t != kPoint10 && t != kGpsTime11 && t != kRgb12 && t != kByte) return -2;
    point_size += item_sizes[i];
  }
  ItemCodecs codecs;
  Encoder enc;
  I64 pos = 0;
  I32 n_chunks = 0;
  I64 p = 0;
  while (p < n_points) {
    const I64 chunk_start = pos;
    const U8* rec = in + p * point_size;
    for (I32 i = 0; i < n_items; ++i) {
      if (pos + item_sizes[i] <= out_cap) std::memcpy(out + pos, rec, item_sizes[i]);
      switch (item_types[i]) {
        case kPoint10: codecs.point10.init(rec, true); break;
        case kGpsTime11: codecs.gpstime.init(rec, true); break;
        case kRgb12: codecs.rgb.init(rec, true); break;
        case kByte: codecs.bytes.init(rec, item_sizes[i], true); break;
      }
      pos += item_sizes[i];
      rec += item_sizes[i];
    }
    ++p;
    enc.init(out, out_cap, pos);
    const I64 chunk_end = (chunk_size == 0xFFFFFFFFu)
                              ? n_points
                              : ((p - 1) + (I64)chunk_size < n_points
                                     ? (p - 1) + (I64)chunk_size
                                     : n_points);
    for (; p < chunk_end; ++p) {
      rec = in + p * point_size;
      for (I32 i = 0; i < n_items; ++i) {
        switch (item_types[i]) {
          case kPoint10: codecs.point10.write(enc, rec); break;
          case kGpsTime11: codecs.gpstime.write(enc, rec); break;
          case kRgb12: codecs.rgb.write(enc, rec); break;
          case kByte: codecs.bytes.write(enc, rec); break;
        }
        rec += item_sizes[i];
      }
    }
    enc.done();
    pos = enc.pos;
    chunk_bytes_out[n_chunks++] = pos - chunk_start;
    if (enc.overflow || pos > out_cap) return -1;
  }
  *n_chunks_out = n_chunks;
  return pos;
}

// Chunk table payload codec (the arithmetic-coded part AFTER the
// u32 version / u32 number_chunks header words).
// Decode: fills chunk_bytes_out[n_chunks]; returns 0 or <0.
int64_t laszip_read_chunk_table(const uint8_t* in, int64_t in_len,
                                int32_t n_chunks, int64_t* chunk_bytes_out) {
  Decoder dec;
  dec.init(in, in_len, 0);
  IntegerCompressor ic(32, 2);
  ic.setup(false);
  I32 prev = 0;
  for (I32 i = 0; i < n_chunks; ++i) {
    const I32 v = ic.decompress(dec, prev, 1);
    chunk_bytes_out[i] = (I64)(U32)v;
    prev = v;
  }
  return 0;
}

// Encode: writes the arithmetic-coded payload; returns bytes written or -1
// if cap too small.
int64_t laszip_write_chunk_table(const int64_t* chunk_bytes, int32_t n_chunks,
                                 uint8_t* out, int64_t cap) {
  Encoder enc;
  enc.init(out, cap, 0);
  IntegerCompressor ic(32, 2);
  ic.setup(true);
  I32 prev = 0;
  for (I32 i = 0; i < n_chunks; ++i) {
    const I32 v = (I32)(U32)chunk_bytes[i];
    ic.compress(enc, prev, v, 1);
    prev = v;
  }
  enc.done();
  return enc.overflow ? -1 : enc.pos;
}

}  // extern "C"
