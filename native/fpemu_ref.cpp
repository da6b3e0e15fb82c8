// fpemu_ref — portable C++ reference implementation of the fp8tpu cast
// contract (the host-side native analog of the reference toolkit's
// mpemu/pytquant cast libraries; see /root/reference/mpemu/pytquant/cpp/
// fpemu_impl.cpp for the semantics being matched — implemented here from
// the format table in fp8tpu/numerics/formats.py, not copied).
//
// Role: (a) an independent third implementation cross-checking the NumPy
// golden and the jnp/Pallas pipelines in tests; (b) fast host-side batch
// quantization (checkpoint/dataset preprocessing) without a device.
//
// ABI (ctypes):
//   int fpemu_cast(const float* in, float* out, int64_t n,
//                  const char* mode, float scale,
//                  int block_norm, int64_t block_size, uint64_t seed);
// mode strings follow the reference ABI: E4M3_RNE, E5M2_DAZ_STOCHASTIC, …
// Returns 0 on success, nonzero on unknown mode.
//
// Stochastic rounding uses a splitmix64-seeded xorshift stream per call;
// the stream differs from the device PRNG (SR parity is statistical, as
// everywhere in this framework).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <string>

namespace {

// ---- fp32 <-> fp16 bit helpers (round-to-nearest-even) --------------------

static inline uint32_t f32_bits(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  return u;
}

static inline float bits_f32(uint32_t u) {
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

static inline uint16_t f32_to_f16_rne(float f) {
  uint32_t u = f32_bits(f);
  uint32_t sign = (u >> 16) & 0x8000u;
  uint32_t absu = u & 0x7FFFFFFFu;
  int exp = (int)(absu >> 23);
  uint32_t mant = absu & 0x7FFFFFu;
  int e = exp - 127;

  if (exp == 255) {  // inf / nan
    uint32_t payload = mant ? ((mant >> 13) | 0x200u) : 0u;
    return (uint16_t)(sign | 0x7C00u | payload);
  }
  if (e > 15) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
  if (exp == 0) return (uint16_t)sign;            // f32 denormal -> 0
  if (e >= -14) {                                  // normal f16
    uint32_t lsb = (mant >> 13) & 1u;
    uint32_t rounded = mant + 0xFFFu + lsb;
    uint32_t h = (uint32_t)((e + 15) << 10) + (rounded >> 13);
    return (uint16_t)(sign | h);
  }
  // subnormal f16
  uint32_t m24 = mant | 0x800000u;
  int rs = -e - 1;
  if (rs > 30) rs = 30;
  uint32_t lsb = (m24 >> rs) & 1u;
  uint32_t h = (m24 + ((1u << (rs - 1)) - 1u) + lsb) >> rs;
  return (uint16_t)(sign | h);
}

static inline float f16_bits_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) & 1u;
  uint32_t exp = (h >> 10) & 0x1Fu;
  uint32_t mant = h & 0x3FFu;
  if (exp == 31) return bits_f32((sign << 31) | 0x7F800000u | (mant << 13));
  if (exp == 0) {
    float f = (float)mant * 5.9604644775390625e-08f;  // 2^-24, exact
    return sign ? -f : f;
  }
  return bits_f32((sign << 31) | ((exp + 112) << 23) | (mant << 13));
}

// ---- PRNG ------------------------------------------------------------------

struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) {
    // splitmix64 init
    s = seed + 0x9E3779B97F4A7C15ull;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    s = z ^ (z >> 31);
    if (!s) s = 1;
  }
  inline uint32_t next() {
    uint64_t x = s;
    x ^= x << 13;
    x ^= x >> 7;
    x ^= x << 17;
    s = x;
    return (uint32_t)(x >> 32);
  }
};

// ---- rounding modes ---------------------------------------------------------

enum Mode { RNE, STOCH, RNAZ, RNTZ, RPINF, RNINF, RTZ, NEAREST };

struct Fmt {
  int lshift;
  int grs, tie;
  bool rebias;
  int can_round_limit;
  int exp_sat, sat_mant, flush_exp, min_norm_exp;
  float block_headroom;
};

// Constants mirror fp8tpu/numerics/formats.py.
static const Fmt E5M2f  = {8, 0x00FF, 0x0180, false, 0x7B00, 0, 0, 0, 0,
                           16384.0f};
static const Fmt E4M3f  = {7, 0x007F, 0x00C0, true, 0x5F00, 8, 0x0300, -9,
                           -6, 8.0f};
// E4M3-IEEE can_round = 0x5B80 = fp16(240): the reference's AVX512 body
// (vsatuval, fpemu_impl.cpp:1221); its scalar tail's 0x4B80 is a typo'd
// constant (saturates >=15.0) not modeled here — see DIFFREF.json.
static const Fmt E4M3If = {7, 0x007F, 0x00C0, true, 0x5B80, 7, 0x0380, -9,
                           -6, 8.0f};
static const Fmt E3M4f  = {6, 0x003F, 0x0060, true, 0x4F80, 4, 0x0380, -6,
                           -2, 1.0f};

static inline int nearest_incr(Mode m, int rnmask, int rntie, bool positive,
                               const Fmt& f) {
  int half = 1 << (f.lshift - 1);
  int up = 0;
  switch (m) {
    case RNE:  up = (rnmask > half) || (rntie == f.tie); break;
    case RNAZ: up = rnmask >= half; break;
    case RNTZ: up = rnmask > half; break;
    case RPINF: up = positive && (rnmask >= half); break;
    case RNINF: up = (!positive) && (rnmask >= half); break;
    default: up = 0;
  }
  return up << f.lshift;
}

static float cast_e5m2(float x, Mode m, float scale, bool daz, Rng* rng) {
  const Fmt& f = E5M2f;
  int h = f32_to_f16_rne(x * scale);
  int expf = h & 0x7C00;
  bool can_round = (h & 0x7F00) <= f.can_round_limit;
  bool is_normal = expf <= 0x7800 && expf >= 0x0400;
  bool is_denorm = expf == 0;
  bool is_naninf = expf == 0x7C00;
  bool positive = (h & 0x8000) == 0;
  int rnmask = h & f.grs, rntie = h & f.tie;
  int rne = nearest_incr(RNE, rnmask, rntie, positive, f);
  int incr;
  if (m == STOCH) {
    int rnd = (int)(rng->next() & (uint32_t)f.grs);
    incr = daz ? rnd : ((is_normal ? rnd : 0) + (is_denorm ? rne : 0));
  } else {
    incr = nearest_incr(m, rnmask, rntie, positive, f);
  }
  bool apply = !is_naninf && can_round && (!daz || is_normal);
  if (apply) h += incr;
  if (daz && is_denorm) h = 0;
  h &= (0xFFFF << f.lshift) & 0xFFFF;
  return f16_bits_to_f32((uint16_t)h) * (1.0f / scale);
}

static float cast_rebias(float x, const Fmt& f, Mode m, float scale,
                         Rng* rng) {
  int h = f32_to_f16_rne(x * scale);
  int exp = ((h >> 10) & 0x1F) - 15;
  int sign = h & 0x8000;
  int mant = h & 0x03FF;
  bool can_round = (h & 0x7FFF) < f.can_round_limit;
  bool is_denorm = (h & 0x7C00) == 0;
  bool is_naninf = (h & 0x7C00) == 0x7C00;
  bool positive = sign == 0;

  bool sat = (exp > f.exp_sat) || !can_round;
  if (sat) { mant = f.sat_mant; exp = f.exp_sat; can_round = false; }
  bool flush = !sat && exp < f.flush_exp;
  if (flush) { mant = 0; exp = -15; }
  bool dn = !sat && !flush && exp < f.min_norm_exp;
  if (dn) {
    int dshift = f.min_norm_exp - exp;
    mant = (mant >> dshift) << dshift;
  }
  int rnmask = mant & f.grs, rntie = mant & f.tie;
  int rne = nearest_incr(RNE, rnmask, rntie, positive, f);
  int incr;
  if (m == STOCH) {
    bool is_normal = (h & 0x7C00) <= 0x7800 && (h & 0x7C00) >= 0x0400;
    int rnd = (int)(rng->next() & (uint32_t)f.grs);
    incr = (is_normal ? rnd : 0) + (is_denorm ? rne : 0);
  } else {
    incr = nearest_incr(m, rnmask, rntie, positive, f);
  }
  if (!is_naninf && can_round) mant += incr;
  mant &= (0xFFFF << f.lshift) & 0xFFFF;
  int out = (mant + ((exp + 15) << 10)) | sign;
  return f16_bits_to_f32((uint16_t)out) * (1.0f / scale);
}

static float cast_bf16(float x, Mode m, Rng* rng) {
  // True full-sticky RNE (0x7FFF + lsb bias add) with NaN/Inf pass-through
  // — the reference's AVX512 production path (fpemu_impl.cpp:207-231).
  // Its scalar tail's 4-bit GRS window and its biased vector SR
  // (rand + RNE bias) are reference defects not modeled (DIFFREF.json).
  uint32_t u = f32_bits(x);
  if ((u & 0x7F800000u) != 0x7F800000u) {
    if (m == STOCH)
      u += rng->next() & 0xFFFFu;
    else
      u += 0x7FFFu + ((u >> 16) & 1u);
  }
  u &= 0xFFFF0000u;
  return bits_f32(u);
}

static float cast_fp16(float x, Mode m, bool daz, Rng* rng) {
  if (m != STOCH) {
    uint16_t h = f32_to_f16_rne(x);
    if (daz && (h & 0x7C00) == 0) h = 0;
    return f16_bits_to_f32(h);
  }
  uint32_t u = f32_bits(x);
  int exp = (int)((u >> 23) & 0xFF) - 127;
  uint32_t mant = u & 0x7FFFFFu;
  uint32_t sign = u & 0x80000000u;
  uint32_t h;
  if (exp == 128) {
    uint32_t nm = (mant && !(mant & 0x400000u)) ? (mant | 0x400000u) : mant;
    h = ((0x1Fu << 23) | nm | (sign >> 3)) >> 13;
  } else if (exp >= 16) {
    h = ((0x1Fu << 23) | (sign >> 3)) >> 13;
  } else if (exp < -14) {
    h = f32_to_f16_rne(x);
  } else {
    uint32_t bits = (((uint32_t)(exp + 15) & 0x1FFu) << 23) | mant |
                    (sign >> 3);
    h = (bits + (rng->next() & 0x1FFFu)) >> 13;
  }
  return f16_bits_to_f32((uint16_t)(h & 0xFFFFu));
}

// E5M2 "noINF" (exponent offset 16, inf/NaN reclaimed) and "flex"
// (f32-domain single rounding, flexible denormals) — the reference's
// out-of-ABI L0 variants (fpemu_impl.cpp:460-593), bit-faithful incl.
// the wrap/sign quirks (see numerics/golden.py cast_e5m2_noinf/_flex).
static float cast_e5m2_noinf(float x, float scale) {
  uint16_t h = f32_to_f16_rne(x * scale);
  bool naninf = (h & 0x7C00) == 0x7C00;
  int tie = ((h & 0x0100) == 0x0100) ? 1 : 0;
  uint32_t enc = ((((uint32_t)(h & 0x7C00) >> 10) + 1) << 10)
                 | (uint32_t)(h & 0x83FF);
  if (!naninf) enc = (enc + 0x7F + tie) & 0xFFFF;
  if ((h & 0x7FFF) > 0x7F00) enc = (enc & 0x8000) | 0x7F00;
  if (naninf) enc = 0x8000;
  uint16_t d = (uint16_t)(((enc >> 8) & 0xFF) << 8);
  uint16_t dexp = (uint16_t)((((int)((d & 0x7C00) >> 10) - 1) << 10)
                             & 0xFFFF);
  uint16_t out = (uint16_t)((dexp | (d & 0x83FF)) & 0xFFFF);
  if (d == 0x8000) out = 0x7C00;
  return f16_bits_to_f32(out) * (1.0f / scale);
}

static float cast_e5m2_flex(float x, float /*scale unused, as in the
                                             reference*/) {
  uint32_t u = f32_bits(x);
  uint32_t expf = u & 0x7F800000u;
  bool naninf = expf == 0x7F800000u;
  uint32_t tie = ((u & 0x00200000u) == 0x00200000u) ? 1u : 0u;
  bool zflush = expf < 0x37800000u;
  bool denorm = expf < 0x38800000u;
  uint32_t sign = u & 0x80000000u;
  uint32_t urne = naninf ? u : (u + 0xFFFFFu + tie);
  int exp = (int)((urne & 0x7F800000u) >> 23) - 127;
  int32_t mant = (int32_t)(urne & 0x7FFFFFu);
  int shft = -15 - exp;
  int rshft = denorm ? 21 + shft : 21;
  int lshft = denorm ? 8 + shft : 8;
  int32_t mant2 = 0;
  if (rshft < 24 && rshft >= 0 && lshft >= 0 && rshft < 32 && lshft < 32)
    mant2 = (mant >> rshft) << lshft;
  uint16_t out = (uint16_t)(((uint32_t)mant2
                             | (uint32_t)(((exp + 15) << 10) & 0xFFFF)
                             | (sign ? 0x8000u : 0u)) & 0xFFFF);
  if (zflush) out = 0;
  return f16_bits_to_f32(out);
}

static float cast_fp4(float x, float scale) {
  float fin = x * scale;
  uint32_t u = f32_bits(fin);
  int exp = (int)((u >> 23) & 0xFF) - 127;
  uint32_t sign = u & 0x80000000u;
  float f2 = (exp < 0 && (exp % 2)) ? fin * 1.6f : fin;
  uint32_t u2 = f32_bits(f2);
  if (exp > 0) u2 = sign | (127u << 23);
  u2 &= 0xFF800000u;
  int exp2 = (int)((u2 >> 23) & 0xFF) - 127;
  if (exp2 < 0 && (exp2 % 2))
    u2 = sign | ((uint32_t)(exp2 + 126) << 23);
  if (exp2 < -12) u2 = 0;
  return bits_f32(u2) * (1.0f / scale);
}

struct Parsed {
  enum Kind { KE5M2, KE4M3, KE4M3I, KE3M4, KFP4, KBF16, KFP16,
              KE5M2NOINF, KE5M2FLEX, KBAD } kind;
  Mode mode;
  bool daz;
};

static Mode parse_round(const std::string& s) {
  if (s == "RNE") return RNE;
  if (s == "STOCHASTIC") return STOCH;
  if (s == "RNAZ") return RNAZ;
  if (s == "RNTZ") return RNTZ;
  if (s == "RPINF") return RPINF;
  if (s == "RNINF") return RNINF;
  if (s == "RTZ") return RTZ;
  if (s == "NEAREST") return NEAREST;
  return RNE;
}

static Parsed parse_mode(const char* mode) {
  std::string m(mode);
  Parsed p{Parsed::KBAD, RNE, false};
  auto starts = [&](const char* pre) {
    return m.rfind(pre, 0) == 0;
  };
  if (starts("E5M2_DAZ_")) {
    p = {Parsed::KE5M2, parse_round(m.substr(9)), true};
  } else if (m == "E5M2_NOINF_RNE") {
    p = {Parsed::KE5M2NOINF, RNE, false};
  } else if (m == "E5M2_FLEX_RNE") {
    p = {Parsed::KE5M2FLEX, RNE, false};
  } else if (starts("E5M2_")) {
    p = {Parsed::KE5M2, parse_round(m.substr(5)), false};
  } else if (starts("E4M3_IEEE_")) {
    p = {Parsed::KE4M3I, parse_round(m.substr(10)), false};
  } else if (starts("E4M3_")) {
    p = {Parsed::KE4M3, parse_round(m.substr(5)), false};
  } else if (starts("E3M4_")) {
    p = {Parsed::KE3M4, parse_round(m.substr(5)), false};
  } else if (starts("FP4_")) {
    p = {Parsed::KFP4, NEAREST, false};
  } else if (starts("BFLOAT16_")) {
    p = {Parsed::KBF16, parse_round(m.substr(9)), false};
  } else if (starts("FLOAT16_DAZ_")) {
    p = {Parsed::KFP16, parse_round(m.substr(12)), true};
  } else if (starts("FLOAT16_")) {
    p = {Parsed::KFP16, parse_round(m.substr(8)), false};
  }
  return p;
}

static const Fmt* fmt_of(Parsed::Kind k) {
  switch (k) {
    case Parsed::KE5M2: return &E5M2f;
    case Parsed::KE4M3: return &E4M3f;
    case Parsed::KE4M3I: return &E4M3If;
    case Parsed::KE3M4: return &E3M4f;
    default: return nullptr;
  }
}

static float cast_one(float x, const Parsed& p, float scale, Rng* rng) {
  switch (p.kind) {
    case Parsed::KE5M2:
      return cast_e5m2(x, p.mode, scale, p.daz, rng);
    case Parsed::KE5M2NOINF:
      return cast_e5m2_noinf(x, scale);
    case Parsed::KE5M2FLEX:
      return cast_e5m2_flex(x, scale);
    case Parsed::KE4M3:
      return cast_rebias(x, E4M3f, p.mode, scale, rng);
    case Parsed::KE4M3I:
      return cast_rebias(x, E4M3If, p.mode, scale, rng);
    case Parsed::KE3M4:
      return cast_rebias(x, E3M4f, p.mode, scale, rng);
    case Parsed::KFP4:
      return cast_fp4(x, scale);
    case Parsed::KBF16:
      return cast_bf16(x, p.mode, rng);
    case Parsed::KFP16:
      return cast_fp16(x, p.mode, p.daz, rng);
    default:
      return x;
  }
}

static float block_scale(const float* in, int64_t n, const Parsed& p) {
  float amax = 0.0f;
  for (int64_t i = 0; i < n; i++) {
    float a = std::fabs(in[i]);
    if (a > amax) amax = a;
  }
  if (p.kind == Parsed::KFP4) return amax > 0 ? 1.0f / amax : 1.0f;
  if (amax == 0.0f) return 1.0f;  // documented deviation (golden.py)
  uint32_t b = f32_bits(amax) & 0x7F800000u;
  const Fmt* f = fmt_of(p.kind);
  return 2.0f * bits_f32(b) / (f ? f->block_headroom : 1.0f);
}

}  // namespace

extern "C" {

int fpemu_cast(const float* in, float* out, int64_t n, const char* mode,
               float scale, int block_norm, int64_t block_size,
               uint64_t seed) {
  Parsed p = parse_mode(mode);
  if (p.kind == Parsed::KBAD) return 1;
  Rng rng(seed);
  if (block_norm && block_size > 0) {
    for (int64_t start = 0; start < n; start += block_size) {
      int64_t len = (start + block_size > n) ? (n - start) : block_size;
      float s = block_scale(in + start, len, p);
      for (int64_t i = 0; i < len; i++)
        out[start + i] = cast_one(in[start + i], p, s, &rng);
    }
    return 0;
  }
  for (int64_t i = 0; i < n; i++)
    out[i] = cast_one(in[i], p, scale, &rng);
  return 0;
}

const char* fpemu_version() { return "fp8tpu-native-ref-0.1"; }

}  // extern "C"
