"""Jittable fake-quantization casts (pure jnp, bit-exact vs the golden model).

This is the *emulation-parity* compute path: a vectorized integer-bit
pipeline XLA fuses into surrounding ops on the VPU.  It matches
:mod:`fp8tpu.numerics.golden` bit-for-bit for every (format × rounding ×
scaling) cell, which in turn replicates the reference toolkit's native cast
kernels (/root/reference/mpemu/pytquant/cpp/fpemu_impl.cpp).

Unlike the reference — which launches one C++/CUDA kernel per tensor (and
one per *channel* for per-channel scaling, qutils.py:289-311) — scales here
are ordinary broadcastable arrays: per-tensor scalars, per-channel columns,
or per-block grids all run in one fused XLA computation.

The production path for matmul operands additionally fuses the cast into the
MXU epilogue (:mod:`fp8tpu.kernels.qmatmul`); this module is the numerics
authority it is tested against.

Deviations from the reference (documented, also in golden.py):
  * stochastic rounding uses counter-based `jax.random` bits, not 16 global
    xoroshiro seed states;
  * all-zero block-norm blocks use scale 1.0 instead of the reference's
    0-scale (which yields 0·inf = NaN on dequant).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .formats import FORMATS, FPFormat, RoundMode, parse_mode_string


import os as _os

# SR dither source.  "hash": murmur3-finalizer counter hash — SR needs
# uniform dither, not crypto, and threefry was measured at ~35% of the
# whole fp8 train step (every gradient stream draws bits; NOTES r3).
# "threefry": jax.random.bits (the round-1/2 behavior).
SR_BITS_IMPL = _os.environ.get("FP8TPU_SR_BITS", "hash")


def sr_bits(key: jax.Array, shape) -> jax.Array:
    """Counter-based random bits for stochastic rounding (uint16):
    deterministic in (key, element index), so streams are reproducible
    across shardings and resumes (SURVEY §5.2)."""
    if SR_BITS_IMPL == "threefry":
        return jax.random.bits(key, shape, dtype=jnp.uint16)
    kd = jax.random.key_data(key)
    kd = kd.reshape(-1).astype(jnp.uint32)
    salt = kd[0] * jnp.uint32(0x9E3779B9) ^ kd[-1]
    n = 1
    for s in shape:
        n *= int(s)
    idx = jax.lax.iota(jnp.uint32, max(n, 1))
    h = idx * jnp.uint32(0xCC9E2D51) + salt
    # murmur3 finalizer: full avalanche per 32-bit lane
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h >> 16).astype(jnp.uint16).reshape(shape)


def f32_to_f16_bits(f: jax.Array) -> jax.Array:
    """IEEE fp32 → fp16 bit pattern with RNE, in pure integer ops.

    Mosaic (Pallas TPU) cannot legalize f32↔f16 converts on v5e, so the
    kernels use this manual pipeline; it is bit-exact vs the hardware
    convert (tested) and therefore also used under plain jit so there is
    exactly one semantics.  Returns int32 holding the 16-bit pattern.
    """
    u = jax.lax.bitcast_convert_type(f.astype(jnp.float32), jnp.uint32)
    sign = ((u >> 16) & jnp.uint32(0x8000)).astype(jnp.int32)
    absu = (u & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    exp = absu >> 23
    mant = absu & 0x7FFFFF
    e = exp - 127

    # Normal fp16 range: RNE-round 23→10 mantissa bits; the carry may roll
    # into the exponent and (for e == 15) correctly produce inf.
    lsb = (mant >> 13) & 1
    h_norm = ((e + 15) << 10) + ((mant + 0xFFF + lsb) >> 13)

    # Subnormal fp16 range (e in [-24, -15]): h_mant = RNE(m24 >> (-e-1)).
    m24 = mant | 0x800000
    rs = jnp.clip(-e - 1, 1, 30)
    lsb_s = (m24 >> rs) & 1
    h_sub = (m24 + (jnp.left_shift(1, rs - 1) - 1) + lsb_s) >> rs

    h_naninf = 0x7C00 | jnp.where(mant != 0, (mant >> 13) | 0x200, 0)

    h = jnp.where(e >= -14, h_norm, h_sub)
    h = jnp.where(e > 15, 0x7C00, h)
    h = jnp.where(exp == 0, 0, h)    # f32 denormals underflow to 0
    h = jnp.where(exp == 255, h_naninf, h)
    return h | sign


def f16_bits_to_f32(h: jax.Array) -> jax.Array:
    """fp16 bit pattern (int32) → fp32 value, in pure integer ops."""
    h = h & 0xFFFF
    sign = (h >> 15) & 1
    exp = (h >> 10) & 0x1F
    mant = h & 0x3FF

    bits_norm = (sign << 31) | ((exp + 112) << 23) | (mant << 13)
    bits_naninf = (sign << 31) | 0x7F800000 | (mant << 13)
    bits = jnp.where(exp == 31, bits_naninf, bits_norm)
    f = jax.lax.bitcast_convert_type(bits.astype(jnp.uint32), jnp.float32)

    # Subnormals: mant × 2^-24 is exact in f32 (mant ≤ 1023).
    f_sub = mant.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    f_sub = jnp.where(sign == 1, -f_sub, f_sub)
    return jnp.where(exp == 0, f_sub, f)


def _to_f16_bits(x: jax.Array, scale) -> jax.Array:
    return f32_to_f16_bits(x.astype(jnp.float32) * scale)


def _from_f16_bits(u: jax.Array, inv_scale) -> jax.Array:
    return f16_bits_to_f32(u) * inv_scale


def _nearest_increment(mode, rnmask, rntie, positive, fmt: FPFormat):
    half = fmt.rounding_half
    if mode == RoundMode.RNE:
        up = (rnmask > half) | (rntie == fmt.cast_tie_mask)
    elif mode == RoundMode.RNAZ:
        up = rnmask >= half
    elif mode == RoundMode.RNTZ:
        up = rnmask > half
    elif mode == RoundMode.RPINF:
        up = positive & (rnmask >= half)
    elif mode == RoundMode.RNINF:
        up = (~positive) & (rnmask >= half)
    elif mode == RoundMode.RTZ:
        up = jnp.zeros(rnmask.shape, jnp.bool_)
    else:
        raise ValueError(f"not a nearest mode: {mode}")
    return up.astype(jnp.int32) << fmt.cast_lshift


def _prep_scale(scale, x):
    scale = jnp.asarray(scale, jnp.float32)
    inv = jnp.float32(1.0) / scale
    return scale, inv


def _cast_e5m2(x, mode, scale, daz, random_bits):
    fmt = FORMATS["e5m2"]
    scale, inv = _prep_scale(scale, x)
    h = _to_f16_bits(x, scale)

    exp_field = h & 0x7C00
    can_round = (h & 0x7F00) <= fmt.cast_can_round_limit
    is_normal = (exp_field <= 0x7800) & (exp_field >= 0x0400)
    is_denorm = exp_field == 0
    is_naninf = exp_field == 0x7C00
    positive = (h & 0x8000) == 0

    rnmask = h & fmt.cast_grs_mask
    rntie = h & fmt.cast_tie_mask
    rne_incr = _nearest_increment(RoundMode.RNE, rnmask, rntie, positive, fmt)

    if mode == RoundMode.STOCHASTIC:
        rand = random_bits.astype(jnp.int32) & fmt.cast_grs_mask
        if daz:
            incr = rand
        else:
            incr = (
                jnp.where(is_normal, rand, 0)
                + jnp.where(is_denorm, rne_incr, 0)
            )
    else:
        incr = _nearest_increment(mode, rnmask, rntie, positive, fmt)

    apply = (~is_naninf) & can_round
    if daz:
        apply = apply & is_normal
    h = jnp.where(apply, h + incr, h)
    if daz:
        h = jnp.where(is_denorm, 0, h)
    h = h & fmt.mant_trunc_mask
    return _from_f16_bits(h, inv)


def _cast_rebias(x, fmt: FPFormat, mode, scale, random_bits):
    scale, inv = _prep_scale(scale, x)
    h = _to_f16_bits(x, scale)

    exp = ((h >> 10) & 0x1F) - 15
    sign = h & 0x8000
    mant = h & 0x03FF

    can_round = (h & 0x7FFF) < fmt.cast_can_round_limit
    is_denorm = (h & 0x7C00) == 0
    is_naninf = (h & 0x7C00) == 0x7C00
    positive = sign == 0

    sat = (exp > fmt.cast_exp_sat) | (~can_round)
    mant = jnp.where(sat, fmt.cast_sat_mant, mant)
    exp = jnp.where(sat, fmt.cast_exp_sat, exp)
    can_round = can_round & (~sat)

    flush = (~sat) & (exp < fmt.cast_flush_exp)
    mant = jnp.where(flush, 0, mant)
    exp = jnp.where(flush, -15, exp)

    dn = (~sat) & (~flush) & (exp < fmt.cast_min_norm_exp)
    dshift = jnp.where(dn, fmt.cast_min_norm_exp - exp, 0)
    mant = jnp.where(dn, (mant >> dshift) << dshift, mant)

    rnmask = mant & fmt.cast_grs_mask
    rntie = mant & fmt.cast_tie_mask
    rne_incr = _nearest_increment(RoundMode.RNE, rnmask, rntie, positive, fmt)

    if mode == RoundMode.STOCHASTIC:
        rand = random_bits.astype(jnp.int32) & fmt.cast_grs_mask
        is_normal = ((h & 0x7C00) <= 0x7800) & ((h & 0x7C00) >= 0x0400)
        incr = (
            jnp.where(is_normal, rand, 0) + jnp.where(is_denorm, rne_incr, 0)
        )
    else:
        incr = _nearest_increment(mode, rnmask, rntie, positive, fmt)

    mant = jnp.where((~is_naninf) & can_round, mant + incr, mant)

    mant = mant & fmt.mant_trunc_mask
    out = (mant + ((exp + 15) << 10)) | sign
    return _from_f16_bits(out, inv)


def _cast_e4m3_v2(x, mode, scale, random_bits):
    """E4M3 "v2" (the reference's dead CUDA-only ``E4M3v2_Kernel``,
    fpemu_kernels.cu:770-875) — jittable twin of golden.cast_e4m3_v2:
    raw fp16 exponent kept, 3 mantissa bits, everything ``|x| >= 1.0``
    (inf/NaN included) saturated to ±0.9375 before rounding."""
    fmt = FORMATS["e4m3"]  # shares E4M3's GRS geometry
    scale, inv = _prep_scale(scale, x)
    h = _to_f16_bits(x, scale)

    exp = ((h >> 10) & 0x1F) - 15
    sign = h & 0x8000
    mant = h & 0x03FF
    can_round = (h & 0x7FFF) < 0x4B80          # |fp16| < 15.0
    exp_field = h & 0x7C00
    is_normal = (exp_field <= 0x7800) & (exp_field >= 0x0400)
    is_denorm = exp_field == 0
    is_naninf = exp_field == 0x7C00
    positive = sign == 0

    sat = exp > -1
    mant = jnp.where(sat, 0x0380, mant)
    exp = jnp.where(sat, -1, exp)
    can_round = can_round & (~sat)

    rnmask = mant & fmt.cast_grs_mask
    rntie = mant & fmt.cast_tie_mask
    if mode == RoundMode.STOCHASTIC:
        rne_incr = _nearest_increment(RoundMode.RNE, rnmask, rntie,
                                      positive, fmt)
        rand = random_bits.astype(jnp.int32) & fmt.cast_grs_mask
        incr = (
            jnp.where(is_normal, rand, 0) + jnp.where(is_denorm, rne_incr, 0)
        )
    else:
        incr = _nearest_increment(mode, rnmask, rntie, positive, fmt)
    mant = jnp.where(can_round & (~is_naninf), mant + incr, mant)
    mant = mant & 0xFF80
    out = (mant + ((exp + 15) << 10)) | sign
    return _from_f16_bits(out, inv)


def _cast_bfloat16(x, mode, random_bits):
    # uint32 arithmetic wraps mod 2^32, matching the reference's C unsigned
    # int pipeline (x64 is disabled, so int64 is unavailable under jit).
    # True RNE via the full-sticky 0x7FFF+lsb bias add with a NaN/Inf
    # pass-through gate — the reference's AVX512 production path
    # (fpemu_impl.cpp:207-231); see golden.cast_bfloat16 for the scalar
    # tail / biased-vector-SR reference defects this deliberately skips.
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    naninf = (u & jnp.uint32(0x7F800000)) == jnp.uint32(0x7F800000)
    if mode == RoundMode.STOCHASTIC:
        incr = random_bits.astype(jnp.uint32) & jnp.uint32(0xFFFF)
    else:
        incr = jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    u = jnp.where(naninf, u, u + incr)
    u = u & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _cast_float16(x, mode, daz, random_bits):
    xf = x.astype(jnp.float32)
    if mode == RoundMode.RNE:
        bits = f32_to_f16_bits(xf)
        if daz:
            is_denorm = (bits & 0x7C00) == 0
            bits = jnp.where(is_denorm, 0, bits)
        return f16_bits_to_f32(bits)

    u = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    exp = ((u >> 23) & jnp.uint32(0xFF)).astype(jnp.int32) - 127
    mant = u & jnp.uint32(0x7FFFFF)
    sign = u & jnp.uint32(0x80000000)

    nan_mant = jnp.where(
        (mant != 0) & ((mant & jnp.uint32(0x400000)) == 0),
        mant | jnp.uint32(0x400000), mant,
    )
    h_naninf = ((jnp.uint32(0x1F << 23) | nan_mant | (sign >> 3))) >> 13
    h_inf = (jnp.uint32(0x1F << 23) | (sign >> 3)) >> 13
    rb = random_bits.astype(jnp.uint32) & jnp.uint32(0x1FFF)
    exp_bits = ((exp + 15).astype(jnp.uint32) & jnp.uint32(0x1FF)) << 23
    h_norm = ((exp_bits | mant | (sign >> 3)) + rb) >> 13
    h_denorm = f32_to_f16_bits(xf).astype(jnp.uint32)

    h = jnp.where(
        exp == 128, h_naninf,
        jnp.where(exp >= 16, h_inf,
                  jnp.where(exp < -14, h_denorm, h_norm)),
    )
    return f16_bits_to_f32((h & jnp.uint32(0xFFFF)).astype(jnp.int32))


def _cast_e5m2_noinf(x, scale):
    """E5M2 noINF (exponent-offset-16, inf/NaN reclaimed) — jittable
    twin of golden.cast_e5m2_noinf; bit-exact incl. the reference's
    wrap/sign quirks (fpemu_impl.cpp:460-535)."""
    scale, inv = _prep_scale(scale, x)
    h = _to_f16_bits(x, scale)
    naninf = (h & 0x7C00) == 0x7C00
    tie = ((h & 0x0100) == 0x0100).astype(jnp.int32)
    enc = ((((h & 0x7C00) >> 10) + 1) << 10) | (h & 0x83FF)
    enc = jnp.where(~naninf, enc + 0x7F + tie, enc) & 0xFFFF
    sat = (h & 0x7FFF) > 0x7F00
    enc = jnp.where(sat, (enc & 0x8000) | 0x7F00, enc)
    enc = jnp.where(naninf, 0x8000, enc)
    d = ((enc >> 8) & 0xFF) << 8
    dexp = ((((d & 0x7C00) >> 10) - 1) << 10) & 0xFFFF
    out = (dexp | (d & 0x83FF)) & 0xFFFF
    out = jnp.where(d == 0x8000, 0x7C00, out)
    return _from_f16_bits(out, inv)


def _cast_e5m2_flex(x, scale):
    """E5M2 flex-denormal (f32-domain single rounding) — jittable twin
    of golden.cast_e5m2_flex (fpemu_impl.cpp:537-593; the reference's
    unused ``scale`` argument is replicated as a no-op)."""
    del scale
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    expf = u & jnp.uint32(0x7F800000)
    naninf = expf == jnp.uint32(0x7F800000)
    tie = ((u & jnp.uint32(0x00200000)) == jnp.uint32(0x00200000))
    zflush = expf < jnp.uint32(0x37800000)
    denorm = expf < jnp.uint32(0x38800000)
    sign = u & jnp.uint32(0x80000000)
    urne = jnp.where(~naninf,
                     u + jnp.uint32(0xFFFFF) + tie.astype(jnp.uint32), u)
    exp = ((urne & jnp.uint32(0x7F800000)) >> 23).astype(jnp.int32) - 127
    mant = (urne & jnp.uint32(0x7FFFFF)).astype(jnp.int32)
    shft = -15 - exp
    rshft = jnp.where(denorm, 21 + shft, 21)
    lshft = jnp.where(denorm, 8 + shft, 8)
    mant2 = jnp.where(
        rshft < 24,
        (mant >> jnp.clip(rshft, 0, 31)) << jnp.clip(lshft, 0, 31), 0)
    out = (mant2 | (((exp + 15) << 10) & 0xFFFF)
           | jnp.where(sign != 0, 0x8000, 0)) & 0xFFFF
    out = jnp.where(zflush, 0, out)
    return f16_bits_to_f32(out)


def _cast_fp4(x, scale):
    scale, inv = _prep_scale(scale, x)
    f = x.astype(jnp.float32) * scale
    u = jax.lax.bitcast_convert_type(f, jnp.uint32)
    exp = ((u >> 23) & jnp.uint32(0xFF)).astype(jnp.int32) - 127
    sign = u & jnp.uint32(0x80000000)

    odd_neg = (exp < 0) & ((exp % 2) != 0)
    f2 = jnp.where(odd_neg, f * jnp.float32(1.6), f)
    u2 = jax.lax.bitcast_convert_type(f2, jnp.uint32)
    u2 = jnp.where(exp > 0, sign | jnp.uint32(127 << 23), u2)
    u2 = u2 & jnp.uint32(0xFF800000)
    exp2 = ((u2 >> 23) & jnp.uint32(0xFF)).astype(jnp.int32) - 127
    odd2 = (exp2 < 0) & ((exp2 % 2) != 0)
    # (exp2 + 126) << 23 wraps like the reference's C int arithmetic.
    fixed = sign | ((exp2 + 126).astype(jnp.uint32) << 23)
    u2 = jnp.where(odd2, fixed, u2)
    # Flush uses the pre-adjustment exponent, as in the reference.
    u2 = jnp.where(exp2 < -12, jnp.uint32(0), u2)
    out = jax.lax.bitcast_convert_type(u2, jnp.float32)
    return out * inv


# -- hardware-convert fast path (cast_impl="hw") ----------------------------
# Spec-exact single-rounding casts through the hardware dtype where one
# exists.  These are the production compute path (training presets default
# to cast_impl="hw"); the bit pipeline above stays the reference-parity
# option.  Shared by quant.fakequant (jax.random bits) and the Pallas
# qdq_matmul kernel (pltpu.prng_random_bits) — both traceable in-kernel.

HW_DTYPES = {"e4m3": jnp.float8_e4m3fn, "e5m2": jnp.float8_e5m2,
             "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def hw_qdq(x, fmt_name: str, scale, descale: bool = True):
    """RNE fake-quant via the native convert: clip + one f32→dtype→f32
    round trip.  With ``descale=False`` returns the SCALED grid values
    (exactly representable in bf16 for every mant_bits<=7 format — the
    fused matmul path contracts those on the MXU and applies 1/scale in
    the epilogue).

    Finite out-of-range values SATURATE to ±max_normal for every format
    — matching the reference kernels (its e5m2 path saturates at 57344,
    fpemu_impl.cpp:711-763) and hw_sr; only a true ±inf after scaling
    passes through on has_inf formats, and NaN stays NaN.  (Without the
    finite clip, the reference's own scale-clamp quirk — raw scales
    above 3.275e4 clamp UP to 6.55e4, qutils.py:280-287 — pushes
    near-amax e5m2 values past 61440 and the native convert returns inf,
    which then poisons training; found via the direct-scaled recipe
    ablation, NOTES r3.)"""
    fmt = FORMATS[fmt_name]
    xf = x.astype(jnp.float32) * scale
    clipped = jnp.clip(xf, -fmt.max_normal, fmt.max_normal)  # NaN → NaN
    if fmt.has_inf:
        xf = jnp.where(jnp.isinf(xf), xf, clipped)
    else:
        xf = clipped
    y = xf.astype(HW_DTYPES[fmt_name]).astype(jnp.float32)
    return y / scale if descale else y


def hw_sr(x, fmt_name: str, scale, rb, descale: bool = True):
    """f32-domain stochastic rounding onto the target float grid.

    ``rb``: uint16-valued random bits of ``x.shape`` (any provider:
    jax.random or the in-kernel TPU PRNG).  Normal range: classic
    add-random-bits-below-the-cut-then-truncate on the f32 bit pattern
    (cut = 23 - m, always within the mantissa field).  Subnormal range:
    the target grid is FIXED-point (k * 2^(emin-m)), so the bit trick
    would reach into the exponent field; instead floor(|x|/g + u) * g
    with u ~ U[0,1) — exact unbiased SR on the subnormal grid, valid
    down to zero (no flush).  ~25 ops vs ~100 for the via-fp16 reference
    pipeline; the random stream differs from the reference's (16 uniform
    bits vs its 8 f16-domain GRS bits) — both unbiased.

    bf16/f16 note: inputs below the f32 normal range are flushed to zero
    by XLA's DAZ+FTZ f32 arithmetic on both CPU and TPU backends (same as
    real bf16 hardware); the guarantee here is no NaN and no saturation
    for such inputs (ADVICE r1 regression).
    """
    fmt = FORMATS[fmt_name]
    m = fmt.mant_bits
    emin = 1 - fmt.bias
    xs0 = x.astype(jnp.float32) * scale
    xs = jnp.clip(xs0, -fmt.max_normal, fmt.max_normal)

    u = jax.lax.bitcast_convert_type(xs, jnp.uint32)
    sign = u & jnp.uint32(0x80000000)
    mag = u & jnp.uint32(0x7FFFFFFF)
    e = (mag >> 23).astype(jnp.int32) - 127
    rb = rb.astype(jnp.uint32)

    # -- normal-range branch: bit add-truncate, cut is a static int ----
    cut = 23 - m
    if cut >= 16:
        radd = rb << (cut - 16)
    else:
        radd = rb >> (16 - cut)
    mask = jnp.uint32(0xFFFFFFFF) << cut
    mag_bits = (mag + radd) & mask
    y_norm = jax.lax.bitcast_convert_type(mag_bits, jnp.float32)

    # -- subnormal-range branch: fixed grid g = 2^(emin - m) -----------
    shift = m - emin                      # static python int
    absx = jax.lax.bitcast_convert_type(mag, jnp.float32)
    # via int32: Mosaic has no uint32->f32 convert (rb values < 2^16)
    u01 = rb.astype(jnp.int32).astype(jnp.float32) * jnp.float32(2.0 ** -16)
    if shift > 126:
        # bfloat16: 2^(m-emin) = 2^133 overflows f32 to inf (0*inf = NaN,
        # ADVICE r1 — XLA refolds even a split constant product back into
        # one inf constant), and the whole branch domain |x| < 2^-126 is
        # f32-subnormal, which XLA's DAZ+FTZ f32 arithmetic flushes on CPU
        # and TPU alike.  The grid values themselves are f32-subnormal, so
        # the defined result under flush semantics is exactly zero.
        y_sub = jnp.zeros_like(absx)
    else:
        g = jnp.float32(2.0 ** (emin - m))
        inv_g = jnp.float32(2.0 ** shift)
        y_sub = jnp.floor(absx * inv_g + u01) * g

    y = jnp.where(e >= emin, y_norm, y_sub)
    out = jax.lax.bitcast_convert_type(
        sign | jax.lax.bitcast_convert_type(y, jnp.uint32), jnp.float32)
    # SR may round up past the format max: saturate; keep NaN as NaN and,
    # for formats with an inf encoding (e5m2/bf16/f16), pass ±inf through
    # instead of saturating (mirrors hw_qdq's overflow semantics).
    out = jnp.clip(out, -fmt.max_normal, fmt.max_normal)
    out = jnp.where(jnp.isnan(xs0), xs0, out)
    if fmt.has_inf:
        out = jnp.where(jnp.isinf(xs0), xs0, out)
    if not descale:
        return out
    return (out / scale).astype(jnp.float32)


def cast_array(x, scale, random_bits, fmt_name: str, mode: RoundMode,
               daz: bool = False):
    """Unjitted cast core: traceable inside jit AND inside Pallas kernel
    bodies (the TPU kernels reuse this exact bit pipeline in-register)."""
    if fmt_name == "e5m2_noinf":
        if mode != RoundMode.RNE:
            raise ValueError("e5m2_noinf implements RNE only "
                             "(fpemu_impl.cpp:460-535)")
        return _cast_e5m2_noinf(x, scale)
    if fmt_name == "e5m2_flex":
        if mode != RoundMode.RNE:
            raise ValueError("e5m2_flex implements RNE only "
                             "(fpemu_impl.cpp:537-593)")
        return _cast_e5m2_flex(x, scale)
    if fmt_name == "e4m3_v2":
        return _cast_e4m3_v2(x, mode, scale, random_bits)
    fmt = FORMATS[fmt_name]
    if fmt_name == "e5m2":
        return _cast_e5m2(x, mode, scale, daz, random_bits)
    if fmt_name in ("e4m3", "e4m3_ieee", "e3m4"):
        return _cast_rebias(x, fmt, mode, scale, random_bits)
    if fmt_name == "bfloat16":
        return _cast_bfloat16(x, mode, random_bits)
    if fmt_name == "float16":
        return _cast_float16(x, mode, daz, random_bits)
    if fmt_name == "fp4":
        return _cast_fp4(x, scale)
    raise ValueError(f"unknown format {fmt_name}")


_qdq_jit = partial(jax.jit, static_argnames=("fmt_name", "mode", "daz"))(
    cast_array
)


def qdq(
    x: jax.Array,
    fmt: FPFormat | str,
    mode: RoundMode = RoundMode.RNE,
    scale=1.0,
    daz: bool = False,
    key: Optional[jax.Array] = None,
    random_bits: Optional[jax.Array] = None,
) -> jax.Array:
    """Quantize-dequantize ``x`` onto the ``fmt`` value grid.

    ``scale`` may be a scalar or any array broadcastable to ``x`` (per-channel
    columns, per-group grids).  Stochastic rounding needs either ``key`` or
    explicit uint16 ``random_bits`` shaped like ``x``.
    Returns float32 with the same shape as ``x``.
    """
    fmt_name = fmt if isinstance(fmt, str) else fmt.name
    x = jnp.asarray(x)
    if mode == RoundMode.STOCHASTIC and random_bits is None:
        if key is None:
            raise ValueError("stochastic rounding requires key or random_bits")
        random_bits = sr_bits(key, x.shape)
    if random_bits is None:
        # Dummy operand so the jitted signature stays uniform.
        random_bits = jnp.zeros((1,) * max(x.ndim, 1), jnp.uint16)
    scale = jnp.asarray(scale, jnp.float32)
    return _qdq_jit(x, scale, random_bits, fmt_name, mode, daz)


def qdq_mode_string(
    x: jax.Array,
    mode: str,
    scale=1.0,
    key: Optional[jax.Array] = None,
    random_bits: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference-ABI entry point (mode strings like ``E5M2_DAZ_RNE``;
    plus ``E5M2_NOINF_RNE`` / ``E5M2_FLEX_RNE`` for the reference's
    out-of-ABI L0 variants, fpemu_impl.cpp:460-593, and
    ``E4M3_V2_<mode>`` for the dead CUDA-only E4M3v2_Kernel,
    fpemu_kernels.cu:770-875)."""
    ml = mode.lower()
    if ml in ("e5m2_noinf_rne", "e5m2_flex_rne"):
        return cast_array(x, scale, None, ml[:-4], RoundMode.RNE)
    if ml.startswith("e4m3_v2_"):
        rmode = RoundMode[ml[len("e4m3_v2_"):].upper()]
        x = jnp.asarray(x)
        if rmode == RoundMode.STOCHASTIC and random_bits is None:
            if key is None:
                raise ValueError(
                    "stochastic rounding requires key or random_bits")
            random_bits = sr_bits(key, x.shape)
        return cast_array(x, scale, random_bits, "e4m3_v2", rmode)
    fmt, rmode, daz = parse_mode_string(mode)
    return qdq(x, fmt, rmode, scale, daz, key, random_bits)


def block_scales(x: jax.Array, block_size: int, fmt: FPFormat | str):
    """Vectorized per-block scales over the flattened tensor.

    scale_b = 2 · 2^⌊log2(absmax_b)⌋ / headroom   (fp8 formats)
    scale_b = 1 / absmax_b                        (fp4)
    All-zero blocks get scale 1.0 (deviation: the reference computes 0 and
    then dequantizes with 1/0 = inf).
    Requires x.size % block_size == 0 (pad upstream if needed).
    """
    fmt = FORMATS[fmt] if isinstance(fmt, str) else fmt
    flat = jnp.asarray(x, jnp.float32).reshape(-1, block_size)
    amax = jnp.max(jnp.abs(flat), axis=1)
    if fmt.name == "fp4":
        return jnp.where(amax > 0, 1.0 / amax, 1.0)
    p2 = jax.lax.bitcast_convert_type(amax, jnp.uint32) & jnp.uint32(
        0x7F800000
    )
    p2f = jax.lax.bitcast_convert_type(p2, jnp.float32)
    scale = 2.0 * p2f / jnp.float32(fmt.block_headroom)
    return jnp.where(amax > 0, scale, 1.0)


def qdq_blocked(
    x: jax.Array,
    fmt: FPFormat | str,
    mode: RoundMode = RoundMode.RNE,
    block_size: int = 128,
    daz: bool = False,
    key: Optional[jax.Array] = None,
    random_bits: Optional[jax.Array] = None,
) -> jax.Array:
    """Block-normalized fake-quant: per-block power-of-two scales computed
    in the same fused computation (the reference's ``block_norm`` path —
    used row-wise for embeddings, e5m2_emu.py:119-120 — but vectorized
    instead of an OpenMP block loop)."""
    fmt = FORMATS[fmt] if isinstance(fmt, str) else fmt
    x = jnp.asarray(x)
    orig_shape = x.shape
    n = x.size
    pad = (-n) % block_size
    flat = jnp.pad(x.reshape(-1).astype(jnp.float32), (0, pad))
    scales = block_scales(flat, block_size, fmt)[:, None]
    flat = flat.reshape(-1, block_size)
    if mode == RoundMode.STOCHASTIC and random_bits is None:
        if key is None:
            raise ValueError("stochastic rounding requires key or random_bits")
        random_bits = sr_bits(key, flat.shape)
    elif random_bits is not None:
        random_bits = jnp.pad(random_bits.reshape(-1), (0, pad)).reshape(
            -1, block_size
        )
    out = qdq(flat, fmt, mode, scales, daz, random_bits=random_bits)
    return out.reshape(-1)[:n].reshape(orig_shape)
