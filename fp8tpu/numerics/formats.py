"""Floating-point format descriptors: the single source of truth for every
low-precision format this framework supports.

Capability parity with the reference toolkit's format surface
(/root/reference/mpemu/qutils.py:42-128 mode table;
/root/reference/mpemu/pytquant/cpp/fpemu_impl.cpp per-format kernels):

  E5M2  (+DAZ variants), E4M3, E4M3-IEEE, E3M4, FP4, BFLOAT16, FLOAT16,
  INT8, INT4.

Each FP8 format is described both at the *value-grid* level (bias, max,
min-subnormal — README.md:15-24 of the reference) and at the *fp16-domain
cast* level: the reference emulates FP32→FP8 by converting to IEEE fp16 and
rounding/truncating the 16-bit pattern.  We keep those bit-level constants
here so the golden NumPy model, the jittable jnp cast, and the Pallas TPU
kernel all share one table.

This file contains data and small pure helpers only — no jax imports — so it
can be used by the NumPy golden model without pulling in a device runtime.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class RoundMode(enum.Enum):
    """Rounding modes (reference mode-string suffixes, qutils.py:56-79)."""

    RNE = "rne"                  # round to nearest, ties to even
    STOCHASTIC = "stochastic"    # stochastic rounding (random bits below grid)
    RNAZ = "rnaz"                # round to nearest, ties away from zero
    RNTZ = "rntz"                # round to nearest, ties toward zero
    RPINF = "rpinf"              # round toward +inf
    RNINF = "rninf"              # round toward -inf
    RTZ = "rtz"                  # truncate (round toward zero)
    NEAREST = "nearest"          # FP4 power-of-two nearest


@dataclasses.dataclass(frozen=True)
class FPFormat:
    """One low-precision floating-point format.

    Value-grid fields describe the format itself; the ``cast_*`` fields
    parameterize the via-fp16 cast pipeline shared by all FP8 formats.
    """

    name: str
    exp_bits: int
    mant_bits: int
    bias: int
    max_normal: float          # reference get_flt_max (qutils.py:100-113)
    min_subnormal: float       # reference get_flt_min (qutils.py:115-128)
    has_inf: bool              # E5M2 keeps fp16 inf/nan; E4M3/E3M4 saturate

    # --- via-fp16 cast constants (fpemu_impl.cpp scalar kernels) ---
    # Number of fp16 mantissa bits dropped; rounding happens at bit
    # ``cast_lshift`` of the fp16 mantissa.
    cast_lshift: int
    cast_grs_mask: int         # guard/round/sticky mask on the fp16 mantissa
    cast_tie_mask: int         # RNE tie pattern mask
    # E5M2 rounds the raw fp16 word; the rebias family (E4M3/E3M4) decomposes
    # into sign/exp/mant and applies saturate/flush/denorm first.
    cast_rebias: bool
    cast_can_round_limit: int  # threshold on (h & 0x7FFF) (or h & 0x7F00 for E5M2)
    cast_exp_sat: Optional[int] = None    # saturation unbiased exponent
    cast_sat_mant: Optional[int] = None   # saturated fp16 mantissa pattern
    cast_flush_exp: Optional[int] = None  # flush-to-zero below this exponent
    cast_min_norm_exp: Optional[int] = None  # denorm handling below this exponent
    # Per-block ("block_norm") scaling headroom divisor:
    # scale = 2 * 2^floor(log2(absmax)) / headroom.
    block_headroom: float = 1.0

    @property
    def rounding_half(self) -> int:
        """Half-ULP threshold within the GRS bits (e.g. 0x80 for E5M2)."""
        return 1 << (self.cast_lshift - 1)

    @property
    def mant_trunc_mask(self) -> int:
        """fp16-word mask that truncates dropped mantissa bits."""
        return (0xFFFF << self.cast_lshift) & 0xFFFF

    def valid_round_modes(self) -> tuple:
        if self.name == "e5m2":
            return (
                RoundMode.RTZ, RoundMode.STOCHASTIC, RoundMode.RNE,
                RoundMode.RNAZ, RoundMode.RNTZ, RoundMode.RPINF,
                RoundMode.RNINF,
            )
        if self.name in ("e4m3", "e4m3_ieee", "e3m4"):
            return (RoundMode.RNE, RoundMode.STOCHASTIC)
        if self.name == "fp4":
            return (RoundMode.NEAREST,)
        if self.name == "bfloat16":
            return (RoundMode.RNE, RoundMode.STOCHASTIC)
        if self.name == "float16":
            return (RoundMode.RNE, RoundMode.STOCHASTIC)
        return ()


# --- The format table -------------------------------------------------------
# Constants cross-checked against the reference scalar kernels:
#   E5M2:  fpemu_impl.cpp:691-763   (lshift 8, grs 0x00FF, tie 0x0180)
#   E4M3:  fpemu_impl.cpp:1038-1133 (lshift 7, grs 0x007F, tie 0x00C0,
#          sat exp 8 / mant 0x300 → ±448, flush < 2^-9, denorm < 2^-6,
#          can_round below 0x5F00)
#   E4M3-IEEE: fpemu_impl.cpp:1330-1470 (sat exp 7 / mant 0x380 → ±240).
#          The reference's SCALAR path saturates anything ≥ 15.0 (its
#          can_round constant 0x4B80 is a typo of 0x5B80 = fp16(240); the
#          AVX512 body at fpemu_impl.cpp:1215-1262 uses vsatuval 0x5B80),
#          so the reference disagrees with itself on the size%16 tail.
#          We model the vector/production semantics — proven bitwise
#          against the reference binary in DIFFREF.json (tools/diffref.py).
#   E3M4:  fpemu_impl.cpp:1623-1717 (lshift 6, grs 0x003F, tie 0x0060,
#          sat exp 4 / mant 0x380 → ±30, flush < 2^-6, denorm < 2^-2,
#          can_round below 0x4F80)
# Block-norm headroom divisors: E5M2 16384 (fpemu_impl.cpp:799), E4M3 8
# (1171), E4M3-IEEE 8 (1463), E3M4 1 (E3M4_Kernel block path).

E5M2 = FPFormat(
    name="e5m2", exp_bits=5, mant_bits=2, bias=15,
    max_normal=57344.0, min_subnormal=2.0 ** -16, has_inf=True,
    cast_lshift=8, cast_grs_mask=0x00FF, cast_tie_mask=0x0180,
    cast_rebias=False, cast_can_round_limit=0x7B00,
    block_headroom=16384.0,
)

E4M3 = FPFormat(
    name="e4m3", exp_bits=4, mant_bits=3, bias=7,
    max_normal=448.0, min_subnormal=2.0 ** -9, has_inf=False,
    cast_lshift=7, cast_grs_mask=0x007F, cast_tie_mask=0x00C0,
    cast_rebias=True, cast_can_round_limit=0x5F00,
    cast_exp_sat=8, cast_sat_mant=0x0300,
    cast_flush_exp=-9, cast_min_norm_exp=-6,
    block_headroom=8.0,
)

E4M3_IEEE = FPFormat(
    name="e4m3_ieee", exp_bits=4, mant_bits=3, bias=7,
    max_normal=240.0, min_subnormal=2.0 ** -9, has_inf=True,
    cast_lshift=7, cast_grs_mask=0x007F, cast_tie_mask=0x00C0,
    cast_rebias=True, cast_can_round_limit=0x5B80,
    cast_exp_sat=7, cast_sat_mant=0x0380,
    cast_flush_exp=-9, cast_min_norm_exp=-6,
    block_headroom=8.0,
)

E3M4 = FPFormat(
    name="e3m4", exp_bits=3, mant_bits=4, bias=3,
    max_normal=30.0, min_subnormal=2.0 ** -6, has_inf=False,
    cast_lshift=6, cast_grs_mask=0x003F, cast_tie_mask=0x0060,
    cast_rebias=True, cast_can_round_limit=0x4F80,
    cast_exp_sat=4, cast_sat_mant=0x0380,
    cast_flush_exp=-6, cast_min_norm_exp=-2,
    block_headroom=1.0,
)

# FP4 / BF16 / FP16 do not use the via-fp16 GRS pipeline; the cast fields are
# unused placeholders kept so the policy layer can treat formats uniformly.
FP4 = FPFormat(
    name="fp4", exp_bits=3, mant_bits=0, bias=0,
    max_normal=1.0, min_subnormal=2.0 ** -12, has_inf=False,
    cast_lshift=0, cast_grs_mask=0, cast_tie_mask=0,
    cast_rebias=False, cast_can_round_limit=0,
)

BFLOAT16 = FPFormat(
    name="bfloat16", exp_bits=8, mant_bits=7, bias=127,
    max_normal=3.3895314e38, min_subnormal=9.184e-41, has_inf=True,
    cast_lshift=16, cast_grs_mask=0x0000FFFF, cast_tie_mask=0x00018000,
    cast_rebias=False, cast_can_round_limit=0,
)

FLOAT16 = FPFormat(
    name="float16", exp_bits=5, mant_bits=10, bias=15,
    max_normal=65504.0, min_subnormal=2.0 ** -24, has_inf=True,
    cast_lshift=13, cast_grs_mask=0x00001FFF, cast_tie_mask=0x00003000,
    cast_rebias=False, cast_can_round_limit=0,
)

FORMATS = {
    f.name: f for f in (E5M2, E4M3, E4M3_IEEE, E3M4, FP4, BFLOAT16, FLOAT16)
}

# Formats that run through the via-fp16 GRS cast pipeline.
FP8_FORMATS = ("e5m2", "e4m3", "e4m3_ieee", "e3m4")


def parse_mode_string(mode: str):
    """Parse a reference-style mode string like ``E4M3_RNE`` or
    ``E5M2_DAZ_STOCHASTIC`` into (format, round_mode, daz).

    The mode-string grammar is the de-facto kernel ABI of the reference
    (fpemu_impl.cpp:1866-2009, qutils.py:56-79).  INT8/INT4 are handled by
    :mod:`fp8tpu.numerics.integer`.
    """
    m = mode.lower()
    daz = False
    if m.startswith("e5m2_daz_"):
        return E5M2, RoundMode(m[len("e5m2_daz_"):]), True
    if m.startswith("e5m2_"):
        return E5M2, RoundMode(m[len("e5m2_"):]), False
    if m.startswith("e4m3_ieee_"):
        return E4M3_IEEE, RoundMode(m[len("e4m3_ieee_"):]), False
    if m.startswith("e4m3_"):
        return E4M3, RoundMode(m[len("e4m3_"):]), False
    if m.startswith("e3m4_"):
        return E3M4, RoundMode(m[len("e3m4_"):]), False
    if m.startswith("fp4_"):
        return FP4, RoundMode(m[len("fp4_"):]), False
    if m.startswith("bfloat16_"):
        return BFLOAT16, RoundMode(m[len("bfloat16_"):]), False
    if m.startswith("float16_daz_"):
        return FLOAT16, RoundMode(m[len("float16_daz_"):]), True
    if m.startswith("float16_"):
        return FLOAT16, RoundMode(m[len("float16_"):]), False
    raise ValueError(f"unknown cast mode string: {mode!r}")


def mode_string(fmt: FPFormat, mode: RoundMode, daz: bool = False) -> str:
    """Inverse of :func:`parse_mode_string`."""
    if daz:
        return f"{fmt.name}_daz_{mode.value}".upper()
    return f"{fmt.name}_{mode.value}".upper()
