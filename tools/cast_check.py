#!/usr/bin/env python
"""Cast-kernel acceptance CLI — the reference's mpemu/pytquant/test.py
as a proper checker: pushes the boundary-value vector (test.py:120-135)
plus random data through every requested implementation (NumPy golden,
jnp/XLA, native C++, and the Pallas kernel when a TPU is attached) and
asserts bit-exact agreement instead of printing pairs.

  python tools/cast_check.py --dformat e4m3_rne --verbose
  python tools/cast_check.py --all
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BOUNDARY = np.array(
    [57344.0, -57344.0, 61440.0, -61440.0, 65504.0, -65504.0,
     448.0, -448.0, 480.0, -480.0, 240.0, -240.0, 30.0, -30.0, 31.0, -31.0,
     1.0, -1.0, 0.0, -0.0, 1.5e-5, -1.5e-5, 1.9e-3, 1.5e-2, 2.0 ** -16,
     2.0 ** -9, 2.0 ** -6, 0.1, 3.14159, 1e6, -1e6, 1e-8],
    dtype=np.float32)

ALL_MODES = [
    "e5m2_rtz", "e5m2_rne", "e5m2_rnaz", "e5m2_rntz", "e5m2_rpinf",
    "e5m2_rninf", "e5m2_daz_rne", "e4m3_rne", "e4m3_ieee_rne", "e3m4_rne",
    "fp4_nearest", "bfloat16_rne", "float16_rne", "float16_daz_rne",
]


def check(mode: str, verbose: bool, use_tpu: bool) -> bool:
    from fp8tpu.numerics import golden, qdq_mode_string, native_ref
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = np.concatenate([BOUNDARY, rng.normal(0, 100, 4096).astype(
        np.float32)])
    ref = golden.cast_mode_string(x, mode.upper())
    nan = np.isnan(ref)
    ok = True

    got_jnp = np.asarray(qdq_mode_string(jnp.asarray(x), mode.upper()))
    if not (np.array_equal(got_jnp[~nan], ref[~nan])
            and np.isnan(got_jnp[nan]).all()):
        print(f"  [FAIL] jnp vs golden: {mode}")
        ok = False

    if native_ref.available():
        got_c = native_ref.cast(x, mode.upper())
        if not (np.array_equal(got_c[~nan], ref[~nan])
                and np.isnan(got_c[nan]).all()):
            print(f"  [FAIL] native C++ vs golden: {mode}")
            ok = False

    if use_tpu:
        from fp8tpu.kernels.cast_kernel import pallas_qdq
        from fp8tpu.numerics.formats import parse_mode_string
        fmt, rmode, daz = parse_mode_string(mode)
        got_k = np.asarray(pallas_qdq(jnp.asarray(x), fmt, rmode, daz=daz))
        if not (np.array_equal(got_k[~nan], ref[~nan])
                and np.isnan(got_k[nan]).all()):
            print(f"  [FAIL] pallas vs golden: {mode}")
            ok = False

    if verbose:
        for a, b in zip(BOUNDARY[:16], ref[:16]):
            print(f"    {a:14.6g} -> {b:14.6g}")
    print(f"{mode:18s} {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dformat", default="e4m3_rne")
    p.add_argument("--all", action="store_true")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    import jax
    use_tpu = jax.default_backend() == "tpu"
    modes = ALL_MODES if args.all else [args.dformat]
    results = [check(m, args.verbose, use_tpu) for m in modes]
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
