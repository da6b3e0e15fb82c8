#!/usr/bin/env python
"""Differential bit-exactness harness against the REAL reference binaries
(VERDICT r3 next #2).

Builds the reference toolkit's own CPU extensions from /root/reference —
`fpemu_cpp` (mpemu/pytquant/cpp/fpemu_impl.cpp, flags per setup.py:12-16)
and `simple_gemm_dev`/`simple_conv2d_dev` (setup.py:33-46) — with
torch.utils.cpp_extension, then diffs them head-to-head against this
repo's independently written models:

  1. Deterministic cast modes: BITWISE diff of fpemu_cpp.forward vs
     numerics/golden.py::cast_mode_string over the full mode-string ABI
     (fpemu_impl.cpp:1866-2009) x a format-boundary vector x millions of
     log-uniform randoms x several scales.  Expected mismatches: 0.
  2. block_norm casts: same, per-block scaling, block sizes {64, 768,
     4096}.  All-zero blocks are excluded from the bitwise count and
     checked separately: the reference dequantizes an all-zero block
     with inf scale (NaN out, fpemu_impl.cpp:794-799); we deliberately
     emit 0 — a documented deviation, not a bug.
  3. Stochastic modes: PRNG streams differ by construction (reference:
     xoroshiro128++ with 16 static seeds, fpemu_impl.cpp:41-88; ours:
     counter-based), so instead of bitwise equality we check a grid
     contract on the REFERENCE outputs using OUR golden grid: every SR
     output must equal one of the two golden grid neighbors of the
     input (RTZ neighbor / next grid value away from zero), on-grid
     inputs must pass through unchanged, and the mean must be unbiased.
  4. GEMM / conv engines: the two C-models are *different machines by
     design* (reference: 16x16x64 fp32 AVX2 tile; ours: 128x128
     bf16-operand MXU-style tile), so the diff is each engine's relative
     L2 error vs float64 ground truth plus their mutual distance.

Writes DIFFREF.json.  Run on CPU: JAX not required; torch 2.13+cpu and
g++ must be present (both are in this image).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "DIFFREF.json")
BUILD_DIR = "/tmp/refbuild"

DET_MODES = [
    # modes whose AVX512 body honors the documented rounding (E5M2_DAZ_*
    # have no intrinsic at all — always scalar)
    "E5M2_RNE", "E5M2_DAZ_RNE", "E5M2_DAZ_RNAZ", "E5M2_DAZ_RNTZ",
    "E4M3_RNE", "E4M3_IEEE_RNE", "E3M4_RNE", "FP4_NEAREST",
    "FLOAT16_RNE", "FLOAT16_DAZ_RNE", "BFLOAT16_RNE",
]
# E5M2 non-nearest modes: the reference's AVX512 dispatcher routes ALL
# non-stochastic modes through the RNE intrinsic (fpemu_impl.cpp:817-841)
# — RTZ/RNAZ/RNTZ/RPINF/RNINF silently compute RNE on any size%32==0
# tensor; only the scalar tail honors the documented rounding.  Diffed in
# section_nonnearest against BOTH of the reference binary's behaviors.
NONNEAREST_MODES = ["E5M2_RTZ", "E5M2_RNAZ", "E5M2_RNTZ", "E5M2_RPINF",
                    "E5M2_RNINF"]
BLOCK_MODES = ["E5M2_RNE", "E4M3_RNE", "E4M3_IEEE_RNE",
               "E3M4_RNE", "FP4_NEAREST"]
SR_MODES = ["E5M2_STOCHASTIC", "E5M2_DAZ_STOCHASTIC", "E4M3_STOCHASTIC",
            "E4M3_IEEE_STOCHASTIC", "E3M4_STOCHASTIC",
            "FLOAT16_STOCHASTIC", "BFLOAT16_STOCHASTIC"]
# scale is plumbed through for the scaled kernels only; FLOAT16/BFLOAT16
# dispatch ignores it (fpemu_impl.cpp:1935-1963)
SCALED = lambda m: not m.startswith(("FLOAT16", "BFLOAT16"))


def build_reference():
    import torch  # noqa: F401  (cpp_extension needs torch first)
    from torch.utils.cpp_extension import load
    os.makedirs(BUILD_DIR, exist_ok=True)
    ref = "/root/reference/mpemu"
    t0 = time.time()
    fpemu = load(
        name="fpemu_cpp",
        sources=[f"{ref}/pytquant/cpp/fpemu_impl.cpp"],
        extra_cflags=["-mf16c", "-march=native", "-mlzcnt", "-fopenmp"],
        extra_ldflags=["-fopenmp"], build_directory=BUILD_DIR)
    gemm = load(
        name="simple_gemm_dev",
        sources=[f"{ref}/cmodel/simple/simple_gemm.cpp",
                 f"{ref}/cmodel/simple/simple_gemm_impl.cpp",
                 f"{ref}/cmodel/simple/simple_mm_engine.cpp"],
        extra_cflags=["-march=native", "-fopenmp"],
        extra_ldflags=["-fopenmp"],
        extra_include_paths=[f"{ref}/cmodel/simple"],
        build_directory=BUILD_DIR)
    conv = load(
        name="simple_conv2d_dev",
        sources=[f"{ref}/cmodel/simple/simple_conv2d.cpp",
                 f"{ref}/cmodel/simple/simple_conv2d_impl.cpp",
                 f"{ref}/cmodel/simple/simple_mm_engine.cpp"],
        extra_cflags=["-march=native", "-fopenmp"],
        extra_ldflags=["-fopenmp"],
        extra_include_paths=[f"{ref}/cmodel/simple"],
        build_directory=BUILD_DIR)
    print(f"[build] reference extensions built in {time.time()-t0:.0f}s")
    return fpemu, gemm, conv


def boundary_vector() -> np.ndarray:
    """Format-boundary probe superset (reference test.py:120-135 spirit):
    per-format max/min-normal/min-subnormal and their neighbors, halfway
    ties, saturation overshoots, and tiny flush-zone values."""
    vals = [0.0, -0.0, 1.0, -1.0, 0.3, -0.3, 2.0/3.0]
    # E5M2: max 57344, min-normal 2^-14, min-sub 2^-16
    vals += [57344.0, -57344.0, 61439.9, 61440.0, 61441.0, 65504.0,
             2.0**-14, 2.0**-15, 2.0**-16, 2.0**-17, 1.5e-5, 6e-8]
    # E4M3: max 448 (flush < 2^-9, denorm < 2^-6); E4M3-IEEE max 240
    vals += [448.0, -448.0, 464.0, 465.0, 479.9, 480.0, 240.0, 248.0,
             249.0, 255.9, 2.0**-6, 2.0**-7, 2.0**-9, 2.0**-10]
    # E3M4: max 30 (flush < 2^-6, denorm < 2^-2)
    vals += [30.0, -30.0, 30.9, 31.0, 31.1, 2.0**-2, 2.0**-3, 2.0**-6,
             0.015, -0.015]
    # FP4 (power-of-two grid, max 1.0)
    vals += [1.5, 0.75, 0.06, 0.03]
    # halfway ties at several binades (exercise RNE/RNAZ/RNTZ splits)
    for e in (-8, -2, 0, 3, 10):
        for frac in (1.125, 1.375, 1.625, 1.875, 1.0625, 1.03125):
            vals += [frac * 2.0**e, -frac * 2.0**e]
    v = np.asarray(vals, np.float32)
    return np.concatenate([v, np.nextafter(v, np.float32(np.inf)),
                           np.nextafter(v, np.float32(-np.inf))])


def specials_vector() -> np.ndarray:
    return np.asarray([np.inf, -np.inf, np.nan, -np.nan, 3.4e38, -3.4e38,
                       1e-38, -1e-38, 1e-45, -1e-45], np.float32)


def random_vector(n: int, seed: int) -> np.ndarray:
    """Log-uniform magnitudes 2^-30..2^20 with random signs plus a
    uniform band — covers every binade all formats care about."""
    rng = np.random.default_rng(seed)
    mag = np.exp2(rng.uniform(-30, 20, n // 2)).astype(np.float32)
    sgn = rng.choice([-1.0, 1.0], n // 2).astype(np.float32)
    uni = rng.uniform(-70000, 70000, n - n // 2).astype(np.float32)
    return np.concatenate([mag * sgn, uni])


def pad32(v: np.ndarray) -> np.ndarray:
    """Pad to a multiple of 32 so the reference runs its AVX512 body for
    every element (the E5M2 dispatcher gates on size%32,
    fpemu_impl.cpp:817; 16-wide kernels gate on %16) — the scalar tail
    has its own divergent semantics, probed in section_tail_quirks."""
    r = (-v.size) % 32
    return np.concatenate([v, np.ones(r, np.float32)]) if r else v


def ref_cast(fpemu, x: np.ndarray, mode: str, scale: float = 1.0,
             block_norm: bool = False, block_size: int = 1) -> np.ndarray:
    import torch
    t = torch.from_numpy(np.ascontiguousarray(x)).clone()
    out = fpemu.forward(t, mode, t.numel(), False, float(scale),
                        block_norm, int(block_size))[0]
    return out.numpy().reshape(x.shape)


def bit_diff(a: np.ndarray, b: np.ndarray):
    """Bitwise mismatch count treating all NaNs as equal."""
    ab = a.view(np.uint32)
    bb = b.view(np.uint32)
    same = ab == bb
    both_nan = np.isnan(a) & np.isnan(b)
    bad = ~(same | both_nan)
    return int(bad.sum()), np.nonzero(bad)[0][:5]


def section_deterministic(fpemu, results):
    from fp8tpu.numerics.golden import cast_mode_string
    sec = {}
    total_bad = 0
    for mode in DET_MODES:
        scales = (1.0, 0.0625, 1.7, 128.0) if SCALED(mode) else (1.0,)
        rec = {"n": 0, "mismatches": 0, "examples": []}
        for tag, vec in (("boundary", pad32(boundary_vector())),
                         ("specials", pad32(specials_vector())),
                         ("random", random_vector(1_000_000, 7))):
            for s in scales if tag != "specials" else (1.0,):
                ref = ref_cast(fpemu, vec, mode, scale=s)
                gold = cast_mode_string(vec, mode, scale=s).astype(
                    np.float32)
                bad, idx = bit_diff(ref, gold)
                rec["n"] += vec.size
                rec["mismatches"] += bad
                for i in idx:
                    if len(rec["examples"]) < 5:
                        rec["examples"].append({
                            "set": tag, "scale": s,
                            "x": float(vec[i]),
                            "x_bits": hex(int(vec[i:i+1].view(np.uint32)[0])),
                            "ref": float(ref[i]),
                            "golden": float(gold[i])})
        total_bad += rec["mismatches"]
        sec[mode] = rec
        print(f"[det] {mode:22s} n={rec['n']:>8d} "
              f"mismatches={rec['mismatches']}", flush=True)
    results["cast_deterministic"] = sec
    results["cast_deterministic_total_mismatches"] = total_bad


def section_nonnearest(fpemu, results):
    """E5M2 RTZ/RNAZ/RNTZ/RPINF/RNINF: (a) the reference SCALAR path
    (exercised via 31-element calls, below the %32 vector gate) must
    match our golden bitwise — proving we implement the documented
    semantics; (b) the reference VECTOR body must match our golden RNE
    bitwise — proving the reference silently computes RNE for these
    modes in production (the defect we do not port)."""
    from fp8tpu.numerics.golden import cast_mode_string
    sec = {}
    total_bad = 0
    vec_all = np.concatenate([boundary_vector(),
                              random_vector(99_976, 13)])
    for mode in NONNEAREST_MODES:
        # (a) scalar path, 31 elements per call
        ref_sc = np.empty_like(vec_all)
        for i in range(0, vec_all.size, 31):
            chunk = vec_all[i:i + 31]
            ref_sc[i:i + chunk.size] = ref_cast(fpemu, chunk, mode)
        gold = cast_mode_string(vec_all, mode).astype(np.float32)
        bad_sc, idx = bit_diff(ref_sc, gold)
        # (b) vector body computes RNE
        v32 = pad32(vec_all)
        ref_vec = ref_cast(fpemu, v32, mode)
        gold_rne = cast_mode_string(v32, "E5M2_RNE").astype(np.float32)
        bad_vec, _ = bit_diff(ref_vec, gold_rne)
        rec = {"n": int(vec_all.size),
               "scalar_vs_golden_mismatches": bad_sc,
               "ref_vector_vs_golden_rne_mismatches": bad_vec,
               "examples": []}
        for i in idx:
            rec["examples"].append({"x": float(vec_all[i]),
                                    "ref_scalar": float(ref_sc[i]),
                                    "golden": float(gold[i])})
        total_bad += bad_sc + bad_vec
        sec[mode] = rec
        print(f"[nn ] {mode:12s} scalar-vs-golden={bad_sc} "
              f"vector-vs-goldenRNE={bad_vec}", flush=True)
    results["cast_nonnearest"] = sec
    results["cast_nonnearest_total_mismatches"] = total_bad


def section_blocknorm(fpemu, results):
    from fp8tpu.numerics.golden import cast_mode_string
    sec = {}
    total_bad = 0
    for mode in BLOCK_MODES:
        rec = {"n": 0, "mismatches": 0, "zero_block_deviation": 0,
               "examples": []}
        for bs in (64, 768, 4096):
            # must divide by every block size: the reference SILENTLY
            # disables block_norm when size % block_size != 0
            # (fpemu_forward, fpemu_impl.cpp:2013-2028)
            n = 768 * 1024
            vec = random_vector(n, seed=11 + bs)
            # plant all-zero blocks to measure the documented deviation
            vec[:bs] = 0.0
            vec[5 * bs:6 * bs] = 0.0
            ref = ref_cast(fpemu, vec, mode, block_norm=True,
                           block_size=bs)
            gold = cast_mode_string(vec, mode, block_norm=True,
                                    block_size=bs).astype(np.float32)
            # zero blocks: reference yields NaN/0*inf, ours yields 0
            zero_mask = np.zeros(n, bool)
            zero_mask[:bs] = True
            zero_mask[5 * bs:6 * bs] = True
            dev = int((~(np.isnan(ref[zero_mask]) |
                         (ref[zero_mask] == 0))).sum())
            live = ~zero_mask
            bad, idx = bit_diff(ref[live], gold[live])
            rec["n"] += int(live.sum())
            rec["mismatches"] += bad
            rec["zero_block_deviation"] += dev
            lividx = np.nonzero(live)[0]
            for i in idx:
                if len(rec["examples"]) < 5:
                    j = int(lividx[i])
                    rec["examples"].append({
                        "block_size": bs, "x": float(vec[j]),
                        "ref": float(ref[j]), "golden": float(gold[j])})
        total_bad += rec["mismatches"]
        sec[mode] = rec
        print(f"[blk] {mode:22s} n={rec['n']:>8d} "
              f"mismatches={rec['mismatches']}", flush=True)
    results["cast_blocknorm"] = sec
    results["cast_blocknorm_total_mismatches"] = total_bad


def _grid_neighbors(mode: str, x: np.ndarray):
    """(down, up) golden grid neighbors of x: the toward-zero grid value
    and the next grid value away from zero.  8-bit formats use a dense
    sorted grid of golden outputs; fp16/bf16 use direct bit stepping."""
    from fp8tpu.numerics.golden import cast_mode_string
    if mode.startswith("BFLOAT16"):
        u = x.view(np.uint32)
        down_b = u & np.uint32(0xFFFF0000)
        up_b = down_b + np.uint32(0x10000)  # next magnitude step
        return down_b.view(np.float32), up_b.view(np.float32)
    if mode.startswith("FLOAT16"):
        h = x.astype(np.float16)
        over = np.abs(h.astype(np.float32)) > np.abs(x)
        down16 = np.where(over, np.nextafter(h, np.float16(0)), h)
        toward = np.where(x >= 0, np.float16(np.inf), np.float16(-np.inf))
        up16 = np.nextafter(down16, toward)
        return down16.astype(np.float32), up16.astype(np.float32)
    det = mode.replace("_STOCHASTIC", "_RTZ")
    try:
        down = cast_mode_string(x, det).astype(np.float32)
    except (KeyError, ValueError):
        # formats without an RTZ ABI string still support RTZ in golden
        from fp8tpu.numerics.formats import RoundMode, parse_mode_string
        from fp8tpu.numerics.golden import cast
        fmt, _, daz = parse_mode_string(mode)
        down = cast(x, fmt, RoundMode.RTZ, daz=daz).astype(np.float32)
    # dense grid from golden RNE outputs over a log sweep (covers every
    # representable value for 8-bit formats at 4M probes)
    probe = random_vector(4_000_000, seed=23)
    rne = mode.replace("_STOCHASTIC", "_RNE")
    grid = np.unique(cast_mode_string(probe, rne).astype(np.float32))
    grid = grid[np.isfinite(grid)]
    idx = np.searchsorted(grid, down)
    up_pos = grid[np.minimum(idx + 1, grid.size - 1)]
    dn_neg = grid[np.maximum(idx - 1, 0)]
    up = np.where(x >= 0, up_pos, dn_neg)
    return down, up.astype(np.float32)


def _sr_contract(out, x, down, up):
    """Ideal-SR contract: outputs are grid neighbors of the input,
    on-grid inputs pass through, and the rounding is unbiased."""
    member = (out == down) | (out == up)
    ongrid = x == down
    resid = out.astype(np.float64) - x
    width = np.maximum(np.abs(up.astype(np.float64) - down), 1e-38)
    return {
        "non_neighbor_outputs": int((~member).sum()),
        "ongrid_passthrough_violations": int(
            (out[ongrid] != x[ongrid]).sum()),
        # mean signed residual in ulp units (ideal SR: 0 within noise)
        "mean_bias_ulp": float((resid / width).mean()),
    }


def section_stochastic(fpemu, results):
    """Reference SR vs our golden SR, judged by the SAME ideal-SR
    contract (PRNG streams differ by construction so bitwise equality is
    impossible).  Known reference vector-path defects this exposes:
    E3M4 SR adds 7 random bits into a 6-bit window (fpemu_impl.cpp:
    1606-1608: cvtepu8>>1 vs grs 0x3F) and BFLOAT16 SR adds the RNE bias
    on top of the random bits (268-279) — both up-biased, both unlike
    the reference's own scalar paths."""
    from fp8tpu.numerics.formats import parse_mode_string
    from fp8tpu.numerics.golden import cast_mode_string
    sec = {}
    ref_bad = ours_bad = 0
    rng = np.random.default_rng(99)
    for mode in SR_MODES:
        n = 200_000
        vec = random_vector(n, seed=31)
        # keep SR inputs in-range: saturation is the deterministic
        # path already covered by section 1
        lim = {"E5M2": 57344.0, "E4M3": 448.0, "E4M3_IEEE": 240.0,
               "E3M4": 30.0, "FLOAT16": 65504.0, "BFLOAT16": 3e38}
        key = next(k for k in sorted(lim, key=len, reverse=True)
                   if mode.startswith(k))
        vec = np.clip(vec, -lim[key] * 0.9, lim[key] * 0.9).astype(
            np.float32)
        down, up = _grid_neighbors(mode, vec)
        ref = ref_cast(fpemu, vec, mode)
        fmt, _, _ = parse_mode_string(mode)
        nbits = 16 if fmt.name in ("bfloat16", "float16") else 8
        rbits = rng.integers(0, 1 << nbits, n).astype(np.uint32)
        ours = cast_mode_string(vec, mode, random_bits=rbits).astype(
            np.float32)
        rrec = _sr_contract(ref, vec, down, up)
        orec = _sr_contract(ours, vec, down, up)
        ref_bad += (rrec["non_neighbor_outputs"] +
                    rrec["ongrid_passthrough_violations"])
        ours_bad += (orec["non_neighbor_outputs"] +
                     orec["ongrid_passthrough_violations"])
        sec[mode] = {"n": n, "reference": rrec, "ours": orec}
        print(f"[sr ] {mode:22s} ref: nn={rrec['non_neighbor_outputs']} "
              f"og={rrec['ongrid_passthrough_violations']} "
              f"bias={rrec['mean_bias_ulp']:+.4f}ulp | ours: "
              f"nn={orec['non_neighbor_outputs']} "
              f"og={orec['ongrid_passthrough_violations']} "
              f"bias={orec['mean_bias_ulp']:+.4f}ulp", flush=True)
    results["cast_stochastic"] = sec
    results["cast_stochastic_ref_violations"] = ref_bad
    results["cast_stochastic_ours_violations"] = ours_bad


def section_tail_quirks(fpemu, results):
    """Demonstrate the reference binary disagreeing with ITSELF between
    its AVX512 body (elements 0..16k-1) and its scalar tail (the size%16
    remainder) — the quirks our implementation does not model."""
    sec = {}
    probes = {
        # sticky bits 0-12 set, guard set, round bits clear: vector's
        # full-sticky RNE rounds up, scalar's 4-bit GRS window truncates
        "BFLOAT16_RNE": np.float32(
            np.asarray([0x3C288446], np.uint32).view(np.float32)[0]),
        # in (15, 240): vector rounds normally, scalar tail saturates
        # to 240 (its can_round constant is 0x4B80 = fp16(15))
        "E4M3_IEEE_RNE": np.float32(24.278477),
    }
    for mode, val in probes.items():
        body = np.full(32, val, np.float32)
        tail = np.full(17, val, np.float32)
        out_body = ref_cast(fpemu, body, mode)
        out_tail = ref_cast(fpemu, tail, mode)
        sec[mode] = {
            "x": float(val),
            "ref_vector_body": float(out_body[0]),
            "ref_scalar_tail": float(out_tail[16]),
            "self_consistent": bool(out_body[0] == out_tail[16]),
        }
        print(f"[tail] {mode:16s} x={val!r}: vector={out_body[0]!r} "
              f"scalar-tail={out_tail[16]!r}", flush=True)
    results["reference_tail_quirks"] = sec


def section_gemm(gemm_dev, results):
    import torch

    from fp8tpu import cmodel
    sec = []
    for (m, n, k, at, bt) in ((64, 64, 64, False, False),
                              (128, 256, 512, False, False),
                              (256, 128, 512, True, False),
                              (128, 512, 256, False, True),
                              (100, 177, 333, False, False)):
        rng = np.random.default_rng(m + n + k)
        a = rng.standard_normal((k, m) if at else (m, k)).astype(np.float32)
        b = rng.standard_normal((n, k) if bt else (k, n)).astype(np.float32)
        c = np.zeros((m, n), np.float32)
        ref = gemm_dev.gemm(torch.from_numpy(c.copy()),
                            torch.from_numpy(a), torch.from_numpy(b),
                            1.0, at, bt).numpy()
        ours = cmodel.gemm(a, b, a_trans=at, b_trans=bt)
        ours32 = cmodel.gemm(a, b, a_trans=at, b_trans=bt,
                             round_bf16=False)
        af = (a.T if at else a).astype(np.float64)
        bf = (b.T if bt else b).astype(np.float64)
        truth = af @ bf

        def rel(x):
            return float(np.linalg.norm(x - truth) /
                         np.linalg.norm(truth))
        sec.append({
            "shape": [m, n, k], "a_trans": at, "b_trans": bt,
            "ref_engine_rel_l2_vs_f64": rel(ref.astype(np.float64)),
            "cmodel_bf16_rel_l2_vs_f64": rel(ours.astype(np.float64)),
            "cmodel_fp32_rel_l2_vs_f64": rel(ours32.astype(np.float64)),
            "mutual_rel_l2_fp32_vs_ref": float(
                np.linalg.norm(ours32.astype(np.float64) -
                               ref.astype(np.float64)) /
                np.linalg.norm(ref.astype(np.float64))),
        })
        r = sec[-1]
        print(f"[gemm] {m}x{n}x{k} aT={int(at)} bT={int(bt)} "
              f"ref={r['ref_engine_rel_l2_vs_f64']:.2e} "
              f"cm_bf16={r['cmodel_bf16_rel_l2_vs_f64']:.2e} "
              f"cm_fp32={r['cmodel_fp32_rel_l2_vs_f64']:.2e}", flush=True)
    results["gemm"] = sec


def section_conv(conv_dev, results):
    import torch
    import torch.nn.functional as F

    from fp8tpu import cmodel
    # The reference engine needs channel counts that fit its blocked
    # layout: at C<16 it silently returns garbage (rel err ~1.0 vs
    # torch at C=8 — measured below).  Its own examples never hit this:
    # the emulator policy unpatches <64-channel convs
    # (e4m3_emu.py:82-128), but the Python wrapper (cmodel/simple.py:
    # 88-109) does NOT guard it — silent-wrong-results defect.
    x8 = torch.randn(2, 8, 14, 14)
    w8 = torch.randn(16, 8, 3, 3)
    t8 = F.conv2d(x8.double(), w8.double(), padding=1)
    o8 = conv_dev.conv2d_fp(torch.zeros(2, 16, 14, 14), x8, w8,
                            torch.zeros(16), 1, 1, 1, 1)
    results["reference_conv_smallchannel_defect"] = {
        "config": [2, 8, 14, 16, 3, 1, 1],
        "ref_rel_l2_vs_f64": float((o8.double() - t8).norm() /
                                   t8.norm()),
        "note": "reference engine silently corrupts C<16 convs; "
                "our cmodel handles any C (tests/test_cmodel.py)",
    }
    sec = []
    for (nb, cin, hw, cout, ks, stride, pad) in (
            (2, 64, 14, 64, 3, 1, 1), (2, 64, 16, 64, 3, 2, 1),
            (1, 16, 8, 16, 1, 1, 0)):
        rng = np.random.default_rng(cin * hw)
        x = rng.standard_normal((nb, cin, hw, hw)).astype(np.float32)
        w = rng.standard_normal((cout, cin, ks, ks)).astype(np.float32)
        xt, wt = torch.from_numpy(x), torch.from_numpy(w)
        truth = F.conv2d(xt.double(), wt.double(), stride=stride,
                         padding=pad).numpy()
        # binding: conv2d_fp(output, input, weight, bias, stride,
        # padding, dilation, groups) — simple_conv2d.cpp:44-45
        oh = (hw + 2 * pad - ks) // stride + 1
        out_t = torch.zeros((nb, cout, oh, oh), dtype=torch.float32)
        bias_t = torch.zeros((cout,), dtype=torch.float32)
        ref = conv_dev.conv2d_fp(out_t, xt, wt, bias_t, stride, pad,
                                 1, 1).numpy()
        # ours is NHWC / KHWC-in-Cout-out
        xn = np.transpose(x, (0, 2, 3, 1))
        wn = np.transpose(w, (2, 3, 1, 0))
        ours = cmodel.conv2d_fp(xn, wn, stride=stride, pad=pad)
        ours_nchw = np.transpose(ours, (0, 3, 1, 2))
        ours32 = np.transpose(
            cmodel.conv2d_fp(xn, wn, stride=stride, pad=pad,
                             round_bf16=False), (0, 3, 1, 2))

        def rel(v):
            return float(np.linalg.norm(v - truth) /
                         np.linalg.norm(truth))
        sec.append({
            "config": [nb, cin, hw, cout, ks, stride, pad],
            "ref_engine_rel_l2_vs_f64": rel(ref.astype(np.float64)),
            "cmodel_bf16_rel_l2_vs_f64": rel(ours_nchw.astype(np.float64)),
            "cmodel_fp32_rel_l2_vs_f64": rel(ours32.astype(np.float64)),
        })
        r = sec[-1]
        print(f"[conv] N{nb} C{cin} H{hw} K{cout} k{ks} s{stride} p{pad} "
              f"ref={r['ref_engine_rel_l2_vs_f64']:.2e} "
              f"cm_bf16={r['cmodel_bf16_rel_l2_vs_f64']:.2e} "
              f"cm_fp32={r['cmodel_fp32_rel_l2_vs_f64']:.2e}", flush=True)
    results["conv2d"] = sec


def main():
    results = {"build_dir": BUILD_DIR,
               "reference": "/root/reference @ fpemu_impl.cpp:1866-2050"}
    fpemu, gemm_dev, conv_dev = build_reference()
    section_deterministic(fpemu, results)
    section_nonnearest(fpemu, results)
    section_blocknorm(fpemu, results)
    section_stochastic(fpemu, results)
    section_tail_quirks(fpemu, results)
    section_gemm(gemm_dev, results)
    section_conv(conv_dev, results)
    tot = (results["cast_deterministic_total_mismatches"] +
           results["cast_nonnearest_total_mismatches"] +
           results["cast_blocknorm_total_mismatches"])
    results["bitwise_total_mismatches"] = tot
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.abspath(OUT)}; bitwise mismatches {tot}, "
          f"SR contract violations ref="
          f"{results['cast_stochastic_ref_violations']} "
          f"ours={results['cast_stochastic_ours_violations']}")


if __name__ == "__main__":
    main()
