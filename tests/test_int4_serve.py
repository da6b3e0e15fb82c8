"""W4A16 serving path: nibble-packed int4 weights with per-channel
scales (INT4 is part of the reference's format surface,
qutils.py:216-247; the packing/split-K decode keeps HBM traffic at
0.5 byte/weight — NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.serve import RingKVCache, ServeConfig
from fp8tpu.serve.model import (
    convert_decoder_params,
    decode_steps,
    int4_linear,
    prefill,
    quantize_weights_int4,
    random_serve_params,
)


def test_int4_pack_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    wp, s = quantize_weights_int4(w)
    assert wp.shape == (32, 32) and wp.dtype == jnp.uint8
    lo = np.asarray(((wp & 0xF).astype(jnp.int8) << 4 >> 4), np.int32)
    hi = np.asarray((wp.astype(jnp.int8) >> 4), np.int32)
    deq = np.zeros((64, 32), np.float32)
    deq[0::2] = lo * np.asarray(s)
    deq[1::2] = hi * np.asarray(s)
    err = np.abs(deq - np.asarray(w))
    # max quantization error is half a step = s/2 per channel
    assert (err <= np.asarray(s) / 2 + 1e-6).all()


def test_int4_linear_matches_dequant_matmul(rng):
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    wp, s = quantize_weights_int4(w)
    got = np.asarray(int4_linear(x, wp, s), np.float32)
    lo = np.asarray(((wp & 0xF).astype(jnp.int8) << 4 >> 4), np.float32)
    hi = np.asarray((wp.astype(jnp.int8) >> 4), np.float32)
    deq = np.zeros((64, 48), np.float32)
    deq[0::2], deq[1::2] = lo, hi
    deq = deq * np.asarray(s)
    want = np.asarray(x, np.float32) @ deq
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int4_decode_end_to_end():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=64)
    m = Decoder(cfg)
    variables = m.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))
    scfg = ServeConfig(model=cfg, weight_fmt="int4")
    sparams = convert_decoder_params(variables, cfg, fmt="int4")
    assert sparams["q8"].dtype == jnp.uint8
    assert sparams["q8"].shape[1] == cfg.d_model // 2

    ring = RingKVCache.create(cfg.n_layers, 2, 32, cfg.n_kv_heads,
                              cfg.head_dim, "e4m3")
    _, ring = prefill(sparams, ring, jnp.pad(
        jnp.asarray([5, 6, 7], jnp.int32), (0, 29)), jnp.int32(0),
        jnp.int32(3), scfg)
    toks, ring = decode_steps(
        sparams, ring, jnp.asarray([1, 2], jnp.int32),
        jnp.asarray([3, 0], jnp.int32), jax.random.key(0),
        jnp.zeros((2,), jnp.float32), 4, scfg)
    t = np.asarray(toks)
    assert t.shape == (2, 4) and (t >= 0).all() and (t < 128).all()


def test_int4_random_params_shapes():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=64)
    p = random_serve_params(cfg, "int4")
    assert p["gate8"].dtype == jnp.uint8
    assert p["gate8"].shape == (2, 32, 128)


def test_int4_grouped_scales_roundtrip(rng):
    """AWQ-class grouped scales (VERDICT r2 next #8): per-(K-group, N)
    scales bound the error per group, strictly refining per-channel."""
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    wp, s = quantize_weights_int4(w, group_size=16)
    assert wp.shape == (32, 32) and s.shape == (4, 32)
    lo = np.asarray(((wp & 0xF).astype(jnp.int8) << 4 >> 4), np.float32)
    hi = np.asarray((wp.astype(jnp.int8) >> 4), np.float32)
    deq = np.zeros((64, 32), np.float32)
    deq[0::2], deq[1::2] = lo, hi
    srow = np.repeat(np.asarray(s), 16, axis=0)
    err = np.abs(deq * srow - np.asarray(w))
    assert (err <= srow / 2 + 1e-6).all()


def test_int4_linear_grouped_matches_dequant(rng):
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    wp, s = quantize_weights_int4(w, group_size=16)
    got = np.asarray(int4_linear(x, wp, s), np.float32)
    lo = np.asarray(((wp & 0xF).astype(jnp.int8) << 4 >> 4), np.float32)
    hi = np.asarray((wp.astype(jnp.int8) >> 4), np.float32)
    deq = np.zeros((64, 48), np.float32)
    deq[0::2], deq[1::2] = lo, hi
    deq = deq * np.repeat(np.asarray(s), 16, axis=0)
    want = np.asarray(x, np.float32) @ deq
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int4_grouped_tighter_than_per_channel(rng):
    """On weights with K-varying magnitude (the outlier structure AWQ
    targets), grouped quantization must reconstruct strictly better."""
    base = rng.standard_normal((128, 32)).astype(np.float32)
    base[:16] *= 20.0                       # K-block outliers
    w = jnp.asarray(base)

    def recon(group):
        wp, s = quantize_weights_int4(w, group_size=group)
        lo = np.asarray(((wp & 0xF).astype(jnp.int8) << 4 >> 4), np.float32)
        hi = np.asarray((wp.astype(jnp.int8) >> 4), np.float32)
        deq = np.zeros((128, 32), np.float32)
        deq[0::2], deq[1::2] = lo, hi
        sr = (np.repeat(np.asarray(s), 128 // s.shape[0], axis=0)
              if np.asarray(s).ndim == 2 else np.asarray(s))
        return np.abs(deq * sr - base).mean()

    wp, s = quantize_weights_int4(w)        # per-channel
    lo = np.asarray(((wp & 0xF).astype(jnp.int8) << 4 >> 4), np.float32)
    hi = np.asarray((wp.astype(jnp.int8) >> 4), np.float32)
    deq = np.zeros((128, 32), np.float32)
    deq[0::2], deq[1::2] = lo, hi
    err_pc = np.abs(deq * np.asarray(s) - base).mean()
    err_g = recon(16)
    assert err_g < err_pc * 0.5, (err_g, err_pc)


def test_int4_grouped_decode_end_to_end():
    """Grouped scales through the full serving decode (d_model >= group
    so the grouped branch — not the G=1 fallback — is exercised)."""
    cfg = tiny_config(n_layers=2, d_model=128, n_heads=4, n_kv_heads=2,
                      d_ff=256, vocab_size=128, max_seq_len=64)
    m = Decoder(cfg)
    variables = m.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))
    scfg = ServeConfig(model=cfg, weight_fmt="int4", int4_group=32)
    sparams = convert_decoder_params(variables, cfg, fmt="int4",
                                     int4_group=32)
    assert sparams["qs"].shape == (2, 4, cfg.n_heads * cfg.head_dim)

    ring = RingKVCache.create(cfg.n_layers, 2, 32, cfg.n_kv_heads,
                              cfg.head_dim, "e4m3")
    _, ring = prefill(sparams, ring, jnp.pad(
        jnp.asarray([5, 6, 7], jnp.int32), (0, 29)), jnp.int32(0),
        jnp.int32(3), scfg)
    toks, ring = decode_steps(
        sparams, ring, jnp.asarray([1, 2], jnp.int32),
        jnp.asarray([3, 0], jnp.int32), jax.random.key(0),
        jnp.zeros((2,), jnp.float32), 4, scfg)
    t = np.asarray(toks)
    assert t.shape == (2, 4) and (t >= 0).all() and (t < 128).all()
