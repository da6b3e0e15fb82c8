"""MoE serving-path tests: quantized expert stacks in the real decode
paths (ring, paged, prefill, full_logits, engine).

The serving form combines ALL experts with exact top-k gates
(serve/model._moe_ffn); with the training model's capacity raised high
enough that GShard routing drops nothing, the two forms compute the same
function, so the standard serve-vs-emulation parity protocol from
test_serve.py applies unchanged.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.serve import (
    PagedKVCache,
    Request,
    RingKVCache,
    ServeConfig,
    ServingEngine,
    convert_decoder_params,
    decode_step,
    prefill,
)


@pytest.fixture(scope="module")
def setup():
    # capacity_factor = n_experts → capacity >= T: the training form
    # drops no tokens, so exact-top-k serving computes the same function.
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=64,
                      n_experts=4, moe_top_k=2, moe_capacity_factor=4.0)
    m = Decoder(cfg)
    tokens = jnp.arange(16)[None] % cfg.vocab_size
    variables = m.init(jax.random.key(0), tokens)
    scfg = ServeConfig(model=cfg)
    sparams = convert_decoder_params(variables, cfg)
    return cfg, m, variables, scfg, sparams


def test_convert_moe_shapes(setup):
    cfg, _, variables, _, sparams = setup
    L, E, Dm, F = cfg.n_layers, cfg.n_experts, cfg.d_model, cfg.d_ff
    assert "gate8" not in sparams and "up8" not in sparams
    assert sparams["router"].shape == (L, Dm, E)
    assert sparams["eup8"].shape == (L, E, Dm, F)
    assert sparams["eup8"].dtype == jnp.float8_e4m3fn
    assert sparams["eups"].shape == (L, E, F)
    assert sparams["edown8"].shape == (L, E, F, Dm)
    assert sparams["edowns"].shape == (L, E, Dm)


def test_moe_serving_logits_close_to_emulation(setup):
    cfg, m, variables, scfg, sparams = setup
    prompt = jnp.asarray([3, 14, 15, 92, 65, 35], jnp.int32)
    ref_logits = m.apply(variables, prompt[None])[0]

    cache = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                               cfg.head_dim, "e4m3")
    logits, cache = prefill(sparams, cache, jnp.pad(prompt, (0, 26)),
                            jnp.int32(0), jnp.int32(len(prompt)), scfg)
    ref_last = np.asarray(ref_logits[-1])
    got = np.asarray(logits)
    assert np.argmax(got) == np.argmax(ref_last) or (
        np.argmax(ref_last) in np.argsort(got)[-3:])
    corr = np.corrcoef(got, ref_last)[0, 1]
    assert corr > 0.98, corr


def test_moe_full_logits_close_to_emulation(setup):
    cfg, m, variables, scfg, sparams = setup
    from fp8tpu.serve.model import full_logits
    toks = jnp.asarray([5, 9, 44, 101, 7, 63, 2, 90], jnp.int32)
    ref = np.asarray(m.apply(variables, toks[None])[0])       # (S, V)
    got = np.asarray(full_logits(sparams, toks, scfg))
    for t in range(len(toks)):
        corr = np.corrcoef(got[t], ref[t])[0, 1]
        assert corr > 0.98, (t, corr)


def test_moe_incremental_decode_matches_prefill(setup):
    cfg, m, variables, scfg, sparams = setup
    prompt = jnp.asarray([3, 14, 15, 92], jnp.int32)
    extra = [65, 35, 89, 79]

    cache = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                               cfg.head_dim, "e4m3")
    logits, cache = prefill(sparams, cache, jnp.pad(prompt, (0, 28)),
                            jnp.int32(0), jnp.int32(4), scfg)
    pos = 4
    for t in extra:
        logits, cache = decode_step(sparams, cache,
                                    jnp.asarray([t], jnp.int32),
                                    jnp.asarray([pos], jnp.int32), scfg)
        pos += 1
    inc = np.asarray(logits[0])

    cache2 = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                                cfg.head_dim, "e4m3")
    full = jnp.asarray(list(prompt) + extra, jnp.int32)
    logits2, _ = prefill(sparams, cache2, jnp.pad(full, (0, 24)),
                         jnp.int32(0), jnp.int32(8), scfg)
    ref = np.asarray(logits2)
    corr = np.corrcoef(inc, ref)[0, 1]
    assert corr > 0.98, corr


def test_moe_paged_decode_matches_ring(setup):
    from fp8tpu.serve.model import decode_steps, decode_steps_paged
    cfg, _, _, scfg, sparams = setup
    B = 2
    toks0 = jnp.asarray([3, 4], jnp.int32)
    pos0 = jnp.asarray([0, 0], jnp.int32)

    ring = RingKVCache.create(cfg.n_layers, B, 32, cfg.n_kv_heads,
                              cfg.head_dim, "e4m3")
    t_ring, _ = decode_steps(sparams, ring, toks0, pos0, jax.random.key(0),
                             jnp.zeros((B,), jnp.float32), 8, scfg)

    pc = PagedKVCache.create(16, 8, cfg.n_layers, B, 8, cfg.n_kv_heads,
                             cfg.head_dim, "e4m3")
    for b in range(B):
        pc = pc.assign_pages(b, jnp.arange(8), jnp.arange(8) + b * 8)
    t_paged, _ = decode_steps_paged(sparams, pc, toks0, pos0,
                                    jax.random.key(0),
                                    jnp.zeros((B,), jnp.float32), 8, scfg)
    np.testing.assert_array_equal(np.asarray(t_ring), np.asarray(t_paged))


def test_moe_engine_end_to_end(setup):
    cfg, _, _, scfg, sparams = setup
    eng = ServingEngine(sparams, scfg, n_slots=2, max_seq=64)
    reqs = [Request(uid=i, prompt=[1 + i, 2 + i, 3 + i], max_new_tokens=5)
            for i in range(3)]
    out = eng.run(reqs)
    assert set(out) == {0, 1, 2}
    assert all(len(v) == 5 for v in out.values())
    assert all(0 <= t < cfg.vocab_size for v in out.values() for t in v)


def test_moe_engine_paged_mode(setup):
    cfg, _, _, scfg, sparams = setup
    eng = ServingEngine(sparams, scfg, n_slots=2, max_seq=64,
                        use_paged=True, page_size=8)
    out = eng.run([Request(uid=0, prompt=[4, 5, 6], max_new_tokens=5),
                   Request(uid=1, prompt=[7, 8], max_new_tokens=5)])
    assert set(out) == {0, 1}
    assert all(len(v) == 5 for v in out.values())
    # paged engine must agree with the ring engine under greedy decode
    ring = ServingEngine(sparams, scfg, n_slots=2, max_seq=64).run(
        [Request(uid=0, prompt=[4, 5, 6], max_new_tokens=5),
         Request(uid=1, prompt=[7, 8], max_new_tokens=5)])
    assert out == ring


def test_moe_gates_match_training_combine():
    """Exact-top-k serving gates == capacity-routing combine summed over
    slots, when nothing overflows."""
    from fp8tpu.parallel.moe import top_k_routing
    T, E, k = 12, 4, 2
    logits = jax.random.normal(jax.random.key(3), (T, E), jnp.float32) * 2
    probs = jax.nn.softmax(logits, axis=-1)
    gv, gi = jax.lax.top_k(probs, k)
    gates = jnp.sum(jax.nn.one_hot(gi, E) * gv[..., None], axis=1)
    _, combine, _ = top_k_routing(logits, k, capacity=T)
    np.testing.assert_allclose(np.asarray(gates),
                               np.asarray(combine.sum(-1)), rtol=1e-6)


@pytest.mark.parametrize("fmt", ["bf16", "int8", "int4"])
def test_moe_formats_smoke(setup, fmt):
    cfg, m, variables, _, _ = setup
    scfg = ServeConfig(model=cfg, weight_fmt=fmt,
                       kv_fmt="e4m3" if fmt != "int8" else "int8")
    sparams = convert_decoder_params(variables, cfg, fmt=fmt)
    if fmt == "bf16":
        assert sparams["eup8"].dtype == jnp.bfloat16
    elif fmt == "int8":
        assert sparams["eup8"].dtype == jnp.int8
    else:
        assert sparams["eup8"].dtype == jnp.uint8
        assert sparams["eup8"].shape[2] == cfg.d_model // 2
    cache = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                               cfg.head_dim, scfg.kv_fmt)
    prompt = jnp.asarray([3, 14, 15, 92], jnp.int32)
    logits, _ = prefill(sparams, cache, jnp.pad(prompt, (0, 28)),
                        jnp.int32(0), jnp.int32(4), scfg)
    got = np.asarray(logits)
    assert np.isfinite(got).all()
    ref_last = np.asarray(m.apply(variables, prompt[None])[0][-1])
    corr = np.corrcoef(got, ref_last)[0, 1]
    assert corr > 0.9, corr
