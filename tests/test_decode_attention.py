"""Flash-decoding cache-attention kernel vs the pure-jnp reference.

Runs the Pallas kernel in interpreter mode (CPU CI); on TPU hardware the
same kernel compiles via Mosaic.  Covers fp8 cache with per-vector
scales, bf16 cache without scales, grouped queries (G>1), ragged
positions including empty slots, and the partial-combine path used by
the serving decoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8tpu.kernels.decode_attention import (
    combine_partials,
    finalize_partials,
    flash_decode_cache,
    flash_decode_cache_reference,
)

L, B, KV, S, D = 2, 8, 2, 256, 128


def make_cache(rng, dtype, with_scales):
    k = rng.standard_normal((L, B, KV, S, D), np.float32)
    v = rng.standard_normal((L, B, KV, S, D), np.float32)
    if with_scales:
        # scale layout: (L, KV, B, S) — see decode_attention docstring
        ks = rng.uniform(0.5, 2.0, (L, KV, B, S)).astype(np.float32)
        vs = rng.uniform(0.5, 2.0, (L, KV, B, S)).astype(np.float32)
    else:
        ks = vs = None
    return (jnp.asarray(k).astype(dtype), ks if ks is None else jnp.asarray(ks),
            jnp.asarray(v).astype(dtype), vs if vs is None else jnp.asarray(vs))


@pytest.mark.parametrize("g", [1, 4])
@pytest.mark.parametrize("fmt,with_scales", [
    (jnp.float8_e4m3fn, True),
    (jnp.bfloat16, False),
])
def test_flash_decode_matches_reference(fmt, with_scales, g, rng):
    k8, ks, v8, vs = make_cache(rng, fmt, with_scales)
    q = jnp.asarray(rng.standard_normal((B, KV, g, D), np.float32),
                    jnp.bfloat16)
    positions = jnp.asarray([0, 1, 37, 128, 200, 255, 256, 64], jnp.int32)

    for layer in range(L):
        got = flash_decode_cache(q, k8, ks, v8, vs, layer, positions,
                                 block_b=4, block_s=128, interpret=True)
        want = flash_decode_cache_reference(q, k8, ks, v8, vs, layer,
                                            positions)
        got_ctx = finalize_partials(got)
        want_ctx = finalize_partials(want)
        # Slots with positions == 0 have l == 0 -> finalize gives 0/eps.
        valid = np.asarray(positions) > 0
        np.testing.assert_allclose(np.asarray(got_ctx)[valid],
                                   np.asarray(want_ctx)[valid],
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(got[2])[valid],
                                   np.asarray(want[2])[valid],
                                   rtol=1e-3, atol=1e-5)


def test_combine_matches_joint_softmax(rng):
    """Splitting keys into cache + fresh partials and combining must equal
    one softmax over the union — the serving decoder's correctness core."""
    k8, ks, v8, vs = make_cache(rng, jnp.float8_e4m3fn, True)
    q = jnp.asarray(rng.standard_normal((B, KV, 1, D), np.float32),
                    jnp.bfloat16)
    positions = jnp.full((B,), S, jnp.int32)

    # Joint: everything through the reference at full positions.
    want = finalize_partials(
        flash_decode_cache_reference(q, k8, ks, v8, vs, 0, positions))

    # Split: first 128 positions via the kernel, rest via the reference
    # (as if they were the "staged chunk"), combined.
    p1 = flash_decode_cache(q, k8[:, :, :, :128], ks[..., :128],
                            v8[:, :, :, :128], vs[..., :128], 0,
                            jnp.full((B,), 128, jnp.int32),
                            block_b=4, block_s=128, interpret=True)
    p2 = flash_decode_cache_reference(
        q, k8[:, :, :, 128:], ks[..., 128:], v8[:, :, :, 128:],
        vs[..., 128:], 0, jnp.full((B,), S - 128, jnp.int32))
    got = finalize_partials(combine_partials(p1, p2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_block_skip_limits_do_not_change_results(rng):
    """Tiny positions leave most s-blocks DMA-skipped; results must be
    identical to reading everything."""
    k8, ks, v8, vs = make_cache(rng, jnp.float8_e4m3fn, True)
    q = jnp.asarray(rng.standard_normal((B, KV, 1, D), np.float32),
                    jnp.bfloat16)
    positions = jnp.asarray([3, 5, 2, 7, 1, 4, 6, 8], jnp.int32)
    got = finalize_partials(
        flash_decode_cache(q, k8, ks, v8, vs, 1, positions,
                           block_b=4, block_s=64, interpret=True))
    want = finalize_partials(
        flash_decode_cache_reference(q, k8, ks, v8, vs, 1, positions))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
