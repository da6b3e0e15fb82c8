"""Rematerialization (jax.checkpoint): DecoderConfig.remat wraps each
decoder layer in nn.remat — the standard HBM lever for long-sequence
training (activations recomputed in the backward pass).  Must be a pure
memory/FLOPs trade: bit-identical losses and updates through the FULL
MPT pipeline (trace-time interception included)."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.training import init_train_state, initialize, make_train_step


def _loss_fn(apply_fn, params, batch):
    lg = apply_fn(params, batch[:, :-1])
    return optax.softmax_cross_entropy_with_integer_labels(
        lg, batch[:, 1:]).mean()


def test_remat_decoder_equivalent_train_step():
    """Remat vs plain train step: same loss, near-identical params.

    Bit-identity held while fake_quant upcast every quantized stream to
    f32; with dtype-preserving casts (the reference's in-place-op
    contract) the streams stay bf16, and XLA fuses the rematerialized
    segment differently than the saved one — recomputed bf16 values can
    differ by 1 ulp at fusion boundaries.  The loss (f32 reduction)
    still matches exactly; params agree to bf16 precision."""
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (2, 17)), jnp.int32)
    results = {}
    for remat in (False, True):
        cfg = tiny_config(n_layers=1, d_model=64, n_heads=2, n_kv_heads=1,
                          d_ff=128, vocab_size=64, max_seq_len=32,
                          remat=remat)
        model = Decoder(cfg)
        variables = model.init(jax.random.key(0), toks[:, :-1])
        emu = initialize(model, variables, (toks[:, :-1],),
                         training_algo="hybrid")
        opt = optax.adamw(1e-3)
        step = jax.jit(make_train_step(emu, opt, _loss_fn))
        opt_state = init_train_state(opt, variables)
        params, opt_state, loss = step(variables, opt_state, toks,
                                       jax.random.key(1))
        results[remat] = (float(loss), params)

    assert results[False][0] == results[True][0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=4e-3),
        results[False][1], results[True][1])
