"""Activation-aware weight equalization (AWQ) for serving artifacts.

The reference toolkit's PTQ calibration is observer min-max
(/root/reference/mpemu/stats_collector.py:165-341 feeding
qutils.py:429-445,662-683); it carries no activation-aware weight
scaling.  This module adds the production step beyond it, following the
AWQ pattern (Lin et al. 2023, arXiv:2306.00978): per-input-channel
scales ``s`` derived from calibration activations, grid-searched over a
small exponent set to minimize the *quantized layer's output error* on
real activations, then folded into the preceding op so the runtime pays
nothing:

=============  ==========================  ===========================
site           input comes from            where 1/s folds
=============  ==========================  ===========================
q/k/v_proj     attn_norm output            ``attn_norm.scale /= s``
gate/up_proj   mlp_norm output             ``mlp_norm.scale  /= s``
down_proj      ``silu(gate) * up``         ``up_proj`` columns ``/= s``
=============  ==========================  ===========================

``o_proj`` is left unscaled: under GQA (n_heads != n_kv_heads) its input
channels mix v-outputs shared across head groups, so no exact
per-channel fold exists.  MoE expert stacks keep plain per-channel (or
grouped int4) scales — their inputs route per token, so a single
calibration scale is not activation-faithful; only the attention sites
of MoE layers are equalized.  The tied LM head reads the embedding
table (also the lookup table), so it cannot absorb a fold either.

Equalization is *output-invariant* in exact arithmetic: every ``s`` is
cancelled by its fold, so the un-quantized model computes the same
function (tests assert this).  Only the quantization error moves.

Usage::

    eq_vars, info = awq_calibrate_decoder(model, variables, cfg,
                                          calib_tokens, fmt="int4")
    artifact = convert_decoder_params(eq_vars, cfg, "int4")
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..numerics.formats import FORMATS

_FP8_DTYPES = {"e4m3": jnp.float8_e4m3fn, "e5m2": jnp.float8_e5m2}

_CAPTURE = ("attn_norm", "mlp_norm", "gate_proj", "up_proj")


# ---------------------------------------------------------------------------
# Quantizer simulation (must mirror the serving producers bit-for-bit in
# effect: kernels/qmatmul.py::quantize_weights and
# serve/model.py::quantize_weights_int4)
# ---------------------------------------------------------------------------

def _qdq_weights(w: jax.Array, fmt: str,
                 int4_group: Optional[int]) -> jax.Array:
    """Round-trip ``w`` (K, N) through the serving quantizer's value
    grid: per-output-channel scales for fp8/int8, per-(K-group, N) for
    int4 — the same scaling the real payload producers use."""
    wf = w.astype(jnp.float32)
    K, N = wf.shape
    if fmt == "int4":
        gs = K if (int4_group is None or K % int4_group != 0
                   or K < int4_group) else int4_group
        wg = wf.reshape(K // gs, gs, N)
        amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)
        s = jnp.where(amax > 0, amax / 7.0, 1.0)
        return (jnp.clip(jnp.round(wg / s), -8, 7) * s).reshape(K, N)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    if fmt == "int8":
        s = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.clip(jnp.round(wf / s), -127, 127) * s
    fdesc = FORMATS[fmt]
    s = jnp.where(amax > 0, amax / fdesc.max_normal, 1.0)
    q = jnp.clip(wf / s, -fdesc.max_normal, fdesc.max_normal)
    return q.astype(_FP8_DTYPES[fmt]).astype(jnp.float32) * s


# ---------------------------------------------------------------------------
# Calibration stats: per-channel absmax + a row subsample per site
# ---------------------------------------------------------------------------

def collect_awq_stats(model, variables, token_batches: Sequence,
                      n_sample: int = 512, seed: int = 0
                      ) -> Dict[int, Dict[str, Dict[str, jnp.ndarray]]]:
    """Run calibration batches through the float model, capturing the
    inputs of every foldable site.

    Returns ``{layer_idx: {site: {"amax": (K,), "x": (n, K)}}}`` with
    sites in {"qkv", "gateup", "down"}.  ``x`` is a fixed-size row
    subsample used for the output-error grid search; ``amax`` is the
    per-channel absolute maximum over ALL batches.
    """
    filt = (lambda mdl, method: getattr(mdl, "name", None) in _CAPTURE)

    # params are a RUNTIME argument: a closure would bake them into the
    # compile payload as constants, which the tunneled remote-compile
    # endpoint rejects at ~90M params (HTTP 413 — NOTES r3).
    @jax.jit
    def captured(vs, toks):
        _, state = model.apply(vs, toks,
                               capture_intermediates=filt,
                               mutable=["intermediates"])
        inter = state["intermediates"]
        per_layer = {}
        i = 0
        while f"layer_{i}" in inter:
            lp = inter[f"layer_{i}"]
            qkv = lp["attn"]["attn_norm"]["__call__"][0] \
                if "attn" in lp and "attn_norm" in lp.get("attn", {}) \
                else lp["attn_norm"]["__call__"][0]
            out = {"qkv": qkv.reshape(-1, qkv.shape[-1])}
            if "mlp" in lp:
                gu = lp["mlp_norm"]["__call__"][0]
                gate = lp["mlp"]["gate_proj"]["__call__"][0]
                up = lp["mlp"]["up_proj"]["__call__"][0]
                out["gateup"] = gu.reshape(-1, gu.shape[-1])
                down_in = jax.nn.silu(gate.astype(jnp.float32)) \
                    * up.astype(jnp.float32)
                out["down"] = down_in.reshape(-1, down_in.shape[-1])
            per_layer[i] = out
            i += 1
        return {li: {site: (jnp.max(jnp.abs(x.astype(jnp.float32)),
                                    axis=0), x)
                     for site, x in sites.items()}
                for li, sites in per_layer.items()}

    stats: Dict[int, Dict[str, Dict[str, jnp.ndarray]]] = {}
    rng = jax.random.PRNGKey(seed)
    for bi, toks in enumerate(token_batches):
        got = jax.device_get(captured(variables, jnp.asarray(toks)))
        for li, sites in got.items():
            dst = stats.setdefault(li, {})
            for site, (amax, x) in sites.items():
                rec = dst.setdefault(site, {"amax": amax, "x": None})
                rec["amax"] = jnp.maximum(rec["amax"], amax)
                if rec["x"] is None:
                    n = min(n_sample, x.shape[0])
                    rng, sub = jax.random.split(rng)
                    idx = jax.random.choice(sub, x.shape[0], (n,),
                                            replace=False)
                    rec["x"] = jnp.asarray(x)[idx].astype(jnp.float32)
    return stats


# ---------------------------------------------------------------------------
# Scale search + folding
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("fmt", "int4_group"))
def _site_errs(weights: Tuple[jax.Array, ...], a: jax.Array, x: jax.Array,
               alphas: jax.Array, fmt: str,
               int4_group: Optional[int]) -> jax.Array:
    """Summed quantized-output MSE for every candidate alpha in ONE
    dispatch (the eager per-alpha loop would pay the ~30 ms tunnel
    round-trip per op on the remote chip)."""
    ref = [x @ w.astype(jnp.float32) for w in weights]

    def err_for(alpha):
        s = jnp.clip(a ** alpha, 1e-3, 1e3)
        e = jnp.float32(0.0)
        for w, r in zip(weights, ref):
            wq = _qdq_weights(w.astype(jnp.float32) * s[:, None], fmt,
                              int4_group) / s[:, None]
            e += jnp.mean(jnp.square(x @ wq - r))
        return e

    return jnp.stack([err_for(alphas[i]) for i in range(alphas.shape[0])])


def _search_site_scale(weights: List[jax.Array], amax: jax.Array,
                       x: jax.Array, fmt: str, int4_group: Optional[int],
                       alphas: Sequence[float]) -> Tuple[jax.Array, dict]:
    """Grid-search ``s = (amax / mean(amax)) ** alpha`` minimizing the
    summed quantized-output MSE over the site's weights on the sampled
    activations.  ``alpha = 0`` (identity) is always a candidate, so the
    result is never worse than no equalization on the calibration set."""
    a = jnp.where(amax > 0, amax, jnp.mean(jnp.where(amax > 0, amax, 1.0)))
    a = (a / jnp.mean(a)).astype(jnp.float32)
    alist = [float(al) for al in alphas]
    errs_arr = jax.device_get(_site_errs(
        tuple(weights), a, x.astype(jnp.float32),
        jnp.asarray(alist, jnp.float32), fmt, int4_group))
    errs = {al: float(e) for al, e in zip(alist, errs_arr)}
    best_alpha = min(errs, key=errs.get)
    best_s = jnp.clip(a ** best_alpha, 1e-3, 1e3)
    info = {"alpha": best_alpha, "err": errs[best_alpha],
            "err_identity": errs.get(0.0), "errs": errs}
    return best_s, info


def awq_equalize(variables, cfg, stats,
                 fmt: str = "e4m3", int4_group: Optional[int] = 128,
                 alphas: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0)
                 ) -> Tuple[dict, dict]:
    """Fold grid-searched AWQ scales into a COPY of ``variables``.

    Returns ``(equalized_variables, info)`` where ``info[layer][site]``
    records the chosen alpha and the before/after quantized-output MSE.
    Feed the result to ``convert_decoder_params`` (same ``fmt`` /
    ``int4_group``!) — the artifact's min-max scales then quantize the
    equalized weights.
    """
    params = jax.tree_util.tree_map(lambda v: v, variables["params"])
    info: Dict[str, dict] = {}
    for li in sorted(stats):
        lp = params[f"layer_{li}"]
        linfo: Dict[str, dict] = {}
        st = stats[li]

        if "qkv" in st:
            names = ("q_proj", "k_proj", "v_proj")
            ws = [lp["attn"][n]["kernel"] for n in names]
            s, rec = _search_site_scale(ws, st["qkv"]["amax"],
                                        st["qkv"]["x"], fmt, int4_group,
                                        alphas)
            for n, w in zip(names, ws):
                lp["attn"][n]["kernel"] = (
                    w.astype(jnp.float32) * s[:, None]).astype(w.dtype)
            sc = lp["attn_norm"]["scale"]
            lp["attn_norm"]["scale"] = (
                sc.astype(jnp.float32) / s).astype(sc.dtype)
            linfo["qkv"] = rec

        if "gateup" in st and "mlp" in lp:
            names = ("gate_proj", "up_proj")
            ws = [lp["mlp"][n]["kernel"] for n in names]
            s, rec = _search_site_scale(ws, st["gateup"]["amax"],
                                        st["gateup"]["x"], fmt,
                                        int4_group, alphas)
            for n, w in zip(names, ws):
                lp["mlp"][n]["kernel"] = (
                    w.astype(jnp.float32) * s[:, None]).astype(w.dtype)
            sc = lp["mlp_norm"]["scale"]
            lp["mlp_norm"]["scale"] = (
                sc.astype(jnp.float32) / s).astype(sc.dtype)
            linfo["gateup"] = rec

        if "down" in st and "mlp" in lp:
            w = lp["mlp"]["down_proj"]["kernel"]
            s, rec = _search_site_scale([w], st["down"]["amax"],
                                        st["down"]["x"], fmt, int4_group,
                                        alphas)
            lp["mlp"]["down_proj"]["kernel"] = (
                w.astype(jnp.float32) * s[:, None]).astype(w.dtype)
            up = lp["mlp"]["up_proj"]["kernel"]
            lp["mlp"]["up_proj"]["kernel"] = (
                up.astype(jnp.float32) / s[None, :]).astype(up.dtype)
            linfo["down"] = rec

        info[f"layer_{li}"] = linfo
    return {**variables, "params": params}, info


def awq_calibrate_decoder(model, variables, cfg, tokens,
                          fmt: str = "e4m3",
                          int4_group: Optional[int] = 128,
                          batch: int = 8, n_batches: int = 4,
                          n_sample: int = 512,
                          alphas: Sequence[float] = (0.0, 0.25, 0.5,
                                                     0.75, 1.0),
                          seed: int = 0) -> Tuple[dict, dict]:
    """One-call AWQ: capture calibration activations from ``tokens``
    ((N, S) int array; the first ``batch * n_batches`` rows are used),
    grid-search per-site scales, and return the equalized variables plus
    the per-site search log."""
    batches = [tokens[i * batch:(i + 1) * batch]
               for i in range(n_batches)
               if tokens[i * batch:(i + 1) * batch].shape[0] > 0]
    stats = collect_awq_stats(model, variables, batches,
                              n_sample=n_sample, seed=seed)
    return awq_equalize(variables, cfg, stats, fmt=fmt,
                        int4_group=int4_group, alphas=alphas)
