"""Int8 weight-only storage for serving.

Orthogonal to Palu's KV compression (the reference compresses only the
KV cache): decode at bs=1 is a chain of memory-bound GEMVs over the model
weights, so storing the large dense projections as int8 with per-output-
channel symmetric scales halves the weight bytes streamed per token AND
halves the HBM they occupy. At the 7B/64K operating point that is the
difference between "the 32-layer model does not fit beside the latent
cache" (bf16 weights 14.3 GB + 4.5 GB 4-bit cache > 15.75 GB v5e HBM) and
"it fits with room for batch lanes" (~7.8 GB + 4.5 GB); measured numbers in
docs/BENCH.md ("true 32-layer 7B").

Only the large dense matrices are quantized (q_proj, o_proj / fused
o_proj, the MLP, lm_head). The Palu factors VT / U / b_k stay in the
engine dtype: they are the accuracy-critical low-rank path, and the fused
decode kernels consume b_k directly.

Dequant happens inside the matmul: `x @ codes.astype(bf16)` lets XLA fuse
the int8->bf16 convert into the dot's operand read (weight-only-quant
pattern), then one scale row multiplies the (.., out) result. There is no
separate dequantized copy of the weights in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_weight", "is_quantized_weight", "wdot", "quantize_params",
           "quantize_embed", "embed_rows", "embed_dim", "tied_head"]


def quantize_weight(w) -> dict:
    """(in, out) float -> {"wq8": int8 codes, "ws": (1, out) f32 scales},
    symmetric per-output-channel."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-30)
    return {"wq8": jnp.round(wf / s).astype(jnp.int8), "ws": s}


def is_quantized_weight(w) -> bool:
    return isinstance(w, dict) and "wq8" in w


def wdot(x: jax.Array, w) -> jax.Array:
    """x @ w over the last axis of x; w is either a plain array or a
    quantized {"wq8", "ws"} dict."""
    if is_quantized_weight(w):
        # codes cast to the activation dtype (int8 values are exact in
        # bf16/f32); the convert fuses into the dot's operand read on TPU
        y = jax.lax.dot_general(
            x, w["wq8"].astype(x.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y * w["ws"]).astype(x.dtype)
    return x @ w


# params keys quantized by quantize_params: the large dense projections.
_ATTN_KEYS = ("q_proj", "o_proj")
_MLP_KEYS = ("gate", "up", "down")


def quantize_params(params, vt: bool = False, embed: bool = False) -> dict:
    """Return a copy of an engine params tree with the large dense weights
    replaced by int8 codes+scales. VT/U (the low-rank factors), biases,
    norms, and the embedding table are left untouched by default; vt=True
    additionally stores the VT down-projection factors (the H x r latent
    GEMVs, ~0.5 GB bf16 at 7B/32L) as int8 -- the latents are re-quantized
    to 2-4 bits at the cache write anyway, so the extra error is far below
    the cache quantizer's (EngineConfig.vt_bits=8). U / b_k stay in the
    engine dtype (the fused kernels consume them directly). Idempotent:
    leaves that are already quantized pass through (e.g. a ServingEngine
    building its batch-1 prefill engine from the serving engine's
    params)."""

    def q(w):
        return w if is_quantized_weight(w) else quantize_weight(w)

    out = dict(params)
    layers = []
    for layer in params["layers"]:
        layer = dict(layer)
        # copy EVERY sub-dict (including the untouched k_proj/v_proj): the
        # returned tree's containers must all be fresh so the engine can
        # null entries during layer stacking without mutating caller params
        attn = {
            k: dict(v) if isinstance(v, dict) else v
            for k, v in layer["attn"].items()
        }
        for k in _ATTN_KEYS:
            proj = attn[k]
            for wk in ("w", "w_fused"):
                if proj.get(wk) is not None:
                    proj[wk] = q(proj[wk])
        if vt:
            for k in ("k_proj", "v_proj"):
                proj = attn.get(k)
                if proj is not None and proj.get("VT") is not None:
                    proj["VT"] = q(proj["VT"])
        layer["attn"] = attn
        mlp = dict(layer["mlp"])
        for k in _MLP_KEYS:
            mlp[k] = q(mlp[k])
        layer["mlp"] = mlp
        layers.append(layer)
    out["layers"] = layers
    if params.get("lm_head") is not None:
        out["lm_head"] = q(params["lm_head"])
    if embed and not (isinstance(params["embed"], dict)
                      and "eq8" in params["embed"]):
        out["embed"] = quantize_embed(params["embed"])
    return out


# ---------------------------------------------------------------------------
# Int8 embedding storage (EngineConfig.embed_bits=8)
# ---------------------------------------------------------------------------
#
# The embedding table is the one large weight the projections story misses
# (V x H bf16 = 262 MB at 7B). Per-VOCAB-ROW symmetric scales serve both
# uses of the table: the token lookup dequantizes its row with one scalar,
# and the tied lm_head (embed.T) becomes a standard wdot with per-output
# scales (ws = es.T).


def quantize_embed(e) -> dict:
    """(V, H) float -> {"eq8": int8 codes, "es": (V, 1) f32 row scales}."""
    ef = jnp.asarray(e, jnp.float32)
    s = jnp.max(jnp.abs(ef), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-30)
    return {"eq8": jnp.round(ef / s).astype(jnp.int8), "es": s}


def embed_rows(emb, ids, dtype) -> jax.Array:
    """Token-id lookup for a plain or int8-quantized embedding table."""
    if isinstance(emb, dict) and "eq8" in emb:
        return (emb["eq8"][ids] * emb["es"][ids]).astype(dtype)
    return emb[ids].astype(dtype)


def embed_dim(emb) -> int:
    return (emb["eq8"] if isinstance(emb, dict) and "eq8" in emb else emb).shape[1]


def tied_head(params):
    """The lm_head operand for wdot: the explicit head if present, else the
    (possibly int8) embedding table transposed (weight tying)."""
    if params.get("lm_head") is not None:
        return params["lm_head"]
    emb = params["embed"]
    if isinstance(emb, dict) and "eq8" in emb:
        return {"wq8": emb["eq8"].T, "ws": emb["es"].T}
    return emb.T
