"""Int8 / int4 weight-only storage for serving.

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

`weight_bits=4` (quantize_weight4) goes one step further: two 4-bit codes
per byte along the INPUT dim, packed WITHIN each 128-row scale group
(rows r and r + group/2 of a group share a byte, so any group-aligned
tile unpacks to two contiguous row blocks, never an interleave) with per-
(128-row-group, output-channel) scales -- the group granularity standard
weight-only-int4 schemes (GPTQ/AWQ-class) need for acceptable error.
Codes are unsigned 0..15; the symmetric offset 8 is folded out of the dot
algebraically: y = sum_g (x_g @ q_g) * s[g] - 8 * sum(x_g) * s[g], so the
unpacked operand feeds the MXU without a re-centering pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_weight", "quantize_weight4", "is_quantized_weight",
           "wdot", "quantize_params", "quantize_embed", "embed_rows",
           "embed_dim", "tied_head", "W4_GROUP"]

W4_GROUP = 128  # rows per int4 scale group (along the contraction dim)


def quantize_weight(w) -> dict:
    """(in, out) float -> {"wq8": int8 codes, "ws": (1, out) f32 scales},
    symmetric per-output-channel."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-30)
    return {"wq8": jnp.round(wf / s).astype(jnp.int8), "ws": s}


def quantize_weight4(w, group: int = W4_GROUP) -> dict:
    """(in, out) float -> {"wq4": uint8 (in/2, out) packed codes,
    "ws": (in/group, out) f32 scales}, symmetric per-(group, out-channel).

    Packing is WITHIN each 128-row scale group: rows r and r + group/2 of
    a group share a byte (low/high nibble), so any tile aligned to whole
    groups -- the Pallas kernels contract 128-row groups one at a time --
    unpacks to two contiguous half-group blocks with one mask and one
    shift, never an interleave, regardless of where the tile starts."""
    wf = jnp.asarray(w, jnp.float32)
    n_in, n_out = wf.shape
    # production shapes are multiples of 256 and use the 128-row group the
    # Pallas kernels require; tiny (test) shapes shrink the group so the
    # XLA path still works
    req = group
    while group > 2 and n_in % (2 * group) != 0:
        group //= 2
    if n_in % (2 * group) != 0:
        raise ValueError(f"in-dim {n_in} must be a multiple of {2 * group}")
    if group != req and n_in >= 1024:
        import warnings

        warnings.warn(
            f"quantize_weight4: in-dim {n_in} is not a multiple of "
            f"{2 * req}; scale group shrinks to {group}, which disqualifies "
            f"the Pallas int4 GEMV kernels (w4_group != W4_GROUP) and the "
            f"decode path falls back to the XLA dequant matmul",
            stacklevel=2)
    n_g = n_in // group
    s = jnp.max(jnp.abs(wf.reshape(n_g, group, n_out)),
                axis=1) / 7.0  # codes -8..7; clip the -8 corner to +/-7
    s = jnp.maximum(s, 1e-30)
    q = jnp.clip(jnp.round(wf.reshape(n_g, group, n_out) / s[:, None, :]),
                 -8, 7)
    u = (q + 8).astype(jnp.uint8).reshape(n_g, 2, group // 2, n_out)
    packed = (u[:, 0] | (u[:, 1] << 4)).reshape(n_in // 2, n_out)
    return {"wq4": packed, "ws": s}


def w4_group(w) -> int:
    """Rows per scale group of a {"wq4", "ws"} weight."""
    return (2 * w["wq4"].shape[0]) // w["ws"].shape[0]


def is_quantized_weight(w) -> bool:
    return isinstance(w, dict) and ("wq8" in w or "wq4" in w)


def unpack_weight4(w) -> jax.Array:
    """{"wq4", "ws"} -> dequantized (in, out) f32 weights (XLA path; the
    decode hot loop uses ops/pallas/gemv_int4 instead).

    Unlike the int8 path (whose convert fuses into the dot's operand
    read), this materializes a full f32 copy of the weight per matmul, so
    batch>8 / prefill / CPU callers pay a transient (in, out) f32 HBM
    allocation plus full-precision weight-read bandwidth each call.
    Acceptable for prefill (the step is MXU-bound on the GEMMs, not on
    weight reads) but a reason the decode dispatch prefers the kernel."""
    u = w["wq4"]
    n_out = u.shape[1]
    n_g = w["ws"].shape[0]
    g = (2 * u.shape[0]) // n_g
    ub = u.reshape(n_g, g // 2, n_out)
    codes = jnp.stack([ub & 0xF, ub >> 4], axis=1).astype(jnp.float32) - 8.0
    return (codes.reshape(n_g, g, n_out)
            * w["ws"][:, None, :]).reshape(n_g * g, n_out)


def wdot(x: jax.Array, w) -> jax.Array:
    """x @ w over the last axis of x; w is either a plain array or a
    quantized {"wq8"|"wq4", "ws"} dict."""
    if isinstance(w, dict) and "wq4" in w:
        import os as _os

        import numpy as _np

        if (_os.environ.get("PALU_GEMV_KERNEL", "1") != "0"
                and int(_np.prod(x.shape[:-1])) <= 8
                and jax.default_backend() == "tpu"
                and w["wq4"].shape[1] % 128 == 0
                and w4_group(w) == W4_GROUP):
            from ..ops.pallas.gemv_int4 import gemv_int4

            lead = x.shape[:-1]
            y = gemv_int4(x.reshape(-1, x.shape[-1]), w)
            return y.reshape(*lead, y.shape[-1])
        return (x @ unpack_weight4(w).astype(x.dtype)).astype(x.dtype)
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


def quantize_params(params, vt: bool = False, embed: bool = False,
                    bits: int = 8) -> dict:
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
    params).

    bits=4 stores the large dense projections (and lm_head) as packed
    int4 with per-group scales (quantize_weight4); VT and the embedding
    stay int8 -- they are nearer the accuracy-critical low-rank path."""
    if bits not in (8, 4):
        raise ValueError(f"weight bits must be 8 or 4, got {bits}")

    def q(w):
        if is_quantized_weight(w):
            return w
        return quantize_weight4(w) if bits == 4 else quantize_weight(w)

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
                    if not is_quantized_weight(proj["VT"]):
                        proj["VT"] = quantize_weight(proj["VT"])  # int8 always
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
