"""Functional JAX Llama-family decoder with pluggable (dense or Palu
low-rank) KV projections.

One implementation covers Llama / TinyLlama / Mistral (sliding window) /
Qwen2 (attention bias) -- the reference keeps three near-identical model
trees (palu/model/svd_llama|svd_mistral|svd_qwen); here family differences
are config deltas only.

Design: params are a plain pytree (nested dicts / lists of jnp arrays);
forward functions are pure. Weights are stored (in_features, out_features) so
matmuls read `x @ w` (natural for XLA/MXU). Low-rank projections hold
  VT: (hidden, G * r)       x @ VT -> latents (B, S, G, r)
  U:  (G, r, group_dim)     reconstruct = einsum('bsgr,grd->bsgd')
matching the math of the reference's HeadwiseLowRankModule
(svd_linear.py:84-121) with uniform-within-layer ranks (the
fisher_uniform default; the reference kernel track has the same restriction,
kernel/palu_attention.py:111).

The *unified* attention supports two value paths that are algebraically
identical (kernel/palu_attention.py:241-257):
  - "reconstruct": rebuild full V, apply probs, then dense o_proj
    (the reference accuracy track, run_ppl_eval semantics)
  - "fused": keep V latent, probs @ v_latent per group, then the
    U_v-fused o_proj (the reference latency track; the serving path here)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from ..core.wquant import wdot

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float, dtype=jnp.float32,
    inv_freq=None, attn_scale: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """HF-Llama RoPE tables: cos/sin of shape (*positions.shape, head_dim),
    duplicated over the two halves ([f, f] layout). `inv_freq`/`attn_scale`
    override the default theta schedule (rope_scaling; models/rope.py)."""
    if inv_freq is None:
        inv_freq = 1.0 / (
            theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
        )
    else:
        inv_freq = jnp.asarray(inv_freq, jnp.float32)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return (
        (jnp.cos(emb) * attn_scale).astype(dtype),
        (jnp.sin(emb) * attn_scale).astype(dtype),
    )


def rope_cos_sin_for(cfg: ModelConfig, positions: jax.Array, dtype=jnp.float32):
    """Config-driven RoPE tables honoring cfg.rope_scaling."""
    from . import rope as rope_mod

    inv_freq, scale = rope_mod.inv_freq_and_scale(cfg)
    return rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, dtype=dtype,
        inv_freq=inv_freq, attn_scale=scale,
    )


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, n_heads, head_dim); cos/sin: (B, S, head_dim)."""
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return x * cos + rotate_half(x) * sin


# ---------------------------------------------------------------------------
# Projections (dense or low-rank)
# ---------------------------------------------------------------------------


def is_ragged(proj: Params) -> bool:
    """True when the low-rank module has non-uniform per-group ranks: U is a
    tuple of (r_i, group_dim) matrices instead of a stacked (G, r, d) array
    (reference svd_linear.py:72-78 holds a per-group rank list)."""
    return "VT" in proj and isinstance(proj["U"], (list, tuple))


def ragged_offsets(proj: Params):
    """Per-group (offset, rank) pairs into the flat latent dimension."""
    offs, o = [], 0
    for u in proj["U"]:
        offs.append((o, u.shape[0]))
        o += u.shape[0]
    return offs


def project_kv(x: jax.Array, proj: Params) -> jax.Array:
    """Dense: returns (B, S, out). Low-rank: returns latents (B, S, G, r)
    for uniform ranks, or flat (B, S, sum_ranks) for ragged ranks."""
    if "VT" in proj:
        b, s, _ = x.shape
        lat = wdot(x, proj["VT"])
        if is_ragged(proj):
            return lat  # (B, S, sum_ranks); slice per group at reconstruct
        g = proj["U"].shape[0]
        return lat.reshape(b, s, g, -1)
    out = wdot(x, proj["w"])
    if proj.get("b") is not None:
        out = out + proj["b"]
    return out


def reconstruct_kv(latents: jax.Array, proj: Params) -> jax.Array:
    """Uniform: latents (B, S, G, r) -> (B, S, G*group_dim) via stacked U.
    Ragged: latents (B, S, sum_ranks) -> (B, S, G*group_dim) via per-group
    slices (reference svd_linear.py:107-121)."""
    if is_ragged(proj):
        outs = []
        for gi, (o, r) in enumerate(ragged_offsets(proj)):
            og = latents[..., o : o + r] @ proj["U"][gi]  # (B, S, d)
            if proj.get("b") is not None:
                og = og + proj["b"][gi]
            outs.append(og)
        return jnp.concatenate(outs, axis=-1)
    out = jnp.einsum("bsgr,grd->bsgd", latents, proj["U"])
    if proj.get("b") is not None:
        out = out + proj["b"]  # per-group bias (G, d), qwen2
    b, s, g, d = out.shape
    return out.reshape(b, s, g * d)


def quantize_latent_grouped(latents: jax.Array, proj: Params, quantize_latent):
    """Apply the fake-quant hook with per-group granularity for ragged
    latents (B, S, sum_ranks); uniform (B, S, G, r) passes through whole."""
    if not is_ragged(proj):
        return quantize_latent(latents)
    parts = [
        quantize_latent(latents[..., o : o + r])
        for (o, r) in ragged_offsets(proj)
    ]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def _causal_mask(
    q_len: int, kv_len: int, dtype, sliding_window: Optional[int] = None
) -> jax.Array:
    """(q_len, kv_len) additive mask; query i attends keys <= i + (kv_len - q_len)."""
    q_pos = jnp.arange(q_len)[:, None] + (kv_len - q_len)
    k_pos = jnp.arange(kv_len)[None, :]
    keep = k_pos <= q_pos
    if sliding_window is not None:
        keep &= k_pos > q_pos - sliding_window
    return jnp.where(keep, 0.0, jnp.finfo(dtype).min).astype(dtype)


def attention_core(
    q: jax.Array,  # (B, Sq, nh, hd) -- already roped
    k: jax.Array,  # (B, Sk, nkv, hd) -- already roped
    v_or_latent: jax.Array,  # (B, Sk, nkv, hd) dense or (B, Sk, G, rv) latent
    cfg: ModelConfig,
    mask: jax.Array,  # (Sq, Sk) additive
    v_is_latent: bool,
) -> jax.Array:
    """softmax(q k^T / sqrt(d) + mask) @ v, GQA-aware.

    With v_is_latent the value matmul runs in latent space grouped by KV head
    group (the o_proj must then be the U_v-fused one); output is
    (B, Sq, nh * rv) instead of (B, Sq, nh * hd).
    """
    b, sq, nh, hd = q.shape
    sk = k.shape[1]
    nkv = cfg.num_key_value_heads
    rep = nh // nkv

    qh = q.transpose(0, 2, 1, 3)  # (B, nh, Sq, hd)
    kh = k.transpose(0, 2, 1, 3)  # (B, nkv, Sk, hd)
    if rep > 1:
        kh = jnp.repeat(kh, rep, axis=1)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / np.sqrt(cfg.head_dim)
    logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)  # (B, nh, Sq, Sk)

    if not v_is_latent:
        vh = v_or_latent.transpose(0, 2, 1, 3)
        if rep > 1:
            vh = jnp.repeat(vh, rep, axis=1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        return out.transpose(0, 2, 1, 3).reshape(b, sq, nh * hd)

    # Latent-V path: group q-heads by kv group; probs (B, G, gs*rep*Sq, Sk)
    # @ latents (B, G, Sk, rv) (kernel/palu_attention.py:248-251, GQA-general).
    g = v_or_latent.shape[2]
    rv = v_or_latent.shape[3]
    heads_per_group = nh // g
    probs_g = probs.reshape(b, g, heads_per_group * sq, sk)
    lat = v_or_latent.transpose(0, 2, 1, 3)  # (B, G, Sk, rv)
    out = jnp.einsum("bgqk,bgkr->bgqr", probs_g, lat)
    out = out.reshape(b, nh, sq, rv)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, nh * rv)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def mlp_forward(x: jax.Array, p: Params) -> jax.Array:
    # wdot == `@` for plain arrays; handles int8 weight-only storage
    # (core/wquant, EngineConfig.weight_bits=8) transparently
    from ..core.wquant import is_quantized_weight, wdot

    mode = os.environ.get("PALU_GEMV_KERNEL", "1")  # "0" off, "force" = run
    # in interpret mode off-TPU (CPU dispatch tests)
    if (
        mode != "0"
        and all(is_quantized_weight(p[k]) for k in ("gate", "up", "down"))
        and int(np.prod(x.shape[:-1])) <= 8
        and (jax.default_backend() == "tpu" or mode == "force")
    ):
        # decode-sized inputs on TPU: one fused streaming pass over the
        # int8/int4 weights (ops/pallas/gemv_int8 / gemv_int4) instead of
        # three XLA GEMVs whose scheduling inside the scanned layer body
        # leaves ~40% of HBM bandwidth idle (docs/BENCH.md round-3
        # decomposition)
        lead = x.shape[:-1]
        interp = jax.default_backend() != "tpu"
        if all("wq4" in p[k] for k in ("gate", "up", "down")):
            from ..core.wquant import W4_GROUP, w4_group

            if (p["gate"]["wq4"].shape[1] % 128 == 0
                    and all(w4_group(p[k]) == W4_GROUP
                            for k in ("gate", "up", "down"))):
                from ..ops.pallas.gemv_int4 import mlp_gemv_int4

                out = mlp_gemv_int4(x.reshape(-1, x.shape[-1]), p["gate"],
                                    p["up"], p["down"], interpret=interp)
                return out.reshape(*lead, out.shape[-1])
        elif (all("wq8" in p[k] for k in ("gate", "up", "down"))
              and p["gate"]["wq8"].shape[1] % 128 == 0):
            from ..ops.pallas.gemv_int8 import mlp_gemv_int8

            out = mlp_gemv_int8(x.reshape(-1, x.shape[-1]), p["gate"],
                                p["up"], p["down"], interpret=interp)
            return out.reshape(*lead, out.shape[-1])

    gate = wdot(x, p["gate"])
    up = wdot(x, p["up"])
    return wdot(jax.nn.silu(gate) * up, p["down"])


def attn_forward(
    x: jax.Array,
    p: Params,
    cfg: ModelConfig,
    positions: jax.Array,
    mask: jax.Array,
    quantize_latent=None,
    value_mode: str = "reconstruct",
) -> jax.Array:
    """Full-sequence (no-cache) attention used by the ppl/accuracy path.

    quantize_latent: optional fn(latents (B,S,G,r)) -> latents, applied to
    K and V latents before reconstruction (fake-quant semantics of
    svd_linear.py:84-90).
    """
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = x @ p["q_proj"]["w"]
    if p["q_proj"].get("b") is not None:
        q = q + p["q_proj"]["b"]
    q = q.reshape(b, s, nh, hd)

    k_raw = project_kv(x, p["k_proj"])
    v_raw = project_kv(x, p["v_proj"])

    k_lowrank = "VT" in p["k_proj"]
    v_lowrank = "VT" in p["v_proj"]
    if quantize_latent is not None:
        if k_lowrank:
            k_raw = quantize_latent_grouped(k_raw, p["k_proj"], quantize_latent)
        if v_lowrank:
            v_raw = quantize_latent_grouped(v_raw, p["v_proj"], quantize_latent)

    k = reconstruct_kv(k_raw, p["k_proj"]) if k_lowrank else k_raw
    k = k.reshape(b, s, nkv, hd)

    cos, sin = rope_cos_sin_for(cfg, positions, dtype=jnp.float32)
    qr = apply_rope(q.astype(jnp.float32), cos, sin).astype(x.dtype)
    kr = apply_rope(k.astype(jnp.float32), cos, sin).astype(x.dtype)

    # ragged-V has no stacked latent layout for the fused path; reconstruct
    if value_mode == "fused" and v_lowrank and not is_ragged(p["v_proj"]):
        out = attention_core(qr, kr, v_raw, cfg, mask, v_is_latent=True)
        o_w = p["o_proj"]["w_fused"]
    else:
        v = reconstruct_kv(v_raw, p["v_proj"]) if v_lowrank else v_raw
        v = v.reshape(b, s, nkv, hd)
        out = attention_core(qr, kr, v, cfg, mask, v_is_latent=False)
        o_w = p["o_proj"]["w"]
    return out @ o_w


def decoder_layer(
    x: jax.Array,
    p: Params,
    cfg: ModelConfig,
    positions: jax.Array,
    mask: jax.Array,
    quantize_latent=None,
    value_mode: str = "reconstruct",
) -> jax.Array:
    h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
    x = x + attn_forward(h, p["attn"], cfg, positions, mask, quantize_latent, value_mode)
    h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
    x = x + mlp_forward(h, p["mlp"])
    return x


def forward(
    params: Params,
    input_ids: jax.Array,  # (B, S)
    cfg: ModelConfig,
    quantize_latent=None,
    value_mode: str = "reconstruct",
) -> jax.Array:
    """Full forward pass -> logits (B, S, vocab). Accuracy-track semantics:
    no KV cache, causal mask, fake-quant hook on latents (run_ppl_eval.py 3.2)."""
    b, s = input_ids.shape
    x = params["embed"][input_ids]
    positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    mask = _causal_mask(s, s, jnp.float32, cfg.sliding_window)
    for p_layer in params["layers"]:
        x = decoder_layer(
            x, p_layer, cfg, positions, mask, quantize_latent, value_mode
        )
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params["lm_head"] if params.get("lm_head") is not None else params["embed"].T
    return x @ lm_head


# ---------------------------------------------------------------------------
# Init (random weights, for tests and latency benches)
# ---------------------------------------------------------------------------


def init_params(
    cfg: ModelConfig, key: jax.Array, dtype=jnp.float32, scale: float = 0.02
) -> Params:
    """Random-init params (the reference's latency track also runs on random
    weights, run_latency_attention.py:40-55). Low-rank layers are created for
    any projection named in cfg.head_wise_ranks."""

    def dense(key, shape):
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, 8 + cfg.num_hidden_layers * 16))

    def kv_proj(layer, which):
        rank = cfg.uniform_rank_for(layer, which)
        out_dim = nkv * hd
        if rank is None:
            p = {"w": dense(next(keys), (h, out_dim))}
            if cfg.attention_bias:
                p["b"] = jnp.zeros((out_dim,), dtype)
            return p
        g = cfg.num_kv_groups
        p = {
            "VT": dense(next(keys), (h, g * rank)),
            "U": dense(next(keys), (g, rank, cfg.group_dim)),
        }
        if cfg.attention_bias:
            p["b"] = jnp.zeros((g, cfg.group_dim), dtype)
        return p

    layers = []
    for i in range(cfg.num_hidden_layers):
        q_p = {"w": dense(next(keys), (h, nh * hd))}
        if cfg.attention_bias:
            q_p["b"] = jnp.zeros((nh * hd,), dtype)
        attn = {
            "q_proj": q_p,
            "k_proj": kv_proj(i, "k_proj"),
            "v_proj": kv_proj(i, "v_proj"),
            "o_proj": {"w": dense(next(keys), (nh * hd, h))},
        }
        if "VT" in attn["v_proj"]:
            attn["o_proj"]["w_fused"] = fuse_o_proj(
                np.asarray(attn["o_proj"]["w"]), np.asarray(attn["v_proj"]["U"]), cfg
            ).astype(dtype)
        layers.append(
            {
                "input_norm": jnp.ones((h,), dtype),
                "post_norm": jnp.ones((h,), dtype),
                "attn": attn,
                "mlp": {
                    "gate": dense(next(keys), (h, cfg.intermediate_size)),
                    "up": dense(next(keys), (h, cfg.intermediate_size)),
                    "down": dense(next(keys), (cfg.intermediate_size, h)),
                },
            }
        )
    return {
        "embed": dense(next(keys), (cfg.vocab_size, h)),
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": None if cfg.tie_word_embeddings else dense(next(keys), (h, cfg.vocab_size)),
    }


def pad_ragged_params(params: Params, cfg: ModelConfig):
    """Zero-pad ragged per-group ranks up to each layer's max rank, giving
    the uniform stacked layout the runtime kernels require (VERDICT: the
    reference's accuracy track runs ragged; its kernel track also requires
    uniform ranks, kernel/palu_attention.py:111). Padding is exact for the
    bf16 cache (zero latent dims project/reconstruct to zero); with a
    quantized cache the padded zeros participate in per-row min/max scales,
    a small extra approximation. Returns (params, cfg) unchanged when no
    layer is ragged."""
    import dataclasses

    changed = False
    new_ranks = dict(cfg.head_wise_ranks or {})
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        attn = dict(layer["attn"])
        layer_changed = False
        for which in ("k_proj", "v_proj"):
            p = attn[which]
            if not is_ragged(p):
                continue
            changed = layer_changed = True
            name = f"model.layers.{i}.self_attn.{which}"
            us = [np.asarray(u, np.float32) for u in p["U"]]
            g = len(us)
            gd = us[0].shape[1]
            rmax = max(u.shape[0] for u in us)
            vt_old = np.asarray(p["VT"], np.float32)
            vt = np.zeros((vt_old.shape[0], g * rmax), np.float32)
            u_new = np.zeros((g, rmax, gd), np.float32)
            o = 0
            for gi, u in enumerate(us):
                r = u.shape[0]
                vt[:, gi * rmax : gi * rmax + r] = vt_old[:, o : o + r]
                u_new[gi, :r] = u
                o += r
            dt = p["VT"].dtype
            newp = {"VT": jnp.asarray(vt, dt), "U": jnp.asarray(u_new, dt)}
            if p.get("b") is not None:
                newp["b"] = p["b"]
            attn[which] = newp
            new_ranks[name] = [rmax] * g
        if layer_changed and "VT" in attn["v_proj"]:
            o_w = np.asarray(attn["o_proj"]["w"], np.float32)
            attn["o_proj"] = dict(attn["o_proj"])
            attn["o_proj"]["w_fused"] = fuse_o_proj(
                o_w, np.asarray(attn["v_proj"]["U"], np.float32), cfg
            ).astype(attn["v_proj"]["VT"].dtype)
        new_layers.append({**layer, "attn": attn})
    if not changed:
        return params, cfg
    return (
        {**params, "layers": new_layers},
        dataclasses.replace(cfg, head_wise_ranks=new_ranks),
    )


def fuse_o_proj(o_w: np.ndarray, u_v: np.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Fold U_v into o_proj: (nh * rv, hidden) fused weight.

    Our o_w is (nh*hd, hidden) [input-major]; per q-head h served by kv head
    j = h // rep in group g = j // gs, the fused block is
    U_v[g, :, (j%gs)*hd:(j%gs+1)*hd] @ o_w[h*hd:(h+1)*hd, :]  -> (rv, hidden).
    Equivalent to the reference's per-head o_proj @ U fusion
    (kernel/palu_attention.py:284-307), generalized to GQA.
    """
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    rep = nh // nkv
    gs = cfg.head_group_size
    rv = u_v.shape[1]
    hidden = o_w.shape[1]
    blocks = np.empty((nh, rv, hidden), dtype=np.float32)
    for h_idx in range(nh):
        j = h_idx // rep
        g = j // gs
        u_slice = u_v[g, :, (j % gs) * hd : (j % gs + 1) * hd]  # (rv, hd)
        blocks[h_idx] = u_slice.astype(np.float32) @ o_w[
            h_idx * hd : (h_idx + 1) * hd, :
        ].astype(np.float32)
    return jnp.asarray(blocks.reshape(nh * rv, hidden))
