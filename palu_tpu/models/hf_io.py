"""HF-checkpoint interop: import dense or Palu-compressed checkpoints from a
local directory, and export our compressed params back to the same format.

Interop targets:
  - dense HF checkpoints: model_type llama / mistral / qwen2
  - reference-produced Palu checkpoints: model_type palullama / palumistral /
    paluqwen2 with `head_wise_ranks` in config.json
    (reference utils.py:48-76 dump_to_huggingface_repos). State-dict names for
    low-rank modules follow nn.Module nesting: `...k_proj.VT.weight`
    (sum_ranks, hidden) and `...k_proj.U.{g}.weight` (group_dim, rank)
    (svd_linear.py:72-78).

All tensors are stored HF-style (out_features, in_features); our params are
input-major, so every projection transposes on the way in/out.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from .config import ModelConfig
from .llama import fuse_o_proj

__all__ = ["load_config", "load_params", "save_checkpoint"]

_FAMILY_BY_MODEL_TYPE = {
    "llama": "llama",
    "palullama": "llama",
    "mistral": "mistral",
    "palumistral": "mistral",
    "qwen2": "qwen2",
    "paluqwen2": "qwen2",
}

_PALU_MODEL_TYPE = {"llama": "palullama", "mistral": "palumistral", "qwen2": "paluqwen2"}
_PALU_ARCHITECTURES = {
    "llama": "PaluLlamaForCausalLM",
    "mistral": "PaluMistralForCausalLM",
    # NOTE: the reference writes the typo'd name "PaluQwenForCausalLM"
    # (utils.py:69); we write the same string for round-trip compatibility.
    "qwen2": "PaluQwenForCausalLM",
}


def load_config(model_dir: str, head_group_size: int = 4) -> ModelConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    model_type = raw.get("model_type", "llama")
    family = _FAMILY_BY_MODEL_TYPE.get(model_type)
    if family is None:
        raise ValueError(f"unsupported model_type: {model_type}")
    return ModelConfig(
        vocab_size=raw["vocab_size"],
        hidden_size=raw["hidden_size"],
        intermediate_size=raw["intermediate_size"],
        num_hidden_layers=raw["num_hidden_layers"],
        num_attention_heads=raw["num_attention_heads"],
        num_key_value_heads=raw.get(
            "num_key_value_heads", raw["num_attention_heads"]
        ),
        head_dim=raw.get("head_dim"),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-5),
        rope_theta=raw.get("rope_theta", 10000.0),
        max_position_embeddings=raw.get("max_position_embeddings", 4096),
        attention_bias=raw.get("attention_bias", family == "qwen2"),
        mlp_bias=raw.get("mlp_bias", False),
        tie_word_embeddings=raw.get("tie_word_embeddings", False),
        sliding_window=raw.get("sliding_window") if family == "mistral" else None,
        rope_scaling=raw.get("rope_scaling"),
        model_family=family,
        head_group_size=raw.get("head_group_size", head_group_size),
        head_wise_ranks=raw.get("head_wise_ranks"),
    )


def _read_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all tensors from safetensors (single or sharded) or torch .bin."""
    tensors: Dict[str, np.ndarray] = {}
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    single_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(index_path):
        from safetensors.numpy import load_file

        with open(index_path) as f:
            index = json.load(f)
        for shard in sorted(set(index["weight_map"].values())):
            tensors.update(load_file(os.path.join(model_dir, shard)))
    elif os.path.exists(single_path):
        from safetensors.numpy import load_file

        tensors = load_file(single_path)
    else:
        import torch  # fallback for .bin checkpoints

        for fname in sorted(os.listdir(model_dir)):
            if fname.endswith(".bin") and "pytorch_model" in fname:
                sd = torch.load(
                    os.path.join(model_dir, fname), map_location="cpu", weights_only=True
                )
                tensors.update(
                    {k: v.float().numpy() for k, v in sd.items()}
                )
        if not tensors:
            raise FileNotFoundError(f"no model weights found in {model_dir}")
    return tensors


def load_params(
    model_dir: str,
    cfg: Optional[ModelConfig] = None,
    dtype=jnp.bfloat16,
    build_fused_o: bool = True,
) -> tuple:
    """Load a local HF checkpoint dir -> (params, cfg)."""
    if cfg is None:
        cfg = load_config(model_dir)
    sd = _read_state_dict(model_dir)

    def t(name):  # transposed projection
        return jnp.asarray(np.asarray(sd[name]).T, dtype=dtype)

    def v(name):  # vector / embedding as-is
        return jnp.asarray(np.asarray(sd[name]), dtype=dtype)

    def kv_proj(i: int, which: str) -> Dict[str, Any]:
        prefix = f"model.layers.{i}.self_attn.{which}"
        ranks = cfg.ranks_for(i, which)
        if ranks is None or f"{prefix}.VT.weight" not in sd:
            p = {"w": t(f"{prefix}.weight")}
            if f"{prefix}.bias" in sd:
                p["b"] = v(f"{prefix}.bias")
            return p
        vt = t(f"{prefix}.VT.weight")  # (hidden, sum_ranks)
        us = [
            np.asarray(sd[f"{prefix}.U.{g}.weight"]).T  # (rank_g, group_dim)
            for g in range(len(ranks))
        ]
        if len(set(ranks)) == 1:
            p = {"VT": vt, "U": jnp.asarray(np.stack(us), dtype=dtype)}
        else:
            # ragged per-group ranks (reference fisher search output,
            # svd_linear.py:72-78): keep per-group matrices; the accuracy
            # track consumes them directly and the Engine pads at build
            p = {"VT": vt, "U": tuple(jnp.asarray(u, dtype=dtype) for u in us)}
        if f"{prefix}.U.0.bias" in sd:
            p["b"] = jnp.asarray(
                np.stack([np.asarray(sd[f"{prefix}.U.{g}.bias"]) for g in range(len(ranks))]),
                dtype=dtype,
            )
        assert vt.shape[1] == sum(ranks), (vt.shape, ranks)
        return p

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        q_p = {"w": t(f"{pre}.self_attn.q_proj.weight")}
        if f"{pre}.self_attn.q_proj.bias" in sd:
            q_p["b"] = v(f"{pre}.self_attn.q_proj.bias")
        attn = {
            "q_proj": q_p,
            "k_proj": kv_proj(i, "k_proj"),
            "v_proj": kv_proj(i, "v_proj"),
            "o_proj": {"w": t(f"{pre}.self_attn.o_proj.weight")},
        }
        if (
            build_fused_o
            and "VT" in attn["v_proj"]
            and not isinstance(attn["v_proj"]["U"], (list, tuple))
        ):  # ragged V has no stacked layout; Engine pads + fuses at build
            attn["o_proj"]["w_fused"] = fuse_o_proj(
                np.asarray(attn["o_proj"]["w"], dtype=np.float32),
                np.asarray(attn["v_proj"]["U"], dtype=np.float32),
                cfg,
            ).astype(dtype)
        layers.append(
            {
                "input_norm": v(f"{pre}.input_layernorm.weight"),
                "post_norm": v(f"{pre}.post_attention_layernorm.weight"),
                "attn": attn,
                "mlp": {
                    "gate": t(f"{pre}.mlp.gate_proj.weight"),
                    "up": t(f"{pre}.mlp.up_proj.weight"),
                    "down": t(f"{pre}.mlp.down_proj.weight"),
                },
            }
        )

    params = {
        "embed": v("model.embed_tokens.weight"),
        "layers": layers,
        "final_norm": v("model.norm.weight"),
        "lm_head": None
        if cfg.tie_word_embeddings or "lm_head.weight" not in sd
        else t("lm_head.weight"),
    }
    return params, cfg


def save_checkpoint(
    params: Dict[str, Any],
    cfg: ModelConfig,
    save_dir: str,
    original_model_name_or_path: str = "",
    extra_config: Optional[Dict[str, Any]] = None,
    dtype=np.float16,
) -> None:
    """Write params as an HF-style Palu checkpoint the reference can load
    (utils.py:48-76 format: save_pretrained layout + config.json with
    head_wise_ranks / palu model_type / architectures)."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    sd: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose):
        a = np.asarray(arr, dtype=np.float32)
        # ascontiguousarray: safetensors serializes the raw buffer, which is
        # wrong for transposed (non-contiguous) views
        sd[name] = np.ascontiguousarray((a.T if transpose else a).astype(dtype))

    put("model.embed_tokens.weight", params["embed"], False)
    put("model.norm.weight", params["final_norm"], False)
    if params.get("lm_head") is not None:
        put("lm_head.weight", params["lm_head"], True)

    for i, layer in enumerate(params["layers"]):
        pre = f"model.layers.{i}"
        put(f"{pre}.input_layernorm.weight", layer["input_norm"], False)
        put(f"{pre}.post_attention_layernorm.weight", layer["post_norm"], False)
        attn, mlp = layer["attn"], layer["mlp"]
        put(f"{pre}.self_attn.q_proj.weight", attn["q_proj"]["w"], True)
        if attn["q_proj"].get("b") is not None:
            put(f"{pre}.self_attn.q_proj.bias", attn["q_proj"]["b"], False)
        put(f"{pre}.self_attn.o_proj.weight", attn["o_proj"]["w"], True)
        for which in ("k_proj", "v_proj"):
            p = attn[which]
            prefix = f"{pre}.self_attn.{which}"
            if "VT" in p:
                put(f"{prefix}.VT.weight", p["VT"], True)
                us = (
                    list(p["U"])  # ragged: per-group (r_g, d)
                    if isinstance(p["U"], (list, tuple))
                    else list(np.asarray(p["U"]))  # stacked (G, r, d)
                )
                for g, u in enumerate(us):
                    put(f"{prefix}.U.{g}.weight", u, True)
                    if p.get("b") is not None:
                        put(f"{prefix}.U.{g}.bias", np.asarray(p["b"])[g], False)
            else:
                put(f"{prefix}.weight", p["w"], True)
                if p.get("b") is not None:
                    put(f"{prefix}.bias", p["b"], False)
        put(f"{pre}.mlp.gate_proj.weight", mlp["gate"], True)
        put(f"{pre}.mlp.up_proj.weight", mlp["up"], True)
        put(f"{pre}.mlp.down_proj.weight", mlp["down"], True)

    save_file(sd, os.path.join(save_dir, "model.safetensors"))

    config = {
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.head_dim,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "attention_bias": cfg.attention_bias,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "torch_dtype": "float16",
        "model_type": _PALU_MODEL_TYPE[cfg.model_family]
        if cfg.head_wise_ranks
        else cfg.model_family,
        "architectures": [_PALU_ARCHITECTURES[cfg.model_family]]
        if cfg.head_wise_ranks
        else None,
        "head_wise_ranks": cfg.head_wise_ranks or {},
        "head_group_size": cfg.head_group_size,
        "original_model_name_or_path": original_model_name_or_path,
    }
    if cfg.sliding_window is not None:
        config["sliding_window"] = cfg.sliding_window
    if cfg.rope_scaling is not None:
        config["rope_scaling"] = cfg.rope_scaling
    if extra_config:
        config.update(extra_config)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump({k: v for k, v in config.items() if v is not None}, f, indent=2)
