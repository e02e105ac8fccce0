"""Golden tests: our functional JAX llama-family forward vs HF transformers
(torch CPU) on tiny random models, plus low-rank equivalence properties."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.models import ModelConfig, hf_io, llama
from palu_tpu.core import lowrank


def _tiny_hf_dir(tmp_path, family="llama", kv_heads=4):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from transformers import MistralConfig, MistralForCausalLM
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    common = dict(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    if family == "llama":
        cfg = LlamaConfig(**common)
        model = LlamaForCausalLM(cfg)
    elif family == "mistral":
        cfg = MistralConfig(**common, sliding_window=16)
        model = MistralForCausalLM(cfg)
    elif family == "qwen2":
        cfg = Qwen2Config(**common)
        model = Qwen2ForCausalLM(cfg)
    else:
        raise ValueError(family)
    model = model.eval().float()
    d = tmp_path / f"hf_{family}_{kv_heads}"
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


@pytest.mark.parametrize("family,kv_heads", [("llama", 4), ("llama", 2), ("mistral", 2), ("qwen2", 4)])
def test_forward_matches_transformers(tmp_path, family, kv_heads):
    import torch

    model_dir, torch_model = _tiny_hf_dir(tmp_path, family, kv_heads)
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    assert cfg.model_family == family

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 24))
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    assert np.allclose(ours, ref, atol=2e-3), np.abs(ours - ref).max()


def _lowrank_params(params, cfg, rank):
    """Replace k/v projections with rank-`rank` low-rank versions, and record
    head_wise_ranks on the config."""
    import dataclasses

    hwr = {}
    new_layers = []
    g = cfg.num_kv_groups
    for i, layer in enumerate(params["layers"]):
        attn = dict(layer["attn"])
        for which in ("k_proj", "v_proj"):
            w = np.asarray(attn[which]["w"]).T  # (out, in) for decomposition
            bias = attn[which].get("b")
            bias_np = None if bias is None else np.asarray(bias)
            lr = lowrank.decompose_svd(w, ranks=[rank] * g, bias=bias_np)
            p = {
                "VT": jnp.asarray(lr.VT.T),  # (in, G*r)
                "U": jnp.asarray(np.stack([u.T for u in lr.U])),  # (G, r, d)
            }
            if lr.bias is not None:
                p["b"] = jnp.asarray(np.stack(lr.bias))
            attn[which] = p
            hwr[f"model.layers.{i}.self_attn.{which}"] = [rank] * g
        attn["o_proj"] = dict(attn["o_proj"])
        attn["o_proj"]["w_fused"] = llama.fuse_o_proj(
            np.asarray(attn["o_proj"]["w"]), np.asarray(attn["v_proj"]["U"]), cfg
        )
        new_layers.append({**layer, "attn": attn})
    new_params = {**params, "layers": new_layers}
    new_cfg = dataclasses.replace(cfg, head_wise_ranks=hwr)
    return new_params, new_cfg


@pytest.mark.parametrize("kv_heads,group_size", [(4, 2), (2, 1)])
def test_full_rank_lowrank_matches_dense(tmp_path, kv_heads, group_size):
    import dataclasses

    model_dir, _ = _tiny_hf_dir(tmp_path, "llama", kv_heads)
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, head_group_size=group_size)
    full_rank = cfg.group_dim  # full rank per group -> exact reconstruction
    lr_params, lr_cfg = _lowrank_params(params, cfg, full_rank)

    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 16)))
    dense_logits = np.asarray(llama.forward(params, ids, cfg))
    lr_logits = np.asarray(llama.forward(lr_params, ids, lr_cfg))
    assert np.allclose(lr_logits, dense_logits, atol=5e-3), np.abs(lr_logits - dense_logits).max()


def test_fused_value_path_matches_reconstruct(tmp_path):
    """The latent-V + fused-o_proj path is algebraically identical to
    reconstruct-V + dense o_proj (kernel/palu_attention.py:241-257)."""
    import dataclasses

    model_dir, _ = _tiny_hf_dir(tmp_path, "llama", 4)
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, head_group_size=2)
    lr_params, lr_cfg = _lowrank_params(params, cfg, 8)  # genuinely low rank

    ids = jnp.asarray(np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 12)))
    rec = np.asarray(llama.forward(lr_params, ids, lr_cfg, value_mode="reconstruct"))
    fused = np.asarray(llama.forward(lr_params, ids, lr_cfg, value_mode="fused"))
    assert np.allclose(rec, fused, atol=2e-3), np.abs(rec - fused).max()


def test_quantize_latent_hook_changes_logits(tmp_path):
    from palu_tpu.core import quant

    model_dir, _ = _tiny_hf_dir(tmp_path, "llama", 4)
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    import dataclasses

    cfg = dataclasses.replace(cfg, head_group_size=2)
    lr_params, lr_cfg = _lowrank_params(params, cfg, 16)
    qcfg = quant.QuantConfig(bits=3, group_size=0, sym=False)

    def qfn(lat):
        return quant.fake_quantize(lat, qcfg)

    ids = jnp.asarray(np.random.default_rng(3).integers(0, cfg.vocab_size, (1, 12)))
    base = np.asarray(llama.forward(lr_params, ids, lr_cfg))
    quantized = np.asarray(llama.forward(lr_params, ids, lr_cfg, quantize_latent=qfn))
    # quantization perturbs but does not destroy
    assert not np.allclose(quantized, base)
    assert np.abs(quantized - base).max() < 10.0


def test_checkpoint_export_import_roundtrip(tmp_path):
    import dataclasses

    model_dir, _ = _tiny_hf_dir(tmp_path, "llama", 4)
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, head_group_size=2)
    lr_params, lr_cfg = _lowrank_params(params, cfg, 16)

    out_dir = str(tmp_path / "palu_ckpt")
    hf_io.save_checkpoint(lr_params, lr_cfg, out_dir, "tiny", dtype=np.float32)

    with open(os.path.join(out_dir, "config.json")) as f:
        raw = json.load(f)
    assert raw["model_type"] == "palullama"
    assert raw["architectures"] == ["PaluLlamaForCausalLM"]
    assert raw["head_wise_ranks"]

    params2, cfg2 = hf_io.load_params(out_dir, dtype=jnp.float32)
    assert cfg2.head_wise_ranks == lr_cfg.head_wise_ranks
    ids = jnp.asarray(np.random.default_rng(4).integers(0, cfg.vocab_size, (1, 8)))
    a = np.asarray(llama.forward(lr_params, ids, lr_cfg))
    b = np.asarray(llama.forward(params2, ids, cfg2))
    assert np.allclose(a, b, atol=1e-4)


def test_init_params_shapes():
    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_group_size=2,
        head_wise_ranks={
            "model.layers.0.self_attn.k_proj": [8, 8],
            "model.layers.0.self_attn.v_proj": [8, 8],
        },
    )
    params = llama.init_params(cfg, jax.random.key(0))
    attn = params["layers"][0]["attn"]
    assert attn["k_proj"]["VT"].shape == (32, 16)
    assert attn["k_proj"]["U"].shape == (2, 8, 16)
    assert attn["o_proj"]["w_fused"].shape == (4 * 8, 32)
    logits = llama.forward(params, jnp.zeros((1, 4), jnp.int32), cfg)
    assert logits.shape == (1, 4, 64)


@pytest.mark.parametrize("family,kv_heads", [("mistral", 2), ("qwen2", 4)])
def test_compressed_checkpoint_roundtrip_other_families(tmp_path, family, kv_heads):
    """Compress -> export -> reload -> identical logits, for the mistral and
    qwen2 families (sliding window / attention bias paths)."""
    import dataclasses

    from palu_tpu.compression import compress_params

    model_dir, _ = _tiny_hf_dir(tmp_path, family, kv_heads)
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, head_group_size=2)
    g = cfg.num_key_value_heads // 2
    sel = {}
    for i in range(cfg.num_hidden_layers):
        sel[f"model.layers.{i}.self_attn.k_proj"] = [16] * g
        sel[f"model.layers.{i}.self_attn.v_proj"] = [16] * g
    lr_params, lr_cfg = compress_params(params, cfg, sel, "svd", head_group_size=2)

    out_dir = str(tmp_path / f"palu_{family}")
    hf_io.save_checkpoint(lr_params, lr_cfg, out_dir, "tiny", dtype=np.float32)
    with open(os.path.join(out_dir, "config.json")) as f:
        conf = json.load(f)
    assert conf["model_type"] == {"mistral": "palumistral", "qwen2": "paluqwen2"}[family]

    params2, cfg2 = hf_io.load_params(out_dir, dtype=jnp.float32)
    assert cfg2.model_family == family
    assert cfg2.sliding_window == lr_cfg.sliding_window
    ids = jnp.asarray(np.random.default_rng(5).integers(0, cfg.vocab_size, (1, 10)))
    a = np.asarray(llama.forward(lr_params, ids, lr_cfg))
    b = np.asarray(llama.forward(params2, ids, cfg2))
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


# ---------------------------------------------------------------------------
# rope_scaling (linear / llama3 / yarn) -- HF transformers parity
# ---------------------------------------------------------------------------


def _scaled_hf_dir(tmp_path, rope_scaling):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, rope_scaling=rope_scaling,
    )
    model = LlamaForCausalLM(cfg).eval().float()
    d = tmp_path / f"hf_scaled_{rope_scaling['rope_type']}"
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


@pytest.mark.parametrize("rope_scaling", [
    {"rope_type": "linear", "factor": 2.0},
    {"rope_type": "llama3", "factor": 4.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
    {"rope_type": "yarn", "factor": 2.0,
     "original_max_position_embeddings": 64},
])
def test_forward_matches_transformers_rope_scaling(tmp_path, rope_scaling):
    """Scaled-RoPE checkpoints (Llama-3.1-style llama3, linear, yarn) must
    load with the scaling applied and match transformers' logits; round 1
    silently dropped rope_scaling entirely."""
    import torch

    model_dir, torch_model = _scaled_hf_dir(tmp_path, rope_scaling)
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    assert cfg.rope_scaling is not None

    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 96))  # > orig_max posns
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    assert np.allclose(ours, ref, atol=3e-3), np.abs(ours - ref).max()


def test_rope_scaling_config_roundtrip(tmp_path):
    from palu_tpu.models import rope as rope_mod

    rs = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
          "high_freq_factor": 4.0, "original_max_position_embeddings": 8192}
    model_dir, _ = _scaled_hf_dir(tmp_path, dict(rs, factor=8.0))
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    out = tmp_path / "resaved"
    hf_io.save_checkpoint(params, cfg, str(out), dtype=np.float32)
    cfg2 = hf_io.load_config(str(out))
    assert cfg2.rope_scaling == cfg.rope_scaling
    f1, s1 = rope_mod.inv_freq_and_scale(cfg)
    f2, s2 = rope_mod.inv_freq_and_scale(cfg2)
    np.testing.assert_allclose(f1, f2)
    assert s1 == s2


def test_engine_rope_scaling_matches_forward(tmp_path):
    """Engine decode (XLA latent path) agrees with the no-cache forward for
    a scaled-rope model, so the cache/decode rope plumbing is consistent."""
    from palu_tpu.runtime.engine import Engine, EngineConfig
    from palu_tpu.compression import compress_params

    rs = {"rope_type": "linear", "factor": 2.0}
    model_dir, _ = _scaled_hf_dir(tmp_path, rs)
    params, cfg = hf_io.load_params(model_dir, dtype=jnp.float32)
    sel = {}
    for i in range(cfg.num_hidden_layers):
        sel[f"model.layers.{i}.self_attn.k_proj"] = [16, 16]
        sel[f"model.layers.{i}.self_attn.v_proj"] = [16, 16]
    cp, cc = compress_params(params, cfg, sel, decompose_method="svd",
                             head_group_size=2)
    assert cc.rope_scaling == rs
    ids = np.arange(12)[None, :] % cc.vocab_size
    ref = np.asarray(llama.forward(cp, jnp.asarray(ids), cc))
    eng = Engine(cp, cc, EngineConfig(s_max=32, dtype=jnp.float32, decode_chunk=8))
    logits, cache = eng.prefill(jnp.asarray(ids[:, :6]))
    np.testing.assert_allclose(np.asarray(logits[0, -1]), ref[0, 5],
                               rtol=2e-3, atol=2e-3)
    for t in range(6, 12):
        logits, cache = eng.decode(ids[:, t:t+1], cache)
        np.testing.assert_allclose(np.asarray(logits[0, -1]), ref[0, t],
                                   rtol=2e-3, atol=2e-3)


def test_load_params_sharded_safetensors(tmp_path):
    """Real 7B checkpoints ship as sharded safetensors with an index; the
    loader must read via model.safetensors.index.json (hf_io.py:84-92)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(3)
    d = str(tmp_path / "sharded")
    m = LlamaForCausalLM(
        LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=4, max_position_embeddings=128)
    ).float()
    # force sharding with a tiny max shard size
    m.save_pretrained(d, safe_serialization=True, max_shard_size="200KB")
    import os
    assert os.path.exists(os.path.join(d, "model.safetensors.index.json")), \
        "fixture did not produce a sharded checkpoint"

    params, cfg = hf_io.load_params(d, dtype=jnp.float32)
    logits = llama.forward(params, jnp.zeros((1, 8), jnp.int32), cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_native_orbax_checkpoint_roundtrip(tmp_path):
    """save_native/load_native round-trips compressed params + config and
    restores with target shardings on a mesh (the pod-restore path)."""
    import jax

    from palu_tpu.compression import compress_params
    from palu_tpu.models import ckpt as ckpt_io
    from palu_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = llama.init_params(cfg, jax.random.key(5), dtype=jnp.float32)
    sel = {}
    for i in range(2):
        sel[f"model.layers.{i}.self_attn.k_proj"] = [8, 8]
        sel[f"model.layers.{i}.self_attn.v_proj"] = [8, 8]
    cp, cc = compress_params(params, cfg, sel, "svd", 2, dtype=jnp.float32)

    d = str(tmp_path / "native")
    ckpt_io.save_native(d, cp, cc)
    rp, rc = ckpt_io.load_native(d)
    assert rc.head_wise_ranks == cc.head_wise_ranks
    ref = llama.forward(cp, jnp.zeros((1, 8), jnp.int32), cc)
    out = llama.forward(rp, jnp.zeros((1, 8), jnp.int32), rc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    # sharded restore: arrays land with the mesh shardings
    from palu_tpu.parallel import make_mesh
    from palu_tpu.parallel.mesh import param_shardings

    mesh = make_mesh(data=2, model=2)
    sh = param_shardings(cp, mesh)
    sp, _ = ckpt_io.load_native(d, shardings=sh)
    leaf = sp["layers"][0]["attn"]["k_proj"]["VT"]
    assert leaf.sharding.mesh.shape == mesh.shape
    out2 = llama.forward(sp, jnp.zeros((1, 8), jnp.int32), rc)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
