"""CLI end-to-end tests (offline: uniform+svd compression, no tokenizer)."""

import json
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp


def test_compress_cli_uniform_svd(tmp_path, monkeypatch):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    src_dir = str(tmp_path / "dense")
    LlamaForCausalLM(
        LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=4, max_position_embeddings=128)
    ).float().save_pretrained(src_dir, safe_serialization=True)

    out_dir = str(tmp_path / "palu")
    monkeypatch.setattr(sys, "argv", [
        "compress", "--model_name_or_path", src_dir, "--output_dir", out_dir,
        "--param_ratio_target", "0.9", "--search_method", "uniform",
        "--decompose_method", "svd", "--head_group_size", "2",
    ])
    from palu_tpu.cli.compress import main

    main()

    with open(os.path.join(out_dir, "config.json")) as f:
        conf = json.load(f)
    assert conf["model_type"] == "palullama"
    assert conf["head_wise_ranks"]

    # loadable and runnable
    from palu_tpu.models import hf_io, llama

    params, cfg = hf_io.load_params(out_dir, dtype=jnp.float32)
    logits = llama.forward(params, jnp.zeros((1, 8), jnp.int32), cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_latency_kernel_cli_runs_interpret(monkeypatch):
    """Kernel micro-bench CLI on CPU (xla provider only, tiny sizes)."""
    import sys

    monkeypatch.setattr(sys, "argv", [
        "bench", "--total_rank", "64", "--num_heads", "8", "--head_dim", "64",
        "--group_size", "4", "--target_seq_lens", "128",
        "--block_s", "64", "--providers", "xla", "--json",
    ])
    from palu_tpu.cli.run_latency_kernel import main

    rows = main()
    assert rows and "xla_us" in rows[0]
