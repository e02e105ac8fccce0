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


def test_compress_cli_fisher_whiten_then_ppl(tmp_path, monkeypatch):
    """The reference's canonical workflow fully offline: random checkpoint +
    freshly trained BPE tokenizer + local corpus -> compress CLI
    (fisher_uniform search, whiten decomposition, 3-bit Hadamard-ready
    output) -> reload -> ppl eval CLI on the same corpus (reference flow:
    compress.py then run_ppl_eval.py)."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    torch.manual_seed(1)
    src_dir = str(tmp_path / "dense")
    LlamaForCausalLM(
        LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=4, max_position_embeddings=256)
    ).float().save_pretrained(src_dir, safe_serialization=True)

    # offline corpus + tokenizer (no-egress analog of wikitext2 calibration)
    corpus = str(tmp_path / "corpus.txt")
    with open(__file__) as f:
        text = f.read() * 8
    with open(corpus, "w") as f:
        f.write(text)
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        [text], trainers.BpeTrainer(vocab_size=500,
                                    special_tokens=["<unk>", "<s>", "</s>"]))
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>").save_pretrained(src_dir)

    out_dir = str(tmp_path / "palu")
    monkeypatch.setattr(sys, "argv", [
        "compress", "--model_name_or_path", src_dir, "--output_dir", out_dir,
        "--param_ratio_target", "0.8", "--search_method", "fisher_uniform",
        "--decompose_method", "whiten", "--head_group_size", "2",
        "--local_text_path", corpus, "--n_fisher_calib_samples", "2",
        "--n_whiten_calib_samples", "2", "--calib_seqlen", "64",
    ])
    from palu_tpu.cli.compress import main as compress_main

    compress_main()

    with open(os.path.join(out_dir, "config.json")) as f:
        conf = json.load(f)
    assert conf["model_type"] == "palullama"
    assert conf["head_wise_ranks"]

    monkeypatch.setattr(sys, "argv", [
        "run_ppl_eval", "--model_name_or_path", out_dir,
        "--datasets", "wikitext2", "--seqlen", "64",
        "--local_text_path", corpus, "--lt_bits", "3", "--lt_hadamard",
        "--use_cpu",
    ])
    from palu_tpu.cli.run_ppl_eval import main as ppl_main

    ppl_main()


def test_run_latency_attention_cli_smoke(tmp_path, monkeypatch, capsys):
    """TPOT profiler CLI on tiny shapes (reference protocol:
    run_latency_attention.py:57-106), both palu and dense baseline."""
    for extra in (["--palu"], []):
        monkeypatch.setattr(sys, "argv", [
            "run_latency_attention", "--prompt_len", "64", "--n_steps", "2",
            "--num_heads", "8", "--head_dim", "64", "--vocab_size", "128",
            "--group_size", "2", "--total_rank_k", "64", "--total_rank_v", "64",
            "--decode_chunk", "32", "--no_pallas", "--json", *extra,
        ])
        from palu_tpu.cli.run_latency_attention import main

        main()
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert rec["tpot_ms"] > 0


def test_serve_bench_cli_smoke(monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", [
        "serve_bench", "--num_requests", "3", "--lanes", "2",
        "--prompt_len", "16", "--max_new_tokens", "4", "--s_max", "64",
        "--num_layers", "1", "--num_heads", "4", "--head_dim", "32",
        "--group_size", "2", "--rank", "16", "--vocab_size", "64",
        "--decode_chunk", "32", "--use_cpu", "--json",
        "--weight_bits", "8",
    ])
    from palu_tpu.cli.serve_bench import main

    main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["requests"] == 3 and rec["total_tokens"] > 0


def test_run_long_bench_cli_offline_fixture(tmp_path, monkeypatch, capsys):
    """LongBench CLI end to end with --fixture_dir (no dataset downloads):
    tiny compressed ckpt + trained tokenizer -> generation -> scoring."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    torch.manual_seed(2)
    src = str(tmp_path / "dense")
    LlamaForCausalLM(
        LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=4, max_position_embeddings=256)
    ).float().save_pretrained(src, safe_serialization=True)
    text = open(__file__).read()
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        [text], trainers.BpeTrainer(vocab_size=500,
                                    special_tokens=["<unk>", "<s>", "</s>"]))
    PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                            bos_token="<s>", eos_token="</s>").save_pretrained(src)

    out_dir = str(tmp_path / "palu")
    monkeypatch.setattr(sys, "argv", [
        "compress", "--model_name_or_path", src, "--output_dir", out_dir,
        "--param_ratio_target", "0.9", "--search_method", "uniform",
        "--decompose_method", "svd", "--head_group_size", "2",
    ])
    from palu_tpu.cli.compress import main as compress_main

    compress_main()
    # tokenizer files travel with the eval checkpoint
    import shutil
    for f in ("tokenizer.json", "tokenizer_config.json", "special_tokens_map.json"):
        p = os.path.join(src, f)
        if os.path.exists(p):
            shutil.copy(p, out_dir)

    fx = tmp_path / "fixtures"
    fx.mkdir()
    with open(fx / "trec.jsonl", "w") as f:
        for q in ("what is a palu cache", "where does the latent live"):
            f.write(json.dumps({
                "context": "", "input": q, "answers": ["test"],
                "all_classes": ["test", "other"],
            }) + "\n")

    out_path = str(tmp_path / "lb.jsonl")
    monkeypatch.setattr(sys, "argv", [
        "run_long_bench", "--model_name_or_path", out_dir,
        "--datasets", "trec", "--s_max", "128", "--max_prompt_len", "64",
        "--fixture_dir", str(fx), "--output_path", out_path, "--use_cpu",
    ])
    from palu_tpu.cli.run_long_bench import main as lb_main

    lb_main()
    assert "trec:" in capsys.readouterr().out
    assert os.path.exists(out_path)


def test_run_lm_eval_cli_offline_fixture(tmp_path, monkeypatch, capsys):
    """Zero-shot CLI with --fixture_dir piqa rows (no downloads)."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    torch.manual_seed(4)
    src = str(tmp_path / "dense")
    LlamaForCausalLM(
        LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=4, max_position_embeddings=256)
    ).float().save_pretrained(src, safe_serialization=True)
    text = open(__file__).read()
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        [text], trainers.BpeTrainer(vocab_size=500,
                                    special_tokens=["<unk>", "<s>", "</s>"]))
    PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                            bos_token="<s>", eos_token="</s>").save_pretrained(src)

    fx = tmp_path / "fixtures"
    fx.mkdir()
    with open(fx / "piqa.jsonl", "w") as f:
        f.write(json.dumps({"goal": "pick a", "sol1": "aaaa", "sol2": "bbbb",
                            "label": 0}) + "\n")
        f.write(json.dumps({"goal": "pick b", "sol1": "cccc", "sol2": "dddd",
                            "label": 1}) + "\n")

    out_dir = str(tmp_path / "results")
    monkeypatch.setattr(sys, "argv", [
        "run_lm_eval", "--model_name_or_path", src, "--tasks", "piqa",
        "--fixture_dir", str(fx), "--output_dir", out_dir, "--use_cpu",
    ])
    from palu_tpu.cli.run_lm_eval import main as lm_main

    lm_main()
    rec = json.loads(capsys.readouterr().out)
    assert 0.0 <= rec["piqa"]["acc"] <= 1.0
    assert os.path.exists(os.path.join(out_dir, "dense_16.json"))
