"""Eval-harness tests: metric functions, scorer, windowed ppl, LongBench
runner and zero-shot harness on offline fixtures."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.core.quant import QuantConfig
from palu_tpu.evals import metrics
from palu_tpu.evals import scorer as _s
import importlib
scorer_mod = importlib.import_module('palu_tpu.evals.scorer')
from palu_tpu.evals.longbench import build_prompt, run_longbench, truncate_middle
from palu_tpu.evals.ppl import eval_ppl_on_tokens
from palu_tpu.evals.zero_shot import loglikelihood_batch, run_zero_shot
from palu_tpu.models import ModelConfig, llama
from palu_tpu.runtime.engine import Engine, EngineConfig


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_qa_f1():
    assert metrics.qa_f1_score("The answer is Paris", "Paris") > 0
    assert metrics.qa_f1_score("Paris", "Paris") == 1.0
    assert metrics.qa_f1_score("London", "Paris") == 0.0


def test_count_and_retrieval():
    assert metrics.count_score("there are 7 passages", "7") == 1.0
    assert metrics.count_score("maybe 3 or 7", "7") == 0.5
    assert metrics.retrieval_score("Paragraph 12", "Paragraph 12") == 1.0


def test_classification():
    s = metrics.classification_score(
        "This is about Location", "Location", all_classes=["Location", "Person"]
    )
    assert s == 1.0
    # no class matched -> 0.0: the reference's difflib fallback is DEAD
    # (`if em_match_list != 0:` is always true for a list,
    # /root/reference/longbench_utils/metrics.py:97); we pin its actual
    # behavior, not the apparent intent (docs/PARITY.md)
    s = metrics.classification_score(
        "totally unrelated", "Person", all_classes=["Location", "Person"]
    )
    assert s == 0.0
    # a prediction naming several classes splits credit (1/len)
    s = metrics.classification_score(
        "Location or Person", "Person", all_classes=["Location", "Person"]
    )
    assert s == 0.5


def test_rouge_and_code_sim():
    assert metrics.rouge_score("the cat sat on the mat", "the cat sat on the mat") > 0.99
    assert metrics.code_sim_score("return x + 1", "return x + 1") == 1.0
    assert metrics.code_sim_score("# comment\nreturn x + 1", "return x + 1") == 1.0


def test_scorer_firstline_handling():
    out = scorer_mod.scorer("triviaqa", ["\nParis\nextra junk"], [["Paris"]], None)
    assert out == 100.0


def test_scorer_e_buckets():
    out = scorer_mod.scorer_e(
        "qasper", ["yes", "no"], [["yes"], ["yes"]], [1000, 9000], None
    )
    assert out["0-4k"] == 100.0
    assert out["8k+"] == 0.0


# ---------------------------------------------------------------------------
# model-based evals (tiny random model, offline fixtures)
# ---------------------------------------------------------------------------


def _tiny_model():
    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
    )
    return llama.init_params(cfg, jax.random.key(0)), cfg


class _FakeTokenizer:
    eos_token_id = 0

    def __call__(self, text, return_tensors=None):
        ids = np.asarray([[(ord(c) % 60) + 2 for c in text[:100]]], dtype=np.int32)
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(i)) for i in ids)


def test_eval_ppl_on_tokens_runs_and_quant_hurts():
    params, cfg = _tiny_model()
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 4 * 32))
    ppl = eval_ppl_on_tokens(params, cfg, tokens, seqlen=32, progress=False)
    assert np.isfinite(ppl) and ppl > 1.0
    # same tokens -> deterministic
    ppl2 = eval_ppl_on_tokens(params, cfg, tokens, seqlen=32, progress=False)
    assert ppl == ppl2


def test_truncate_middle():
    t = np.arange(100)[None, :]
    out = truncate_middle(t, 10)
    assert out.shape[1] == 10
    assert list(out[0, :5]) == [0, 1, 2, 3, 4]
    assert list(out[0, 5:]) == [95, 96, 97, 98, 99]
    assert truncate_middle(t, 200).shape[1] == 100


def test_run_longbench_with_fixture():
    params, cfg = _tiny_model()
    eng = Engine(params, cfg, EngineConfig(s_max=128, dtype=jnp.float32, decode_chunk=16))
    tok = _FakeTokenizer()

    def loader(name):
        return [
            {"context": "some context here", "input": "what?", "answers": ["4 5"],
             "all_classes": None},
        ]

    results = run_longbench(
        eng, tok, datasets=["qasper"], max_prompt_len=64, data_loader=loader
    )
    assert "qasper" in results
    assert 0.0 <= results["qasper"] <= 100.0


def test_loglikelihood_batch_orders_correct_continuation():
    """A continuation the model assigns high probability must outrank a
    random one. Construct via the model's own greedy continuation."""
    params, cfg = _tiny_model()
    ctx = list(np.random.default_rng(1).integers(2, cfg.vocab_size, 8))
    # model's greedy next tokens
    ids = jnp.asarray([ctx])
    logits = llama.forward(params, ids, cfg)
    greedy = int(jnp.argmax(logits[0, -1]))
    good = (ctx, [greedy])
    bad_tok = (greedy + 7) % cfg.vocab_size
    bad = (ctx, [bad_tok])
    out = loglikelihood_batch(params, cfg, [good, bad])
    assert out[0][0] > out[1][0]
    assert out[0][1]  # greedy match flag


def test_run_zero_shot_with_fixture():
    params, cfg = _tiny_model()
    tok = _FakeTokenizer()

    def loader(task):
        return [
            {"goal": "pick a", "sol1": "aaaa", "sol2": "bbbb", "label": 0},
            {"goal": "pick b", "sol1": "cccc", "sol2": "dddd", "label": 1},
        ]

    res = run_zero_shot(params, cfg, tok, tasks=["piqa"], data_loader=loader)
    assert "piqa" in res
    assert 0.0 <= res["piqa"]["acc"] <= 1.0
    assert 0.0 <= res["piqa"]["acc_norm"] <= 1.0


def test_sampling():
    import jax as _jax
    from palu_tpu.runtime.sampling import SamplingParams, sample

    logits = jnp.asarray(np.array([[0.0, 5.0, 1.0, -2.0]] * 2, np.float32))
    # greedy
    out = sample(logits, SamplingParams(temperature=0.0))
    assert out.tolist() == [1, 1]
    # temperature sampling stays within top-k support
    key = _jax.random.key(0)
    out = sample(logits, SamplingParams(temperature=1.0, top_k=2), key)
    assert all(t in (1, 2) for t in out.tolist())
    # top-p=tiny keeps only the argmax
    out = sample(logits, SamplingParams(temperature=1.0, top_p=0.01), key)
    assert out.tolist() == [1, 1]


def test_lm_eval_adapter_gates_cleanly():
    from palu_tpu.evals import lm_eval_adapter

    params, cfg = _tiny_model()
    lm = lm_eval_adapter.JaxLM(params, cfg, _FakeTokenizer())
    assert lm.max_length == 2048
    if not lm_eval_adapter._HAVE_LM_EVAL:
        with pytest.raises(ImportError):
            lm_eval_adapter.simple_evaluate(params, cfg, _FakeTokenizer(), ["piqa"])


def test_loglikelihood_batch_buckets_compile_count():
    """Many distinct request lengths must map to O(#buckets) jitted shapes
    (per-length recompiles are unusable on TPU where compiles cost minutes)."""
    from palu_tpu.evals import zero_shot as zs

    params, cfg = _tiny_model()
    rng = np.random.default_rng(0)
    reqs = []
    for n in range(3, 40):  # 37 distinct total lengths
        ctx = list(rng.integers(2, cfg.vocab_size, n))
        reqs.append((ctx, [int(rng.integers(2, cfg.vocab_size))]))
    before = set(zs._LL_SHAPES)
    out = loglikelihood_batch(params, cfg, reqs)
    new_shapes = set(zs._LL_SHAPES) - before
    # lengths 4..41 -> buckets {32, 64} only
    assert len(new_shapes) <= 2, new_shapes
    assert len(out) == len(reqs) and all(np.isfinite(s) for s, _ in out)
    # jitted scorer is cached per (cfg, qcfg): same fn object on re-entry
    assert zs._ll_fn(cfg, None) is zs._ll_fn(cfg, None)


def test_loglikelihood_batch_bucketing_matches_unpadded():
    """Padding to a bucket + batching must not change the scores."""
    params, cfg = _tiny_model()
    rng = np.random.default_rng(2)
    reqs = []
    for n in (5, 9, 17):
        ctx = list(rng.integers(2, cfg.vocab_size, n))
        reqs.append((ctx, list(rng.integers(2, cfg.vocab_size, 2))))
    batched = loglikelihood_batch(params, cfg, reqs, batch_size=8)
    single = loglikelihood_batch(params, cfg, reqs, batch_size=1)
    for (s1, e1), (s2, e2) in zip(batched, single):
        assert abs(s1 - s2) < 1e-3
        assert e1 == e2


def test_prefill_bucketed_matches_exact():
    """Right-padded bucket prefill must produce the same last-token logits
    and the same decode continuation as exact-length prefill."""
    params, cfg = _tiny_model()
    eng = Engine(params, cfg, EngineConfig(s_max=64, dtype=jnp.float32, decode_chunk=16))
    ids = np.random.default_rng(3).integers(2, cfg.vocab_size, (1, 11))
    lg_exact, c_exact = eng.prefill(jnp.asarray(ids))
    lg_bucket, c_bucket = eng.prefill_bucketed(ids)
    np.testing.assert_allclose(
        np.asarray(lg_exact), np.asarray(lg_bucket), rtol=1e-4, atol=1e-4
    )
    assert int(c_bucket["length"][0]) == 11
    tok = np.asarray([[5]])
    d1, _ = eng.decode(tok, c_exact)
    d2, _ = eng.decode(tok, c_bucket)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-4)


def test_generate_until_stops_at_string():
    from palu_tpu.evals.lm_eval_adapter import JaxLM

    params, cfg = _tiny_model()
    tok = _FakeTokenizer()
    lm = JaxLM(params, cfg, tok, max_length=64)

    class _Req:
        def __init__(self, args):
            self.args = args

    outs = lm.generate_until([_Req(("hello there", {"until": [" "], "max_gen_toks": 6}))])
    assert len(outs) == 1
    assert " " not in outs[0]


def test_build_chat_families():
    from palu_tpu.evals.longbench import build_chat, post_process

    tok = _FakeTokenizer()
    assert build_chat(tok, "hi", "llama-2-7b-chat") == "[INST]hi[/INST]"
    v = build_chat(tok, "hi", "vicuna-13b")
    assert v.startswith("A chat between") and v.endswith("ASSISTANT:")
    x = build_chat(tok, "hi", "xgen-7b")
    assert "### Human: hi" in x
    assert build_chat(tok, "hi", "internlm-7b").startswith("<|User|>:hi")
    # no template and no chat_template attr -> passthrough
    assert build_chat(tok, "hi", "plainmodel") == "hi"
    assert post_process("foo<eoa>bar", "internlm") == "foo"
    assert post_process(" Assistant: yes", "xgen-7b") == " yes"


def test_hadamard_williamson_and_fallback_orders():
    from palu_tpu.core import hadamard as hm

    H = hm.hadamard_matrix(92)  # Williamson construction, exact
    assert (H.astype(np.int64) @ H.astype(np.int64).T == 92 * np.eye(92)).all()
    for n in (736, 1248, 1376):  # select K = 92 / 156 / 172
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, n)), jnp.float32)
        y = hm.apply_hadamard(x)
        back = hm.apply_hadamard(y, transpose=True)
        assert float(jnp.abs(back - x).max()) < 1e-5
        # orthonormal: norms preserved
        assert abs(float(jnp.linalg.norm(y) / jnp.linalg.norm(x)) - 1.0) < 1e-5
