"""Layer-stacked scanned decode (EngineConfig.stacked_decode) must be
bit-for-bit the same math as the per-layer unrolled engine: same cache
contents (modulo layout), same logits at every step. The stacked mode is
the production full-model decode path (one HLO layer body + the v4
kernel's scalar-prefetched layer index; docs/BENCH.md full-model
decomposition) -- these tests pin it to the reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.core.quant import QuantConfig
from palu_tpu.runtime.engine import Engine, EngineConfig

from test_engine import _lowrank_model


def _engine_pair(params, cfg, qcfg=None, rank_major_fp=False, batch=1,
                 s_max=32, weight_bits=16):
    kw = dict(
        s_max=s_max, batch=batch, dtype=jnp.float32, qcfg=qcfg,
        decode_chunk=8, use_pallas=True, pallas_interpret=True,
        rank_major_fp=rank_major_fp, weight_bits=weight_bits,
    )
    unrolled = Engine(params, cfg, EngineConfig(**kw, stacked_decode=False))
    stacked = Engine(params, cfg, EngineConfig(**kw, stacked_decode=True))
    assert stacked._stacked and not unrolled._stacked
    return unrolled, stacked


def _run_pair(unrolled, stacked, ids, n_decode=5):
    """prefill_chunked + greedy-style forced decode on both engines;
    returns stacked per-step logits for each."""
    outs = []
    for eng in (unrolled, stacked):
        logits, cache = eng.prefill_chunked(ids, chunk_size=8)
        steps = [np.asarray(logits[:, -1])]
        rng = np.random.default_rng(7)
        for _ in range(n_decode):
            tok = rng.integers(0, 16, (ids.shape[0], 1))
            logits, cache = eng.decode(jnp.asarray(tok, jnp.int32), cache)
            steps.append(np.asarray(logits[:, -1]))
        outs.append(np.stack(steps, axis=1))
    return outs


@pytest.mark.parametrize(
    "qcfg,rank_major_fp",
    [
        (QuantConfig(bits=3, group_size=0, sym=True), False),
        (QuantConfig(bits=3, group_size=0, sym=True, container=4), False),
        (QuantConfig(bits=4, group_size=0, sym=False), False),
        (QuantConfig(bits=4, group_size=8, sym=True), False),
        (QuantConfig(bits=3, group_size=8, sym=False), False),
        (None, True),
    ],
    ids=["3b-sym", "3b-in-4", "4b-asym", "4b-chunked", "3b-chunked-asym",
         "fp-rank-major"],
)
def test_stacked_decode_matches_unrolled(qcfg, rank_major_fp):
    params, cfg = _lowrank_model(rank=16, gs=2)
    unrolled, stacked = _engine_pair(params, cfg, qcfg=qcfg,
                                     rank_major_fp=rank_major_fp)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 12))
    ref, got = _run_pair(unrolled, stacked, ids)
    assert ref.shape == got.shape
    assert np.allclose(ref, got, atol=2e-4), np.abs(ref - got).max()


def test_stacked_oneshot_prefill_matches_unrolled():
    """Engine.prefill (one-shot accuracy path) works on stacked engines and
    matches the unrolled engine, including right-padded prompts."""
    params, cfg = _lowrank_model(rank=16, gs=2)
    qcfg = QuantConfig(bits=4, group_size=0, sym=False)
    unrolled, stacked = _engine_pair(params, cfg, qcfg=qcfg)
    ids = np.random.default_rng(5).integers(0, cfg.vocab_size, (1, 16))
    outs = []
    for eng in (unrolled, stacked):
        logits, cache = eng.prefill(ids, real_len=12)
        steps = [np.asarray(logits[:, -1])]
        for t in range(3):
            logits, cache = eng.decode(
                jnp.asarray([[7 + t]], jnp.int32), cache)
            steps.append(np.asarray(logits[:, -1]))
        outs.append((np.stack(steps, 1), np.asarray(cache["length"])))
    assert np.array_equal(outs[0][1], outs[1][1])
    assert np.allclose(outs[0][0], outs[1][0], atol=2e-4), np.abs(
        outs[0][0] - outs[1][0]).max()


def test_stacked_decode_batched_lanes_and_masking():
    """active-mask semantics must match: inactive lanes freeze (length and
    cache), active lanes advance -- per lane, exactly as unrolled."""
    params, cfg = _lowrank_model(rank=16, gs=2)
    qcfg = QuantConfig(bits=4, group_size=0, sym=True)
    unrolled, stacked = _engine_pair(params, cfg, qcfg=qcfg, batch=2)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 8))
    caches, logitss = [], []
    for eng in (unrolled, stacked):
        logits, cache = eng.prefill_chunked(ids, chunk_size=8)
        active = jnp.asarray([True, False])
        for t in range(3):
            tok = jnp.asarray([[3 + t], [5]], jnp.int32)
            logits, cache = eng.decode(tok, cache, active=active)
        caches.append(cache)
        logitss.append(np.asarray(logits))
    assert np.array_equal(np.asarray(caches[0]["length"]),
                          np.asarray(caches[1]["length"]))
    assert np.asarray(caches[0]["length"]).tolist() == [11, 8]
    assert np.allclose(logitss[0], logitss[1], atol=2e-4)


def test_stacked_generate_matches_unrolled():
    params, cfg = _lowrank_model(rank=16, gs=2)
    qcfg = QuantConfig(bits=3, group_size=0, sym=True)
    unrolled, stacked = _engine_pair(params, cfg, qcfg=qcfg)
    ids = np.random.default_rng(2).integers(0, cfg.vocab_size, (1, 9))
    a = unrolled.generate(ids, max_new_tokens=6)
    b = stacked.generate(ids, max_new_tokens=6)
    assert np.array_equal(a, b), (a, b)


def test_stacked_weight_bits8_matches_unrolled_int8():
    """int8 weight storage composes with stacking (stacked int8 codes +
    scales ride the scan xs)."""
    params, cfg = _lowrank_model(rank=16, gs=2)
    qcfg = QuantConfig(bits=4, group_size=0, sym=True)
    unrolled, stacked = _engine_pair(params, cfg, qcfg=qcfg, weight_bits=8)
    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, (1, 10))
    ref, got = _run_pair(unrolled, stacked, ids, n_decode=3)
    assert np.allclose(ref, got, atol=2e-4), np.abs(ref - got).max()


def test_stacked_eligibility_and_default():
    params, cfg = _lowrank_model(rank=16, gs=2)
    rm = QuantConfig(bits=3, group_size=0, sym=True)
    base = dict(s_max=32, dtype=jnp.float32, decode_chunk=8,
                pallas_interpret=True)
    # default (None) resolves to the unrolled decode (faster on chip,
    # EngineConfig.stacked_decode) but the config IS eligible
    eng = Engine(params, cfg, EngineConfig(**base, use_pallas=True, qcfg=rm))
    assert not eng._stacked
    assert eng._stacked_ineligible_reason() is None
    # forcing it on an eligible config works
    eng = Engine(params, cfg, EngineConfig(**base, use_pallas=True, qcfg=rm,
                                           stacked_decode=True))
    assert eng._stacked
    # ineligible: no pallas / seq-major fp cache
    eng = Engine(params, cfg, EngineConfig(**base, use_pallas=False, qcfg=rm))
    assert eng._stacked_ineligible_reason() is not None
    # forcing it for an ineligible config raises with the reason
    with pytest.raises(ValueError, match="rank_major_fp"):
        Engine(params, cfg,
               EngineConfig(**base, use_pallas=True, stacked_decode=True))


def test_stacked_from_prestacked_params():
    """An engine built from another stacked engine's params (the
    ServingEngine shared-params pattern) must produce identical logits."""
    params, cfg = _lowrank_model(rank=16, gs=2)
    qcfg = QuantConfig(bits=4, group_size=0, sym=True)
    _, stacked = _engine_pair(params, cfg, qcfg=qcfg)
    again = Engine(stacked.params, stacked.cfg, stacked.ecfg)
    assert again._stacked
    ids = np.random.default_rng(4).integers(0, cfg.vocab_size, (1, 10))
    ref, got = _run_pair(stacked, again, ids, n_decode=3)
    assert np.allclose(ref, got, atol=1e-6)


def test_stacked_profiler_chained():
    """profile_tpot_chained drives the stacked engine end-to-end (the
    BASELINE measurement path, tools/tpu_engine_bench.py)."""
    from palu_tpu.runtime import profiler

    params, cfg = _lowrank_model(rank=16, gs=2)
    qcfg = QuantConfig(bits=3, group_size=0, sym=True)
    _, stacked = _engine_pair(params, cfg, qcfg=qcfg)
    res = profiler.profile_tpot_chained(stacked, 8, n_steps=3, k_calls=2,
                                        reps=1)
    assert np.isfinite(res["tpot_ms"]) and res["tpot_ms"] > 0


def test_stacked_qwen2_bias_matches_unrolled():
    """qwen2 k/v biases auto-stack (homogeneous across layers): the scanned
    body passes the stacked k_bias into the kernel and adds the stacked
    o_bias_corr after the fused o_proj."""
    from test_engine import _qwen2_bias_model

    lr_params, lr_cfg = _qwen2_bias_model(seed=41)
    qcfg = QuantConfig(bits=4, group_size=0, sym=False)
    unrolled, stacked = _engine_pair(lr_params, lr_cfg, qcfg=qcfg)
    assert stacked._kbias_stack is not None
    assert stacked._ocorr_stack is not None
    ids = np.random.default_rng(41).integers(0, lr_cfg.vocab_size, (1, 12))
    ref, got = _run_pair(unrolled, stacked, ids)
    assert np.allclose(ref, got, atol=5e-4), np.abs(ref - got).max()


def test_stacked_qwen2_prestacked_rebuild():
    """Engine rebuilt from a stacked qwen2 engine's params re-derives the
    k_bias / o_bias_corr stacks from the stacked weights themselves."""
    from test_engine import _qwen2_bias_model

    lr_params, lr_cfg = _qwen2_bias_model(seed=43)
    qcfg = QuantConfig(bits=4, group_size=0, sym=True)
    _, stacked = _engine_pair(lr_params, lr_cfg, qcfg=qcfg)
    again = Engine(stacked.params, stacked.cfg, stacked.ecfg)
    assert again._kbias_stack is not None and again._ocorr_stack is not None
    ids = np.random.default_rng(43).integers(0, lr_cfg.vocab_size, (1, 10))
    ref, got = _run_pair(stacked, again, ids, n_decode=3)
    assert np.allclose(ref, got, atol=1e-5), np.abs(ref - got).max()


def test_stacked_scaled_rope_matches_unrolled():
    import dataclasses as dc

    from test_engine import _lowrank_model as _lm

    params, cfg = _lm(seed=45, rank=16, gs=2)
    cfg = dc.replace(cfg, rope_scaling={"rope_type": "linear", "factor": 2.0})
    qcfg = QuantConfig(bits=3, group_size=0, sym=True)
    unrolled, stacked = _engine_pair(params, cfg, qcfg=qcfg)
    assert stacked._inv_freq_static is not None
    ids = np.random.default_rng(45).integers(0, cfg.vocab_size, (1, 12))
    ref, got = _run_pair(unrolled, stacked, ids)
    assert np.allclose(ref, got, atol=2e-4), np.abs(ref - got).max()
