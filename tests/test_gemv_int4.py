"""Int4 weight-only storage (core/wquant.quantize_weight4 +
ops/pallas/gemv_int4): packing round-trip, kernel parity vs the XLA
dequant path, MLP dispatch, and the weight_bits=4 engine against an
explicitly dequantized reference engine.

The reference has no weight-quantization story (its latency track is one
attention module, run_latency_attention.py); this extends the wquant int8
feature one step down for the decode GEMV chain (docs/BENCH.md round-4
decomposition: ~8.6 ms/step of weight bytes at int8 width at 7B/64K)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.core import wquant
from palu_tpu.ops.pallas.gemv_int4 import gemv_int4, mlp_gemv_int4

from test_engine import _lowrank_model, _stepwise_logits  # noqa: E402
from palu_tpu.runtime.engine import Engine, EngineConfig  # noqa: E402


def _rand(shape, seed=0, s=0.05):
    return np.random.default_rng(seed).standard_normal(
        shape, dtype=np.float32) * s


def test_pack_roundtrip_error_bound():
    w = _rand((512, 384), 1)
    q4 = wquant.quantize_weight4(w)
    assert q4["wq4"].shape == (256, 384) and q4["wq4"].dtype == jnp.uint8
    assert q4["ws"].shape == (4, 384)
    wd = np.asarray(wquant.unpack_weight4(q4))
    # per-element error is at most half a quantization step (s = gmax/7)
    gmax = np.abs(w.reshape(4, 128, 384)).max(axis=1)
    step = np.repeat(gmax / 7.0, 128, axis=0)
    assert (np.abs(wd - w) <= 0.5 * step + 1e-6).all()


def test_small_in_dim_shrinks_group():
    w = _rand((32, 48), 2)
    q4 = wquant.quantize_weight4(w)
    assert wquant.w4_group(q4) < 128
    wd = np.asarray(wquant.unpack_weight4(q4))
    assert np.abs(wd - w).max() < np.abs(w).max() * 0.1


def test_gemv_int4_matches_xla_dequant():
    w = _rand((512, 384), 3)
    q4 = wquant.quantize_weight4(w)
    x = jnp.asarray(_rand((2, 512), 4, 0.1))
    ref = x @ wquant.unpack_weight4(q4).astype(x.dtype)
    got = gemv_int4(x, q4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mlp_gemv_int4_matches_dequant():
    H, I = 512, 768
    wg = wquant.quantize_weight4(_rand((H, I), 5))
    wu = wquant.quantize_weight4(_rand((H, I), 6))
    wd = wquant.quantize_weight4(_rand((I, H), 7))
    x = jnp.asarray(_rand((1, H), 8, 0.1), jnp.bfloat16)
    g = x.astype(jnp.float32) @ wquant.unpack_weight4(wg)
    u = x.astype(jnp.float32) @ wquant.unpack_weight4(wu)
    h = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    ref = (h.astype(jnp.float32) @ wquant.unpack_weight4(wd)).astype(
        jnp.bfloat16)
    got = mlp_gemv_int4(x, wg, wu, wd, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=1e-3)


def test_wdot_wq4_xla_path():
    w = _rand((256, 128), 9)
    q4 = wquant.quantize_weight4(w)
    x = jnp.asarray(_rand((4, 256), 10, 0.1))
    ref = x @ wquant.unpack_weight4(q4).astype(x.dtype)
    got = wquant.wdot(x, q4)  # CPU backend -> XLA path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_quantize_params_bits4_leaves_vt_int8():
    params, cfg = _lowrank_model(rank=8, gs=2)
    p4 = wquant.quantize_params(params, vt=True, bits=4)
    l0 = p4["layers"][0]
    assert "wq4" in l0["mlp"]["gate"]
    assert "wq4" in l0["attn"]["q_proj"]["w"]
    # VT stays int8 regardless of bits (accuracy-critical low-rank path)
    assert "wq8" in l0["attn"]["k_proj"]["VT"]
    assert "wq4" in p4["lm_head"]


def test_engine_weight_bits4_matches_dequantized_reference():
    """weight_bits=4 engine == fp engine run on explicitly dequantized
    int4 params (same pattern as the weight_bits=8 golden test)."""
    params, cfg = _lowrank_model(rank=8, gs=2)
    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, (1, 12))
    ecfg = EngineConfig(s_max=16, dtype=jnp.float32, decode_chunk=8)
    eng4 = Engine(params, cfg, dataclasses.replace(ecfg, weight_bits=4))
    s4 = _stepwise_logits(eng4, ids)

    p4 = wquant.quantize_params(params, bits=4)
    pd = jax.tree_util.tree_map(
        lambda l: wquant.unpack_weight4(l)
        if isinstance(l, dict) and "wq4" in l else l,
        p4, is_leaf=lambda l: isinstance(l, dict) and "wq4" in l)
    engd = Engine(pd, cfg, ecfg)
    sd = _stepwise_logits(engd, ids)
    np.testing.assert_allclose(s4, sd, atol=5e-6)


def test_engine_weight_bits4_with_vt8_and_embed8():
    params, cfg = _lowrank_model(rank=8, gs=2)
    ids = np.random.default_rng(5).integers(0, cfg.vocab_size, (1, 10))
    ecfg = EngineConfig(s_max=16, dtype=jnp.float32, decode_chunk=8,
                        weight_bits=4, vt_bits=8, embed_bits=8)
    eng = Engine(params, cfg, ecfg)
    out = eng.generate(ids, max_new_tokens=4)
    assert out.shape == (1, 4)


def test_weight_bits4_validation():
    params, cfg = _lowrank_model(rank=8, gs=2)
    with pytest.raises(ValueError, match="weight_bits"):
        Engine(params, cfg, EngineConfig(s_max=16, weight_bits=5))
