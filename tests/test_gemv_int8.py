"""Differential tests for the int8 weight-only GEMV kernels
(ops/pallas/gemv_int8) against the XLA `wquant.wdot` reference the engine
uses everywhere else."""

import numpy as np
import jax.numpy as jnp
import pytest

from palu_tpu.core import wquant
from palu_tpu.ops.pallas.gemv_int8 import gemv_int8, mlp_gemv_int8, pick_block


def _qw(rng, k, n, s=0.02):
    return wquant.quantize_weight(
        jnp.asarray(rng.standard_normal((k, n)) * s, jnp.float32))


def _mlp_ref(x, wg, wu, wd):
    gate = wquant.wdot(x, wg)
    up = wquant.wdot(x, wu)
    return wquant.wdot(jnp.asarray(
        jnp.asarray(gate, jnp.float32) * (1 / (1 + np.exp(-np.asarray(gate, np.float32))))
        * np.asarray(up, np.float32), x.dtype), wd)


def test_pick_block():
    assert pick_block(11008) == 256  # 86 * 128: no 512-divisor
    assert pick_block(4096) == 512
    assert pick_block(14336) == 512
    with pytest.raises(ValueError):
        pick_block(100)


@pytest.mark.parametrize("b", [1, 4])
def test_gemv_matches_wdot(b):
    rng = np.random.default_rng(0)
    k, n = 256, 384
    w = _qw(rng, k, n)
    x = jnp.asarray(rng.standard_normal((b, k)) * 0.1, jnp.bfloat16)
    ref = wquant.wdot(x, w)
    out = gemv_int8(x, w, block_n=128, interpret=True)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2)


@pytest.mark.parametrize("b", [1, 2])
def test_mlp_matches_wdot_chain(b):
    rng = np.random.default_rng(1)
    h, inter = 256, 640  # 5 * 128: exercises a non-power-of-two tile count
    wg, wu = _qw(rng, h, inter), _qw(rng, h, inter)
    wd = _qw(rng, inter, h)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.1, jnp.bfloat16)

    import palu_tpu.models.llama as llama
    ref = llama.mlp_forward(x, {"gate": wg, "up": wu, "down": wd})
    out = mlp_gemv_int8(x, wg, wu, wd, block_n=128, interpret=True)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2)


def test_mlp_fp32_accuracy():
    """fp32 activations: the kernel's fp32 accumulate should track a float64
    reference closely (the int8 codes are exact in bf16/fp32)."""
    rng = np.random.default_rng(2)
    h, inter = 128, 256
    wg, wu = _qw(rng, h, inter), _qw(rng, h, inter)
    wd = _qw(rng, inter, h)
    x = jnp.asarray(rng.standard_normal((1, h)) * 0.1, jnp.float32)
    out = mlp_gemv_int8(x, wg, wu, wd, block_n=128, interpret=True)

    def deq(w):
        return np.asarray(w["wq8"], np.float64) * np.asarray(w["ws"], np.float64)

    xf = np.asarray(x, np.float64)
    g = xf @ deq(wg)
    u = xf @ deq(wu)
    refd = (g / (1 + np.exp(-g)) * u) @ deq(wd)
    np.testing.assert_allclose(np.asarray(out, np.float64), refd,
                               rtol=0, atol=1e-4)


def test_engine_decode_dispatches_mlp_kernel(monkeypatch):
    """With PALU_GEMV_KERNEL=force a weight_bits=8 engine's decode runs the
    fused Pallas MLP (interpret mode off-TPU) and must produce the same
    tokens as the XLA wdot chain."""
    import dataclasses
    import jax

    from palu_tpu.runtime.engine import Engine, EngineConfig
    from tests.test_engine import _lowrank_model

    params, cfg = _lowrank_model(seed=11, rank=8, gs=2, intermediate_size=128)
    # the kernel path requires inter % 128 == 0
    assert params["layers"][0]["mlp"]["gate"].shape[1] % 128 == 0
    ids = np.random.default_rng(11).integers(0, cfg.vocab_size, (1, 12))
    ecfg = EngineConfig(s_max=32, dtype=jnp.float32, weight_bits=8)

    monkeypatch.setenv("PALU_GEMV_KERNEL", "0")
    out_xla = Engine(params, cfg, ecfg).generate(ids, max_new_tokens=6)
    monkeypatch.setenv("PALU_GEMV_KERNEL", "force")
    out_k = Engine(params, cfg, ecfg).generate(ids, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(out_xla), np.asarray(out_k))
