"""Pallas fused-decode kernel vs the XLA reference implementation
(interpret mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.core.quant import QuantConfig
from palu_tpu.core import quant as quant_mod
from palu_tpu.ops import attention as att_ops
from palu_tpu.ops.pallas.palu_decode import (
    palu_flash_decode,
    palu_flash_decode_quantized,
)


def _setup(b=1, g=2, hpg=4, rk=32, rv=64, hd=128, s_max=256, kv_len=200, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, g * hpg, hd)).astype(np.float32)
    b_k = rng.standard_normal((g, hpg, rk, hd)).astype(np.float32) * 0.1
    x_k = rng.standard_normal((b, g, s_max, rk)).astype(np.float32)
    x_v = rng.standard_normal((b, g, s_max, rv)).astype(np.float32)
    return (
        jnp.asarray(q),
        jnp.asarray(b_k),
        jnp.asarray(x_k),
        jnp.asarray(x_v),
        jnp.full((b,), kv_len, jnp.int32),
    )


def _xla_reference(q, b_k, x_k, x_v, kv_len, chunk=64, sliding_window=None,
                   theta=10000.0):
    s_max = x_k.shape[2]
    return att_ops.flash_decode_latent(
        q,
        lambda idx: jax.lax.dynamic_slice_in_dim(x_k, idx * chunk, chunk, axis=2),
        lambda idx: jax.lax.dynamic_slice_in_dim(x_v, idx * chunk, chunk, axis=2),
        b_k,
        s_max // chunk,
        chunk,
        kv_len,
        q.shape[-1],
        theta,
        x_v.shape[-1],
        sliding_window,
    )


@pytest.mark.parametrize("impl", ["merged", "split"])
@pytest.mark.parametrize("kv_len", [200, 256, 1])
def test_pallas_decode_matches_xla(kv_len, impl):
    q, b_k, x_k, x_v, kvl = _setup(kv_len=kv_len)
    ref = np.asarray(_xla_reference(q, b_k, x_k, x_v, kvl))
    out = np.asarray(
        palu_flash_decode(q, b_k, x_k, x_v, kvl, block_s=64, interpret=True,
                          compute_dtype=jnp.float32, impl=impl)
    )
    assert out.shape == ref.shape
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()


def test_pallas_decode_sliding_window():
    q, b_k, x_k, x_v, kvl = _setup(kv_len=200)
    ref = np.asarray(_xla_reference(q, b_k, x_k, x_v, kvl, sliding_window=50))
    out = np.asarray(
        palu_flash_decode(
            q, b_k, x_k, x_v, kvl, block_s=64, sliding_window=50, interpret=True,
            compute_dtype=jnp.float32,
        )
    )
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()


def test_pallas_decode_batch2():
    q, b_k, x_k, x_v, kvl = _setup(b=2, kv_len=100)
    ref = np.asarray(_xla_reference(q, b_k, x_k, x_v, kvl))
    out = np.asarray(
        palu_flash_decode(q, b_k, x_k, x_v, kvl, block_s=64, interpret=True, compute_dtype=jnp.float32)
    )
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()


def test_pallas_decode_nonstandard_theta_and_head_dim():
    q, b_k, x_k, x_v, kvl = _setup(hd=64, rk=64, rv=32, kv_len=128)
    ref = np.asarray(_xla_reference(q, b_k, x_k, x_v, kvl, theta=50000.0))
    out = np.asarray(
        palu_flash_decode(q, b_k, x_k, x_v, kvl, block_s=64, theta=50000.0, interpret=True, compute_dtype=jnp.float32)
    )
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()


@pytest.mark.parametrize("impl", ["merged", "split"])
@pytest.mark.parametrize("bits", [4, 3, 2])
def test_pallas_decode_quantized_matches_dequant_xla(bits, impl):
    """Fused-dequant kernel == XLA path on pre-dequantized latents."""
    qcfg = QuantConfig(bits=bits, group_size=0, sym=False)
    q, b_k, x_k, x_v, kvl = _setup(rk=32, rv=64, kv_len=200)

    kc, ks, kb = quant_mod.quantize(x_k, qcfg)
    vc, vs, vb = quant_mod.quantize(x_v, qcfg)
    kc_packed = quant_mod.pack_codes(kc, bits)
    vc_packed = quant_mod.pack_codes(vc, bits)

    # XLA reference on dequantized latents
    x_k_dq = quant_mod.dequantize(kc, ks, kb, qcfg, dtype=jnp.float32)
    x_v_dq = quant_mod.dequantize(vc, vs, vb, qcfg, dtype=jnp.float32)
    ref = np.asarray(_xla_reference(q, b_k, x_k_dq, x_v_dq, kvl))

    out = np.asarray(
        palu_flash_decode_quantized(
            q, b_k,
            kc_packed, ks.astype(jnp.float32), kb.astype(jnp.float32),
            vc_packed, vs.astype(jnp.float32), vb.astype(jnp.float32),
            kvl,
            qcfg=qcfg, rk=32, rv=64, block_s=64, interpret=True,
            compute_dtype=jnp.float32, impl=impl,
        )
    )
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()
