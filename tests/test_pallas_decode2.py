"""v2 fused-decode kernel (rank-major value cache, wide-lane fused dequant)
vs the XLA reference (interpret mode on CPU; same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.core.quant import QuantConfig
from palu_tpu.core import quant as quant_mod
from palu_tpu.ops import attention as att_ops
from palu_tpu.ops.pallas.archive.palu_decode2 import (
    palu_flash_decode2,
    palu_flash_decode2_quantized,
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


@pytest.mark.parametrize("kv_len", [200, 256, 1])
def test_v2_bf16_matches_xla(kv_len):
    q, b_k, x_k, x_v, kvl = _setup(kv_len=kv_len)
    ref = np.asarray(_xla_reference(q, b_k, x_k, x_v, kvl))
    out = np.asarray(
        palu_flash_decode2(
            q, b_k, x_k, jnp.swapaxes(x_v, 2, 3), kvl, block_s=64,
            interpret=True, compute_dtype=jnp.float32,
        )
    )
    assert out.shape == ref.shape
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()


def test_v2_bf16_sliding_window_and_batch():
    q, b_k, x_k, x_v, kvl = _setup(b=2, kv_len=100)
    ref = np.asarray(_xla_reference(q, b_k, x_k, x_v, kvl, sliding_window=50))
    out = np.asarray(
        palu_flash_decode2(
            q, b_k, x_k, jnp.swapaxes(x_v, 2, 3), kvl, block_s=64,
            sliding_window=50, interpret=True, compute_dtype=jnp.float32,
        )
    )
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()


@pytest.mark.parametrize("sym", [False, True])
@pytest.mark.parametrize("bits", [4, 3, 2])
def test_v2_quantized_matches_dequant_xla(bits, sym):
    """Wide-lane fused-dequant kernel == XLA path on pre-dequantized latents,
    for both symmetric and asymmetric affine quantization."""
    qcfg = QuantConfig(bits=bits, group_size=0, sym=sym)
    q, b_k, x_k, x_v, kvl = _setup(rk=32, rv=64, kv_len=200)

    kc, ks, kz = quant_mod.quantize_affine(x_k, qcfg)
    vc, vs, vz = quant_mod.quantize_affine(x_v, qcfg)
    kc_packed = quant_mod.pack_codes_t(kc, bits)  # (B, G, rows, S)
    vc_packed = quant_mod.pack_codes_t(vc, bits)

    # XLA reference on affine-dequantized latents
    x_k_dq = (kc.astype(jnp.float32) * ks + kz)
    x_v_dq = (vc.astype(jnp.float32) * vs + vz)
    ref = np.asarray(_xla_reference(q, b_k, x_k_dq, x_v_dq, kvl))

    out = np.asarray(
        palu_flash_decode2_quantized(
            q, b_k,
            kc_packed, ks[..., 0], kz[..., 0],
            vc_packed, vs[..., 0], vz[..., 0],
            kvl,
            qcfg=qcfg, rk=32, rv=64, block_s=64, interpret=True,
            compute_dtype=jnp.float32,
        )
    )
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()


def test_v2_matches_v1_bf16():
    """v1 and v2 kernels agree on identical inputs."""
    from palu_tpu.ops.pallas.palu_decode import palu_flash_decode

    q, b_k, x_k, x_v, kvl = _setup(kv_len=180)
    v1 = np.asarray(
        palu_flash_decode(q, b_k, x_k, x_v, kvl, block_s=64, interpret=True,
                          compute_dtype=jnp.float32)
    )
    v2 = np.asarray(
        palu_flash_decode2(q, b_k, x_k, jnp.swapaxes(x_v, 2, 3), kvl,
                           block_s=64, interpret=True,
                           compute_dtype=jnp.float32)
    )
    assert np.allclose(v1, v2, atol=2e-3, rtol=1e-3), np.abs(v1 - v2).max()


def test_v2_rope_scaling_static():
    """Kernel with baked-in scaled inv_freq == XLA reference with the same
    tables (rope_scaling plumbing into the fused kernel)."""
    from palu_tpu.models import rope as rope_mod
    from palu_tpu.models.config import ModelConfig

    q, b_k, x_k, x_v, kvl = _setup(kv_len=200)
    cfg = ModelConfig(rope_scaling={"rope_type": "linear", "factor": 2.0},
                      num_attention_heads=8, num_key_value_heads=8,
                      hidden_size=1024)
    inv_freq, scale = rope_mod.inv_freq_and_scale(cfg)
    ref = np.asarray(att_ops.flash_decode_latent(
        q,
        lambda i: jax.lax.dynamic_slice_in_dim(x_k, i * 64, 64, axis=2),
        lambda i: jax.lax.dynamic_slice_in_dim(x_v, i * 64, 64, axis=2),
        b_k, x_k.shape[2] // 64, 64, kvl, q.shape[-1], 10000.0,
        x_v.shape[-1], None, inv_freq=inv_freq, rope_scale=scale,
    ))
    out = np.asarray(
        palu_flash_decode2(
            q, b_k, x_k, jnp.swapaxes(x_v, 2, 3), kvl, block_s=64,
            interpret=True, compute_dtype=jnp.float32,
            inv_freq_static=tuple(float(f) for f in inv_freq),
            rope_scale=float(scale),
        )
    )
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()
