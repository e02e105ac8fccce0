"""v3 fused-decode kernel (static rel-RoPE tables, zero-point as small
dots) vs the XLA reference on affine-dequantized latents. v3 is superseded
by v4 in the engine but kept for the kernel-iteration A/B harness
(tools/tpu_ab_v2.py, docs/BENCH.md iteration table); this pins its
numerics so the harness keeps measuring a correct kernel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.core import quant as quant_mod
from palu_tpu.core.quant import QuantConfig
from palu_tpu.ops import attention as att_ops
from palu_tpu.ops.pallas.archive.palu_decode3 import palu_flash_decode3_quantized, sz_pack


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


def _xla_reference(q, b_k, x_k, x_v, kv_len, chunk=64):
    s_max = x_k.shape[2]
    return att_ops.flash_decode_latent(
        q,
        lambda i: jax.lax.dynamic_slice_in_dim(x_k, i * chunk, chunk, axis=2),
        lambda i: jax.lax.dynamic_slice_in_dim(x_v, i * chunk, chunk, axis=2),
        b_k,
        s_max // chunk,
        chunk,
        kv_len,
        q.shape[-1],
        10000.0,
        x_v.shape[-1],
        None,
    )


@pytest.mark.parametrize("bits", [4, 3])
@pytest.mark.parametrize("kv_len", [200, 256])
def test_v3_quantized_matches_dequant_xla(bits, kv_len):
    q, b_k, x_k, x_v, kvl = _setup(kv_len=kv_len)
    qcfg = QuantConfig(bits=bits, group_size=0)  # asymmetric affine
    kc, ks, kz = quant_mod.quantize_affine(x_k, qcfg)
    vc, vs, vz = quant_mod.quantize_affine(x_v, qcfg)
    out = palu_flash_decode3_quantized(
        q, b_k,
        quant_mod.pack_codes_t(kc, bits), sz_pack(ks[..., 0], kz[..., 0]),
        quant_mod.pack_codes_t(vc, bits), sz_pack(vs[..., 0], vz[..., 0]),
        kvl, qcfg=qcfg, rk=32, rv=64, block_s=64, interpret=True,
    )
    # affine dequant: x ~= scale * code + zero (scales keep a trailing 1 dim)
    x_k_dq = kc.astype(jnp.float32) * ks + kz
    x_v_dq = vc.astype(jnp.float32) * vs + vz
    ref = _xla_reference(q, b_k, jnp.asarray(x_k_dq), jnp.asarray(x_v_dq), kvl)
    assert np.allclose(out, ref, atol=2e-3, rtol=1e-3), np.abs(out - ref).max()
