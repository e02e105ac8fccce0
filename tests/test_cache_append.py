"""Fused quantize+pack+append kernel vs the XLA append path
(cache._encode + write_at_lanes_masked): bit-identical buffers, masked
no-op contract, container packing, asym zeros."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.core.quant import QuantConfig
from palu_tpu.ops.pallas.cache_append import (
    append_supported, append_token_quantized)
from palu_tpu.runtime import cache as cache_lib


def _xla_append(lat, bufs, pos, writeable, qcfg):
    """Reference path: encode one token column + masked per-lane write."""
    upd = cache_lib._encode(lat[:, :, None, :], qcfg, jnp.float32)
    return cache_lib.write_at_lanes_masked(bufs, upd, pos, writeable)


def _bufs(b, g, rank, s_max, qcfg, seed):
    rng = np.random.default_rng(seed)
    lat0 = rng.standard_normal((b, g, s_max, rank)).astype(np.float32)
    upd = cache_lib._encode(jnp.asarray(lat0), qcfg, jnp.float32)
    return {k: jnp.asarray(v) for k, v in upd.items()}


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("bits,container", [(4, 0), (3, 4), (2, 0), (8, 0)])
def test_append_matches_xla_path(bits, container, sym):
    qcfg = QuantConfig(bits=bits, group_size=0, sym=sym, container=container)
    assert append_supported(qcfg)
    b, g, rank, s_max = 3, 2, 32, 256
    bufs = _bufs(b, g, rank, s_max, qcfg, seed=1)
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.standard_normal((b, g, rank)).astype(np.float32))
    pos = jnp.asarray([0, 100, 255], jnp.int32)
    wr = jnp.asarray([True, True, False])

    want = _xla_append(lat, dict(bufs), pos, wr, qcfg)
    # 4D scale/zero buffers pass verbatim (the engine path)
    got = append_token_quantized(
        lat, bufs["codes_t"], bufs["scale_t"], pos, wr,
        qcfg=qcfg, rank=rank,
        zero=None if sym else bufs["zero_t"],
        interpret=True,
    )
    codes, scale = got[0], got[1]
    np.testing.assert_array_equal(np.asarray(codes),
                                  np.asarray(want["codes_t"]))
    np.testing.assert_array_equal(np.asarray(scale),
                                  np.asarray(want["scale_t"]))
    if not sym:
        np.testing.assert_array_equal(np.asarray(got[2]),
                                      np.asarray(want["zero_t"]))
    # squeezed 3D scales (the stacked layout) give identical results
    got3 = append_token_quantized(
        lat, bufs["codes_t"], bufs["scale_t"][:, :, 0, :], pos, wr,
        qcfg=qcfg, rank=rank,
        zero=None if sym else bufs["zero_t"][:, :, 0, :],
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got3[0]), np.asarray(codes))
    np.testing.assert_array_equal(np.asarray(got3[1]),
                                  np.asarray(scale[:, :, 0, :]))


def test_append_unsupported_configs():
    assert not append_supported(QuantConfig(bits=3, group_size=0, sym=True))
    assert not append_supported(QuantConfig(bits=4, group_size=8, sym=True))
    assert not append_supported(QuantConfig())  # 16-bit passthrough
    assert not append_supported(None)


def test_append_masked_lane_is_bit_preserved():
    """A masked-out lane's block must be untouched even when its position
    collides with another lane's write block."""
    qcfg = QuantConfig(bits=4, group_size=0, sym=True)
    b, g, rank, s_max = 2, 2, 16, 128
    bufs = _bufs(b, g, rank, s_max, qcfg, seed=3)
    before = {k: np.asarray(v).copy() for k, v in bufs.items()}
    lat = jnp.asarray(
        np.random.default_rng(4).standard_normal((b, g, rank)), jnp.float32)
    pos = jnp.asarray([5, 5], jnp.int32)
    wr = jnp.asarray([False, True])
    codes, scale = append_token_quantized(
        lat, bufs["codes_t"], bufs["scale_t"], pos, wr,
        qcfg=qcfg, rank=rank, interpret=True)
    np.testing.assert_array_equal(np.asarray(codes)[0], before["codes_t"][0])
    assert not np.array_equal(np.asarray(codes)[1], before["codes_t"][1])
