"""Unit tests for the core math library: Hadamard, quantizer, low-rank."""

import numpy as np
import pytest

import jax.numpy as jnp

from palu_tpu.core import hadamard, lowrank, quant


# ---------------------------------------------------------------------------
# Hadamard
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n", [1, 2, 4, 12, 20, 28, 36, 40, 44, 52, 64, 76, 92, 108, 156, 172, 244]
)
def test_hadamard_matrix_orthogonal(n):
    H = hadamard.hadamard_matrix(n).astype(np.int64)
    assert np.array_equal(H @ H.T, n * np.eye(n, dtype=np.int64)), n
    assert set(np.unique(H)) <= {-1, 1}


@pytest.mark.parametrize("n", [2, 8, 128])
def test_fwht_matches_sylvester(n):
    H = hadamard.hadamard_matrix(n).astype(np.float32)
    out = np.asarray(hadamard.fwht(jnp.eye(n, dtype=jnp.float32)))
    # fwht applied to rows of I gives H (rows are basis vectors)
    assert np.allclose(out, H)


@pytest.mark.parametrize("n", [96, 128, 160, 352, 1024])
def test_apply_hadamard_orthonormal(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, n)).astype(np.float32)
    y = np.asarray(hadamard.apply_hadamard(jnp.asarray(x)))
    # orthonormal: norms preserved
    assert np.allclose(np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4)
    # linear: matrix representation Q has Q Q^T = I
    Q = np.asarray(hadamard.apply_hadamard(jnp.eye(n, dtype=jnp.float32)))
    assert np.allclose(Q @ Q.T, np.eye(n), atol=1e-4)


def test_get_hadK_reference_priority():
    # n = 96 = 12 * 8 -> K=12; n = 160 = 20*8 -> K=20; n=1952=244*8 -> K=244
    assert hadamard.get_hadK(96)[1] == 12
    # 160 = 40*4: the reference's if/elif chain tries 40 before 20
    assert hadamard.get_hadK(160)[1] == 40
    assert hadamard.get_hadK(1952)[1] == 244
    assert hadamard.get_hadK(256)[1] == 1


# ---------------------------------------------------------------------------
# Quantizer
# ---------------------------------------------------------------------------


def _torch_reference_quantize(w, n_bits, group_size, sym, clip_ratio=1.0):
    """Numpy port of the reference quantize_tensor (quant.py:6-41) used as the
    independent oracle in tests."""
    saved_shape = w.shape
    w = w.reshape(-1, w.shape[-1])
    if group_size > 0:
        w = w.reshape(-1, group_size)
    if sym:
        w_max = np.clip(np.max(np.abs(w), axis=-1, keepdims=True), 1e-5, None)
        q_max = 2 ** (n_bits - 1) - 1
        q_min = -(2 ** (n_bits - 1))
        if clip_ratio < 1.0:
            w_max = w_max * clip_ratio
        scales = w_max / q_max
        base = np.zeros_like(scales)
    else:
        w_max = np.max(w, axis=-1, keepdims=True)
        w_min = np.min(w, axis=-1, keepdims=True)
        q_max = 2**n_bits - 1
        q_min = 0
        if clip_ratio < 1.0:
            w_max = w_max * clip_ratio
            w_min = w_min * clip_ratio
        scales = np.clip(w_max - w_min, 1e-5, None) / q_max
        base = np.clip(np.round(-w_min / scales), q_min, q_max)
    w = (np.clip(np.round(w / scales) + base, q_min, q_max) - base) * scales
    return w.reshape(saved_shape)


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("group_size", [0, 32])
def test_fake_quant_matches_reference(bits, sym, group_size):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 7, 128)).astype(np.float32)
    cfg = quant.QuantConfig(bits=bits, group_size=group_size, sym=sym, clip_ratio=0.9)
    ours = np.asarray(quant.fake_quantize(jnp.asarray(x), cfg))
    ref = _torch_reference_quantize(x, bits, group_size, sym, 0.9)
    assert np.allclose(ours, ref, atol=1e-6), np.abs(ours - ref).max()


def test_fake_quant_16bit_passthrough():
    x = jnp.arange(12.0).reshape(3, 4)
    cfg = quant.QuantConfig(bits=16)
    assert np.array_equal(np.asarray(quant.fake_quantize(x, cfg)), np.asarray(x))


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("sym", [True, False])
def test_real_quant_roundtrip_equals_fake(bits, sym):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 5, 64)).astype(np.float32)
    cfg = quant.QuantConfig(bits=bits, group_size=0, sym=sym)
    codes, scales, base = quant.quantize(jnp.asarray(x), cfg)
    deq = np.asarray(quant.dequantize(codes, scales, base, cfg, dtype=jnp.float32))
    fake = np.asarray(quant.fake_quantize(jnp.asarray(x), cfg))
    assert np.allclose(deq, fake, atol=1e-5)


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(3)
    n = 128
    codes = rng.integers(0, 2**bits, size=(4, 6, n)).astype(np.uint8)
    packed = quant.pack_codes(jnp.asarray(codes), bits)
    assert packed.shape[-1] == quant.packed_nbytes(n, bits)
    out = np.asarray(quant.unpack_codes(packed, bits, n))
    assert np.array_equal(out, codes)


def test_packed_nbytes_3bit_exact():
    # 3-bit really is 3 bits/value: n/4 + n/8 bytes
    assert quant.packed_nbytes(128, 3) == 48  # = 128*3/8


def test_container_pack_bits_and_validation():
    cfg = quant.QuantConfig(bits=3, sym=True, container=4)
    assert cfg.pack_bits == 4 and cfg.bits == 3
    assert quant.QuantConfig(bits=3).pack_bits == 3
    with pytest.raises(ValueError):
        quant.QuantConfig(bits=4, container=2)  # narrower than bits
    with pytest.raises(ValueError):
        quant.QuantConfig(bits=3, container=5)  # not a field width


def test_container_roundtrip_identical_values():
    """3-bit codes in a 4-bit nibble container: same quantization grid,
    same codes, only the storage geometry changes."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 4, 64)).astype(np.float32))
    c3 = quant.QuantConfig(bits=3, group_size=0, sym=True)
    c34 = quant.QuantConfig(bits=3, group_size=0, sym=True, container=4)
    codes, scales, zeros = quant.quantize_affine(x, c34)
    codes3, _, _ = quant.quantize_affine(x, c3)
    assert np.array_equal(np.asarray(codes), np.asarray(codes3))
    packed = quant.pack_codes_t(codes, c34.pack_bits)
    assert packed.shape[-2] == quant.packed_nrows(64, 4)  # nibble rows
    out = np.asarray(quant.unpack_codes_t(packed, c34.pack_bits, 64))
    assert np.array_equal(out, np.moveaxis(np.asarray(codes), -1, -2))


# ---------------------------------------------------------------------------
# Low-rank decomposition
# ---------------------------------------------------------------------------


def test_svd_full_rank_exact():
    rng = np.random.default_rng(4)
    W = rng.standard_normal((64, 96)).astype(np.float32)
    lr = lowrank.decompose_svd(W, ranks=[32, 32])  # full rank per 32-row group
    assert np.allclose(lr.reconstruct_dense(), W, atol=1e-3)


def test_svd_truncation_error_ordering():
    rng = np.random.default_rng(5)
    W = rng.standard_normal((64, 96)).astype(np.float32)
    err = {}
    for r in (8, 16, 32):
        lr = lowrank.decompose_svd(W, ranks=[r, r])
        err[r] = np.linalg.norm(lr.reconstruct_dense() - W)
    assert err[32] < err[16] < err[8]


def test_whiten_full_rank_exact_and_beats_svd_on_calib():
    rng = np.random.default_rng(6)
    in_f, out_f = 96, 64
    W = rng.standard_normal((out_f, in_f)).astype(np.float32)
    # calibration inputs with strongly anisotropic covariance
    X = rng.standard_normal((512, in_f)).astype(np.float32)
    X *= np.geomspace(1, 100, in_f)[None, :].astype(np.float32)
    gram = X.T @ X
    S = lowrank.cholesky_with_psd_repair(gram)

    full = lowrank.decompose_whiten(W, S, ranks=[32, 32])
    assert np.allclose(full.reconstruct_dense(), W, atol=1e-2)

    # At low rank, whitening should reduce *data-weighted* error vs plain SVD
    sv = lowrank.decompose_svd(W, ranks=[8, 8])
    wh = lowrank.decompose_whiten(W, S, ranks=[8, 8])
    err_sv = np.linalg.norm(X @ (sv.reconstruct_dense() - W).T)
    err_wh = np.linalg.norm(X @ (wh.reconstruct_dense() - W).T)
    assert err_wh < err_sv


def test_cholesky_psd_repair():
    # A matrix that is symmetric but indefinite triggers the repair path
    A = np.diag([1.0, -0.5, 2.0])
    S = lowrank.cholesky_with_psd_repair(A)
    assert np.isfinite(S).all()
    # S @ S.T approximates the shifted matrix (still PSD)
    assert np.all(np.linalg.eigvalsh(S @ S.T) > 0)


def test_fuse_hadamard_is_noop():
    rng = np.random.default_rng(7)
    W = rng.standard_normal((64, 96)).astype(np.float32)
    lr = lowrank.decompose_svd(W, ranks=[32, 32])
    fused = lowrank.fuse_hadamard(lr)
    # end-to-end reconstruction unchanged (Q @ Q^T = I)
    assert np.allclose(fused.reconstruct_dense(), lr.reconstruct_dense(), atol=1e-4)
    # but the factors themselves are rotated
    assert not np.allclose(fused.VT, lr.VT)
