"""Pallas FWHT kernel vs the XLA apply_hadamard reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from palu_tpu.core.hadamard import apply_hadamard
from palu_tpu.ops.pallas.fwht import full_hadamard_matrix, hadamard_transform


@pytest.mark.parametrize("n", [128, 96, 352, 1024])
def test_fwht_kernel_matches_apply_hadamard(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((37, n)).astype(np.float32)  # non-multiple rows
    ref = np.asarray(apply_hadamard(jnp.asarray(x)))
    out = np.asarray(hadamard_transform(jnp.asarray(x), block_rows=16, interpret=True))
    assert np.allclose(out, ref, atol=1e-4), np.abs(out - ref).max()


def test_full_hadamard_matrix_orthonormal():
    for n in (96, 256):
        h = full_hadamard_matrix(n).astype(np.float64)
        assert np.allclose(h @ h.T, np.eye(n), atol=1e-6)


def test_fwht_kernel_3d_input():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, 128)).astype(np.float32)
    ref = np.asarray(apply_hadamard(jnp.asarray(x)))
    out = np.asarray(hadamard_transform(jnp.asarray(x), block_rows=8, interpret=True))
    assert np.allclose(out, ref, atol=1e-4)
