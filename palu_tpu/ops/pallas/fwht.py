"""Pallas TPU fast-Hadamard transform.

TPU-native equivalent of the reference's Dao-AILab CUDA
`fast_hadamard_transform` extension (.gitmodules:5-6, invoked from
hadamard_utils.py:141-145). On a GPU the log-n butterfly is the right
algorithm; on TPU the lane-shuffle pattern of a butterfly is hostile to the
VPU while the MXU multiplies by a dense +-1 matrix at full throughput -- so
the kernel is a blocked matmul against the (generated, not tabulated)
Hadamard constant H_n / sqrt(n), with n = K * 2^m handled by building the
kron-structured matrix directly (K-selection per the reference's priority
order, palu_tpu.core.hadamard.get_hadK).

Sizes used by Palu (latent ranks, <= 2048) keep the constant comfortably in
VMEM; for larger n fall back to palu_tpu.core.hadamard.apply_hadamard (XLA).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.hadamard import get_hadK, hadamard_matrix

__all__ = ["hadamard_transform", "full_hadamard_matrix"]


@functools.lru_cache(maxsize=None)
def full_hadamard_matrix(n: int) -> np.ndarray:
    """Orthonormal n x n Hadamard H/sqrt(n) with the reference's K*2^m
    structure (chunk-FWHT then KxK mix == kron(H_K, H_m))."""
    hadK, K = get_hadK(n)
    m = n // K
    h_m = hadamard_matrix(m).astype(np.float64)
    if K == 1:
        h = h_m
    else:
        h = np.kron(hadK.astype(np.float64), h_m)
    return (h / math.sqrt(n)).astype(np.float32)


def _fwht_kernel(x_ref, h_ref, o_ref):
    o_ref[...] = jnp.dot(
        x_ref[...].astype(jnp.float32),
        h_ref[...].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def hadamard_transform(
    x: jax.Array, block_rows: int = 256, interpret: bool = False
) -> jax.Array:
    """Multiply the last dim by H_n / sqrt(n). x: (..., n); any leading dims.

    Matches core.hadamard.apply_hadamard numerically (same H, transposed
    application x @ H with H symmetric-structured kron product).
    """
    n = x.shape[-1]
    if n > 4096:
        from ...core.hadamard import apply_hadamard

        return apply_hadamard(x)
    h = jnp.asarray(full_hadamard_matrix(n).T)  # right-multiply form
    orig_shape = x.shape
    rows = int(np.prod(orig_shape[:-1])) if len(orig_shape) > 1 else 1
    x2 = x.reshape(rows, n)
    padded = (rows + block_rows - 1) // block_rows * block_rows
    if padded != rows:
        x2 = jnp.pad(x2, ((0, padded - rows), (0, 0)))
    out = pl.pallas_call(
        _fwht_kernel,
        grid=(padded // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, n), x.dtype),
        interpret=interpret,
    )(x2, h)
    return out[:rows].reshape(orig_shape)
