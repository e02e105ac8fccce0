"""Headwise low-rank (G-LRD) decomposition math.

Pure-functional equivalents of the reference's module-surgery approach
(/root/reference/palu/model/modules/svd_linear.py): a projection weight
W (out, in) is split into per-head-group blocks W_g (group_dim, in) and each
block factorized W_g ~= L_g @ R_g with rank r_g:

  - plain SVD   (svd_linear.py:36-51):   L = U sqrt(S), R = sqrt(S) Vt
  - whitened SVD (svd_linear.py:6-34):   SVD of (W_g @ S) with S the Cholesky
    factor of the calibration Gram matrix X^T X; R is then mapped back with
    S^-1 (SVD-LLM-style data-aware decomposition).

Instead of an nn.Module, the result is a `LowRankWeights` pytree:
  VT (sum(ranks), in)  -- latent projection, x @ VT.T -> latents
  U  list of (group_dim, r_g) -- per-group reconstruction
which the JAX model consumes directly. Decomposition runs in fp32 (Gram /
Cholesky handling in fp64) on CPU, matching the reference's precision choices
(decomposition.py:150-152, svd_linear.py:14-19).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from .hadamard import apply_hadamard

__all__ = [
    "LowRankWeights",
    "decompose_svd",
    "decompose_whiten",
    "cholesky_with_psd_repair",
    "fuse_hadamard",
]


@dataclasses.dataclass
class LowRankWeights:
    """Factorized projection: x @ VT.T gives latents; per-group U reconstructs."""

    VT: np.ndarray  # (sum(ranks), in_features)
    U: List[np.ndarray]  # per group: (group_dim, rank_g)
    ranks: List[int]
    bias: Optional[List[np.ndarray]] = None  # per group: (group_dim,), qwen2 attn bias

    @property
    def in_features(self) -> int:
        return self.VT.shape[1]

    @property
    def out_features(self) -> int:
        return sum(u.shape[0] for u in self.U)

    @property
    def num_groups(self) -> int:
        return len(self.ranks)

    def reconstruct_dense(self) -> np.ndarray:
        """Recombine to a dense (out, in) weight (for tests / error metrics)."""
        blocks = []
        off = 0
        for u, r in zip(self.U, self.ranks):
            blocks.append(u @ self.VT[off : off + r])
            off += r
        return np.concatenate(blocks, axis=0)


def _split_heads(weight: np.ndarray, num_groups: int) -> np.ndarray:
    out_features, in_features = weight.shape
    if out_features % num_groups:
        raise ValueError(
            f"out_features {out_features} not divisible by num_groups {num_groups}"
        )
    return weight.reshape(num_groups, out_features // num_groups, in_features)


def _svd_lowrank(block: np.ndarray, rank: int):
    """L = U sqrt(S), R = sqrt(S) Vt truncated to `rank` (svd_linear.py:36-51)."""
    U, S, Vt = np.linalg.svd(block.astype(np.float32), full_matrices=False)
    U = U[:, :rank]
    S = S[:rank]
    Vt = Vt[:rank, :]
    sqrt_s = np.sqrt(S)
    return U * sqrt_s[None, :], sqrt_s[:, None] * Vt


def decompose_svd(
    weight: np.ndarray,
    ranks: Sequence[int],
    bias: Optional[np.ndarray] = None,
) -> LowRankWeights:
    """Plain per-head-group SVD decomposition (reference from_linear,
    svd_linear.py:206-236)."""
    blocks = _split_heads(np.asarray(weight), len(ranks))
    Ls, Rs = [], []
    for g, r in enumerate(ranks):
        L, R = _svd_lowrank(blocks[g], r)
        Ls.append(L)
        Rs.append(R)
    b = None
    if bias is not None:
        b = list(np.asarray(bias).reshape(len(ranks), -1))
    return LowRankWeights(VT=np.concatenate(Rs, axis=0), U=Ls, ranks=list(ranks), bias=b)


def cholesky_with_psd_repair(gram: np.ndarray) -> np.ndarray:
    """Cholesky factor of the (fp64) Gram matrix with the reference's
    eigenvalue-shift fallback for non-PSD inputs (decomposition.py:150-170)."""
    gram = np.asarray(gram, dtype=np.float64)
    try:
        return np.linalg.cholesky(gram).astype(np.float32)
    except np.linalg.LinAlgError:
        eigvals = np.linalg.eigvalsh(gram)
        gram = gram + (-eigvals[0] + 1e-3) * np.eye(gram.shape[0])
        return np.linalg.cholesky(gram).astype(np.float32)


def decompose_whiten(
    weight: np.ndarray,
    scale: np.ndarray,
    ranks: Sequence[int],
    bias: Optional[np.ndarray] = None,
) -> LowRankWeights:
    """Whitened per-head-group decomposition (reference
    _per_head_whiten_decomposition_from_weight, svd_linear.py:6-34).

    `scale` is the Cholesky factor S of the input Gram matrix; the SVD is
    taken of W_g @ S and the right factor mapped back through S^-1 so that
    L @ R ~= W_g in the original input basis.
    """
    scale = np.asarray(scale, dtype=np.float32)
    scale_inv = np.linalg.inv(scale)
    blocks = _split_heads(np.asarray(weight), len(ranks))
    Ls, Rs = [], []
    for g, r in enumerate(ranks):
        W_scale = blocks[g].astype(np.float32) @ scale
        U, S, Vt = np.linalg.svd(W_scale, full_matrices=False)
        V = Vt @ scale_inv
        U = U[:, :r]
        S = S[:r]
        V = V[:r, :]
        sqrt_s = np.sqrt(S)
        Ls.append(U * sqrt_s[None, :])
        Rs.append(sqrt_s[:, None] * V)
    b = None
    if bias is not None:
        b = list(np.asarray(bias).reshape(len(ranks), -1))
    return LowRankWeights(VT=np.concatenate(Rs, axis=0), U=Ls, ranks=list(ranks), bias=b)


def fuse_hadamard(lr: LowRankWeights) -> LowRankWeights:
    """Bake an orthonormal Hadamard rotation Q into each group's (VT_g, U_g)
    pair: latents become Q^T @ latent while U_g @ Q undoes it -- numerically a
    no-op that redistributes latent outliers for quantization
    (reference fused_hadamard_matrix, svd_linear.py:156-168).

    Reference applies `apply_hadamard(VT_g.T).T` (rotating the rank dim of VT)
    and `apply_hadamard(U_g)` (rotating the rank dim of U).
    """
    import jax.numpy as jnp

    new_U = []
    vt_blocks = []
    off = 0
    for g, r in enumerate(lr.ranks):
        vt_g = lr.VT[off : off + r]  # (r, in)
        vt_rot = np.asarray(apply_hadamard(jnp.asarray(vt_g.T, dtype=jnp.float32))).T
        vt_blocks.append(vt_rot.astype(lr.VT.dtype))
        u_rot = np.asarray(apply_hadamard(jnp.asarray(lr.U[g], dtype=jnp.float32)))
        new_U.append(u_rot.astype(lr.U[g].dtype))
        off += r
    return LowRankWeights(
        VT=np.concatenate(vt_blocks, axis=0),
        U=new_U,
        ranks=list(lr.ranks),
        bias=lr.bias,
    )
