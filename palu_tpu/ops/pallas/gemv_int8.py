"""Pallas TPU int8 weight-only GEMV kernels for the decode hot path.

At bs=1 decode the non-attention cost of a step is a chain of
memory-bound GEMVs over the model weights (the reference pays the same
chain in torch, run_latency_attention.py's full-model track has no
answer for it).  XLA streams a STANDALONE int8 GEMV at ~718 GB/s on a
v5e (tools/tpu_gemv_probe.py `i8`), but the three-matmul MLP body drops
to ~598 GB/s standalone and ~500 GB/s inside the scanned decode layer
(272 us/layer measured vs the 165 us HBM floor, docs/BENCH.md round-3
decomposition).  These kernels recover the gap with explicit
double-buffered streaming:

- `mlp_gemv_int8`: the whole SwiGLU MLP (gate/up GEMVs -> silu * mul ->
  down GEMV) in ONE pass.  The grid walks `inter`-dimension tiles; each
  step streams a (H, bn) gate tile, a (H, bn) up tile and a (bn, H) down
  tile, computes the tile's activation in VMEM, and accumulates the
  down-projection partial product into a (B, H) fp32 scratch.  Every
  weight byte is read exactly once at int8 width; the (B, inter)
  intermediate never exists in HBM.

- `gemv_int8`: plain y = x @ W for q_proj / fused o_proj / lm_head.
  Grid over output tiles, per-output-channel scales applied in-kernel.

Weights arrive in `core.wquant` storage ({"wq8": int8 (in, out),
"ws": (1, out) f32}); results match `wquant.wdot` to bf16 rounding
(differential tests, tests/test_gemv_int8.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mlp_gemv_int8", "gemv_int8", "pick_block"]


def pick_block(n: int, want: int = 512) -> int:
    """Largest multiple of 128 that divides n and is <= want (llama inter
    sizes are not powers of two: 11008 = 86*128 admits 256 but not 512)."""
    best = 0
    for m in range(128, want + 1, 128):
        if n % m == 0:
            best = m
    if best == 0:
        raise ValueError(f"dimension {n} is not a multiple of 128")
    return best


def _mlp_kernel(x_ref, wg_ref, gs_ref, wu_ref, us_ref, wd_ref, ds_ref,
                o_ref, acc_ref):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]
    g = jax.lax.dot_general(
        xb, wg_ref[...].astype(xb.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * gs_ref[...]
    u = jax.lax.dot_general(
        xb, wu_ref[...].astype(xb.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * us_ref[...]
    h = (jax.nn.silu(g) * u).astype(xb.dtype)  # (B, bn)
    acc_ref[...] += jax.lax.dot_general(
        h, wd_ref[...].astype(xb.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _fin():
        o_ref[...] = (acc_ref[...] * ds_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def mlp_gemv_int8(x, wg, wu, wd, *, block_n: int = 0, interpret: bool = False):
    """SwiGLU MLP over int8 weight-only storage in one streaming pass.

    x: (B, H); wg/wu: {"wq8": (H, I) int8, "ws": (1, I)};
    wd: {"wq8": (I, H) int8, "ws": (1, H)}.  Returns (B, H) in x.dtype.
    Intended for decode-sized B (the MXU is idle-tall at B=1; the kernel
    is HBM-bound so that is irrelevant)."""
    b, hdim = x.shape
    inter = wg["wq8"].shape[1]
    bn = block_n or pick_block(inter)
    assert inter % bn == 0, (inter, bn)
    assert wu["wq8"].shape == (hdim, inter) and wd["wq8"].shape == (inter, hdim)
    grid = (inter // bn,)
    return pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, hdim), lambda j: (0, 0)),
            pl.BlockSpec((hdim, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
            pl.BlockSpec((hdim, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
            pl.BlockSpec((bn, hdim), lambda j: (j, 0)),
            pl.BlockSpec((1, hdim), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, hdim), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hdim), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, hdim), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x, wg["wq8"], wg["ws"].astype(jnp.float32),
      wu["wq8"], wu["ws"].astype(jnp.float32),
      wd["wq8"], wd["ws"].astype(jnp.float32))


def _gemv_kernel(x_ref, w_ref, s_ref, o_ref):
    xb = x_ref[...]
    y = jax.lax.dot_general(
        xb, w_ref[...].astype(xb.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def gemv_int8(x, w, *, block_n: int = 0, interpret: bool = False):
    """y = x @ W for int8 weight-only storage.  x: (B, K);
    w: {"wq8": (K, N) int8, "ws": (1, N)}.  Grid over N tiles; the x row
    block stays resident while weight tiles stream."""
    b, k = x.shape
    n = w["wq8"].shape[1]
    bn = block_n or pick_block(n)
    assert n % bn == 0, (n, bn)
    return pl.pallas_call(
        _gemv_kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((b, k), lambda j: (0, 0)),
            pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x, w["wq8"], w["ws"].astype(jnp.float32))
