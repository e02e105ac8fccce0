"""Pallas TPU int4 weight-only GEMV kernels for the decode hot path.

Same streaming structure as gemv_int8 (one pass over the weight bytes,
double-buffered tiles, fp32 accumulator scratch), but the weights arrive
PACKED two-codes-per-byte (core/wquant.quantize_weight4: rows r and
r + group/2 of each 128-row scale group share a byte, so a group-aligned
tile unpacks to two contiguous nibble planes, never an interleave) with
per-(128-row-group, out-channel) scales.

Per tile the kernel unpacks the byte block with one mask and one shift,
feeds the unsigned 0..15 codes straight to the MXU (convert fuses into
the operand read), applies the group scales to the per-group partial
products, and folds the symmetric offset 8 algebraically:

    y[.., o] = sum_g (x_g @ q_g)[o] * s[g, o]  -  8 * sum(x_g) * s[g, o]

so no re-centering pass over the 45M-value unpacked operand ever runs.
HBM floor at the 7B point is half the int8 kernel's (docs/BENCH.md
round-4: the decode step streams ~8.6 ms of weight bytes at int8 width).

The reference has no weight-quantization story at all; this extends its
latency track the same way wquant int8 does (run_latency_attention.py
measures one attention module, never the surrounding GEMV chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemv_int8 import pick_block

__all__ = ["mlp_gemv_int4", "gemv_int4"]

GROUP = 128  # must match core/wquant.W4_GROUP


def _group_dot(x, packed_ref, scales):
    """x (B, K) @ dequant(packed (K/2, bn) bytes, scales (K/GROUP, bn))
    with the offset-8 fold. Packing is within-group (core/wquant: rows r
    and r + 64 of each 128-row group share a byte). Returns (B, bn) f32."""
    b, k = x.shape
    n_g = k // GROUP
    hg = GROUP // 2
    xf = x.astype(jnp.float32)
    acc = None
    corr = None
    for g in range(n_g):
        # widen per 64-row slice, not the whole tile: keeps the int32
        # unpack temporaries at ~the slice size instead of 3x the tile
        # (Mosaic has no direct uint8 -> float cast, so the hop through
        # int32 is required -- same as the cache kernels)
        blk = packed_ref[g * hg : (g + 1) * hg, :].astype(jnp.int32)
        cg = jnp.concatenate([blk & 0xF, blk >> 4],
                             axis=0).astype(x.dtype)  # (GROUP, bn), 0..15
        xg = x[:, g * GROUP : (g + 1) * GROUP]
        sg = scales[g : g + 1, :]
        pg = jax.lax.dot_general(
            xg, cg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sg
        sxg = jnp.sum(xf[:, g * GROUP : (g + 1) * GROUP],
                      axis=1, keepdims=True)  # (B, 1)
        cg_corr = sxg * sg  # (B, bn) via broadcast
        acc = pg if acc is None else acc + pg
        corr = cg_corr if corr is None else corr + cg_corr
    return acc - 8.0 * corr


def _mlp_kernel4(x_ref, wg_ref, gs_ref, wu_ref, us_ref, wd_ref, ds_ref,
                 o_ref, acc_ref):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]
    g = _group_dot(xb, wg_ref, gs_ref[...])
    u = _group_dot(xb, wu_ref, us_ref[...])
    h = (jax.nn.silu(g) * u).astype(xb.dtype)  # (B, bn)
    # ds arrives 3D (1, bn/GROUP, H): a 2D (bn/GROUP, H) tile would break
    # Mosaic's (8, 128) block divisibility when bn/GROUP < 8
    acc_ref[...] += _group_dot(h, wd_ref, ds_ref[0])

    @pl.when(j == nj - 1)
    def _fin():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def mlp_gemv_int4(x, wg, wu, wd, *, block_n: int = 0, interpret: bool = False):
    """SwiGLU MLP over packed int4 weight-only storage in one streaming
    pass. x: (B, H); wg/wu: {"wq4": (H/2, I) uint8, "ws": (H/128, I)};
    wd: {"wq4": (I/2, H) uint8, "ws": (I/128, H)}. Returns (B, H)."""
    b, hdim = x.shape
    inter = wg["wq4"].shape[1]
    bn = block_n or pick_block(inter)
    assert inter % bn == 0, (inter, bn)
    assert wu["wq4"].shape == (hdim // 2, inter)
    assert wd["wq4"].shape == (inter // 2, hdim)
    ng_h = hdim // GROUP
    ng_i = inter // GROUP
    grid = (inter // bn,)
    return pl.pallas_call(
        _mlp_kernel4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, hdim), lambda j: (0, 0)),
            pl.BlockSpec((hdim // 2, bn), lambda j: (0, j)),
            pl.BlockSpec((ng_h, bn), lambda j: (0, j)),
            pl.BlockSpec((hdim // 2, bn), lambda j: (0, j)),
            pl.BlockSpec((ng_h, bn), lambda j: (0, j)),
            pl.BlockSpec((bn // 2, hdim), lambda j: (j, 0)),
            pl.BlockSpec((1, bn // GROUP, hdim), lambda j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, hdim), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hdim), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, hdim), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x, wg["wq4"], wg["ws"].astype(jnp.float32),
      wu["wq4"], wu["ws"].astype(jnp.float32),
      wd["wq4"],
      wd["ws"].astype(jnp.float32).reshape(inter // bn, bn // GROUP, hdim))


def _gemv_kernel4(x_ref, w_ref, s_ref, o_ref):
    o_ref[...] = _group_dot(x_ref[...], w_ref, s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def gemv_int4(x, w, *, block_n: int = 0, interpret: bool = False):
    """y = x @ W for packed int4 weight-only storage. x: (B, K);
    w: {"wq4": (K/2, N) uint8, "ws": (K/128, N)}."""
    b, k = x.shape
    n = w["wq4"].shape[1]
    ng = k // GROUP
    bn = block_n or pick_block(n)
    assert n % bn == 0, (n, bn)
    return pl.pallas_call(
        _gemv_kernel4,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((b, k), lambda j: (0, 0)),
            pl.BlockSpec((k // 2, bn), lambda j: (0, j)),
            pl.BlockSpec((ng, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x, w["wq4"], w["ws"].astype(jnp.float32))
