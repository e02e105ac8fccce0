"""Pallas TPU fused Palu flash-decode, v2: rank-major value cache and
wide-lane fused dequantization.

Successor of palu_decode.py (v1), attacking its two measured bottlenecks
(docs/BENCH.md round-1 analysis):

1. **Value-path MXU starvation.** v1 computes `p_t (hpg, BS) @ xv (BS, rv)`
   per head group -- an M=4 matmul whose stationary-operand loads waste the
   128-wide systolic array. v2 stores the value latents rank-major
   `(rv, S_max)` so the update is the natural matmul
   `xv_t (rv, BS) @ p_g (BS, hpg)` with M = rv = 384 streaming rows.
   The accumulator lives transposed `(G, rv, hpg)`; the caller undoes the
   transpose outside the kernel (tiny, XLA-fused).

2. **VPU-hostile sub-byte unpack.** v1's planar codes put `rank*bits/8`
   bytes on the *lane* axis (48 lanes for 3-bit rk=128), so the ~25
   shift/mask ops per group ran at <40% lane occupancy and the 3-bit kernel
   was instruction-bound at 2x the *dense* baseline's latency. v2 stores
   codes rank-major (`pack_codes_t`): every shift/mask spans the full seq
   block (1024+ lanes), fields stack to natural rank order with zero
   in-kernel permutes, and 3-bit is a 2-bit plane plus a 1-bit plane, each with its own field
   geometry (core/quant.py rank-major layout).

Dequantization is affine `x = scale * code + zero` (zero = (q_min - base) *
scale, one formula for sym and asym) and is folded *past* the matmuls:

  K path:  logits = s_col * (q . RoPE(codes @ B)) + z_col * (q . RoPE(colsum B))
           -- the zero-point term is the logit of one "virtual key" (the
           column sums of B), two extra (BS, W) x (W, hpg) matmuls/group.
  V path:  out    = codes_v @ (p * s_col) + sum(p * z_col) broadcast
           -- scales fold into the probability columns.

so the only full-width work on dequantized codes is shift/mask/convert --
no per-element multiply-add over (BS, rank) at all.

This implements the fused low-bit decode the reference leaves as a TODO
(/root/reference/README.md:24); the fp16 Triton analog of the K path is
kernel/abx_rope.py:48-111.

Grid: (batch, S_max / block_s), head groups statically unrolled, online
softmax carried in VMEM scratch across the sequential seq axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ....core.quant import QuantConfig, packed_nrows
from ..palu_decode import split_b_halves, _q_blockdiag, _rope_tables

__all__ = ["palu_flash_decode2", "palu_flash_decode2_quantized"]


def _unpack_rank_major(codes_ref, bits: int, rank: int, cdt):
    """uint8 block (rows, BS) -> bf16 codes (rank, BS) in natural rank
    order. All shift/mask ops are (rows, BS) -- full VPU lane width.
    Arithmetic runs in int32 (Mosaic has no uint8->bf16 cast)."""
    c = codes_ref[...].astype(jnp.int32)
    if bits in (2, 4):
        s = 8 // bits
        mask = 2**bits - 1
        parts = [((c >> (bits * k)) & mask) for k in range(s)]
        return jnp.concatenate(parts, axis=0).astype(cdt)
    if bits == 3:
        rl = rank // 4
        lo_rows, hi_rows = c[:rl], c[rl : rl + rank // 8]
        lo = jnp.concatenate(
            [((lo_rows >> (2 * k)) & 3) for k in range(4)], axis=0)
        hi = jnp.concatenate(
            [((hi_rows >> k) & 1) for k in range(8)], axis=0)
        return (lo | (hi << 2)).astype(cdt)
    if bits == 8:
        return c.astype(cdt)
    raise ValueError(f"unsupported bits: {bits}")


def _make_kernel2(
    *,
    block_s: int,
    theta: float,
    hd: int,
    g: int,
    hpg: int,
    sliding_window: Optional[int],
    qcfg: Optional[QuantConfig],
    rk: int,
    rv: int,
    compute_dtype=jnp.bfloat16,
    inv_freq_static=None,
    rope_scale: float = 1.0,
):
    quantized = qcfg is not None and qcfg.enabled
    scaled_rope = inv_freq_static is not None
    cdt = compute_dtype
    nh = g * hpg
    half = hd // 2

    def kernel(*refs):
        refs = list(refs)
        inv_freq_ref = refs.pop(5) if scaled_rope else None
        if quantized:
            (kv_len_ref, q1_ref, q2_ref, b1_ref, b2_ref,
             xk_codes, xk_scale, xk_zero,
             xv_codes, xv_scale, xv_zero,
             out_ref, m_scr, l_scr, acc_scr) = refs
        else:
            (kv_len_ref, q1_ref, q2_ref, b1_ref, b2_ref, xk_ref, xv_ref,
             out_ref, m_scr, l_scr, acc_scr) = refs

        sblk = pl.program_id(1)
        nblk = pl.num_programs(1)
        kv_len = kv_len_ref[pl.program_id(0)]

        @pl.when(sblk == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        pos_start = sblk * block_s
        inv_row = inv_freq_ref[0:1, :] if scaled_rope else None
        cos, sin = _rope_tables(jnp.int32(pos_start), block_s, half, theta, hpg,
                                inv_row, rope_scale)
        cos = cos.astype(jnp.float32)  # (BS, W)
        sin = sin.astype(jnp.float32)

        pos = jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0) + pos_start
        valid = pos < kv_len  # (BS, 1)
        if sliding_window is not None:
            valid = jnp.logical_and(valid, pos > (kv_len - 1) - sliding_window)

        scale = 1.0 / np.sqrt(hd)

        if quantized:
            # (g, BS) rows -> (BS, g) columns, once per block
            ks_col = xk_scale[...].astype(jnp.float32).T  # (BS, g)
            kz_col = xk_zero[...].astype(jnp.float32).T
            vs_col = xv_scale[...].astype(jnp.float32).T
            vz_col = xv_zero[...].astype(jnp.float32).T

        # ---- K path: logits (BS, nh) ----
        parts = []
        for gi in range(g):
            b1g = b1_ref[gi].astype(cdt)  # (rk, W)
            b2g = b2_ref[gi].astype(cdt)
            q1g = q1_ref[gi].astype(cdt)  # (W, hpg)
            q2g = q2_ref[gi].astype(cdt)
            if quantized:
                ck = _unpack_rank_major(xk_codes.at[gi], qcfg.bits, rk, cdt)
                # codes term: (codes^T @ B) via LHS-transposed contraction
                xb1 = jax.lax.dot_general(
                    ck, b1g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (BS, W)
                xb2 = jax.lax.dot_general(
                    ck, b2g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                r1 = (xb1 * cos - xb2 * sin).astype(cdt)
                r2 = (xb2 * cos + xb1 * sin).astype(cdt)
                lc = (
                    jnp.dot(r1, q1g, preferred_element_type=jnp.float32)
                    + jnp.dot(r2, q2g, preferred_element_type=jnp.float32)
                )  # (BS, hpg)
                # zero-point term: logit of the virtual key colsum(B)
                cs1 = jnp.sum(b1_ref[gi].astype(jnp.float32), axis=0,
                              keepdims=True)  # (1, W)
                cs2 = jnp.sum(b2_ref[gi].astype(jnp.float32), axis=0,
                              keepdims=True)
                z1 = (cs1 * cos - cs2 * sin).astype(cdt)  # (BS, W)
                z2 = (cs2 * cos + cs1 * sin).astype(cdt)
                lz = (
                    jnp.dot(z1, q1g, preferred_element_type=jnp.float32)
                    + jnp.dot(z2, q2g, preferred_element_type=jnp.float32)
                )  # (BS, hpg)
                lg = ks_col[:, gi : gi + 1] * lc + kz_col[:, gi : gi + 1] * lz
            else:
                x = xk_ref[gi].astype(cdt)  # (BS, rk) seq-major
                xb1 = jnp.dot(x, b1g, preferred_element_type=jnp.float32)
                xb2 = jnp.dot(x, b2g, preferred_element_type=jnp.float32)
                r1 = (xb1 * cos - xb2 * sin).astype(cdt)
                r2 = (xb2 * cos + xb1 * sin).astype(cdt)
                lg = (
                    jnp.dot(r1, q1g, preferred_element_type=jnp.float32)
                    + jnp.dot(r2, q2g, preferred_element_type=jnp.float32)
                )
            parts.append(lg)
        logits = jnp.concatenate(parts, axis=1) * scale  # (BS, nh)
        logits = jnp.where(valid, logits, -1e30)

        # ---- online softmax carry ----
        m_prev = m_scr[0:1, :]  # (1, nh)
        l_prev = l_scr[0:1, :]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (1, nh)
        p = jnp.exp(logits - m_new)  # (BS, nh)
        p = jnp.where(valid, p, 0.0)
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)

        # ---- V path: natural matmul (rv, BS) @ (BS, hpg), M = rv ----
        for gi in range(g):
            p_g = p[:, gi * hpg : (gi + 1) * hpg].astype(cdt)  # (BS, hpg)
            if quantized:
                cv = _unpack_rank_major(xv_codes.at[gi], qcfg.bits, rv, cdt)
                ps = (p[:, gi * hpg : (gi + 1) * hpg]
                      * vs_col[:, gi : gi + 1]).astype(cdt)
                pv = jnp.dot(cv, ps, preferred_element_type=jnp.float32)
                # zero-point: sum_t p[t]*z[t], same for every rv row
                zc = jnp.sum(p[:, gi * hpg : (gi + 1) * hpg]
                             * vz_col[:, gi : gi + 1], axis=0, keepdims=True)
                pv = pv + zc  # broadcast (1, hpg) over rv rows
            else:
                xv_t = xv_ref[gi].astype(cdt)  # (rv, BS) rank-major
                pv = jnp.dot(xv_t, p_g, preferred_element_type=jnp.float32)
            alpha_g = alpha[0:1, gi * hpg : (gi + 1) * hpg]  # (1, hpg)
            acc_scr[gi] = acc_scr[gi] * alpha_g + pv
        m_scr[0:1, :] = m_new
        l_scr[0:1, :] = l_new

        @pl.when(sblk == nblk - 1)
        def _finalize():
            for gi in range(g):
                l_g = l_scr[0:1, gi * hpg : (gi + 1) * hpg]
                out_ref[gi] = (acc_scr[gi] / l_g).astype(out_ref.dtype)

    return kernel


def _call2(kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra_in_specs,
           interpret, inputs, inv_freq_static=None):
    half = hd // 2
    nh = g * hpg
    grid = (b, s_max // block_s)
    inv_specs, inv_inputs = [], ()
    if inv_freq_static is not None:
        inv_specs = [pl.BlockSpec((1, half), lambda bi, si, *_: (0, 0))]
        inv_inputs = (jnp.asarray(inv_freq_static, jnp.float32).reshape(1, half),)
    # splice the optional inv_freq right after the 4 q/B inputs (the kernel
    # pops ref index 5: kv_len prefetch + q1 q2 b1 b2 then inv_freq)
    inputs = inputs[:5] + inv_inputs + inputs[5:]
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # older pallas versions
        compiler_params = None
    return pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (None, g, hpg * half, hpg), lambda bi, si, *_: (bi, 0, 0, 0)
                ),
                pl.BlockSpec(
                    (None, g, hpg * half, hpg), lambda bi, si, *_: (bi, 0, 0, 0)
                ),
                pl.BlockSpec((g, rk, hpg * half), lambda bi, si, *_: (0, 0, 0)),
                pl.BlockSpec((g, rk, hpg * half), lambda bi, si, *_: (0, 0, 0)),
            ]
            + inv_specs
            + extra_in_specs,
            out_specs=pl.BlockSpec(
                (None, g, rv, hpg), lambda bi, si, *_: (bi, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((8, nh), jnp.float32),
                pltpu.VMEM((8, nh), jnp.float32),
                pltpu.VMEM((g, rv, hpg), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, rv, hpg), jnp.float32),
        interpret=interpret,
    )(*inputs)


@functools.partial(
    jax.jit,
    static_argnames=("block_s", "theta", "sliding_window", "interpret",
                     "compute_dtype", "inv_freq_static", "rope_scale"),
)
def palu_flash_decode2(
    q: jax.Array,  # (B, nh, hd) roped at the current position
    b_k: jax.Array,  # (G, hpg, rk, hd)
    x_k: jax.Array,  # (B, G, S_max, rk) latents, pre-RoPE (seq-major)
    x_v_t: jax.Array,  # (B, G, rv, S_max) latents, RANK-MAJOR
    kv_len: jax.Array,
    *,
    block_s: int = 1024,
    theta: float = 10000.0,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    inv_freq_static=None,
    rope_scale: float = 1.0,
) -> jax.Array:
    """Fused decode attention -> (B, nh, rv) latent-space output."""
    b, nh, hd = q.shape
    g, hpg, rk, _ = b_k.shape
    s_max, rv = x_k.shape[2], x_v_t.shape[2]
    assert nh == g * hpg and s_max % block_s == 0, (nh, g, hpg, s_max, block_s)
    assert x_v_t.shape[3] == s_max

    b1, b2 = split_b_halves(b_k)
    q1, q2 = _q_blockdiag(q, g, hpg, hd // 2)
    kvl = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))

    kernel = _make_kernel2(
        block_s=block_s, theta=theta, hd=hd, g=g, hpg=hpg,
        sliding_window=sliding_window, qcfg=None, rk=rk, rv=rv,
        compute_dtype=compute_dtype, inv_freq_static=inv_freq_static,
        rope_scale=rope_scale,
    )
    extra = [
        pl.BlockSpec((None, g, block_s, rk), lambda bi, si, *_: (bi, 0, si, 0)),
        pl.BlockSpec((None, g, rv, block_s), lambda bi, si, *_: (bi, 0, 0, si)),
    ]
    out = _call2(
        kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra, interpret,
        (kvl, q1, q2, b1, b2, x_k, x_v_t), inv_freq_static=inv_freq_static,
    )
    # (B, G, rv, hpg) -> (B, nh, rv)
    return out.transpose(0, 1, 3, 2).reshape(b, g * hpg, rv)


@functools.partial(
    jax.jit,
    static_argnames=("qcfg", "rk", "rv", "block_s", "theta", "sliding_window",
                     "interpret", "compute_dtype", "inv_freq_static",
                     "rope_scale"),
)
def palu_flash_decode2_quantized(
    q: jax.Array,  # (B, nh, hd)
    b_k: jax.Array,  # (G, hpg, rk, hd)
    xk_codes: jax.Array,  # (B, G, packed_nrows(rk), S_max) uint8 rank-major
    xk_scale: jax.Array,  # (B, G, S_max) f32
    xk_zero: jax.Array,  # (B, G, S_max) f32
    xv_codes: jax.Array,  # (B, G, packed_nrows(rv), S_max) uint8
    xv_scale: jax.Array,
    xv_zero: jax.Array,
    kv_len: jax.Array,
    *,
    qcfg: QuantConfig,
    rk: int,
    rv: int,
    block_s: int = 1024,
    theta: float = 10000.0,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    inv_freq_static=None,
    rope_scale: float = 1.0,
) -> jax.Array:
    """Decode attention with wide-lane fused dequant of the rank-major
    packed latent cache (per-row affine scales; qcfg.group_size == 0)."""
    assert qcfg.enabled and qcfg.group_size == 0
    b, nh, hd = q.shape
    g, hpg = b_k.shape[0], b_k.shape[1]
    s_max = xk_codes.shape[3]
    nrk = packed_nrows(rk, qcfg.bits)
    nrv = packed_nrows(rv, qcfg.bits)
    assert xk_codes.shape[2] == nrk and xv_codes.shape[2] == nrv
    assert s_max % block_s == 0

    b1, b2 = split_b_halves(b_k)
    q1, q2 = _q_blockdiag(q, g, hpg, hd // 2)
    kvl = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))

    kernel = _make_kernel2(
        block_s=block_s, theta=theta, hd=hd, g=g, hpg=hpg,
        sliding_window=sliding_window, qcfg=qcfg, rk=rk, rv=rv,
        compute_dtype=compute_dtype, inv_freq_static=inv_freq_static,
        rope_scale=rope_scale,
    )

    def rows_blk(nrows):
        return pl.BlockSpec(
            (None, g, nrows, block_s), lambda bi, si, *_: (bi, 0, 0, si)
        )

    def seq_blk():
        return pl.BlockSpec((None, g, block_s), lambda bi, si, *_: (bi, 0, si))

    extra = [rows_blk(nrk), seq_blk(), seq_blk(), rows_blk(nrv), seq_blk(),
             seq_blk()]
    out = _call2(
        kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra, interpret,
        (kvl, q1, q2, b1, b2, xk_codes, xk_scale, xk_zero,
         xv_codes, xv_scale, xv_zero), inv_freq_static=inv_freq_static,
    )
    return out.transpose(0, 1, 3, 2).reshape(b, g * hpg, rv)
