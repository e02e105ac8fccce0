"""Pallas TPU fused Palu flash-decode, v3: quantized latent cache with the
per-block work stripped to what the converged-clock probes say actually
costs time.

Chain-256 (clock-converged, docs/BENCH.md) measurements that shaped v3:

- pure streaming of the bf16 latent cache runs at 78% of HBM SoL; the
  quantized caches stream 4-5x fewer bytes, so the kernel budget is
  compute, not DMA;
- sub-byte extraction (shift/mask/convert over every value) is ~free on
  the VPU, and so is the sublane concatenate that glues extracted parts
  into one (rank, BS) operand -- but *splitting* the reconstruct matmul
  into per-part K=16..64 dots would waste the 128-deep MXU contraction,
  so v3 keeps v2's extract-concat-dot structure;
- what is NOT free in v1/v2 is per-block RoPE overhead: transcendental
  cos/sin + hpg-way lane tiling every block, a SECOND full-width (BS, W)
  rotation for the affine zero-point term, and four (g, BS) scale-row
  transposes per block.

v3 therefore:

1. **Static relative-position tables.** RoPE(s) = R(s0) R(s - s0) for a
   block starting at s0: the (block_s, hpg*half) cos/sin tables of the
   RELATIVE positions are position-independent and passed in once
   (constant-index block, stays VMEM-resident); the per-block absolute
   offset is folded into the tiny (W, hpg) block-diagonal query operand
   via a (nblk, W) offset table row -- no transcendentals, no tiling, and
   only W*hpg*6 multiply-adds per group-block touch the offset.
2. **Zero-point term as two small dots.** The affine dequant
   x = scale*code + zero contributes the logit of one "virtual key"
   (colsum of B) scaled per position. Because that key is
   position-independent, its roped logit is  cos_rel @ A' + sin_rel @ C'
   with A' = cs1*q1' + cs2*q2', C' = cs1*q2' - cs2*q1' precomputed per
   block from the offset-rotated query -- the (BS, W) zero-point rotation
   of v2 disappears entirely.
3. **Pre-transposed scale layout.** Scales/zeros arrive (B, S, G) so the
   per-block slice is directly the (BS, g) column form the logit/value
   folds consume; v2's four per-block (g, BS) transposes disappear.
4. **1/sqrt(hd) folded into the query operand** outside the kernel.

The fp16 Triton analog of the K path is the reference's
kernel/abx_rope.py:48-111; the fused low-bit dequant is the TODO the
reference never built (/root/reference/README.md:24).
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
from ..palu_decode import split_b_halves, _q_blockdiag

__all__ = ["palu_flash_decode3_quantized"]


def _unpack_rank_major(codes_ref_block, bits: int, rank: int, cdt):
    """uint8 block (rows, BS) -> codes (rank, BS) in natural rank order.
    Shift/mask ops run full-lane-width; the sublane concatenate is cheap
    (measured +46us over no-concat for all 268M K+V values)."""
    c = codes_ref_block.astype(jnp.int32)
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


def _rel_tables(block_s: int, half: int, hpg: int, theta: float,
                inv_freq_static, rope_scale: float):
    """Static (block_s, hpg*half) relative cos/sin and the inv_freq row.
    rope_scale (yarn mscale) multiplies cos AND sin, i.e. the whole
    rotation; folding it once into the relative tables scales every
    logit term built from them."""
    if inv_freq_static is not None:
        inv_freq = np.asarray(inv_freq_static, np.float64).reshape(half)
    else:
        inv_freq = 1.0 / theta ** (np.arange(half, dtype=np.float64) * 2 / (2 * half))
    rel = np.arange(block_s, dtype=np.float64)[:, None] * inv_freq[None, :]
    cos = np.cos(rel) * rope_scale
    sin = np.sin(rel) * rope_scale
    cos = np.tile(cos, (1, hpg)).astype(np.float32)
    sin = np.tile(sin, (1, hpg)).astype(np.float32)
    return cos, sin, inv_freq


def _offset_tables(nblk: int, block_s: int, inv_freq, hpg: int):
    """(nblk, hpg*half) cos/sin of the absolute block-start offsets."""
    s0 = (np.arange(nblk, dtype=np.float64) * block_s)[:, None] * inv_freq[None, :]
    c0 = np.tile(np.cos(s0), (1, hpg)).astype(np.float32)
    s0t = np.tile(np.sin(s0), (1, hpg)).astype(np.float32)
    return c0, s0t


def _make_kernel3(
    *,
    block_s: int,
    hd: int,
    g: int,
    hpg: int,
    sliding_window: Optional[int],
    qcfg: QuantConfig,
    rk: int,
    rv: int,
    compute_dtype=jnp.bfloat16,
):
    cdt = compute_dtype
    nh = g * hpg

    def kernel(kv_len_ref, q1_ref, q2_ref, b1_ref, b2_ref,
               cos_ref, sin_ref, c0_ref, s0_ref,
               xk_codes, xk_sz, xv_codes, xv_sz,
               out_ref, m_scr, l_scr, acc_scr):
        sblk = pl.program_id(1)
        nblk = pl.num_programs(1)
        kv_len = kv_len_ref[pl.program_id(0)]

        @pl.when(sblk == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        pos_start = sblk * block_s
        cos = cos_ref[...]  # (BS, W) static relative tables
        sin = sin_ref[...]
        c0 = c0_ref[pl.ds(sblk, 1), :]  # (1, W) this block's offset row
        s0 = s0_ref[pl.ds(sblk, 1), :]

        pos = jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0) + pos_start
        valid = pos < kv_len  # (BS, 1)
        if sliding_window is not None:
            valid = jnp.logical_and(valid, pos > (kv_len - 1) - sliding_window)

        # scales/zeros (BS, 2g): columns [0:g] scale, [g:2g] zero
        ks_col = xk_sz[...]
        vs_col = xv_sz[...]

        # ---- K path ----
        parts = []
        for gi in range(g):
            # offset-rotated block-diagonal query (W, hpg); rotation by
            # R(-s0) so the in-block tables are relative positions
            q1g = q1_ref[gi].astype(jnp.float32)
            q2g = q2_ref[gi].astype(jnp.float32)
            q1r = (q1g * c0.T + q2g * s0.T).astype(cdt)
            q2r = (q2g * c0.T - q1g * s0.T).astype(cdt)

            ck = _unpack_rank_major(xk_codes[gi], qcfg.bits, rk, cdt)
            b1g = b1_ref[gi].astype(cdt)  # (rk, W)
            b2g = b2_ref[gi].astype(cdt)
            xb1 = jax.lax.dot_general(
                ck, b1g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (BS, W)
            xb2 = jax.lax.dot_general(
                ck, b2g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # relative-position rotation (4 VPU ops via fma pairing)
            xb1s = xb1 * sin
            xb2s = xb2 * sin
            r1 = (xb1 * cos - xb2s).astype(cdt)
            r2 = (xb2 * cos + xb1s).astype(cdt)
            lc = (
                jnp.dot(r1, q1r, preferred_element_type=jnp.float32)
                + jnp.dot(r2, q2r, preferred_element_type=jnp.float32)
            )  # (BS, hpg)
            # zero-point virtual key: position-independent colsums of B,
            # roped via the SAME static tables against precomputed A'/C'
            cs1 = jnp.sum(b1_ref[gi].astype(jnp.float32), axis=0,
                          keepdims=True)  # (1, W)
            cs2 = jnp.sum(b2_ref[gi].astype(jnp.float32), axis=0,
                          keepdims=True)
            a_p = (cs1.T * q1r.astype(jnp.float32)
                   + cs2.T * q2r.astype(jnp.float32)).astype(cdt)  # (W, hpg)
            c_p = (cs1.T * q2r.astype(jnp.float32)
                   - cs2.T * q1r.astype(jnp.float32)).astype(cdt)
            lz = (
                jnp.dot(cos.astype(cdt), a_p, preferred_element_type=jnp.float32)
                + jnp.dot(sin.astype(cdt), c_p, preferred_element_type=jnp.float32)
            )  # (BS, hpg)
            lg = (ks_col[:, gi : gi + 1] * lc
                  + ks_col[:, g + gi : g + gi + 1] * lz)
            parts.append(lg)
        logits = jnp.concatenate(parts, axis=1)  # (BS, nh); 1/sqrt(hd) folded in q
        logits = jnp.where(valid, logits, -1e30)

        # ---- online softmax carry ----
        m_prev = m_scr[0:1, :]  # (1, nh)
        l_prev = l_scr[0:1, :]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)  # (BS, nh)
        p = jnp.where(valid, p, 0.0)
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)

        # ---- V path: (rv, BS) @ (BS, hpg) with scale folded into p ----
        for gi in range(g):
            cv = _unpack_rank_major(xv_codes[gi], qcfg.bits, rv, cdt)
            p_g = p[:, gi * hpg : (gi + 1) * hpg]
            ps = (p_g * vs_col[:, gi : gi + 1]).astype(cdt)
            pv = jnp.dot(cv, ps, preferred_element_type=jnp.float32)
            zc = jnp.sum(p_g * vs_col[:, g + gi : g + gi + 1], axis=0,
                         keepdims=True)  # (1, hpg)
            pv = pv + zc
            alpha_g = alpha[0:1, gi * hpg : (gi + 1) * hpg]
            acc_scr[gi] = acc_scr[gi] * alpha_g + pv
        m_scr[0:1, :] = m_new
        l_scr[0:1, :] = l_new

        @pl.when(sblk == nblk - 1)
        def _finalize():
            for gi in range(g):
                l_g = l_scr[0:1, gi * hpg : (gi + 1) * hpg]
                out_ref[gi] = (acc_scr[gi] / l_g).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("qcfg", "rk", "rv", "block_s", "theta", "sliding_window",
                     "interpret", "compute_dtype", "inv_freq_static",
                     "rope_scale"),
)
def palu_flash_decode3_quantized(
    q: jax.Array,  # (B, nh, hd)
    b_k: jax.Array,  # (G, hpg, rk, hd)
    xk_codes: jax.Array,  # (B, G, packed_nrows(rk), S_max) uint8 rank-major
    xk_sz: jax.Array,  # (B, S_max, 2G) f32: scales cols [0:G], zeros [G:2G]
    xv_codes: jax.Array,  # (B, G, packed_nrows(rv), S_max) uint8
    xv_sz: jax.Array,  # (B, S_max, 2G) f32
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
    """Decode attention over the affine-quantized rank-major latent cache
    -> (B, nh, rv) latent-space output. See module docstring for the v3
    design; numerics match palu_flash_decode2_quantized (same dequant
    formula, same online softmax) and are covered by the differential
    tests in tests/test_kernels.py."""
    assert qcfg.enabled and qcfg.group_size == 0
    b, nh, hd = q.shape
    g, hpg = b_k.shape[0], b_k.shape[1]
    s_max = xk_codes.shape[3]
    half = hd // 2
    W = hpg * half
    nrk = packed_nrows(rk, qcfg.bits)
    nrv = packed_nrows(rv, qcfg.bits)
    assert xk_codes.shape[2] == nrk and xv_codes.shape[2] == nrv
    assert xk_sz.shape == (b, s_max, 2 * g) and xv_sz.shape == (b, s_max, 2 * g)
    assert s_max % block_s == 0
    nblk = s_max // block_s

    b1, b2 = split_b_halves(b_k)
    q_scaled = (q.astype(jnp.float32) / np.sqrt(hd)).astype(q.dtype)
    q1, q2 = _q_blockdiag(q_scaled, g, hpg, half)
    kvl = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))

    cos_rel, sin_rel, inv_freq = _rel_tables(
        block_s, half, hpg, theta, inv_freq_static, rope_scale)
    c0_tab, s0_tab = _offset_tables(nblk, block_s, inv_freq, hpg)

    kernel = _make_kernel3(
        block_s=block_s, hd=hd, g=g, hpg=hpg,
        sliding_window=sliding_window, qcfg=qcfg, rk=rk, rv=rv,
        compute_dtype=compute_dtype,
    )

    grid = (b, nblk)
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # older pallas versions
        compiler_params = None

    out = pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, g, W, hpg), lambda bi, si, *_: (bi, 0, 0, 0)),
                pl.BlockSpec((None, g, W, hpg), lambda bi, si, *_: (bi, 0, 0, 0)),
                pl.BlockSpec((g, rk, W), lambda bi, si, *_: (0, 0, 0)),
                pl.BlockSpec((g, rk, W), lambda bi, si, *_: (0, 0, 0)),
                pl.BlockSpec((block_s, W), lambda bi, si, *_: (0, 0)),
                pl.BlockSpec((block_s, W), lambda bi, si, *_: (0, 0)),
                pl.BlockSpec((nblk, W), lambda bi, si, *_: (0, 0)),
                pl.BlockSpec((nblk, W), lambda bi, si, *_: (0, 0)),
                pl.BlockSpec((None, g, nrk, block_s),
                             lambda bi, si, *_: (bi, 0, 0, si)),
                pl.BlockSpec((None, block_s, 2 * g),
                             lambda bi, si, *_: (bi, si, 0)),
                pl.BlockSpec((None, g, nrv, block_s),
                             lambda bi, si, *_: (bi, 0, 0, si)),
                pl.BlockSpec((None, block_s, 2 * g),
                             lambda bi, si, *_: (bi, si, 0)),
            ],
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
    )(
        kvl, q1, q2, b1, b2,
        jnp.asarray(cos_rel), jnp.asarray(sin_rel),
        jnp.asarray(c0_tab), jnp.asarray(s0_tab),
        xk_codes, xk_sz, xv_codes, xv_sz,
    )
    return out.transpose(0, 1, 3, 2).reshape(b, g * hpg, rv)


def sz_pack(scale: jax.Array, zero: jax.Array) -> jax.Array:
    """(B, G, S) scale + zero -> the kernel's (B, S, 2G) layout."""
    return jnp.concatenate(
        [jnp.swapaxes(scale, 1, 2), jnp.swapaxes(zero, 1, 2)], axis=-1
    ).astype(jnp.float32)
