"""Pallas TPU kernel: fused Palu flash-decode over the latent KV cache.

This is the TPU-native successor of the reference's Triton `_abx_fwd` decode
kernel (kernel/abx_rope.py:48-111) -- and goes further: where the reference
runs three kernels per step (abx logits -> softmax -> probs @ v_latents,
kernel/palu_attention.py:207-251), this kernel performs the *entire* decode
attention in one pass over HBM:

    per sequence block:
        K-block reconstruct:  xb = x_k_blk @ B            (MXU)
        on-the-fly RoPE:      cos/sin from absolute block positions,
                              computed in-kernel (the abx_rope.py:20-27
                              idea, but parameterized -- no hardcoded
                              32 heads / 128 head_dim / theta=10000)
        masked online softmax over logits q . xb^T
        value accumulate:     p @ x_v_blk  (latent V -- never reconstructed)

so each latent-cache byte is read exactly once per decode step: the kernel is
HBM-bandwidth-bound at ~(r_k + r_v) elements/token/layer, the scheme's
theoretical minimum (vs 2 * n_kv_heads * head_dim for a dense KV cache).

MXU-native formulation (everything is a matmul, no per-head vector dots --
Mosaic cannot lower lane-dim vector reductions):
  - B is pre-split on the host into the two RoPE halves, columns grouped as
    [head, half-dim]:  B1, B2: (rk, hpg*half)
  - the query enters as two block-diagonal matrices Q1,Q2 (hpg*half, hpg)
    so `logits = r1 @ Q1 + r2 @ Q2` computes every head's dot at once
  - the accumulator is kept transposed (rv, hpg) so the value update is
    `xv^T @ p` and the running rescale broadcasts over sublanes.

The *_quantized variant reads an int-packed cache (2/3/4-bit planar codes
from palu_tpu.core.quant) and fuses dequantization into the same pass -- the
reference's stated-but-unimplemented TODO (README.md:24).

Grid: (batch, G, S_max / BLOCK_S), sequential over the last axis with the
online-softmax carry in VMEM scratch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.quant import QuantConfig, packed_nbytes

__all__ = [
    "palu_flash_decode",
    "palu_flash_decode_quantized",
    "split_b_halves",
]


def split_b_halves(b_k: jax.Array) -> tuple:
    """(G, hpg, rk, hd) -> (B1, B2) each (G, rk, hpg*half): per-head columns
    for the first/second RoPE half of the head dim."""
    g, hpg, rk, hd = b_k.shape
    half = hd // 2
    b1 = b_k[..., :half].transpose(0, 2, 1, 3).reshape(g, rk, hpg * half)
    b2 = b_k[..., half:].transpose(0, 2, 1, 3).reshape(g, rk, hpg * half)
    return b1, b2


def _q_blockdiag(q: jax.Array, g: int, hpg: int, half: int) -> tuple:
    """q (B, nh, hd) -> (Q1, Q2) each (B, G, hpg*half, hpg) block-diagonal:
    Q1[b, g, j*half+e, j] = q1[b, g, j, e]."""
    b = q.shape[0]
    qg = q.reshape(b, g, hpg, 2, half)  # split halves
    eye = jnp.eye(hpg, dtype=q.dtype)  # (hpg, hpg)
    # (B, G, hpg, half, hpg): diag over head index
    q1 = qg[:, :, :, 0, :][..., None] * eye[None, None, :, None, :]
    q2 = qg[:, :, :, 1, :][..., None] * eye[None, None, :, None, :]
    return (
        q1.reshape(b, g, hpg * half, hpg),
        q2.reshape(b, g, hpg * half, hpg),
    )


def _rope_tables(pos_start, block, half, theta, hpg, inv_freq_row=None,
                 rope_scale: float = 1.0):
    """cos/sin (block, hpg*half): per-position tables tiled across heads.

    inv_freq_row: optional (1, half) array (read from a kernel input ref)
    overriding the theta schedule (rope_scaling), with rope_scale
    multiplying the tables (yarn attention scaling)."""
    if inv_freq_row is not None:
        inv_freq = inv_freq_row.astype(jnp.float32).reshape(1, half)
    else:
        exponent = (
            jax.lax.broadcasted_iota(jnp.int32, (1, half), 1).astype(jnp.float32)
            * (2.0 / (2 * half))
        )
        inv_freq = 1.0 / jnp.power(jnp.float32(theta), exponent)  # (1, half)
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0).astype(jnp.float32)
        + pos_start.astype(jnp.float32)
    )
    freqs = pos * inv_freq  # (block, half)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    if rope_scale != 1.0:
        cos = cos * rope_scale
        sin = sin * rope_scale
    if hpg > 1:
        cos = jnp.concatenate([cos] * hpg, axis=1)
        sin = jnp.concatenate([sin] * hpg, axis=1)
    return cos, sin


def _unpack_block(codes_i32, bits: int, rank: int):
    """(BS, nbytes) int32 planar-packed codes -> (BS, rank) int32.

    Mirrors palu_tpu.core.quant.unpack_codes: lane-uniform shifts/masks,
    concatenation along lanes restores logical order.
    """
    if bits in (2, 4):
        s = 8 // bits
        mask = 2**bits - 1
        fields = [(codes_i32 >> (bits * k)) & mask for k in range(s)]
        return jnp.concatenate(fields, axis=-1)
    if bits == 3:
        n4 = rank // 4
        lo_codes = codes_i32[:, :n4]
        hi_codes = codes_i32[:, n4:]
        lo = jnp.concatenate([(lo_codes >> (2 * k)) & 3 for k in range(4)], axis=-1)
        hi = jnp.concatenate([(hi_codes >> k) & 1 for k in range(8)], axis=-1)
        return lo | (hi << 2)
    raise ValueError(f"unsupported bits: {bits}")


def _make_decode_kernel(
    *,
    block_s: int,
    theta: float,
    hd: int,
    hpg: int,
    sliding_window: Optional[int],
    qcfg: Optional[QuantConfig],
    rk: int,
    rv: int,
    compute_dtype=jnp.bfloat16,
    head_major_acc: bool = True,
    inv_freq_static=None,
    rope_scale: float = 1.0,
):
    quantized = qcfg is not None and qcfg.enabled
    if inv_freq_static is not None:
        raise NotImplementedError(
            "v1 kernel does not take scaled-rope tables; use palu_decode4 "
            "or the XLA decode path"
        )
    cdt = compute_dtype

    def kernel(*refs):
        if quantized:
            (kv_len_ref, q1_ref, q2_ref, b1_ref, b2_ref,
             xk_codes, xk_scales, xk_base,
             xv_codes, xv_scales, xv_base,
             out_ref, m_scr, l_scr, acc_scr) = refs
        else:
            (kv_len_ref, q1_ref, q2_ref, b1_ref, b2_ref, xk_ref, xv_ref,
             out_ref, m_scr, l_scr, acc_scr) = refs

        sblk = pl.program_id(2)
        nblk = pl.num_programs(2)
        kv_len = kv_len_ref[pl.program_id(0)]  # per-lane length

        @pl.when(sblk == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        half = hd // 2
        pos_start = sblk * block_s
        cos, sin = _rope_tables(jnp.int32(pos_start), block_s, half, theta, hpg,
                                None, rope_scale)

        pos = jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0) + pos_start
        valid = pos < kv_len  # (BS, 1)
        if sliding_window is not None:
            valid = jnp.logical_and(valid, pos > (kv_len - 1) - sliding_window)

        if quantized:
            q_min = -(2 ** (qcfg.bits - 1)) if qcfg.sym else 0

            def dequant(codes_ref, scales_ref, base_ref, rank):
                codes = _unpack_block(codes_ref[...].astype(jnp.int32), qcfg.pack_bits, rank)
                vals = (codes + q_min).astype(cdt)
                return (vals - base_ref[...].astype(cdt)) * scales_ref[...].astype(cdt)

            x = dequant(xk_codes, xk_scales, xk_base, rk)
            xv = dequant(xv_codes, xv_scales, xv_base, rv)
        else:
            x = xk_ref[...].astype(cdt)
            xv = xv_ref[...].astype(cdt)

        # K-block reconstruction for ALL heads: two MXU matmuls (compute in
        # cdt -- native MXU width -- accumulating fp32; fp32 everywhere blows
        # the VMEM budget and stalls the DMA pipeline)
        xb1 = jnp.dot(x, b1_ref[...].astype(cdt),
                      preferred_element_type=jnp.float32)  # (BS, hpg*half)
        xb2 = jnp.dot(x, b2_ref[...].astype(cdt),
                      preferred_element_type=jnp.float32)
        r1 = (xb1 * cos - xb2 * sin).astype(cdt)
        r2 = (xb2 * cos + xb1 * sin).astype(cdt)

        # logits for all heads at once via block-diagonal Q
        scale = 1.0 / np.sqrt(hd)
        logits = (
            jnp.dot(r1, q1_ref[...].astype(cdt),
                    preferred_element_type=jnp.float32)
            + jnp.dot(r2, q2_ref[...].astype(cdt),
                      preferred_element_type=jnp.float32)
        ) * scale  # (BS, hpg)
        logits = jnp.where(valid, logits, -1e30)

        m_prev = m_scr[0:1, :]  # (1, hpg)
        l_prev = l_scr[0:1, :]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (1, hpg)
        p = jnp.exp(logits - m_new)  # (BS, hpg)
        p = jnp.where(valid, p, 0.0)
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)

        if head_major_acc:
            # transpose the SMALL probs matrix (BS, hpg) -> (hpg, BS) and do
            # a natural matmul against xv; transposing xv instead costs a
            # full-block lane/sublane shuffle per step
            p_t = p.astype(cdt).T  # (hpg, BS)
            pv = jnp.dot(p_t, xv, preferred_element_type=jnp.float32)  # (hpg, rv)
            alpha_col = alpha.T  # (hpg, 1)
            acc_scr[...] = acc_scr[...] * alpha_col + pv
            m_scr[0:1, :] = m_new
            l_scr[0:1, :] = l_new

            @pl.when(sblk == nblk - 1)
            def _finalize():
                out_ref[...] = (acc_scr[...] / l_scr[0:1, :].T).astype(out_ref.dtype)
        else:
            # transposed value update: (rv, BS) @ (BS, hpg) -> (rv, hpg)
            pv = jax.lax.dot_general(
                xv, p.astype(cdt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[...] = acc_scr[...] * alpha + pv
            m_scr[0:1, :] = m_new
            l_scr[0:1, :] = l_new

            @pl.when(sblk == nblk - 1)
            def _finalize():
                out_ref[...] = (acc_scr[...] / l_scr[0:1, :]).astype(out_ref.dtype)

    return kernel




def _make_decode_kernel_merged(
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
    """All head groups in one grid step (grid = (B, S/BS)).

    The split-group kernel wastes the VPU badly: softmax elementwise ops on
    (BS, hpg=4) tensors pad to 128 lanes (32x idle), and the RoPE tables are
    recomputed per group. Merging groups makes the softmax run on (BS, nh)
    once, shares cos/sin across groups, and cuts grid steps by G -- per-step
    DMA grows to G blocks, which is what actually keeps the HBM pipe busy.
    """
    quantized = qcfg is not None and qcfg.enabled
    if inv_freq_static is not None:
        raise NotImplementedError(
            "v1 kernel does not take scaled-rope tables; use palu_decode4 "
            "or the XLA decode path"
        )
    cdt = compute_dtype
    nh = g * hpg

    def kernel(*refs):
        if quantized:
            (kv_len_ref, q1_ref, q2_ref, b1_ref, b2_ref,
             xk_codes, xk_scales, xk_base,
             xv_codes, xv_scales, xv_base,
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

        half = hd // 2
        pos_start = sblk * block_s
        cos, sin = _rope_tables(jnp.int32(pos_start), block_s, half, theta, hpg,
                                None, rope_scale)
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)

        pos = jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0) + pos_start
        valid = pos < kv_len  # (BS, 1)
        if sliding_window is not None:
            valid = jnp.logical_and(valid, pos > (kv_len - 1) - sliding_window)

        if quantized:
            q_min = -(2 ** (qcfg.bits - 1)) if qcfg.sym else 0

            def dequant_all(codes, scales, base, rank):
                """Unpack ALL groups in one batch: (G, BS, nb) -> (G*BS, rank).
                Per-group unpacking issues ~25 tiny VPU ops per group whose
                instruction overhead dominates; batching makes each op 8x
                wider for the same total element count."""
                flat = codes.reshape(g * block_s, -1).astype(jnp.int32)
                c = _unpack_block(flat, qcfg.pack_bits, rank)
                vals = (c + q_min).astype(cdt)
                s_ = scales.reshape(g * block_s, 1).astype(cdt)
                b_ = base.reshape(g * block_s, 1).astype(cdt)
                return (vals - b_) * s_

        scale = 1.0 / np.sqrt(hd)
        if quantized:
            xk_all = dequant_all(xk_codes[...], xk_scales[...], xk_base[...], rk)
            xv_all = dequant_all(xv_codes[...], xv_scales[...], xv_base[...], rv)
        parts = []
        for gi in range(g):  # static unroll over head groups
            if quantized:
                x = xk_all[gi * block_s : (gi + 1) * block_s, :]
            else:
                x = xk_ref[gi].astype(cdt)  # (BS, rk)
            xb1 = jnp.dot(x, b1_ref[gi].astype(cdt),
                          preferred_element_type=jnp.float32)
            xb2 = jnp.dot(x, b2_ref[gi].astype(cdt),
                          preferred_element_type=jnp.float32)
            r1 = (xb1 * cos - xb2 * sin).astype(cdt)
            r2 = (xb2 * cos + xb1 * sin).astype(cdt)
            lg = (
                jnp.dot(r1, q1_ref[gi].astype(cdt),
                        preferred_element_type=jnp.float32)
                + jnp.dot(r2, q2_ref[gi].astype(cdt),
                          preferred_element_type=jnp.float32)
            )  # (BS, hpg)
            parts.append(lg)
        logits = jnp.concatenate(parts, axis=1) * scale  # (BS, nh)
        logits = jnp.where(valid, logits, -1e30)

        m_prev = m_scr[0:1, :]  # (1, nh)
        l_prev = l_scr[0:1, :]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (1, nh)
        p = jnp.exp(logits - m_new)
        p = jnp.where(valid, p, 0.0)
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)

        p_t = p.astype(cdt).T  # (nh, BS) -- one small transpose
        alpha_col = alpha.T  # (nh, 1)
        for gi in range(g):
            if quantized:
                xv = xv_all[gi * block_s : (gi + 1) * block_s, :]
            else:
                xv = xv_ref[gi].astype(cdt)  # (BS, rv)
            pv = jnp.dot(p_t[gi * hpg : (gi + 1) * hpg, :], xv,
                         preferred_element_type=jnp.float32)  # (hpg, rv)
            sl = slice(gi * hpg, (gi + 1) * hpg)
            acc_scr[sl, :] = acc_scr[sl, :] * alpha_col[sl] + pv
        m_scr[0:1, :] = m_new
        l_scr[0:1, :] = l_new

        @pl.when(sblk == nblk - 1)
        def _finalize():
            out_ref[...] = (acc_scr[...] / l_scr[0:1, :].T).astype(out_ref.dtype)

    return kernel


def _merged_call(kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra_in_specs,
                 interpret, inputs):
    half = hd // 2
    nh = g * hpg
    grid = (b, s_max // block_s)
    try:
        # default scoped-VMEM cap is 16MB; v5e has far more physical VMEM --
        # raising it allows larger seq blocks (fewer grid steps, better
        # DMA/compute amortization)
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
                pl.BlockSpec(
                    (None, g, hpg * half, hpg), lambda bi, si, *_: (bi, 0, 0, 0)
                ),
                pl.BlockSpec(
                    (None, g, hpg * half, hpg), lambda bi, si, *_: (bi, 0, 0, 0)
                ),
                pl.BlockSpec((g, rk, hpg * half), lambda bi, si, *_: (0, 0, 0)),
                pl.BlockSpec((g, rk, hpg * half), lambda bi, si, *_: (0, 0, 0)),
            ]
            + extra_in_specs,
            out_specs=pl.BlockSpec(
                (None, nh, rv), lambda bi, si, *_: (bi, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((8, nh), jnp.float32),
                pltpu.VMEM((8, nh), jnp.float32),
                pltpu.VMEM((nh, rv), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nh, rv), jnp.float32),
        interpret=interpret,
    )(*inputs)
    return out


def _common_call(kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra_in_specs,
                 interpret, inputs, head_major_acc=True):
    half = hd // 2
    grid = (b, g, s_max // block_s)
    acc_shape = (hpg, rv) if head_major_acc else (rv, hpg)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (None, None, hpg * half, hpg),
                    lambda bi, gi, si, *_: (bi, gi, 0, 0),
                ),
                pl.BlockSpec(
                    (None, None, hpg * half, hpg),
                    lambda bi, gi, si, *_: (bi, gi, 0, 0),
                ),
                pl.BlockSpec(
                    (None, rk, hpg * half), lambda bi, gi, si, *_: (gi, 0, 0)
                ),
                pl.BlockSpec(
                    (None, rk, hpg * half), lambda bi, gi, si, *_: (gi, 0, 0)
                ),
            ]
            + extra_in_specs,
            out_specs=pl.BlockSpec(
                (None, None) + acc_shape, lambda bi, gi, si, *_: (bi, gi, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((8, hpg), jnp.float32),
                pltpu.VMEM((8, hpg), jnp.float32),
                pltpu.VMEM(acc_shape, jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, g) + acc_shape, jnp.float32),
        interpret=interpret,
    )(*inputs)
    if head_major_acc:
        return out.reshape(b, g * hpg, rv)
    # (B, G, rv, hpg) -> (B, nh, rv)
    return out.transpose(0, 1, 3, 2).reshape(b, g * hpg, rv)


@functools.partial(
    jax.jit,
    static_argnames=("block_s", "theta", "sliding_window", "interpret",
                     "compute_dtype", "head_major_acc", "impl",
                     "inv_freq_static", "rope_scale"),
)
def palu_flash_decode(
    q: jax.Array,  # (B, nh, hd) roped at the current position
    b_k: jax.Array,  # (G, hpg, rk, hd)
    x_k: jax.Array,  # (B, G, S_max, rk) latents, pre-RoPE
    x_v: jax.Array,  # (B, G, S_max, rv)
    kv_len: jax.Array,  # () or (B,) int32 valid lengths
    *,
    block_s: int = 512,
    theta: float = 10000.0,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    head_major_acc: bool = True,
    impl: str = "merged",
    inv_freq_static=None,  # tuple of hd/2 floats (rope_scaling)
    rope_scale: float = 1.0,
) -> jax.Array:
    """Fused decode attention -> (B, nh, rv) latent-space output (feed into
    the U_v-fused o_proj)."""
    b, nh, hd = q.shape
    g, hpg, rk, _ = b_k.shape
    s_max, rv = x_k.shape[2], x_v.shape[3]
    assert nh == g * hpg and s_max % block_s == 0, (nh, g, hpg, s_max, block_s)

    b1, b2 = split_b_halves(b_k)
    q1, q2 = _q_blockdiag(q, g, hpg, hd // 2)
    kvl = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))

    if impl == "merged":
        kernel = _make_decode_kernel_merged(
            block_s=block_s, theta=theta, hd=hd, g=g, hpg=hpg,
            sliding_window=sliding_window, qcfg=None, rk=rk, rv=rv,
            compute_dtype=compute_dtype, inv_freq_static=inv_freq_static,
            rope_scale=rope_scale,
        )
        extra = [
            pl.BlockSpec((None, g, block_s, rk), lambda bi, si, *_: (bi, 0, si, 0)),
            pl.BlockSpec((None, g, block_s, rv), lambda bi, si, *_: (bi, 0, si, 0)),
        ]
        return _merged_call(
            kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra, interpret,
            (kvl, q1, q2, b1, b2, x_k, x_v),
        )

    kernel = _make_decode_kernel(
        block_s=block_s, theta=theta, hd=hd, hpg=hpg,
        sliding_window=sliding_window, qcfg=None, rk=rk, rv=rv,
        compute_dtype=compute_dtype, head_major_acc=head_major_acc,
        inv_freq_static=inv_freq_static, rope_scale=rope_scale,
    )
    extra = [
        pl.BlockSpec((None, None, block_s, rk), lambda bi, gi, si, *_: (bi, gi, si, 0)),
        pl.BlockSpec((None, None, block_s, rv), lambda bi, gi, si, *_: (bi, gi, si, 0)),
    ]
    return _common_call(
        kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra, interpret,
        (kvl, q1, q2, b1, b2, x_k, x_v),
        head_major_acc=head_major_acc,
    )


@functools.partial(
    jax.jit,
    static_argnames=("qcfg", "rk", "rv", "block_s", "theta", "sliding_window",
                     "interpret", "compute_dtype", "head_major_acc", "impl",
                     "inv_freq_static", "rope_scale"),
)
def palu_flash_decode_quantized(
    q: jax.Array,  # (B, nh, hd)
    b_k: jax.Array,  # (G, hpg, rk, hd)
    xk_codes: jax.Array,  # (B, G, S_max, packed_nbytes(rk)) uint8
    xk_scales: jax.Array,  # (B, G, S_max, 1) f32
    xk_base: jax.Array,  # (B, G, S_max, 1) f32
    xv_codes: jax.Array,
    xv_scales: jax.Array,
    xv_base: jax.Array,
    kv_len: jax.Array,
    *,
    qcfg: QuantConfig,
    rk: int,
    rv: int,
    block_s: int = 512,
    theta: float = 10000.0,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    head_major_acc: bool = True,
    impl: str = "merged",
    inv_freq_static=None,
    rope_scale: float = 1.0,
) -> jax.Array:
    """Decode attention with dequantization of the packed latent cache fused
    into the streaming pass. Requires per-row scales (qcfg.group_size == 0)."""
    assert qcfg.enabled and qcfg.group_size == 0
    b, nh, hd = q.shape
    g, hpg = b_k.shape[0], b_k.shape[1]
    s_max = xk_codes.shape[2]
    nbk = packed_nbytes(rk, qcfg.pack_bits)
    nbv = packed_nbytes(rv, qcfg.pack_bits)
    assert xk_codes.shape[3] == nbk and xv_codes.shape[3] == nbv

    b1, b2 = split_b_halves(b_k)
    q1, q2 = _q_blockdiag(q, g, hpg, hd // 2)
    kvl = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    quant_inputs = (kvl, q1, q2, b1, b2, xk_codes, xk_scales, xk_base,
                    xv_codes, xv_scales, xv_base)

    if impl == "merged":
        kernel = _make_decode_kernel_merged(
            block_s=block_s, theta=theta, hd=hd, g=g, hpg=hpg,
            sliding_window=sliding_window, qcfg=qcfg, rk=rk, rv=rv,
            compute_dtype=compute_dtype, inv_freq_static=inv_freq_static,
            rope_scale=rope_scale,
        )

        def mblk(last):
            return pl.BlockSpec(
                (None, g, block_s, last), lambda bi, si, *_: (bi, 0, si, 0)
            )

        extra = [mblk(nbk), mblk(1), mblk(1), mblk(nbv), mblk(1), mblk(1)]
        return _merged_call(
            kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra, interpret,
            quant_inputs,
        )

    kernel = _make_decode_kernel(
        block_s=block_s, theta=theta, hd=hd, hpg=hpg,
        sliding_window=sliding_window, qcfg=qcfg, rk=rk, rv=rv,
        compute_dtype=compute_dtype, head_major_acc=head_major_acc,
        inv_freq_static=inv_freq_static, rope_scale=rope_scale,
    )

    def blk(last):
        return pl.BlockSpec(
            (None, None, block_s, last), lambda bi, gi, si, *_: (bi, gi, si, 0)
        )

    extra = [blk(nbk), blk(1), blk(1), blk(nbv), blk(1), blk(1)]
    return _common_call(
        kernel, b, g, hpg, hd, rk, rv, s_max, block_s, extra, interpret,
        quant_inputs,
        head_major_acc=head_major_acc,
    )
