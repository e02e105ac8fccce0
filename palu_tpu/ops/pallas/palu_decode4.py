"""Pallas TPU fused Palu flash-decode, v4: the transposed formulation.

Why v2/v3 were slow (converged chain-256 numbers, docs/BENCH.md): the
quantized caches stream only 100-170 MB (SoL 0.14-0.18 ms) so the kernel
is COMPUTE-bound, and nearly all of that compute was MXU *slot waste*:
every logits / value dot produced an `hpg`-wide output (4 of the MXU's
128 lanes), so each such matmul occupied 32x the useful array slots.
Per group-block at the headline point (BS=1024, rk=128, rv=384, W=256):

    v3: recon 67M slots (useful) + logits 67M (3% useful)
        + zero-point 67M (3% useful) + value 50M (3% useful)  = 251M
    v4: recon 67M + logits 2M + value 3.1M                    = 72M

v4 gets there by computing everything TRANSPOSED, with the sequence
dimension (the only large dimension at decode) always on the 128-lane
axis:

1. **Transposed reconstruct.**  The rank-major packed cache already
   unpacks to codes `(rank, BS)`; v4 contracts `B^T (W, rank) @ codes`
   into `xb^T (W, BS)` -- full MXU utilization, no relayout, where
   v2/v3 built `(BS, W)` and then hit narrow-N dots.
2. **Logits via a 0/1 segment matrix.**  The query enters as per-lane
   rows folded into the static relative-RoPE tables:
   `t = xb1^T * CA1 + xb2^T * CA2` with `CA1 = cos_rel * a1 + sin_rel
   * a2` (a1/a2 = the block-offset-rotated query laid out along W),
   then `logits^T (hpg, BS) = seg (hpg, W) @ t`.  Groups are processed
   in PAIRS so the dot output is 8 sublanes (tile-aligned) and the
   final `(nh, BS)` concat never splits a sublane tile.
3. **Transposed value path.**  `out (hpg, rv) = p_g (hpg, BS) @
   codes_v (rv, BS)^T` -- contraction over the sequence lanes of both
   operands; 2x M-padding instead of 32x N-padding.
4. **Symmetric codes, no zero-point math.**  With `QuantConfig(sym=
   True)` the affine zero is exactly `q_min * scale`, so the kernel
   subtracts the constant `2^(bits-1)` from the unpacked codes and
   multiplies by the per-token scale row once per group -- the entire
   zero-point logits term of v2/v3 (two full-size dots + a second
   rotation) does not exist.
4b. **Asymmetric caches** (the reference's default protocol --
   `--lt_sym` is opt-in, /root/reference/utils.py:106) also run in the
   transposed formulation: the per-token zero z enters every dequant
   linearly, so its whole contribution collapses past the big dots.
   K side: since dequant(X) = s*C + z*1_rank, the roped-logit zero
   term is z ⊙ (seg @ (cos*rowsum(bq1) + sin*rowsum(bq2))), and
   because the cos/sin tables tile with period `half`, that segment
   sum is exactly `R1 @ cosb + R2 @ sinb` with R = rowsum(bq)
   reshaped (hpg, half) -- two (hpg, half)x(half, BS) dots per group
   per block, ~1% of the reconstruct MXU work.  V side: the zero adds
   `sum_s p[h,s] * z[s]` broadcast over rv -- one (hpg, BS) multiply
   + lane reduction.  No centering subtract is needed at all (codes
   stay unsigned; z absorbs the offset).
5. **Online softmax in (heads, seq) layout**: head statistics are
   (nh, 1) columns, reductions run over lanes, and the output
   accumulator is `(g, hpg, rv)` so the final result reshapes to
   `(B, nh, rv)` with no transpose at all.

The fp16 Triton analog of the K path is the reference's
kernel/abx_rope.py:48-111; the fused low-bit dequant is the TODO the
reference never built (/root/reference/README.md:24).

Round-5 formulation knobs (all parity-tested, measured in the
docs/BENCH.md "round-5 kernel formulation study"): `v_byte_dot` (exact
byte-plane V dots), `int8_dots` (int8 MXU K reconstruct), `fuse_uv`
(stacked single reconstruct dot), `int8_rot` (full-int K path: int8 dots
+ int32 rotation on static int8 tables — the opt-in throughput mode).
The study's conclusion: the kernel sits at a ~610-630 us/layer
structural floor at the 7B/64K point — a serialized VPU/MXU mix that
these knobs shift between units without shortening; the decode-step wins
ship in the weight path (core/wquant) instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.quant import QuantConfig, packed_nrows

__all__ = ["palu_flash_decode4_quantized", "palu_flash_decode4"]


def _unpack_rank_major_t(codes_ref_block, bits: int, rank: int, qoff: int, cdt):
    """uint8 block (rows, BS) -> signed codes (rank, BS) in natural rank
    order, already re-centered by the symmetric offset 2^(bits-1)."""
    c = codes_ref_block.astype(jnp.int32)
    if bits in (2, 4):
        s = 8 // bits
        mask = 2**bits - 1
        parts = [(((c >> (bits * k)) & mask) - qoff) for k in range(s)]
        return jnp.concatenate(parts, axis=0).astype(cdt)
    if bits == 3:
        rl = rank // 4
        lo_rows, hi_rows = c[:rl], c[rl : rl + rank // 8]
        lo = jnp.concatenate(
            [((lo_rows >> (2 * k)) & 3) for k in range(4)], axis=0)
        hi = jnp.concatenate(
            [((hi_rows >> k) & 1) for k in range(8)], axis=0)
        return ((lo - qoff) + (hi << 2)).astype(cdt)
    if bits == 8:
        return (c - qoff).astype(cdt)
    raise ValueError(f"unsupported bits: {bits}")


def _rel_tables_t(block_s: int, half: int, hpg: int, theta: float,
                  inv_freq_static, rope_scale: float):
    """Static (hpg*half, block_s) relative cos/sin tables (W-major) and the
    inv_freq row.  rope_scale (yarn mscale) multiplies the whole rotation."""
    if inv_freq_static is not None:
        inv_freq = np.asarray(inv_freq_static, np.float64).reshape(half)
    else:
        inv_freq = 1.0 / theta ** (np.arange(half, dtype=np.float64) * 2 / (2 * half))
    rel = inv_freq[:, None] * np.arange(block_s, dtype=np.float64)[None, :]
    cos = np.cos(rel) * rope_scale
    sin = np.sin(rel) * rope_scale
    cos = np.tile(cos, (hpg, 1)).astype(np.float32)  # (W, BS)
    sin = np.tile(sin, (hpg, 1)).astype(np.float32)
    return cos, sin, inv_freq


def _seg_pair(hpg: int, half: int, dtype):
    """(2*hpg, 2*W) 0/1 block-diagonal segment-sum matrix for a PAIR of
    groups: row r sums the lanes of head r%hpg within pair member r//hpg."""
    W = hpg * half
    seg = np.zeros((2 * hpg, 2 * W), np.float32)
    for m in range(2):
        for h in range(hpg):
            seg[m * hpg + h, m * W + h * half : m * W + (h + 1) * half] = 1.0
    return seg.astype(dtype)


def _make_kernel4(
    *,
    block_s: int,
    g: int,
    hpg: int,
    half: int,
    sliding_window: Optional[int],
    bits: Optional[int],
    rk: int,
    rv: int,
    compute_dtype=jnp.bfloat16,
    rot_dtype=jnp.float32,
    asym: bool = False,
    return_stats: bool = False,
    layer_stacked: bool = False,
    n_sc_k: int = 1,
    n_sc_v: int = 1,
    chunked: bool = False,
    seg_sum: bool = False,
    k_bias: bool = False,
    fold_qoff: bool = False,
    pack_bits: Optional[int] = None,  # storage field width (>= bits):
    # QuantConfig.container; e.g. 3-bit codes in 4-bit nibbles halve the
    # per-value unpack ops (the 3-bit kernel's VPU bottleneck) for 4/3x
    # the cache reads
    v_byte_dot: bool = False,  # V path dots the RAW container bytes
    # (lo + 16*hi, <= 127 for 3-bit-in-nibble so exact in bf16/int8) plus
    # one hi-nibble plane, and recovers the lo outputs algebraically at
    # finalize: pv_lo = pv_byte - 16 * pv_hi.  Numerically EXACT (integer
    # code values, f32 accumulation) and removes the lo-plane unpack
    # entirely -- the V side is ~75% of the kernel's ~270M per-layer cache
    # values.  Requires nibble-container storage + per-row scales with
    # zero-corrections active (asym or fold_qoff): codes must enter the
    # dot unsigned.
    int8_dots: bool = False,  # K reconstruct dots run on the int8 MXU
    # path (2x the bf16 rate; the K dots are ~350 us/layer of bf16 MXU at
    # the 7B/64K point, the kernel's single largest cost): the query-
    # folded operand bq quantizes per-row to int8 (same error class as
    # the bf16 rounding the default path already applies), codes feed the
    # dot as raw int8 nibbles, and the per-row scale multiplies the int32
    # dot output during the rotation stage.  Zero-correction rowsums use
    # the QUANTIZED operand so the correction cancels exactly against the
    # dots.  Requires codes in [0, 127] (pack width <= 4, or the byte
    # plane of v_byte_dot at 3-bit).
    fuse_uv: bool = False,  # stack the two reconstruct dots per group
    # into ONE (2W, rk) @ (rk, BS) dot (identical MACs and f32 rounding;
    # the bq halves are independent output rows): halves the MXU issue
    # count and reads the unpacked ck operand once, and merges the two
    # (hpg, half) zero-correction dots into one K=2*half dot -- a
    # scheduling-bubble experiment, not an algebra change.
    int8_rot: bool = False,  # FULL-int K path: int8 reconstruct dots with
    # per-HEAD operand scales + the rotation evaluated in int32 against
    # static int8 cos/sin tables, with int32 sublane segment-sums; floats
    # appear only on the (hpg, BS) per-head outputs.  Removes both the
    # bf16 MXU reconstruct (int8 = 2x rate) AND the (2W, BS) int->float
    # converts that made plain int8_dots a wash (docs/BENCH.md round-5
    # formulation study).  Accuracy: operand int8/head + tables at 6-bit
    # (63) scale -> ~0.3-1% logit noise (overflow-safe: 63 * 127*15*128 *
    # 64 < 2^30).  Opt-in throughput mode; requires seg_sum + per-row
    # scales + pack width <= 4.
    i8r_inv: float = 0.0,  # int8_rot: 1 / (127-ish table scale) -- the
    # static dequant constant for the int8 cos/sin tables
):
    """bits=None builds the fp (bf16 rank-major latents, no scales) variant;
    the cache refs then hold latent rows directly instead of packed codes,
    and xk_s/xv_s are ignored dummy (g, BS) refs.  asym=True adds per-token
    zero-point refs xk_z/xv_z and the collapsed zero-term corrections
    (module docstring 4b); codes are then used unsigned (qoff = 0).
    return_stats=True skips the final acc/l division and emits the raw
    flash stats (m, l, acc) -- the flash-decoding combine for a
    sequence-sharded cache merges per-shard stats outside the kernel.

    n_sc_k/n_sc_v > 1 selects the PER-CHUNK scale variant (the reference's
    --lt_group_size > 0, quant.py:14-24): scale/zero refs are
    (g, n_sc, BS) with one row per contiguous rank chunk, and the kernel
    dequantizes codes in VMEM before the reconstruct/value dots (a
    sub-row-granular scale cannot fold past the dots the way the per-row
    scale does).  Costs one extra multiply (+add if asym) per cache value;
    the asym zero needs no folded correction because it enters the
    materialized operand directly.

    k_bias=True adds PRE-RoPE per-(group, head) K biases (qwen2: K =
    lat @ U + b, reference svd_qwen modeling, bias threaded through U per
    svd_linear.py:76,179): since RoPE is linear, logit += q . R_{s-p} b_h,
    which has exactly the asym-zero structure -- with the offset-rotated
    query lanes a1/a2 it collapses to U_b @ cosb + V_b @ sinb where
    U_b = per-head rows of (a1*b1 + a2*b2), V_b = rows of (a2*b1 - a1*b2):
    two (hpg, half) x (half, BS) dots per group-block, independent of the
    cache (so it adds AFTER the per-token scale fold).

    fold_qoff=True (sym per-row only) removes the symmetric re-centering
    from the per-element unpack: codes stay unsigned and the constant
    offset rides the ASYM zero-correction machinery with in-kernel zero
    rows z = -qoff * scale (algebraically identical; the unpack drops one
    VPU op per cache value -- ~270M values/layer at 7B, the 3-bit
    kernel's bottleneck)."""
    cdt = compute_dtype
    nh = g * hpg
    pbits = pack_bits or bits  # unpack geometry; `bits` keeps the grid/qoff
    zfold = fold_qoff and bits is not None and not asym and not chunked
    qoff = 2 ** (bits - 1) if (bits is not None and not asym) else 0
    qoff_unpack = 0 if zfold else qoff
    zcorr = asym or zfold  # zero-term corrections active (real or folded)
    pair = g % 2 == 0

    def _rows(ref_block, rank):
        if bits is None:
            return ref_block.astype(cdt)
        return _unpack_rank_major_t(ref_block, pbits, rank, qoff_unpack, cdt)

    def kernel(kv_len_ref, *rest):
        if layer_stacked:
            _li_ref, *rest = rest  # consumed by the BlockSpec index maps
        (a1_ref, a2_ref, b1t_ref, b2t_ref, seg_ref,
         cos_ref, sin_ref, *rest) = rest
        if int8_rot:
            cos8_ref, sin8_ref, *rest = rest  # static int8 tables (W, BS)
        if k_bias:
            kb1_ref, kb2_ref, *rest = rest
        xk_codes, xk_s, xv_codes, xv_s, *rest = rest
        if asym:
            xk_z, xv_z, *rest = rest
        if return_stats:
            out_ref, m_out, l_out, m_scr, l_scr, acc_scr = rest
        else:
            out_ref, m_scr, l_scr, acc_scr = rest
        sblk = pl.program_id(1)
        nblk = pl.num_programs(1)
        kv_len = kv_len_ref[pl.program_id(0)]

        @pl.when(sblk == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        pos_start = sblk * block_s
        # Skip the whole block body for blocks past kv_len (and, with a
        # sliding window, blocks wholly before it): decode cost then scales
        # with the LIVE context length instead of the allocated s_max --
        # buffers are typically over-allocated (bench: s_max rounds up to
        # the block grid; serving: short requests sit in long lanes). The
        # skipped block's DMA still streams, but the kernel is compute-
        # bound (docs/BENCH.md), so the block's cost effectively vanishes.
        active = pos_start < kv_len
        if sliding_window is not None:
            active = jnp.logical_and(
                active, pos_start + block_s > kv_len - sliding_window)

        @pl.when(active)
        def _block_body():
            # rot_dtype=bf16 halves the elementwise-RoPE VPU work (the largest
            # non-MXU cost); fp32 (default) keeps full logit precision
            cos = cos_ref[...].astype(rot_dtype)  # (W, BS) static relative tables
            sin = sin_ref[...].astype(rot_dtype)

            pos = jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1) + pos_start
            valid = pos < kv_len  # (1, BS) -- broadcasts over head sublanes
            if sliding_window is not None:
                valid = jnp.logical_and(valid, pos > (kv_len - 1) - sliding_window)

            # per-row: (g, BS) per-token scales; chunked: (g, n_sc, BS)
            # per-(token, rank-chunk) scales
            ks_rows = xk_s[...]
            vs_rows = xv_s[...]
            if asym:
                kz_rows = xk_z[...]  # zero-points (value units), same shape
                vz_rows = xv_z[...]
            elif zfold:
                # folded symmetric offset: codes stay unsigned, the
                # re-centering becomes a per-token zero z = -qoff * scale
                kz_rows = ks_rows * jnp.float32(-qoff)
                vz_rows = vs_rows * jnp.float32(-qoff)
            if (zcorr and not chunked) or k_bias:
                cosb = cos_ref[0:half, :]  # untiled base tables, f32
                sinb = sin_ref[0:half, :]

            def dequant_rows(codes, scales, zeros, rank):
                """Chunked in-VMEM dequant: codes (rank, BS) -> values (rank,
                BS) in cdt; scales/zeros are (n_sc, BS) with one row per
                contiguous rank chunk."""
                n_sc = scales.shape[0]
                gsz = rank // n_sc
                blocks = []
                for c in range(n_sc):
                    blk = codes[c * gsz : (c + 1) * gsz, :].astype(
                        jnp.float32) * scales[c : c + 1, :]
                    if zeros is not None:
                        blk = blk + zeros[c : c + 1, :]
                    blocks.append(blk)
                return jnp.concatenate(blocks, axis=0).astype(cdt)

            def kbias_logits(gi, a1, a2):
                # pre-RoPE K-bias logits (cache-independent; docstring):
                # shared by the bf16 and full-int K paths so the fold can
                # never diverge between them
                kb1 = kb1_ref[:, gi : gi + 1].astype(jnp.float32)  # (W, 1)
                kb2 = kb2_ref[:, gi : gi + 1].astype(jnp.float32)
                ub = (a1 * kb1 + a2 * kb2).reshape(hpg, half)
                vb = (a2 * kb1 - a1 * kb2).reshape(hpg, half)
                return (
                    jax.lax.dot_general(ub, cosb, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(vb, sinb, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                )  # (hpg, BS)

            def k_path(gi):
                """t (W, BS) in compute dtype: roped-K logit contributions per
                lane, before segment summation and per-token scaling.

                The query (offset-rotated lanes a1/a2) is folded into the
                reconstruct OPERAND -- bq1 = a1*B1^T + a2*B2^T, a tiny (W, rk)
                elementwise build -- so the post-dot rotation is just
                cos*u + sin*v instead of building two (W, BS) ca tables:
                  u = bq1 @ ck = a1*xb1 + a2*xb2
                  v = bq2 @ ck = a2*xb1 - a1*xb2
                  cos*u + sin*v = xb1*(cos*a1 + sin*a2) + xb2*(cos*a2 - sin*a1)
                which is exactly the roped logit contribution."""
                a1 = a1_ref[:, gi : gi + 1]  # (W, 1) offset-rotated query lanes
                a2 = a2_ref[:, gi : gi + 1]
                b1g = b1t_ref[gi].astype(jnp.float32)
                b2g = b2t_ref[gi].astype(jnp.float32)
                bq1f = a1 * b1g + a2 * b2g  # (W, rk) f32
                bq2f = a2 * b1g - a1 * b2g
                if int8_dots:
                    # per-row int8 quantization of the query-folded operand
                    # (tiny: (W, rk) per group); codes feed the dot as raw
                    # int8 nibbles, so both reconstruct dots run at the MXU
                    # int8 rate (2x bf16) with no int->float unpack convert
                    s1 = jnp.maximum(
                        jnp.max(jnp.abs(bq1f), axis=1, keepdims=True),
                        1e-30) * (1.0 / 127.0)  # (W, 1)
                    s2 = jnp.maximum(
                        jnp.max(jnp.abs(bq2f), axis=1, keepdims=True),
                        1e-30) * (1.0 / 127.0)
                    n1 = jnp.round(bq1f / s1).astype(jnp.int8)
                    n2 = jnp.round(bq2f / s2).astype(jnp.int8)
                    ck = _unpack_rank_major_t(
                        xk_codes[gi], pbits, rk, qoff_unpack, jnp.int8)
                    u_i = jax.lax.dot_general(
                        n1, ck, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)  # (W, BS) exact
                    v_i = jax.lax.dot_general(
                        n2, ck, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    u = u_i.astype(rot_dtype) * s1
                    v = v_i.astype(rot_dtype) * s2
                else:
                    bq1 = bq1f.astype(cdt)
                    bq2 = bq2f.astype(cdt)
                    ck = _rows(xk_codes[gi], rk)
                    if chunked:
                        ck = dequant_rows(
                            ck, ks_rows[gi],
                            kz_rows[gi] if asym else None, rk)
                    # Mosaic requires 32-bit matmul accumulators; rot_dtype
                    # only affects the elementwise rotation (and the table
                    # residency)
                    if fuse_uv:
                        uv = jax.lax.dot_general(
                            jnp.concatenate([bq1, bq2], axis=0), ck,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (2W, BS)
                        u = uv[: bq1.shape[0]].astype(rot_dtype)
                        v = uv[bq1.shape[0] :].astype(rot_dtype)
                    else:
                        u = jax.lax.dot_general(
                            bq1, ck, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(rot_dtype)  # (W, BS)
                        v = jax.lax.dot_general(
                            bq2, ck, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(rot_dtype)
                if seg_sum:
                    # stays in rot_dtype: the sublane segment-sum consumes
                    # it directly (no MXU dot, so no down-cast needed)
                    t = u * cos + v * sin
                else:
                    t = (u * cos + v * sin).astype(cdt)
                bcorr = kbias_logits(gi, a1, a2) if k_bias else None
                if not zcorr or chunked:
                    # chunked asym needs no folded correction: the zero
                    # entered the dequantized operand before the dots
                    return t, None, bcorr
                # zero-term correction (docstring 4b): the per-token zero z adds
                # z * (seg @ (cos*rowsum(bq1) + sin*rowsum(bq2))) to the logits;
                # the tiled tables make that R1 @ cosb + R2 @ sinb.
                # int8_dots: rowsums of the QUANTIZED operand, so the
                # correction cancels exactly against what the dots computed
                if int8_dots:
                    r1 = (jnp.sum(n1.astype(jnp.float32), axis=1)
                          * s1[:, 0]).reshape(hpg, half)
                    r2 = (jnp.sum(n2.astype(jnp.float32), axis=1)
                          * s2[:, 0]).reshape(hpg, half)
                else:
                    r1 = jnp.sum(bq1f, axis=1).reshape(hpg, half)
                    r2 = jnp.sum(bq2f, axis=1).reshape(hpg, half)
                if fuse_uv:
                    corr = jax.lax.dot_general(
                        jnp.concatenate([r1, r2], axis=1),
                        jnp.concatenate([cosb, sinb], axis=0),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (hpg, BS)
                else:
                    corr = (
                        jax.lax.dot_general(r1, cosb, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(r2, sinb, (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.float32)
                    )  # (hpg, BS)
                return t, corr, bcorr

            def k_path_i8(gi, cos8i, sin8i):
                """Full-int K path (int8_rot docstring): per-head int8
                operand scales -> int8 MXU dots -> int32 rotation against
                the static int8 tables -> int32 segment sums; floats only
                on the (hpg, BS) output."""
                a1 = a1_ref[:, gi : gi + 1]  # (W, 1)
                a2 = a2_ref[:, gi : gi + 1]
                b1g = b1t_ref[gi].astype(jnp.float32)
                b2g = b2t_ref[gi].astype(jnp.float32)
                bq1f = a1 * b1g + a2 * b2g  # (W, rk) f32
                bq2f = a2 * b1g - a1 * b2g

                def hq(bqf):
                    # per-HEAD scale: constant over each head's half-rows,
                    # so it factors out of the segment sum.  Row-max then
                    # head-max as two SINGLE-axis reduces: a multi-axis
                    # jnp.max(axis=(1, 2)) (and the (hpg, half*rk) lane
                    # relayout) SIGABRTs this Mosaic version's backend
                    mrow = jnp.max(jnp.abs(bqf), axis=1, keepdims=True)
                    mh = jnp.max(mrow.reshape(hpg, half, 1), axis=1,
                                 keepdims=True)  # (hpg, 1, 1)
                    s3 = jnp.maximum(mh, 1e-30) * (1.0 / 127.0)
                    srow = jnp.broadcast_to(
                        s3, (hpg, half, 1)).reshape(hpg * half, 1)
                    n = jnp.round(bqf / srow).astype(jnp.int8)
                    return n, s3[:, 0, :], srow

                n1, s1h, s1row = hq(bq1f)
                n2, s2h, s2row = hq(bq2f)
                ck = _unpack_rank_major_t(
                    xk_codes[gi], pbits, rk, qoff_unpack, jnp.int8)
                u_i = jax.lax.dot_general(
                    n1, ck, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (W, BS) exact
                v_i = jax.lax.dot_general(
                    n2, ck, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                # int32 rotation + sublane segment sums:
                # |t| <= 63 * 127*15*128 * 64 ~= 9.8e8 < 2^31
                t1s = jnp.sum(
                    (cos8i * u_i).reshape(hpg, half, block_s), axis=1)
                t2s = jnp.sum(
                    (sin8i * v_i).reshape(hpg, half, block_s), axis=1)
                lg = (t1s.astype(jnp.float32) * (s1h * i8r_inv)
                      + t2s.astype(jnp.float32) * (s2h * i8r_inv))
                # per-token cache scale + zero corrections (quantized-
                # consistent rowsums, exact f32 base tables)
                lg = lg * ks_rows[gi : gi + 1, :]
                if zcorr:
                    r1 = (jnp.sum(n1.astype(jnp.float32), axis=1,
                                  keepdims=True) * s1row).reshape(hpg, half)
                    r2 = (jnp.sum(n2.astype(jnp.float32), axis=1,
                                  keepdims=True) * s2row).reshape(hpg, half)
                    corr = (
                        jax.lax.dot_general(r1, cosb, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                        + jax.lax.dot_general(r2, sinb, (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.float32)
                    )
                    lg = lg + corr * kz_rows[gi : gi + 1, :]
                if k_bias:
                    lg = lg + kbias_logits(gi, a1, a2)
                return lg

            # ---- K path: per-pair segment dot -> (2*hpg, BS), tile-aligned ----
            parts = []
            if int8_rot:
                cos8i = cos8_ref[...].astype(jnp.int32)  # hoisted widen,
                sin8i = sin8_ref[...].astype(jnp.int32)  # shared by groups
                for gi in range(g):
                    parts.append(k_path_i8(gi, cos8i, sin8i))
            elif pair:
                for gj in range(0, g, 2):
                    t_a, c_a, b_a = k_path(gj)
                    t_b, c_b, b_b = k_path(gj + 1)
                    t2 = jnp.concatenate([t_a, t_b], axis=0)
                    if seg_sum:
                        # per-head sublane reduction instead of the 0/1
                        # segment dot: the dot's (2hpg, BS) output occupies
                        # 8 of 128 MXU rows (16x slot waste, ~180 us/layer
                        # at the 7B/64K point); rows of t2 are head-major
                        # contiguous so a sublane-split reshape + sum is
                        # exactly the segment sum
                        lg2 = jnp.sum(
                            t2.reshape(2 * hpg, half, block_s), axis=1
                        ).astype(jnp.float32)
                    else:
                        lg2 = jnp.dot(seg_ref[...].astype(cdt), t2,
                                      preferred_element_type=jnp.float32)  # (2hpg, BS)
                    if bits is not None and not chunked:
                        sc = jnp.concatenate(
                            [jnp.broadcast_to(ks_rows[gj + m : gj + m + 1, :],
                                              (hpg, block_s)) for m in range(2)],
                            axis=0)
                        lg2 = lg2 * sc
                        if zcorr:
                            zc = jnp.concatenate(
                                [jnp.broadcast_to(kz_rows[gj + m : gj + m + 1, :],
                                                  (hpg, block_s)) for m in range(2)],
                                axis=0)
                            lg2 = lg2 + jnp.concatenate([c_a, c_b], axis=0) * zc
                    # fp latents / chunked pre-dot dequant need no scale
                    # fold; the cache-independent K-bias logits add last
                    if k_bias:
                        lg2 = lg2 + jnp.concatenate([b_a, b_b], axis=0)
                    parts.append(lg2)
            else:
                for gi in range(g):
                    t_g, c_g, b_g = k_path(gi)
                    if seg_sum:
                        lg = jnp.sum(
                            t_g.reshape(hpg, half, block_s), axis=1
                        ).astype(jnp.float32)
                    else:
                        lg = jnp.dot(seg_ref[0:hpg, 0 : hpg * half].astype(cdt),
                                     t_g, preferred_element_type=jnp.float32)
                    if bits is not None and not chunked:
                        lg = lg * ks_rows[gi : gi + 1, :]
                        if zcorr:
                            lg = lg + c_g * kz_rows[gi : gi + 1, :]
                    if k_bias:
                        lg = lg + b_g
                    parts.append(lg)
            logits = jnp.concatenate(parts, axis=0)  # (nh, BS); 1/sqrt(hd) in q
            logits = jnp.where(valid, logits, -1e30)

            # ---- online softmax carry: head stats are (nh, 1) columns ----
            m_prev = m_scr[0:nh, 0:1]
            l_prev = l_scr[0:nh, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new)  # (nh, BS)
            p = jnp.where(valid, p, 0.0)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

            # ---- V path: (hpg, BS) @ (rv, BS)^T, contraction over seq lanes ----
            for gi in range(g):
                p_g = p[gi * hpg : (gi + 1) * hpg, :]
                if bits is None or chunked:
                    ps = p_g.astype(cdt)
                else:
                    ps = (p_g * vs_rows[gi : gi + 1, :]).astype(cdt)
                if v_byte_dot:
                    # dot the RAW container bytes (lo + 16*hi, integer
                    # values exact in bf16) + one hi-nibble plane; the lo
                    # outputs are recovered at finalize (pv_lo = pv_byte -
                    # 16*pv_hi), so the lo plane is never unpacked -- half
                    # the V-side per-value VPU work for identical math.
                    braw = xv_codes[gi].astype(jnp.int32)  # (rv/2, BS);
                    # Mosaic has no direct uint8->bf16 cast, widen first
                    cb = braw.astype(cdt)
                    chi = ((braw >> 4) & 15).astype(cdt)
                    pv_b = jax.lax.dot_general(
                        ps, cb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (hpg, rv/2)
                    pv_h = jax.lax.dot_general(
                        ps, chi, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    # zero-term in (byte, hi) accumulator space: finalize
                    # maps (B, H) -> (B - 16H, H), so adding 17c to the
                    # byte half and c to the hi half yields +c on both
                    # natural halves
                    corr = jnp.sum(p_g * vz_rows[gi : gi + 1, :],
                                   axis=1, keepdims=True)
                    pv = jnp.concatenate(
                        [pv_b + 17.0 * corr, pv_h + corr], axis=1)
                else:
                    cv = _rows(xv_codes[gi], rv)
                    if chunked:
                        cv = dequant_rows(
                            cv, vs_rows[gi],
                            vz_rows[gi] if asym else None, rv)
                    pv = jax.lax.dot_general(
                        ps, cv, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (hpg, rv)
                    if zcorr and not chunked:
                        # zero-term: sum_s p[h,s] * z[s], broadcast over rv
                        pv = pv + jnp.sum(p_g * vz_rows[gi : gi + 1, :],
                                          axis=1, keepdims=True)
                alpha_g = alpha[gi * hpg : (gi + 1) * hpg, :]
                acc_scr[gi] = acc_scr[gi] * alpha_g + pv
            m_scr[0:nh, 0:1] = m_new
            l_scr[0:nh, 0:1] = l_new

        @pl.when(sblk == nblk - 1)
        def _finalize():
            def natural(accg):
                # v_byte_dot accumulates (byte-dot | hi-dot) halves along
                # rv; recover the natural rank order once, at finalize
                if not v_byte_dot:
                    return accg
                hi = accg[:, rv // 2 :]
                lo = accg[:, : rv // 2] - 16.0 * hi
                return jnp.concatenate([lo, hi], axis=1)

            if return_stats:
                for gi in range(g):
                    out_ref[gi] = natural(acc_scr[gi]).astype(out_ref.dtype)
                m_out[...] = m_scr[...]
                l_out[...] = l_scr[...]
            else:
                for gi in range(g):
                    l_g = l_scr[gi * hpg : (gi + 1) * hpg, 0:1]
                    out_ref[gi] = (natural(acc_scr[gi]) / l_g).astype(
                        out_ref.dtype)

    return kernel


def _call4(
    q, b_k, xk_rows, xk_scale, xv_rows, xv_scale, kv_len,
    *, bits, rk, rv, block_s, theta, sliding_window, interpret,
    compute_dtype, inv_freq_static, rope_scale, rot_dtype=jnp.float32,
    xk_zero=None, xv_zero=None, pos_offset=None, return_stats=False,
    layer_idx=None, group_chunk=None, seg_sum=False, k_bias=None,
    fold_qoff=False, pack_bits=None, v_byte_dot=False, int8_dots=False,
    fuse_uv=False, int8_rot=False,
):
    asym = xk_zero is not None
    stacked = layer_idx is not None
    b, nh, hd = q.shape
    g, hpg = b_k.shape[0], b_k.shape[1]
    s_max = xk_rows.shape[-1]
    half = hd // 2
    W = hpg * half
    pb = pack_bits or bits
    nrk = packed_nrows(rk, pb) if bits is not None else rk
    nrv = packed_nrows(rv, pb) if bits is not None else rv
    zfold_call = fold_qoff and bits is not None and not asym and not group_chunk
    if v_byte_dot:
        assert bits is not None and pb == 4 and not group_chunk and (
            asym or zfold_call
        ), "v_byte_dot needs nibble-container codes with zero-corrections " \
           "active (asym, or sym with fold_qoff)"
    if int8_dots:
        assert bits is not None and pb <= 4 and not group_chunk, \
            "int8_dots needs sub-byte codes (pack width <= 4) and per-row " \
            "scales"
    if int8_rot:
        assert bits is not None and pb <= 4 and not group_chunk and seg_sum, \
            "int8_rot needs sub-byte codes, per-row scales, and seg_sum"
        # int32 segment-sum bound: |table| * |operand| * |code| * rk terms
        # summed over `half` frequencies must stay inside int32
        assert 63 * 127 * (2 ** pb - 1) * rk * (hd // 2) < 2 ** 31, (
            f"int8_rot int32 segment sums would overflow at rk={rk}, "
            f"half={hd // 2}, pack={pb}")
    lb = (xk_rows.shape[0],) if stacked else ()  # leading layer dim
    assert xk_rows.shape[-2] == nrk and xv_rows.shape[-2] == nrv
    if group_chunk:
        # per-chunk scales: one scale/zero ROW per contiguous rank chunk
        nsk, nsv = rk // group_chunk, rv // group_chunk
        assert xk_scale.shape == lb + (b, g, nsk, s_max), (xk_scale.shape, lb)
        assert xv_scale.shape == lb + (b, g, nsv, s_max)
        if asym:
            assert xk_zero.shape == lb + (b, g, nsk, s_max)
            assert xv_zero.shape == lb + (b, g, nsv, s_max)
    else:
        nsk = nsv = 1
        assert xk_scale.shape == lb + (b, g, s_max), (xk_scale.shape, lb)
        assert xv_scale.shape == lb + (b, g, s_max)
        if asym:
            assert xk_zero.shape == lb + (b, g, s_max)
            assert xv_zero.shape == lb + (b, g, s_max)
    assert s_max % block_s == 0
    nblk = s_max // block_s

    # B^T halves: (G, W, rk) so the reconstruct dot is (W, rk) @ (rk, BS)
    bg = b_k.reshape(g, hpg, rk, 2, half)
    b1t = jnp.moveaxis(bg[:, :, :, 0, :], 2, 3).reshape(g, W, rk)
    b2t = jnp.moveaxis(bg[:, :, :, 1, :], 2, 3).reshape(g, W, rk)

    cos_t, sin_t, inv_freq = _rel_tables_t(
        block_s, half, hpg, theta, inv_freq_static, rope_scale)
    if int8_rot:
        # static int8 rotation tables at a shared 6-bit-magnitude scale
        # (63): keeps the int32 segment sums overflow-safe (kernel
        # docstring) while the exact f32 tables still serve the
        # zero-correction / k-bias dots
        cmax = float(max(np.abs(cos_t).max(), np.abs(sin_t).max(), 1e-9))
        i8q = 63.0 / cmax
        cos8_t = np.round(cos_t * i8q).astype(np.int8)
        sin8_t = np.round(sin_t * i8q).astype(np.int8)
        i8r_inv = float(1.0 / i8q)
    else:
        i8r_inv = 0.0

    # Offset-rotated query lanes: A1/A2 (B, nblk, W, G), tiny
    qf = q.astype(jnp.float32) / np.sqrt(hd)
    qg = qf.reshape(b, g, hpg, 2, half)
    q1 = qg[:, :, :, 0, :].reshape(b, g, W)
    q2 = qg[:, :, :, 1, :].reshape(b, g, W)
    if pos_offset is None:
        ang0 = (np.arange(nblk, dtype=np.float64) * block_s)[:, None] * inv_freq[None, :]
        c0 = jnp.asarray(np.tile(np.cos(ang0), (1, hpg)), jnp.float32)  # (nblk, W)
        s0 = jnp.asarray(np.tile(np.sin(ang0), (1, hpg)), jnp.float32)
    else:
        # traced shard offset (seq-sharded cache): block angles in fp32 --
        # |err| ~ angle * eps32, ~4e-3 rad at 64K, the precision the fp
        # seq-sharded combine already runs at; kv_len moves to shard-local
        # coordinates below
        posf = (jnp.asarray(np.arange(nblk, dtype=np.float32) * block_s)
                + jnp.asarray(pos_offset, jnp.float32))
        ang0_t = posf[:, None] * jnp.asarray(inv_freq, jnp.float32)[None, :]
        c0 = jnp.tile(jnp.cos(ang0_t), (1, hpg)).astype(jnp.float32)
        s0 = jnp.tile(jnp.sin(ang0_t), (1, hpg)).astype(jnp.float32)
        kv_len = jnp.asarray(kv_len, jnp.int32) - jnp.asarray(pos_offset, jnp.int32)
    q1t = jnp.moveaxis(q1, 1, 2)[:, None]  # (B, 1, W, G)
    q2t = jnp.moveaxis(q2, 1, 2)[:, None]
    a1 = q1t * c0[None, :, :, None] + q2t * s0[None, :, :, None]
    a2 = q2t * c0[None, :, :, None] - q1t * s0[None, :, :, None]

    seg = jnp.asarray(_seg_pair(hpg, half, np.float32))

    if k_bias is not None:
        # (G, hpg, hd) pre-RoPE K biases -> (W, g) lane layouts matching
        # the a1/a2 query lanes (first/second rotation halves)
        kb = jnp.asarray(k_bias, jnp.float32).reshape(g, hpg, 2, half)
        kb1 = jnp.moveaxis(kb[:, :, 0, :].reshape(g, W), 0, 1)  # (W, g)
        kb2 = jnp.moveaxis(kb[:, :, 1, :].reshape(g, W), 0, 1)

    kernel = _make_kernel4(
        block_s=block_s, g=g, hpg=hpg, half=half,
        sliding_window=sliding_window, bits=bits, rk=rk, rv=rv,
        compute_dtype=compute_dtype, rot_dtype=rot_dtype, asym=asym,
        return_stats=return_stats, layer_stacked=stacked,
        n_sc_k=nsk, n_sc_v=nsv, chunked=group_chunk is not None,
        seg_sum=seg_sum, k_bias=k_bias is not None, fold_qoff=fold_qoff,
        pack_bits=pack_bits, v_byte_dot=v_byte_dot, int8_dots=int8_dots,
        fuse_uv=fuse_uv, int8_rot=int8_rot, i8r_inv=i8r_inv,
    )

    grid = (b, nblk)
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # older pallas versions
        compiler_params = None

    nhp = max(nh, 8)
    if stacked:
        # layer-stacked cache buffers (L, ...): the scalar-prefetched layer
        # index drives the BlockSpec index maps directly, so a scanned
        # full-model decode never materializes a per-layer cache slice
        # (the XLA dynamic_index copy cost ~0.45 ms/layer at 7B/64K,
        # docs/BENCH.md full-model decomposition)
        def codes_spec(nr):
            return pl.BlockSpec(
                (None, None, g, nr, block_s),
                lambda bi, si, kvl, li: (li[0], bi, 0, 0, si))

        def scale_spec(n_sc):
            if group_chunk:
                return pl.BlockSpec(
                    (None, None, g, n_sc, block_s),
                    lambda bi, si, kvl, li: (li[0], bi, 0, 0, si))
            return pl.BlockSpec(
                (None, None, g, block_s),
                lambda bi, si, kvl, li: (li[0], bi, 0, si))
    else:
        def codes_spec(nr):
            return pl.BlockSpec(
                (None, g, nr, block_s), lambda bi, si, *_: (bi, 0, 0, si))

        def scale_spec(n_sc):
            if group_chunk:
                return pl.BlockSpec(
                    (None, g, n_sc, block_s), lambda bi, si, *_: (bi, 0, 0, si))
            return pl.BlockSpec(
                (None, g, block_s), lambda bi, si, *_: (bi, 0, si))

    cache_specs = [codes_spec(nrk), scale_spec(nsk),
                   codes_spec(nrv), scale_spec(nsv)]
    zero_specs = [scale_spec(nsk), scale_spec(nsv)]
    out = pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if stacked else 1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, None, W, g), lambda bi, si, *_: (bi, si, 0, 0)),
                pl.BlockSpec((None, None, W, g), lambda bi, si, *_: (bi, si, 0, 0)),
                pl.BlockSpec((g, W, rk), lambda bi, si, *_: (0, 0, 0)),
                pl.BlockSpec((g, W, rk), lambda bi, si, *_: (0, 0, 0)),
                pl.BlockSpec((2 * hpg, 2 * W), lambda bi, si, *_: (0, 0)),
                pl.BlockSpec((W, block_s), lambda bi, si, *_: (0, 0)),
                pl.BlockSpec((W, block_s), lambda bi, si, *_: (0, 0)),
            ]
            + (
                [pl.BlockSpec((W, block_s), lambda bi, si, *_: (0, 0))] * 2
                if int8_rot
                else []
            )
            + (
                [pl.BlockSpec((W, g), lambda bi, si, *_: (0, 0))] * 2
                if k_bias is not None
                else []
            )
            + cache_specs
            + (zero_specs if asym else []),
            out_specs=(
                pl.BlockSpec((None, g, hpg, rv), lambda bi, si, *_: (bi, 0, 0, 0)),
                pl.BlockSpec((None, nhp, 128), lambda bi, si, *_: (bi, 0, 0)),
                pl.BlockSpec((None, nhp, 128), lambda bi, si, *_: (bi, 0, 0)),
            ) if return_stats else pl.BlockSpec(
                (None, g, hpg, rv), lambda bi, si, *_: (bi, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((nhp, 128), jnp.float32),
                pltpu.VMEM((nhp, 128), jnp.float32),
                pltpu.VMEM((g, hpg, rv), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, g, hpg, rv), jnp.float32),
            jax.ShapeDtypeStruct((b, nhp, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, nhp, 128), jnp.float32),
        ) if return_stats else jax.ShapeDtypeStruct((b, g, hpg, rv), jnp.float32),
        interpret=interpret,
    )(
        jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,)),
        *(
            (jnp.broadcast_to(jnp.asarray(layer_idx, jnp.int32), (1,)),)
            if stacked
            else ()
        ),
        a1, a2, b1t, b2t, seg,
        jnp.asarray(cos_t), jnp.asarray(sin_t),
        *((jnp.asarray(cos8_t), jnp.asarray(sin8_t)) if int8_rot else ()),
        *((kb1, kb2) if k_bias is not None else ()),
        xk_rows, xk_scale.astype(jnp.float32),
        xv_rows, xv_scale.astype(jnp.float32),
        *(
            (xk_zero.astype(jnp.float32), xv_zero.astype(jnp.float32))
            if asym
            else ()
        ),
    )
    if return_stats:
        acc, m_full, l_full = out
        return (acc.reshape(b, nh, rv), m_full[:, :nh, 0], l_full[:, :nh, 0])
    return out.reshape(b, nh, rv)


@functools.partial(
    jax.jit,
    static_argnames=("qcfg", "rk", "rv", "block_s", "theta", "sliding_window",
                     "interpret", "compute_dtype", "inv_freq_static",
                     "rope_scale", "rot_dtype", "return_stats", "seg_sum",
                     "fold_qoff", "v_byte_dot", "int8_dots", "fuse_uv",
                     "int8_rot"),
)
def palu_flash_decode4_quantized(
    q: jax.Array,  # (B, nh, hd)
    b_k: jax.Array,  # (G, hpg, rk, hd)
    xk_codes: jax.Array,  # (B, G, packed_nrows(rk), S_max) uint8 rank-major
    xk_scale: jax.Array,  # (B, G, S_max) f32 per-token scales
    xv_codes: jax.Array,  # (B, G, packed_nrows(rv), S_max) uint8
    xv_scale: jax.Array,  # (B, G, S_max) f32
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
    rot_dtype=jnp.float32,
    xk_zero: Optional[jax.Array] = None,  # (B, G, S_max) f32, asym only
    xv_zero: Optional[jax.Array] = None,
    pos_offset: Optional[jax.Array] = None,  # absolute position of column 0
    return_stats: bool = False,  # emit raw (acc, m, l) for seq-shard combine
    layer_idx: Optional[jax.Array] = None,  # cache buffers carry a leading
    # (L, ...) layer dim; the scalar-prefetched index selects the layer's
    # blocks in the BlockSpec maps (no XLA-level cache slice in scanned
    # full-model decode)
    seg_sum: bool = True,  # per-head sublane reduction instead of the 0/1
    # segment dot (saves the 16x-row-padded MXU dot; default ON — the
    # chip sweep has it equal-or-faster at every block size / bit width /
    # zero-point config measured, docs/BENCH.md round-3; seg_sum=False
    # keeps the dot path as an A/B knob)
    k_bias: Optional[jax.Array] = None,  # (G, hpg, hd) pre-RoPE K bias
    # (qwen2); folded as cache-independent per-position logit corrections
    # (_make_kernel4 docstring)
    fold_qoff: bool = True,  # sym per-row: fold the re-centering constant
    # out of the unpack into zero-correction dots -- default ON: the chip
    # A/B has it ~7% faster at the 3-bit/64K/block-2048 headline point
    # (746 vs 802 us chained, tools/tpu_stacked_kernel_ab.py); identical
    # algebra (_make_kernel4 docstring), False keeps the in-unpack subtract
    # as an A/B knob
    v_byte_dot: bool = False,  # V path byte-plane dots (numerically exact;
    # container-4 + per-row scales with zero-corrections only) -- see
    # _make_kernel4
    int8_dots: bool = False,  # K reconstruct dots on the int8 MXU path
    # (2x rate; operand quantization error of the same class as the bf16
    # rounding the default applies) -- see _make_kernel4
    fuse_uv: bool = False,  # one stacked (2W, rk) reconstruct dot per
    # group instead of two -- identical algebra, scheduling A/B knob
    int8_rot: bool = False,  # FULL-int K path (int8 dots + int32 rotation
    # against static int8 tables; ~0.3-1% logit noise) -- see _make_kernel4
) -> jax.Array:
    """Decode attention over an affine-quantized rank-major latent cache
    -> (B, nh, rv) latent-space output.

    Codes are the unsigned `quantize_affine` codes.  Symmetric configs
    (zero-point == q_min * scale identically) dequantize in-kernel as
    `scale * (code - 2^(bits-1))` with no zero-point arrays; asymmetric
    configs (the reference's canonical accuracy protocol,
    /root/reference/utils.py:106, README.md:78-86) pass per-token
    xk_zero/xv_zero rows and the kernel folds the whole zero term past
    the big dots (module docstring 4b).  Per-chunk configs
    (qcfg.group_size > 0, the reference's --lt_group_size) pass scales
    and zeros as (B, G, rank // group_size, S_max) ROW STACKS and the
    kernel dequantizes codes in VMEM before its dots.  Differentially
    tested against the XLA dequant reference in
    tests/test_pallas_decode4.py.
    """
    assert qcfg.enabled
    if qcfg.group_size > 0:
        assert rk % qcfg.group_size == 0 and rv % qcfg.group_size == 0
    if qcfg.sym:
        assert xk_zero is None and xv_zero is None
    else:
        assert xk_zero is not None and xv_zero is not None
    return _call4(
        q, b_k, xk_codes, xk_scale, xv_codes, xv_scale, kv_len,
        group_chunk=qcfg.group_size or None,
        bits=qcfg.bits, pack_bits=qcfg.pack_bits,
        rk=rk, rv=rv, block_s=block_s, theta=theta,
        sliding_window=sliding_window, interpret=interpret,
        compute_dtype=compute_dtype, inv_freq_static=inv_freq_static,
        rope_scale=rope_scale, rot_dtype=rot_dtype,
        xk_zero=xk_zero, xv_zero=xv_zero,
        pos_offset=pos_offset, return_stats=return_stats,
        layer_idx=layer_idx, seg_sum=seg_sum, k_bias=k_bias,
        fold_qoff=fold_qoff, v_byte_dot=v_byte_dot, int8_dots=int8_dots,
        fuse_uv=fuse_uv, int8_rot=int8_rot,
    )


@functools.partial(
    jax.jit,
    static_argnames=("rk", "rv", "block_s", "theta", "sliding_window",
                     "interpret", "compute_dtype", "inv_freq_static",
                     "rope_scale", "rot_dtype", "return_stats", "seg_sum"),
)
def palu_flash_decode4(
    q: jax.Array,  # (B, nh, hd)
    b_k: jax.Array,  # (G, hpg, rk, hd)
    xk_t: jax.Array,  # (B, G, rk, S_max) rank-major latents (bf16)
    xv_t: jax.Array,  # (B, G, rv, S_max)
    kv_len: jax.Array,
    *,
    rk: int,
    rv: int,
    block_s: int = 1024,
    theta: float = 10000.0,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    inv_freq_static=None,
    rope_scale: float = 1.0,
    rot_dtype=jnp.float32,
    pos_offset: Optional[jax.Array] = None,
    return_stats: bool = False,
    layer_idx: Optional[jax.Array] = None,  # (L, ...)-stacked cache (see
    # palu_flash_decode4_quantized)
    seg_sum: bool = True,  # default ON (see palu_flash_decode4_quantized)
    k_bias: Optional[jax.Array] = None,  # (G, hpg, hd) pre-RoPE K bias
) -> jax.Array:
    """Transposed-formulation decode over an UNQUANTIZED rank-major latent
    cache -> (B, nh, rv).  Same kernel as the quantized variant with the
    unpack and per-token scaling compiled out; the cache streams straight
    into the (W, rk) @ (rk, BS) reconstruct dots."""
    lb = (xk_t.shape[0],) if layer_idx is not None else ()
    b, g = xk_t.shape[len(lb)], xk_t.shape[len(lb) + 1]
    s_max = xk_t.shape[-1]
    dummy = jnp.zeros(lb + (b, g, s_max), jnp.float32)
    return _call4(
        q, b_k, xk_t, dummy, xv_t, dummy, kv_len,
        bits=None, rk=rk, rv=rv, block_s=block_s, theta=theta,
        sliding_window=sliding_window, interpret=interpret,
        compute_dtype=compute_dtype, inv_freq_static=inv_freq_static,
        rope_scale=rope_scale, rot_dtype=rot_dtype,
        pos_offset=pos_offset, return_stats=return_stats,
        layer_idx=layer_idx, seg_sum=seg_sum, k_bias=k_bias,
    )
