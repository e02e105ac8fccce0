"""Pallas TPU flash attention for CHUNKED PREFILL with an absolute query
offset and a dynamic kv length.

Why it exists: the XLA chunked-prefill path (ops/attention.py
flash_prefill_latent) materializes (Cq, C) fp32 probability intermediates
in HBM for every (q-chunk, kv-chunk) pair — ~0.5 GB per pair at the 64K
headline shape, ~0.35 s/layer of pure HBM traffic (docs/BENCH.md
"Prefill / TTFT"). This kernel runs the online softmax entirely in VMEM:
per (batch, head) it streams K/V blocks once and keeps logits, probs, and
the (Cq, hd) accumulator on-chip, exactly like the v4 decode kernel does
for decode.

jax's own pallas flash_attention cannot express this call: the causal
mask there is tied to sq==sk (or a static sk-sq diagonal), while chunked
prefill needs q row i to attend cache positions <= q_offset + i with
q_offset changing per chunk and the real kv extent (kv_len) changing per
call — both arrive here as scalar-prefetch operands, so ONE compiled
executable serves every chunk of every prompt length. The kv length also
feeds the BlockSpec index maps: sequence blocks past the last needed one
clamp to it, so their DMAs are elided (same block index -> no refetch)
and a short prefix never streams the whole s_max buffer.

GQA: K/V carry n_kv heads; the q-head grid index maps onto its kv head in
the BlockSpec (hi -> hi * nkv // nh), so kv blocks are fetched per q head
without materializing a head-repeated copy in HBM.

Reference analog: the prefill side of kernel/palu_attention.py:196-206
(reconstruct-then-SDPA); the reference has no fused prefill kernel at all.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["prefill_flash"]


LOG2E = float(np.log2(np.e))


def _make_kernel_pipelined(cq: int, block_s: int, hd: int, sliding_window,
                           cdt, exp2: bool = False):
    """Software-pipelined variant: grid runs one EXTRA sequence step and
    each step (a) issues the QK dot for block `si` into a ping-pong logits
    scratch slot, then (b) runs the online-softmax + PV for block `si-1`
    from the other slot.  The VPU softmax of a block has no data
    dependency on the next block's QK dot, so the scalar core can issue
    the (long-running) MXU dot first and execute the softmax while it
    drains -- the round-4 prefill sweep pinned MXU efficiency at ~64%,
    bounded by exactly this serialization (docs/BENCH.md).  Identical
    math: same dots, same masks, same f32 online-softmax recurrence,
    evaluated one grid step later."""
    def kernel(scalars, q_ref, k_ref, v_ref, out_ref, m_scr, l_scr, acc_scr,
               lg_scr):
        bi = pl.program_id(0)
        sblk = pl.program_id(2)
        nblk = pl.num_programs(2) - 1  # one flush step
        b_total = scalars.shape[0] // 2
        q_off = scalars[bi]
        kv_len = scalars[b_total + bi]

        @pl.when(sblk == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        produce = jnp.logical_and(sblk < nblk, sblk * block_s < kv_len)
        prev_start = (sblk - 1) * block_s
        consume = jnp.logical_and(sblk >= 1, prev_start < kv_len)

        def qk_into(slot):
            q = q_ref[0].astype(cdt)  # (Cq, hd)
            k = k_ref[0].astype(cdt)  # (BS, hd)
            scale = (LOG2E if exp2 else 1.0) / np.sqrt(hd)
            lg_scr[slot] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * np.float32(scale)

        def softmax_pv(slot, masked: bool):
            logits = lg_scr[slot]  # (Cq, BS) f32, block sblk-1
            if masked:
                pos = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
                    + prev_start
                )
                q_pos = (
                    jax.lax.broadcasted_iota(jnp.int32, (cq, 1), 0) + q_off
                )
                valid = jnp.logical_and(pos <= q_pos, pos < kv_len)
                if sliding_window is not None:
                    valid = jnp.logical_and(valid, pos > q_pos - sliding_window)
                logits = jnp.where(valid, logits, -1e30)
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
            # exp2 domain: logits carry a folded log2(e) factor, so
            # 2^(l2 - m2) == e^(l - m) exactly in infinite precision --
            # the hardware pow2 path skips exp's range-reduction multiply
            e = jnp.exp2 if exp2 else jnp.exp
            alpha = e(m_prev - m_new)
            p = e(logits - m_new)
            if masked:
                p = jnp.where(valid, p, 0.0)
            l_scr[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_new
            v = v_ref[0].astype(cdt)  # (BS, hd) -- the LAGGED block
            pv = jax.lax.dot_general(
                p.astype(cdt), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[...] = acc_scr[...] * alpha + pv

        # the QK dot issues FIRST so the MXU is busy while the (pure-VPU)
        # softmax of the previous block executes; ping-pong slots by grid
        # parity remove the write-before-read hazard
        even = jax.lax.rem(sblk, 2) == 0

        @pl.when(jnp.logical_and(produce, even))
        def _qk_even():
            qk_into(0)

        @pl.when(jnp.logical_and(produce, jnp.logical_not(even)))
        def _qk_odd():
            qk_into(1)

        # mask specialization for the LAGGED block (same rule as the
        # unpipelined kernel, shifted one step)
        full_ok = prev_start + block_s <= jnp.minimum(q_off + 1, kv_len)
        if sliding_window is not None:
            full_ok = jnp.logical_and(
                full_ok, prev_start >= q_off + cq - sliding_window
            )
        # step sblk consumes the slot written at sblk-1, i.e. slot
        # (sblk-1) % 2 = 1 - sblk % 2: even steps read slot 1, odd read 0
        for cur_even, slot in ((True, 1), (False, 0)):
            sel = even if cur_even else jnp.logical_not(even)

            @pl.when(jnp.logical_and(jnp.logical_and(consume, sel), full_ok))
            def _consume_unmasked(slot=slot):
                softmax_pv(slot, masked=False)

            @pl.when(jnp.logical_and(jnp.logical_and(consume, sel),
                                     jnp.logical_not(full_ok)))
            def _consume_masked(slot=slot):
                softmax_pv(slot, masked=True)

        @pl.when(sblk == nblk)
        def _finalize():
            out_ref[0] = (
                acc_scr[...] / jnp.maximum(l_scr[...], 1e-30)
            ).astype(out_ref.dtype)

    return kernel


def _make_kernel(cq: int, block_s: int, hd: int, sliding_window, cdt,
                 exp2: bool = False):
    def kernel(scalars, q_ref, k_ref, v_ref, out_ref, m_scr, l_scr, acc_scr):
        # scalars: (2*B,) int32 = [q_offset..., kv_len...]
        bi = pl.program_id(0)
        sblk = pl.program_id(2)
        nblk = pl.num_programs(2)
        b_total = scalars.shape[0] // 2
        q_off = scalars[bi]
        kv_len = scalars[b_total + bi]

        @pl.when(sblk == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        block_start = sblk * block_s

        def attend(masked: bool):
            q = q_ref[0].astype(cdt)  # (Cq, hd)
            k = k_ref[0].astype(cdt)  # (BS, hd)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * np.float32((LOG2E if exp2 else 1.0) / np.sqrt(hd))  # (Cq, BS)
            if masked:
                pos = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
                    + block_start
                )
                q_pos = (
                    jax.lax.broadcasted_iota(jnp.int32, (cq, 1), 0) + q_off
                )  # (Cq, 1) absolute query positions
                valid = jnp.logical_and(pos <= q_pos, pos < kv_len)
                if sliding_window is not None:
                    valid = jnp.logical_and(valid, pos > q_pos - sliding_window)
                logits = jnp.where(valid, logits, -1e30)

            m_prev = m_scr[...]  # (Cq, 1)
            l_prev = l_scr[...]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
            e = jnp.exp2 if exp2 else jnp.exp
            alpha = e(m_prev - m_new)
            p = e(logits - m_new)
            if masked:
                p = jnp.where(valid, p, 0.0)
            l_scr[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_new
            v = v_ref[0].astype(cdt)  # (BS, hd)
            pv = jax.lax.dot_general(
                p.astype(cdt), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Cq, hd)
            acc_scr[...] = acc_scr[...] * alpha + pv

        # Mask specialization: a block is valid for EVERY query row iff it
        # ends at or before q_off (all q_pos >= q_off) and inside kv_len
        # (and, with a sliding window, starts inside the window of the
        # largest q_pos). ~(S/Cq - 1)/(S/Cq) of blocks take the unmasked
        # path, skipping the iota/compare/select VPU work per element.
        full_ok = block_start + block_s <= jnp.minimum(q_off + 1, kv_len)
        if sliding_window is not None:
            full_ok = jnp.logical_and(
                full_ok, block_start >= q_off + cq - sliding_window
            )
        in_range = block_start < kv_len

        @pl.when(jnp.logical_and(in_range, full_ok))
        def _body_unmasked():
            attend(masked=False)

        @pl.when(jnp.logical_and(in_range, jnp.logical_not(full_ok)))
        def _body_masked():
            attend(masked=True)

        @pl.when(sblk == nblk - 1)
        def _finalize():
            # every in-range query row attends at least its own position so
            # l > 0 there; rows past kv_len (padded tail chunks) would hit
            # l == 0 -> guard keeps them finite garbage instead of NaN
            out_ref[0] = (
                acc_scr[...] / jnp.maximum(l_scr[...], 1e-30)
            ).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("block_s", "sliding_window", "interpret", "compute_dtype", "pipelined", "exp2"),
)
def prefill_flash(
    q: jax.Array,  # (B, nh, Cq, hd) roped at absolute positions q_offset+i
    k: jax.Array,  # (B, nkv, S_max, hd) roped reconstructed keys
    v: jax.Array,  # (B, nkv, S_max, hd)
    q_offset: jax.Array,  # (B,) absolute position of q[:, :, 0]
    kv_len: jax.Array,  # (B,) real cache extent (positions >= kv_len masked)
    *,
    block_s: int = 1024,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    pipelined: bool = False,
    exp2: bool = False,
) -> jax.Array:
    """Causal-with-offset flash attention -> (B, nh, Cq, hd).

    GQA handled in the BlockSpec index maps (nh % nkv == 0); no head
    repetition is materialized.  pipelined=True runs the one-block-lag
    software pipeline (_make_kernel_pipelined): same math, the QK dot of
    block i overlaps the softmax of block i-1.
    """
    b, nh, cq, hd = q.shape
    nkv, s_max = k.shape[1], k.shape[2]
    assert k.shape == (b, nkv, s_max, hd) and v.shape == (b, nkv, s_max, hd)
    assert nh % nkv == 0
    assert s_max % block_s == 0
    nblk = s_max // block_s

    scalars = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b,)),
            jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,)),
        ]
    )

    def clamp_last(bi, si, s):
        # clamp past-the-end sequence blocks to the last needed one: pallas
        # skips the DMA when consecutive grid steps map to the same block
        last = jnp.maximum(s[b + bi], 1) - 1  # kv_len-1, >= 0
        return jnp.minimum(si, last // block_s)

    def kv_index(bi, hi, si, s):
        return (bi, (hi * nkv) // nh, clamp_last(bi, si, s), 0)

    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # older pallas versions
        compiler_params = None

    if pipelined:
        def k_index(bi, hi, si, s):
            return (bi, (hi * nkv) // nh,
                    clamp_last(bi, jnp.minimum(si, nblk - 1), s), 0)

        def v_index(bi, hi, si, s):
            # the LAGGED block: step si consumes block si-1
            return (bi, (hi * nkv) // nh,
                    clamp_last(bi, jnp.maximum(si - 1, 0), s), 0)

        kernel = _make_kernel_pipelined(cq, block_s, hd, sliding_window,
                                        compute_dtype, exp2=exp2)
        grid = (b, nh, nblk + 1)
        in_specs = [
            pl.BlockSpec((1, None, cq, hd), lambda bi, hi, si, *_: (bi, hi, 0, 0)),
            pl.BlockSpec((1, None, block_s, hd), k_index),
            pl.BlockSpec((1, None, block_s, hd), v_index),
        ]
        scratch = [
            pltpu.VMEM((cq, 1), jnp.float32),
            pltpu.VMEM((cq, 1), jnp.float32),
            pltpu.VMEM((cq, hd), jnp.float32),
            pltpu.VMEM((2, cq, block_s), jnp.float32),
        ]
    else:
        kernel = _make_kernel(cq, block_s, hd, sliding_window, compute_dtype,
                              exp2=exp2)
        grid = (b, nh, nblk)
        in_specs = [
            pl.BlockSpec((1, None, cq, hd), lambda bi, hi, si, *_: (bi, hi, 0, 0)),
            pl.BlockSpec((1, None, block_s, hd), kv_index),
            pl.BlockSpec((1, None, block_s, hd), kv_index),
        ]
        scratch = [
            pltpu.VMEM((cq, 1), jnp.float32),
            pltpu.VMEM((cq, 1), jnp.float32),
            pltpu.VMEM((cq, hd), jnp.float32),
        ]

    out = pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, None, cq, hd), lambda bi, hi, si, *_: (bi, hi, 0, 0)
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nh, cq, hd), q.dtype),
        interpret=interpret,
    )(scalars, q, k, v)
    return out
