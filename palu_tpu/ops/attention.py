"""Attention ops for prefill and decode.

- `mha_prefill`: causal (optionally sliding-window) multi-head attention.
  On TPU with long sequences it dispatches to the Pallas flash-attention
  kernel that ships with JAX; elsewhere it uses a blockwise-safe XLA einsum
  (fine for eval sequence lengths).
- `flash_decode_latent`: the Palu decode step over the *latent* KV cache --
  one flash-style pass that fuses K-reconstruction (latent @ B), on-the-fly
  RoPE, masked online softmax, and the latent-V value contraction. This is
  the XLA (lax.scan) formulation of the fused kernel; the Pallas version
  (palu_tpu.ops.pallas.palu_decode) shares its math and is used on TPU.

Math parity: the reference decode computes attn = softmax(abx(q, B, X)/sqrt(d))
then probs @ v_latents then fused o_proj (kernel/palu_attention.py:207-257,
abx_rope.py:49-111). Here the two stages run in one online-softmax pass, so
the latent cache is read exactly once per step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mha_prefill",
    "flash_decode_latent",
    "flash_prefill_latent",
    "rope_align_query",
]


def _causal_biased_logits(q, k, scale, sliding_window, q_offset):
    sq, sk = q.shape[-3], k.shape[-3]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    q_pos = jnp.arange(sq)[:, None] + q_offset
    k_pos = jnp.arange(sk)[None, :]
    keep = k_pos <= q_pos
    if sliding_window is not None:
        keep &= k_pos > q_pos - sliding_window
    return jnp.where(keep[None, None], logits, jnp.finfo(jnp.float32).min)


def mha_prefill(
    q: jax.Array,  # (B, Sq, nh, hd), roped
    k: jax.Array,  # (B, Sk, nkv, hd), roped
    v: jax.Array,  # (B, Sk, nkv, hd)
    sliding_window: Optional[int] = None,
    q_offset: int = 0,
) -> jax.Array:
    """Causal MHA -> (B, Sq, nh*hd). GQA handled by head repetition.

    Long sequences on TPU dispatch to the Pallas flash-attention kernel that
    ships with JAX (the reference's optional FlashAttention-2 analog,
    utils.py:89); short/sliding-window cases use the full-softmax einsum.
    """
    b, sq, nh, hd = q.shape
    nkv = k.shape[2]
    if nh != nkv:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    use_flash = (
        sliding_window is None
        and q_offset == 0
        and sq == k.shape[1]
        and sq >= 1024
        and sq % 512 == 0
        # hd=64 (TinyLlama-class) and hd=128 validated on a real v5e chip
        # vs the full-softmax reference (bf16 max diff ~0.01)
        and hd % 64 == 0
        and jax.default_backend() == "tpu"
    )
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=True,
            sm_scale=float(1.0 / np.sqrt(hd)),
        )
        return out.transpose(0, 2, 1, 3).reshape(b, sq, nh * hd)

    logits = _causal_biased_logits(q, k, 1.0 / np.sqrt(hd), sliding_window, q_offset)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(b, sq, nh * hd)


def rope_align_query(q: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply RoPE at the query's absolute position. q: (..., hd)."""
    half = q.shape[-1] // 2
    rot = jnp.concatenate([-q[..., half:], q[..., :half]], axis=-1)
    return q * cos + rot * sin


def flash_decode_latent(
    q: jax.Array,  # (B, nh, hd) -- roped at the current position
    read_k_chunk,  # fn(chunk_idx) -> (B, G, C, rk) latents (dequantized)
    read_v_chunk,  # fn(chunk_idx) -> (B, G, C, rv) latents
    b_k: jax.Array,  # (G, hpg, rk, hd) grouped per-head reconstruction matrices
    num_chunks: int,
    chunk: int,
    kv_len: jax.Array,  # (B,) per-lane valid cache positions
    head_dim: int,
    rope_theta: float,
    rv: int,
    sliding_window: Optional[int] = None,
    k_bias: Optional[jax.Array] = None,  # (G, hpg, hd) reconstruction bias
    pos_offset: jax.Array | int = 0,  # absolute position of chunk 0 (seq sharding)
    return_stats: bool = False,
    inv_freq=None,  # (hd/2,) rope_scaling override (models/rope.py)
    rope_scale: float = 1.0,  # attention scaling (yarn)
) -> jax.Array:
    """Fused latent decode attention -> (B, nh, rv) latent-space output.

    Single pass over the cache with online softmax (flash-decoding over the
    sequence): per chunk, reconstruct K-block (latent @ B), apply RoPE with
    absolute positions computed in-scan (the reference kernel's in-kernel
    cos/sin, abx_rope.py:20-27), accumulate (m, l, acc).
    """
    b, nh, hd = q.shape
    g, hpg = b_k.shape[0], b_k.shape[1]
    q_g = q.reshape(b, g, hpg, hd)

    if inv_freq is None:
        inv_freq = 1.0 / (
            rope_theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
        )
    else:
        inv_freq = jnp.asarray(inv_freq, jnp.float32)

    # matmul operands in the caller's compute dtype (bf16 MXU rate is ~8x
    # fp32 on TPU) with fp32 accumulation; softmax statistics stay fp32
    cdt = q.dtype

    def body(carry, idx):
        m, l, acc = carry
        xk = read_k_chunk(idx).astype(cdt)  # (B, G, C, rk)
        xv = read_v_chunk(idx).astype(cdt)  # (B, G, C, rv)
        # reconstruct K block: (B, G, hpg, C, hd)
        kblk = jnp.einsum(
            "bgcr,ghrd->bghcd", xk, b_k.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        if k_bias is not None:  # qwen2: K = lat @ U + b, bias pre-RoPE
            kblk = kblk + k_bias.astype(jnp.float32)[None, :, :, None, :]
        # in-scan RoPE at absolute positions
        pos = pos_offset + idx * chunk + jnp.arange(chunk)
        freqs = pos[:, None].astype(jnp.float32) * inv_freq  # (C, hd/2)
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        cos, sin = jnp.cos(emb) * rope_scale, jnp.sin(emb) * rope_scale
        half = hd // 2
        krot = jnp.concatenate([-kblk[..., half:], kblk[..., :half]], axis=-1)
        kblk = kblk * cos + krot * sin
        # logits (B, G, hpg, C)
        logits = jnp.einsum(
            "bghd,bghcd->bghc", q_g.astype(cdt), kblk.astype(cdt),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(head_dim)
        valid = pos[None, :] < kv_len[:, None]  # (B, C)
        if sliding_window is not None:
            valid &= pos[None, :] > (kv_len[:, None] - 1) - sliding_window
        vmask = valid[:, None, None, :]
        # finite mask value + explicit p zeroing: -inf would produce
        # exp(-inf - -inf) = nan on fully-masked chunks
        logits = jnp.where(vmask, logits, -1e30)
        # online softmax update
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])  # (B, G, hpg, C)
        p = jnp.where(vmask, p, 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bghc,bgcr->bghr", p.astype(cdt), xv,
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha[..., None] + pv
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, g, hpg), -1e30, jnp.float32)
    l0 = jnp.zeros((b, g, hpg), jnp.float32)
    acc0 = jnp.zeros((b, g, hpg, rv), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(num_chunks))
    if return_stats:
        return m, l, acc  # (B,G,hpg), (B,G,hpg), (B,G,hpg,rv)
    out = acc / l[..., None]
    return out.reshape(b, nh, rv)


def flash_prefill_latent(
    q: jax.Array,  # (B, Cq, nh, hd) -- roped at absolute positions offset+i
    read_k_chunk,  # fn(chunk_idx) -> (B, G, C, rk) latents (dequantized)
    read_v_chunk,  # fn(chunk_idx) -> (B, G, C, rv)
    b_k: jax.Array,  # (G, hpg, rk, hd)
    num_chunks: int,
    chunk: int,
    offset: jax.Array,  # (B,) absolute position of q[:, 0]
    head_dim: int,
    rope_theta: float,
    rv: int,
    sliding_window: Optional[int] = None,
    k_bias: Optional[jax.Array] = None,  # (G, hpg, hd)
    inv_freq=None,
    rope_scale: float = 1.0,
    b_v: Optional[jax.Array] = None,  # (G, hpg, rv, hd) -> reconstruct V
    v_bias: Optional[jax.Array] = None,  # (G, hpg, hd)
) -> jax.Array:
    """Chunked-prefill attention over the latent cache -> (B, Cq, nh, rv),
    or (B, Cq, nh, hd) when `b_v` is given.

    The q-block generalization of flash_decode_latent: each query position
    offset+i attends cache positions <= offset+i (causal across and within
    the chunk). Used by Engine.prefill_chunked so a 64K prompt streams
    through in fixed-size pieces with O(chunk^2) activation memory.

    Value path: decode keeps V in latent space (probs @ latents, rv per
    group) because one query amortizes nothing; at PREFILL every kv block
    is hit by a whole q-chunk, so reconstructing V (b_v, like b_k for K)
    and attending at head_dim is ~3x fewer PV flops at the headline shape
    (rv=384 vs hd=128) and feeds the 3x-narrower unfused o_proj. Pass b_v
    to select it.
    """
    b, cq, nh, hd = q.shape
    g, hpg = b_k.shape[0], b_k.shape[1]
    q_g = q.reshape(b, cq, g, hpg, hd).transpose(0, 2, 3, 1, 4)  # (B,G,hpg,Cq,hd)

    if inv_freq is None:
        inv_freq = 1.0 / (
            rope_theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
        )
    else:
        inv_freq = jnp.asarray(inv_freq, jnp.float32)

    # matmul operands stay in the caller's compute dtype (bf16 on TPU: the
    # MXU runs bf16 x bf16 -> fp32 at full rate, fp32 x fp32 at ~1/8) with
    # fp32 ACCUMULATION; only the softmax statistics are materialized fp32.
    cdt = q.dtype

    def body(idx, carry):
        m, l, acc = carry
        xk = read_k_chunk(idx).astype(cdt)  # (B, G, C, rk)
        xv = read_v_chunk(idx).astype(cdt)  # (B, G, C, rv)
        kblk = jnp.einsum(
            "bgcr,ghrd->bghcd", xk, b_k.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        if k_bias is not None:
            kblk = kblk + k_bias.astype(jnp.float32)[None, :, :, None, :]
        pos = idx * chunk + jnp.arange(chunk)  # (C,) cache positions
        freqs = pos[:, None].astype(jnp.float32) * inv_freq
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        cos, sin = jnp.cos(emb) * rope_scale, jnp.sin(emb) * rope_scale
        half = hd // 2
        krot = jnp.concatenate([-kblk[..., half:], kblk[..., :half]], axis=-1)
        kblk = kblk * cos + krot * sin
        logits = jnp.einsum(
            "bghqd,bghcd->bghqc", q_g.astype(cdt), kblk.astype(cdt),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(head_dim)
        # causal: cache pos <= absolute q pos (offset + q_idx), per lane
        q_pos = offset[:, None] + jnp.arange(cq)[None, :]  # (B, Cq)
        valid = pos[None, None, :] <= q_pos[..., None]  # (B, Cq, C)
        if sliding_window is not None:
            valid &= pos[None, None, :] > q_pos[..., None] - sliding_window
        vmask = valid[:, None, None, :, :]  # (B,1,1,Cq,C)
        logits = jnp.where(vmask, logits, -1e30)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        p = jnp.where(vmask, p, 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        if b_v is not None:
            vblk = jnp.einsum(
                "bgcr,ghrd->bghcd", xv, b_v.astype(cdt),
                preferred_element_type=jnp.float32,
            )
            if v_bias is not None:
                vblk = vblk + v_bias.astype(jnp.float32)[None, :, :, None, :]
            pv = jnp.einsum(
                "bghqc,bghcd->bghqd", p.astype(cdt), vblk.astype(cdt),
                preferred_element_type=jnp.float32,
            )
        else:
            pv = jnp.einsum(
                "bghqc,bgcr->bghqr", p.astype(cdt), xv,
                preferred_element_type=jnp.float32,
            )
        return (m_new, l_new, acc * alpha[..., None] + pv)

    out_w = hd if b_v is not None else rv
    m0 = jnp.full((b, g, hpg, cq), -1e30, jnp.float32)
    l0 = jnp.zeros((b, g, hpg, cq), jnp.float32)
    acc0 = jnp.zeros((b, g, hpg, cq, out_w), jnp.float32)
    # dynamic causal bound: chunks entirely after the last query position
    # contribute nothing (their whole mask is false) and are skipped -- a
    # fori_loop with a traced upper bound keeps ONE compiled executable for
    # every (offset, cq) while halving total prefill chunk pairs
    last_q = jnp.max(offset) + cq - 1
    needed = jnp.minimum(last_q // chunk + 1, num_chunks).astype(jnp.int32)
    m, l, acc = jax.lax.fori_loop(0, needed, body, (m0, l0, acc0))
    out = acc / l[..., None]  # (B, G, hpg, Cq, rv|hd)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, cq, nh, out_w)


def flash_decode_latent_seq_sharded(
    q: jax.Array,  # (B, nh, hd) roped, replicated over the seq axis
    x_k: jax.Array,  # (B, G, S_max, rk) -- to be sharded over `axis` on dim 2
    x_v: jax.Array,  # (B, G, S_max, rv)
    b_k: jax.Array,  # (G, hpg, rk, hd) replicated
    kv_len: jax.Array,  # (B,) global lengths
    mesh,
    axis: str,
    chunk: int,
    head_dim: int,
    rope_theta: float,
    sliding_window: Optional[int] = None,
    inv_freq=None,
    rope_scale: float = 1.0,
) -> jax.Array:
    """Sequence-parallel fused decode: the latent cache is sharded along the
    sequence dim over `axis`; each shard computes partial flash stats
    (m, l, acc) over its slice with absolute-position RoPE, then the
    flash-decoding combine (pmax on m, rescaled psums of l and acc) merges
    shards. This is the SURVEY section-5 long-context design: per-block work
    is exactly the abx kernel body, the combine is one (m, l, o) reduction.
    """
    from jax.sharding import PartitionSpec as P

    from palu_tpu.parallel.mesh import shard_map_nocheck

    n_shards = mesh.shape[axis]
    b, nh, hd = q.shape
    g, hpg = b_k.shape[0], b_k.shape[1]
    s_max, rv = x_k.shape[2], x_v.shape[3]
    s_local = s_max // n_shards
    assert s_local % chunk == 0

    def shard_fn(q_, xk_, xv_, kvl_):
        idx = jax.lax.axis_index(axis)
        offset = idx * s_local
        m, l, acc = flash_decode_latent(
            q_,
            lambda i: jax.lax.dynamic_slice_in_dim(xk_, i * chunk, chunk, 2),
            lambda i: jax.lax.dynamic_slice_in_dim(xv_, i * chunk, chunk, 2),
            b_k,
            s_local // chunk,
            chunk,
            kvl_,
            head_dim,
            rope_theta,
            rv,
            sliding_window,
            pos_offset=offset,
            return_stats=True,
            inv_freq=inv_freq,
            rope_scale=rope_scale,
        )
        m_g = jax.lax.pmax(m, axis)
        scale_ = jnp.exp(m - m_g)
        l_g = jax.lax.psum(l * scale_, axis)
        acc_g = jax.lax.psum(acc * scale_[..., None], axis)
        out = acc_g / l_g[..., None]
        return out.reshape(q_.shape[0], nh, rv)

    return shard_map_nocheck(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis, None), P(None, None, axis, None), P()),
        out_specs=P(),
    )(q, x_k, x_v, kv_len)


def flash_decode_latent_seq_sharded_rank_major(
    q: jax.Array,  # (B, nh, hd) roped, replicated over the seq axis
    k_bufs,  # rank-major cache dict: codes_t/scale_t[/zero_t] or lat_t,
    v_bufs,  # each leaf's LAST dim = sequence, sharded over `axis`
    b_k: jax.Array,  # (G, hpg, rk, hd) replicated
    kv_len: jax.Array,  # (B,) global lengths
    mesh,
    axis: str,
    *,
    qcfg,  # QuantConfig (packed cache) or None (bf16 rank-major lat_t)
    rk: int,
    rv: int,
    block_s: int,
    theta: float,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
    inv_freq_static=None,
    rope_scale: float = 1.0,
    k_bias: Optional[jax.Array] = None,  # (G, hpg, hd) replicated (qwen2)
    kernel_knobs: Optional[dict] = None,  # v4 formulation knobs
    # (v_byte_dot / int8_dots) splatted into the per-shard kernel call
) -> jax.Array:
    """Sequence-sharded fused decode over a RANK-MAJOR latent cache (packed
    low-bit or bf16): each shard runs the v4 transposed kernel on its slice
    with a pos_offset (absolute-position RoPE composed into the query lanes)
    and return_stats=True, then the flash-decoding combine (pmax on m,
    rescaled psums of l and acc) merges shards -- the quantized long-context
    north star: 64K+ caches sharded over chips stay packed end to end.
    Per-chunk scale/zero rows (qcfg.group_size > 0, the reference's
    --lt_group_size) shard along their last (sequence) axis like every
    other leaf and pass through as (B, G, n_sc, S_local) row stacks.

    The reference has no distributed mode at all (SURVEY section-2.3); this
    is the TPU-native composition of its abx kernel math with sequence
    parallelism."""
    from jax.sharding import PartitionSpec as P

    from palu_tpu.ops.pallas import palu_decode4 as pk4
    from palu_tpu.parallel.mesh import shard_map_nocheck

    n_shards = mesh.shape[axis]
    b, nh, hd = q.shape
    g = b_k.shape[0]
    seq_leaf = "lat_t" if qcfg is None else "codes_t"
    s_max = k_bufs[seq_leaf].shape[-1]
    s_local = s_max // n_shards
    assert s_local * n_shards == s_max
    bs = max(1, min(block_s, s_local))
    while s_local % bs:
        bs -= 1

    def shard_fn(q_, kb, vb, kvl_):
        idx = jax.lax.axis_index(axis)
        offset = (idx * s_local).astype(jnp.int32)
        common = dict(
            rk=rk, rv=rv, block_s=bs, theta=theta,
            sliding_window=sliding_window, interpret=interpret,
            inv_freq_static=inv_freq_static, rope_scale=rope_scale,
            pos_offset=offset, return_stats=True, k_bias=k_bias,
        )
        if qcfg is None:
            acc, m, l = pk4.palu_flash_decode4(
                q_, b_k, kb["lat_t"], vb["lat_t"], kvl_, **common)
        else:
            if qcfg.group_size > 0:
                # per-chunk: (B, G, n_sc, S_local) row stacks pass raw
                ksc, vsc = kb["scale_t"], vb["scale_t"]
                zeros = {} if qcfg.sym else {
                    "xk_zero": kb["zero_t"], "xv_zero": vb["zero_t"],
                }
            else:
                ksc = kb["scale_t"].reshape(b, g, s_local)
                vsc = vb["scale_t"].reshape(b, g, s_local)
                zeros = {} if qcfg.sym else {
                    "xk_zero": kb["zero_t"].reshape(b, g, s_local),
                    "xv_zero": vb["zero_t"].reshape(b, g, s_local),
                }
            acc, m, l = pk4.palu_flash_decode4_quantized(
                q_, b_k, kb["codes_t"], ksc, vb["codes_t"], vsc,
                kvl_, qcfg=qcfg, **common, **zeros,
                **(kernel_knobs or {}))
        m_g = jax.lax.pmax(m, axis)  # (B, nh)
        scale_ = jnp.exp(m - m_g)
        l_g = jax.lax.psum(l * scale_, axis)
        acc_g = jax.lax.psum(acc * scale_[..., None], axis)
        return acc_g / l_g[..., None]  # (B, nh, rv)

    def buf_specs(bufs):
        return {
            k: P(*([None] * (v.ndim - 1) + [axis])) for k, v in bufs.items()
        }

    return shard_map_nocheck(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), buf_specs(k_bufs), buf_specs(v_bufs), P()),
        out_specs=P(),
    )(q, k_bufs, v_bufs, kv_len)
