"""Latent KV cache: static-shape, jit-friendly, optionally int-packed.

The reference's latency track stores latents in an HF DynamicCache
(kernel/palu_attention.py:193) whose buffers grow per step -- a shape-dynamic
pattern XLA cannot compile. Here the cache is a preallocated pytree of
per-layer buffers written with lax.dynamic_update_slice, with a scalar
`length`; decode steps donate the cache for in-place XLA updates (the
CUDA-graph replacement, run_latency_attention.py:81-90 -> jit + donation).

Layouts (per layer, ragged ranks across layers allowed):
  k latents: (B, G, S_max, r_k)   pre-RoPE, as in the reference (RoPE is
  v latents: (B, G, S_max, r_v)   applied at reconstruction time)

Quantized variant stores uint8-packed codes + per-token scales/base produced
by palu_tpu.core.quant (2/3/4-bit; the reference only fake-quants and lists
real packed caching as future work, README.md:24).

Two quantized layouts exist:
  - seq-major (default): codes (B, G, S, nbytes) + scales/base (B, G, S, n),
    consumed by the v1 fused kernel and the XLA fallback;
  - rank-major (symmetric per-row quantization only): codes_t
    (B, G, rows, S) + scale_t (B, G, 1, S), the layout the v4 transposed
    kernel streams directly (palu_decode4.py).  Keys ending in "_t" carry
    the sequence on their LAST axis; the write/slice helpers here dispatch
    on that convention so engine code stays layout-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core import quant
from ..models.config import ModelConfig

__all__ = [
    "init_cache", "init_cache_stacked", "cache_nbytes", "write_prefill",
    "write_token", "rank_major", "seq_slice", "layer_view",
    "write_at_lanes_stacked",
]


def rank_major(qcfg: Optional[quant.QuantConfig]) -> bool:
    """True when the cache uses the rank-major packed layout with PER-ROW
    scales: feeds the v4 transposed kernel (sym: no zero row; asym: an
    extra per-token zero row consumed by the kernel's folded zero-point
    corrections)."""
    return qcfg is not None and qcfg.enabled and qcfg.group_size == 0


def rank_major_chunked(qcfg: Optional[quant.QuantConfig], rank: int) -> bool:
    """True when a per-chunk (group_size > 0, the reference's
    --lt_group_size) cache can use the rank-major layout: scale/zero rows
    are (rank // group_size, S) and the v4 kernel dequantizes in-VMEM
    before its reconstruct dots (scales cannot fold past the dots at
    sub-row granularity). Requires the chunk to divide the rank and to be
    a sublane multiple; other shapes keep the seq-major layout + XLA
    fallback."""
    return (
        qcfg is not None
        and qcfg.enabled
        and qcfg.group_size > 0
        and qcfg.group_size % 8 == 0
        and rank % qcfg.group_size == 0
    )


def _seq_axis(key: str, ndim: int) -> int:
    """Sequence axis of a buffer leaf: last for rank-major ("_t") keys,
    third-from-last otherwise (works pre- and post-vmap over batch)."""
    return ndim - 1 if key.endswith("_t") else ndim - 2


def _layer_buffers(
    batch: int,
    groups: int,
    s_max: int,
    rank: int,
    dtype,
    qcfg: Optional[quant.QuantConfig],
    rank_major_fp: bool = False,
):
    if qcfg is None or not qcfg.enabled:
        if rank_major_fp:
            return {"lat_t": jnp.zeros((batch, groups, rank, s_max), dtype)}
        return {"lat": jnp.zeros((batch, groups, s_max, rank), dtype)}
    if rank_major(qcfg) or rank_major_chunked(qcfg, rank):
        nrows = quant.packed_nrows(rank, qcfg.pack_bits)
        n_sc = rank // qcfg.group_size if qcfg.group_size > 0 else 1
        bufs = {
            "codes_t": jnp.zeros((batch, groups, nrows, s_max), jnp.uint8),
            "scale_t": jnp.zeros((batch, groups, n_sc, s_max), jnp.float32),
        }
        if not qcfg.sym:
            bufs["zero_t"] = jnp.zeros((batch, groups, n_sc, s_max), jnp.float32)
        return bufs
    nbytes = quant.packed_nbytes(rank, qcfg.pack_bits)
    n_scale = rank // qcfg.group_size if qcfg.group_size > 0 else 1
    return {
        "codes": jnp.zeros((batch, groups, s_max, nbytes), jnp.uint8),
        "scales": jnp.zeros((batch, groups, s_max, n_scale), jnp.float32),
        "base": jnp.zeros((batch, groups, s_max, n_scale), jnp.float32),
    }


def init_cache(
    cfg: ModelConfig,
    batch: int,
    s_max: int,
    dtype=jnp.bfloat16,
    qcfg: Optional[quant.QuantConfig] = None,
    rank_major_fp: bool = False,
) -> Dict[str, Any]:
    """Build the cache pytree. Layers without low-rank k/v fall back to dense
    KV buffers (B, n_kv, S_max, head_dim); those always stay seq-major
    (they hold roped full K/V, which no transposed kernel consumes)."""
    g = cfg.num_kv_groups
    layers = []
    for i in range(cfg.num_hidden_layers):
        rk = cfg.uniform_rank_for(i, "k_proj")
        rv = cfg.uniform_rank_for(i, "v_proj")
        entry = {}
        if rk is None:
            entry["k"] = {
                "lat": jnp.zeros((batch, cfg.num_key_value_heads, s_max, cfg.head_dim), dtype)
            }
        else:
            entry["k"] = _layer_buffers(batch, g, s_max, rk, dtype, qcfg,
                                        rank_major_fp)
        if rv is None:
            entry["v"] = {
                "lat": jnp.zeros((batch, cfg.num_key_value_heads, s_max, cfg.head_dim), dtype)
            }
        else:
            entry["v"] = _layer_buffers(batch, g, s_max, rv, dtype, qcfg,
                                        rank_major_fp)
        layers.append(entry)
    return {"layers": layers, "length": jnp.zeros((batch,), jnp.int32)}


def init_cache_stacked(
    cfg: ModelConfig,
    batch: int,
    s_max: int,
    dtype=jnp.bfloat16,
    qcfg: Optional[quant.QuantConfig] = None,
    rank_major_fp: bool = False,
) -> Dict[str, Any]:
    """Layer-STACKED cache: one {"k": bufs, "v": bufs} tree whose leaves
    carry a leading (L, ...) layer axis, so a lax.scan over layers can pass
    the whole stack through its carry and the v4 kernel's scalar-prefetched
    `layer_idx` selects blocks directly from the stacked buffers -- no
    per-layer XLA cache slice (~0.45 ms/layer of pure copy at 7B/64K,
    docs/BENCH.md full-model decomposition). Requires uniform ranks across
    layers and all-low-rank k/v (Engine auto-falls-back otherwise)."""
    g = cfg.num_kv_groups
    L = cfg.num_hidden_layers
    rk = cfg.uniform_rank_for(0, "k_proj")
    rv = cfg.uniform_rank_for(0, "v_proj")
    for i in range(L):
        if (cfg.uniform_rank_for(i, "k_proj") != rk
                or cfg.uniform_rank_for(i, "v_proj") != rv):
            raise ValueError("stacked cache requires uniform ranks per layer")
    if rk is None or rv is None:
        raise ValueError("stacked cache requires low-rank k and v")

    def stack_bufs(rank):
        one = stacked_squeeze(
            _layer_buffers(batch, g, s_max, rank, dtype, qcfg, rank_major_fp),
            qcfg,
        )
        return {
            k: jnp.zeros((L,) + v.shape, v.dtype) for k, v in one.items()
        }

    return {
        "stack": {"k": stack_bufs(rk), "v": stack_bufs(rv)},
        "length": jnp.zeros((batch,), jnp.int32),
    }


def stacked_squeeze(bufs: Dict[str, jax.Array], qcfg) -> Dict[str, jax.Array]:
    """Per-row (group_size == 0) rank-major scale/zero leaves drop their
    unit n_sc axis in the STACKED layout: (.., G, 1, S) -> (.., G, S).
    The v4 kernel consumes exactly that shape, so the scanned decode body
    never reshapes a multi-MB carry buffer per layer (an XLA reshape in the
    scan body can materialize a copy each iteration). Per-chunk scales
    (group_size > 0) keep their row-stack axis."""
    if qcfg is None or not qcfg.enabled or qcfg.group_size > 0:
        return bufs
    out = dict(bufs)
    for k in ("scale_t", "zero_t"):
        if k in out:
            out[k] = out[k][..., 0, :]
    return out


def stacked_unsqueeze(bufs: Dict[str, jax.Array], qcfg) -> Dict[str, jax.Array]:
    """Inverse of stacked_squeeze on a per-layer VIEW: re-insert the unit
    n_sc axis so layout-generic readers (decode_latents, seq_slice users)
    see the standard per-layer shapes."""
    if qcfg is None or not qcfg.enabled or qcfg.group_size > 0:
        return bufs
    out = dict(bufs)
    for k in ("scale_t", "zero_t"):
        if k in out:
            out[k] = out[k][..., None, :]
    return out


def layer_view(stack: Dict[str, Any], i: int) -> Dict[str, Any]:
    """Static per-layer view of a stacked {"k","v"} buffer tree. Inside a
    trace this is a basic slice XLA fuses into the consumers (reads only;
    writes go through write_at_lanes_stacked)."""
    return jax.tree.map(lambda a: a[i], stack)


def write_at_lanes_stacked(
    buf: Dict[str, jax.Array],  # leaves (L, B, G, ..., S)
    update: Dict[str, jax.Array],  # leaves (B, G, ..., S_new) (lane layout)
    pos: jax.Array,  # (B,) per-lane sequence offsets
    layer_idx,  # static int (prefill loop) or traced scalar (decode scan)
    mask: Optional[jax.Array] = None,  # (B,) bool; None = unconditional
) -> Dict[str, jax.Array]:
    """Per-lane write into layer `layer_idx` of a stacked buffer tree.
    A Python loop over lanes keeps every write a plain dynamic_update_slice
    (aliasable in place under donation); with `mask`, masked-out lanes
    re-write their current content (same no-op contract as
    write_at_lanes_masked)."""
    li = jnp.asarray(layer_idx, jnp.int32)
    out = {}
    for k, u in update.items():
        a = buf[k]
        nlane = u.shape[0]
        for b in range(nlane):
            ub = u[b][None, None]  # (1, 1, G, ..., S_new)
            starts = [li, b] + [0] * (ub.ndim - 2)
            starts[2 + _seq_axis(k, ub.ndim - 2)] = pos[b]
            if mask is not None:
                cur = jax.lax.dynamic_slice(a, starts, ub.shape)
                ub = jnp.where(mask[b], ub, cur)
            a = jax.lax.dynamic_update_slice(a, ub.astype(a.dtype), starts)
        out[k] = a
    return out


def cache_nbytes(cache: Dict[str, Any]) -> int:
    """Total cache footprint in bytes (for compression-rate reporting)."""
    total = 0
    for leaf in jax.tree.leaves(cache):
        total += leaf.size * leaf.dtype.itemsize
    return total


def _encode(latents: jax.Array, qcfg: Optional[quant.QuantConfig], dtype,
            rank_major_fp: bool = False):
    """latents (B, G, S, r) -> buffer update dict (layout-matched)."""
    if qcfg is None or not qcfg.enabled:
        if rank_major_fp:
            return {"lat_t": jnp.swapaxes(latents.astype(dtype), -1, -2)}
        return {"lat": latents.astype(dtype)}
    if rank_major(qcfg) or rank_major_chunked(qcfg, latents.shape[-1]):
        codes, scales, zeros = quant.quantize_affine(latents, qcfg)
        # scales (B, G, S, n_sc) -> (B, G, n_sc, S): sequence on the last
        # axis (n_sc = 1 per-row, rank//group_size per-chunk)
        upd = {
            "codes_t": quant.pack_codes_t(codes, qcfg.pack_bits),
            "scale_t": jnp.swapaxes(scales.astype(jnp.float32), -1, -2),
        }
        if not qcfg.sym:
            upd["zero_t"] = jnp.swapaxes(zeros.astype(jnp.float32), -1, -2)
        return upd
    codes, scales, base = quant.quantize(latents, qcfg)
    packed = quant.pack_codes(codes, qcfg.pack_bits)
    return {
        "codes": packed,
        "scales": scales.astype(jnp.float32),
        "base": base.astype(jnp.float32),
    }


def decode_latents(
    buf: Dict[str, jax.Array],
    qcfg: Optional[quant.QuantConfig],
    rank: int,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Read back latents (B, G, S, r) from a layer buffer (dequantizing if
    packed). The Pallas decode kernel fuses this; this is the XLA fallback."""
    if qcfg is None or not qcfg.enabled:
        if "lat_t" in buf:
            return jnp.swapaxes(buf["lat_t"], -1, -2).astype(dtype)
        return buf["lat"].astype(dtype)
    if "codes_t" in buf:
        codes = quant.unpack_codes_t(buf["codes_t"], qcfg.pack_bits, rank)

        def rows(a):  # (B, G, n_sc, S) -> (B, G, rank, S)
            n_sc = a.shape[-2]
            return a if n_sc == 1 else jnp.repeat(a, rank // n_sc, axis=-2)

        if qcfg.sym:
            qoff = 2 ** (qcfg.bits - 1)
            lat = (codes.astype(jnp.float32) - qoff) * rows(buf["scale_t"])
        else:  # affine: x = scale * code + zero
            lat = codes.astype(jnp.float32) * rows(buf["scale_t"]) + rows(
                buf["zero_t"])
        return jnp.swapaxes(lat, -1, -2).astype(dtype)
    codes = quant.unpack_codes(buf["codes"], qcfg.pack_bits, rank)
    return quant.dequantize(codes, buf["scales"], buf["base"], qcfg, dtype=dtype)


def seq_slice(buf: Dict[str, jax.Array], start, size: int,
              dynamic: bool = True) -> Dict[str, jax.Array]:
    """Slice `size` positions from each leaf's sequence axis at `start`
    (layout-aware; `dynamic` uses lax.dynamic_slice_in_dim for traced
    starts, else basic indexing)."""
    out = {}
    for k, a in buf.items():
        ax = _seq_axis(k, a.ndim)
        if dynamic:
            out[k] = jax.lax.dynamic_slice_in_dim(a, start, size, axis=ax)
        else:
            idx = [slice(None)] * a.ndim
            idx[ax] = slice(start, start + size)
            out[k] = a[tuple(idx)]
    return out


def _starts(key: str, ndim: int, pos) -> tuple:
    s = [0] * ndim
    s[_seq_axis(key, ndim)] = pos
    return tuple(s)


def write_at(
    buf: Dict[str, jax.Array],
    update: Dict[str, jax.Array],
    pos: jax.Array,
) -> Dict[str, jax.Array]:
    """Write `update` (B, G, S_new, ...) into each buffer at seq offset pos."""
    return {
        k: jax.lax.dynamic_update_slice(buf[k], u, _starts(k, u.ndim, pos))
        for k, u in update.items()
    }


def write_at_lanes(
    buf: Dict[str, jax.Array],
    update: Dict[str, jax.Array],
    pos: jax.Array,  # (B,) per-lane sequence offsets
) -> Dict[str, jax.Array]:
    """Per-lane write: update (B, G, S_new, ...) lands at each lane's own
    offset (continuous batching: lanes hold different-length requests)."""
    def one(key):
        def fn(b_buf, b_upd, p):
            return jax.lax.dynamic_update_slice(
                b_buf, b_upd, _starts(key, b_upd.ndim, p))
        return fn

    return {k: jax.vmap(one(k))(buf[k], update[k], pos) for k in update}


def write_at_lanes_masked(
    buf: Dict[str, jax.Array],
    update: Dict[str, jax.Array],
    pos: jax.Array,  # (B,) per-lane sequence offsets (clamped by caller)
    mask: jax.Array,  # (B,) bool: lanes where the write should take effect
) -> Dict[str, jax.Array]:
    """write_at_lanes that is a true no-op for masked-out lanes: the existing
    slot content is re-written, so idle lanes (continuous batching) and full
    lanes (pos clamped to s_max-1) are never corrupted by the unconditional
    decode step. Costs one (G, S_new, r) read per buffer -- negligible next
    to the attention pass."""

    def one(key):
        def fn(b_buf, b_upd, p, m):
            starts = _starts(key, b_upd.ndim, p)
            cur = jax.lax.dynamic_slice(b_buf, starts, b_upd.shape)
            return jax.lax.dynamic_update_slice(
                b_buf, jnp.where(m, b_upd, cur), starts
            )
        return fn

    return {k: jax.vmap(one(k))(buf[k], update[k], pos, mask) for k in update}


def write_prefill(buf, latents, qcfg, dtype, pos, rank_major_fp: bool = False):
    """latents (B, G, S, r) written at offset pos; returns new layer buffer.
    Pass qcfg=None for dense (uncompressed) buffers."""
    upd = _encode(latents, qcfg, dtype, rank_major_fp)
    return write_at(buf, upd, pos)


write_token = write_prefill  # same path: S == 1
