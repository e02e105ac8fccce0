"""Latent quantization: simulated (fake) quant with reference parity, plus
*real* packed integer storage for the latent KV cache.

Fake-quant semantics mirror the reference exactly
(/root/reference/palu/model/modules/quant.py:6-41):
  - operate on the last dim; `group_size > 0` splits it into contiguous
    chunks, `group_size == 0` means one scale per row,
  - symmetric: q in [-2^(b-1), 2^(b-1)-1], scale = clip_ratio*absmax / qmax,
  - asymmetric: q in [0, 2^b-1], scale = (max-min).clamp(1e-5)/qmax,
    base = round(-min/scale) clamped to the integer range,
  - n_bits >= 16 is a passthrough (quant.py:62-63).

Real quantization (`quantize` / `dequantize` / pack helpers) stores integer
codes + scales so the runtime cache actually shrinks; 2/3/4-bit codes are
bit-packed into int8 planes with a *planar* layout chosen so unpacking is a
handful of lane-uniform shift/mask ops on the TPU VPU (no cross-lane bit
gathers). 3-bit = a 2-bit plane + a 1-bit plane (exactly 3 bits/value), the
reference's unfinished TODO (README.md:24).
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp

__all__ = [
    "QuantConfig",
    "fake_quantize",
    "quantize",
    "dequantize",
    "pack_codes",
    "unpack_codes",
    "packed_nbytes",
]


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Latent quantizer configuration (reference add_common_args, utils.py:101-110).

    `container` (0 = same as `bits`) widens the STORAGE field per code
    without changing the quantization grid: bits=3, container=4 keeps the
    8-level 3-bit codes (identical accuracy to the reference's 3-bit
    protocol) but stores them in nibbles, so the fused kernel's per-value
    unpack is one shift+mask instead of the two-plane 3-bit assembly --
    the 3-bit decode kernel's VPU bottleneck (docs/BENCH.md round-4
    decomposition) -- at 4/3x the cache bytes."""

    bits: int = 16
    group_size: int = 0  # 0 = one scale per row (last dim)
    sym: bool = False
    clip_ratio: float = 1.0
    hadamard: bool = False
    container: int = 0  # storage field width; 0 = bits (exact packing)

    def __post_init__(self):
        if self.container and self.container != self.bits:
            if self.container not in (2, 4, 8) or self.container < self.bits:
                raise ValueError(
                    f"container {self.container} must be a power-of-two "
                    f"field width >= bits ({self.bits})")

    @property
    def pack_bits(self) -> int:
        """Storage field width per code (>= bits)."""
        return self.container or self.bits

    @property
    def enabled(self) -> bool:
        return self.bits < 16


def _group(x: jax.Array, group_size: int) -> jax.Array:
    n = x.shape[-1]
    if group_size > 0:
        if n % group_size:
            raise ValueError(f"last dim {n} not divisible by group_size {group_size}")
        return x.reshape(x.shape[:-1] + (n // group_size, group_size))
    return x.reshape(x.shape[:-1] + (1, n))


def _scales_base(x: jax.Array, bits: int, sym: bool, clip_ratio: float):
    """Per-group scales and zero-point ("base") in fp32. x is grouped."""
    xf = x.astype(jnp.float32)
    if sym:
        q_max = 2 ** (bits - 1) - 1
        q_min = -(2 ** (bits - 1))
        w_max = jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), min=1e-5)
        if clip_ratio < 1.0:
            w_max = w_max * clip_ratio
        scales = w_max / q_max
        base = jnp.zeros_like(scales)
    else:
        q_max = 2**bits - 1
        q_min = 0
        w_max = jnp.max(xf, axis=-1, keepdims=True)
        w_min = jnp.min(xf, axis=-1, keepdims=True)
        if clip_ratio < 1.0:
            w_max = w_max * clip_ratio
            w_min = w_min * clip_ratio
        scales = jnp.clip(w_max - w_min, min=1e-5) / q_max
        base = jnp.clip(jnp.round(-w_min / scales), q_min, q_max)
    return scales, base, q_min, q_max


@functools.partial(jax.jit, static_argnames=("cfg",))
def fake_quantize(x: jax.Array, cfg: QuantConfig) -> jax.Array:
    """Quant->dequant round trip in float; bit-exact with the reference's
    `quantize_tensor` (quant.py:6-41) up to fp32-vs-fp16 arithmetic."""
    if not cfg.enabled:
        return x
    dtype = x.dtype
    g = _group(x, cfg.group_size)
    scales, base, q_min, q_max = _scales_base(g, cfg.bits, cfg.sym, cfg.clip_ratio)
    gf = g.astype(jnp.float32)
    q = jnp.clip(jnp.round(gf / scales) + base, q_min, q_max)
    out = (q - base) * scales
    return out.reshape(x.shape).astype(dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def quantize(x: jax.Array, cfg: QuantConfig):
    """Real quantization: returns (codes int8 in [0, 2^bits), scales, base).

    Codes are biased to unsigned (code = q - q_min) so packing needs no sign
    handling; dequantize() undoes the bias.
    """
    assert cfg.enabled, "quantize() called with bits >= 16"
    g = _group(x, cfg.group_size)
    scales, base, q_min, q_max = _scales_base(g, cfg.bits, cfg.sym, cfg.clip_ratio)
    gf = g.astype(jnp.float32)
    q = jnp.clip(jnp.round(gf / scales) + base, q_min, q_max)
    codes = (q - q_min).astype(jnp.int8).reshape(x.shape)
    return codes, scales.squeeze(-1), base.squeeze(-1)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def dequantize(codes: jax.Array, scales: jax.Array, base: jax.Array, cfg: QuantConfig,
               dtype=jnp.bfloat16) -> jax.Array:
    q_min = -(2 ** (cfg.bits - 1)) if cfg.sym else 0
    g = _group(codes, cfg.group_size)
    out = (g.astype(jnp.float32) + q_min - base[..., None]) * scales[..., None]
    return out.reshape(codes.shape).astype(dtype)


# ---------------------------------------------------------------------------
# Bit-packing: planar int8 layout, lane-uniform unpack
# ---------------------------------------------------------------------------
#
# For s values per byte (s = 8 // bits for bits in {1, 2, 4}), a row of n
# codes packs into n//s bytes: value i lives in byte (i mod n//s), bit-field
# (i div n//s). Unpacking field k is `(w >> (bits*k)) & mask` -- the same
# shift for every lane, so it vectorizes on the 8x128 VPU. Concatenating the
# s fields reproduces logical order with plain reshapes, no permutation.
#
# 3-bit decomposes each code v in [0,8) as v = 4*hi + lo, lo in [0,4):
# a 2-bit plane (n//4 bytes) plus a 1-bit plane (n//8 bytes) = exactly
# 3 bits/value. Both planes unpack to logical order independently.


def _pack_plane(codes: jax.Array, bits: int) -> jax.Array:
    """Pack last-dim codes (values < 2^bits) into n * bits / 8 bytes."""
    n = codes.shape[-1]
    s = 8 // bits
    if n % s:
        raise ValueError(f"last dim {n} must be divisible by {s} for {bits}-bit packing")
    w = n // s
    fields = codes.reshape(codes.shape[:-1] + (s, w)).astype(jnp.uint8)
    shifts = (jnp.arange(s, dtype=jnp.uint8) * bits)[..., None]
    packed = jnp.bitwise_or.reduce(fields << shifts, axis=-2)
    return packed.astype(jnp.uint8)


def _unpack_plane(packed: jax.Array, bits: int, n: int) -> jax.Array:
    s = 8 // bits
    w = n // s
    mask = jnp.uint8(2**bits - 1)
    shifts = (jnp.arange(s, dtype=jnp.uint8) * bits)[..., None]
    fields = (packed[..., None, :] >> shifts) & mask
    return fields.reshape(packed.shape[:-1] + (n,))


@functools.partial(jax.jit, static_argnames=("bits",))
def pack_codes(codes: jax.Array, bits: int) -> jax.Array:
    """Pack unsigned codes (< 2^bits) along the last dim into uint8 planes.

    Returns a single uint8 array of n*bits/8 bytes per row; for bits==3 the
    2-bit plane (n/4 bytes) is concatenated with the 1-bit plane (n/8 bytes).
    """
    codes = codes.astype(jnp.uint8)
    if bits in (1, 2, 4):
        return _pack_plane(codes, bits)
    if bits == 3:
        lo = codes & jnp.uint8(3)
        hi = codes >> jnp.uint8(2)
        return jnp.concatenate([_pack_plane(lo, 2), _pack_plane(hi, 1)], axis=-1)
    if bits == 8:
        return codes
    raise ValueError(f"unsupported pack width: {bits}")


@functools.partial(jax.jit, static_argnames=("bits", "n"))
def unpack_codes(packed: jax.Array, bits: int, n: int) -> jax.Array:
    """Inverse of pack_codes; returns uint8 codes of last-dim length n."""
    if bits in (1, 2, 4):
        return _unpack_plane(packed, bits, n)
    if bits == 3:
        lo = _unpack_plane(packed[..., : n // 4], 2, n)
        hi = _unpack_plane(packed[..., n // 4 :], 1, n)
        return lo | (hi << jnp.uint8(2))
    if bits == 8:
        return packed
    raise ValueError(f"unsupported pack width: {bits}")


def packed_nbytes(n: int, bits: int) -> int:
    """Bytes per row of n codes at the given width."""
    if bits in (1, 2, 4, 8):
        return n * bits // 8
    if bits == 3:
        return n // 4 + n // 8
    raise ValueError(f"unsupported pack width: {bits}")


# ---------------------------------------------------------------------------
# Rank-major ("transposed") packing for the fused decode kernel
# ---------------------------------------------------------------------------
#
# The seq-major planar layout above packs each token's codes along the lane
# dimension, so the in-kernel unpack runs shift/mask ops on (seq_block,
# rank*bits/8)-lane tensors -- far below the 128-lane VPU width for per-group
# ranks, which made the fused dequant kernel instruction-bound (docs/BENCH.md
# round-1 analysis). This layout stores the cache rank-major, (r, S): every
# unpack op then spans the *sequence* dimension (a full seq block wide, 1024+
# lanes), and the bit-fields of byte row j are codes of rank indices
# {k*r/s + j} -- chosen so that stacking the s fields along sublanes yields
# the codes matrix (r, S_blk) in natural rank order with zero in-kernel
# permutes. 3-bit stores a 2-bit plane (r/4 rows) plus a 1-bit plane
# (r/8 rows); each plane assembles to natural rank order independently.
#
# Scales are stored affine: x = scale * code + zero, zero = (q_min - base) *
# scale, so symmetric and asymmetric quantization are one in-kernel formula
# and the (seq,)-shaped scale/zero rows fold into the post-matmul tensors.


@functools.partial(jax.jit, static_argnames=("cfg",))
def quantize_affine(x: jax.Array, cfg: QuantConfig):
    """Quantization in affine form: x ~= scale * code + zero with unsigned
    codes in [0, 2^bits); sym and asym collapse into one dequant formula
    (zero = (q_min - base) * scale).

    group_size == 0: one scale per row -- returns (codes, scales (...,),
    zeros (...,)).  group_size > 0 (the reference's --lt_group_size,
    utils.py:105): one scale per contiguous last-dim chunk -- returns
    scales/zeros shaped (..., n // group_size)."""
    assert cfg.enabled
    g = _group(x, cfg.group_size)
    scales, base, q_min, q_max = _scales_base(g, cfg.bits, cfg.sym, cfg.clip_ratio)
    gf = g.astype(jnp.float32)
    q = jnp.clip(jnp.round(gf / scales) + base, q_min, q_max)
    # uint8 so the full 8-bit code range survives (int8 would wrap at 128)
    codes = (q - q_min).astype(jnp.uint8).reshape(x.shape)
    zeros = (q_min - base) * scales
    return codes, scales.squeeze(-1), zeros.squeeze(-1)


def packed_nrows(n: int, bits: int) -> int:
    """Byte rows of the rank-major packed layout for n codes."""
    if bits in (1, 2, 4, 8):
        return n * bits // 8
    if bits == 3:
        return 3 * (n // 8)
    raise ValueError(f"unsupported pack width: {bits}")


def _pack_plane_t(codes: jax.Array, bits: int) -> jax.Array:
    """codes (..., S, n) with values < 2^bits -> (..., n*bits/8, S) bytes.

    Byte row j, bit-field k holds the code of rank index k*(n/s) + j, so the
    kernel's `(bytes >> bits*k) & mask` fields stack to natural rank order.
    """
    n = codes.shape[-1]
    s = 8 // bits
    w = n // s
    fields = codes.reshape(codes.shape[:-1] + (s, w)).astype(jnp.uint8)
    shifts = jnp.arange(s, dtype=jnp.uint8).reshape((s, 1))
    packed = jnp.bitwise_or.reduce(fields << (shifts * bits), axis=-2)
    # (..., S, w) -> (..., w, S)
    return jnp.moveaxis(packed, -2, -1)


def _unpack_plane_t(packed: jax.Array, bits: int, n: int) -> jax.Array:
    """(..., n*bits/8, S) -> (..., n, S) codes in natural rank order."""
    s = 8 // bits
    mask = jnp.uint8(2**bits - 1)
    parts = [(packed >> jnp.uint8(bits * k)) & mask for k in range(s)]
    return jnp.concatenate(parts, axis=-2)


@functools.partial(jax.jit, static_argnames=("bits",))
def pack_codes_t(codes: jax.Array, bits: int) -> jax.Array:
    """Pack unsigned codes (..., S, n) rank-major -> uint8 (..., rows, S)."""
    codes = codes.astype(jnp.uint8)
    if bits in (1, 2, 4):
        return _pack_plane_t(codes, bits)
    if bits == 3:
        # 2-bit plane (n/4 rows) + 1-bit plane (n/8 rows): unpacking costs
        # ~2 ops/value per plane + one shift-add combine, vs ~11 ops/value
        # for three 1-bit planes (each plane assembles to natural rank
        # order independently, so any per-plane field geometry works)
        lo = _pack_plane_t(codes & jnp.uint8(3), 2)
        hi = _pack_plane_t(codes >> jnp.uint8(2), 1)
        return jnp.concatenate([lo, hi], axis=-2)
    if bits == 8:
        return jnp.swapaxes(codes, -1, -2)
    raise ValueError(f"unsupported pack width: {bits}")


@functools.partial(jax.jit, static_argnames=("bits", "n"))
def unpack_codes_t(packed: jax.Array, bits: int, n: int) -> jax.Array:
    """Inverse of pack_codes_t -> uint8 codes (..., n, S)."""
    if bits in (1, 2, 4):
        return _unpack_plane_t(packed, bits, n)
    if bits == 3:
        lo = _unpack_plane_t(packed[..., : n // 4, :], 2, n)
        hi = _unpack_plane_t(packed[..., n // 4 :, :], 1, n)
        return lo | (hi << jnp.uint8(2))
    if bits == 8:
        return packed
    raise ValueError(f"unsupported pack width: {bits}")
