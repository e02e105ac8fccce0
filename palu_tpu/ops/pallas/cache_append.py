"""Fused decode-step cache append: quantize + pack + masked column write
in ONE Pallas op per layer.

The XLA append path costs ~12 small ops per layer side per decode step
(quantize_affine's reductions/round, pack_codes_t's shift/or tree, a
dynamic_slice + select + dynamic_update_slice per buffer for the masked
no-op contract) -- at 32 layers that is several hundred tiny ops whose
fixed issue overhead is a measurable slice of the step (docs/BENCH.md
round-4 decomposition: ~1.5 ms of append machinery + a share of the
~2.3 ms inter-op gaps at 7B/64K).  This kernel replaces the whole
per-layer append (BOTH k and v sides) with one pallas_call that touches
only the 128-lane block around the write position:

  - per-row (group_size == 0) affine quantization, sym or asym, with
    EXACTLY quantize_affine's f32 arithmetic (bit-identical codes);
  - packing at pack widths {2, 4, 8} (incl. container storage, e.g.
    3-bit codes in 4-bit nibbles); exact 3-bit two-plane packing keeps
    the XLA path;
  - the masked no-op write contract of write_at_lanes_masked: lanes with
    writeable == 0 (idle serving lanes, full lanes at clamped pos) are
    bit-preserved -- the write is a lane-mask select against the aliased
    input block, so no dynamic-lane store is needed at all.

Buffers alias in/out (input_output_aliases), so under donation the append
stays fully in place; the DMA cost is one (G, nrows, 128) block + one
(G, 128) scale row per side (~0.5 us), invisible next to the decode
kernel.

Reference: the append side of kernel/palu_attention.py:193 (HF
DynamicCache .update()); the reference re-allocates growing torch buffers
per step and has no packed storage at all (README.md:24).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.quant import QuantConfig, packed_nrows

__all__ = ["append_token_quantized", "append_supported"]


def append_supported(qcfg: Optional[QuantConfig]) -> bool:
    """True when the fused append kernel covers this config: per-row
    rank-major quantized cache at a byte-aligned pack width."""
    return (
        qcfg is not None
        and qcfg.enabled
        and qcfg.group_size == 0
        and qcfg.pack_bits in (2, 4, 8)
    )


def _quantize_pack_rows(lat, qcfg: QuantConfig, rank: int):
    """lat (G, rank) f32, rank on lanes -> (packed (G, nrows) uint32-held
    bytes, scale (G, 1), zero (G, 1)).  Bit-identical to
    core.quant.quantize_affine + pack_codes_t on the same column."""
    bits, pbits = qcfg.bits, qcfg.pack_bits
    xf = lat.astype(jnp.float32)
    if qcfg.sym:
        q_max = 2 ** (bits - 1) - 1
        q_min = -(2 ** (bits - 1))
        w_max = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5)
        if qcfg.clip_ratio < 1.0:
            w_max = w_max * qcfg.clip_ratio
        scale = w_max / q_max
        base = jnp.zeros_like(scale)
    else:
        q_max = 2**bits - 1
        q_min = 0
        w_max = jnp.max(xf, axis=-1, keepdims=True)
        w_min = jnp.min(xf, axis=-1, keepdims=True)
        if qcfg.clip_ratio < 1.0:
            w_max = w_max * qcfg.clip_ratio
            w_min = w_min * qcfg.clip_ratio
        scale = jnp.maximum(w_max - w_min, 1e-5) / q_max
        base = jnp.clip(jnp.round(-w_min / scale), q_min, q_max)
    q = jnp.clip(jnp.round(xf / scale) + base, q_min, q_max)
    codes = (q - q_min).astype(jnp.int32)  # (G, rank) unsigned values
    zero = (q_min - base) * scale

    # pack_codes_t geometry: byte row j, field k holds rank index k*w + j
    s = 8 // pbits
    w = rank // s
    packed = codes[:, 0:w]
    for k in range(1, s):
        packed = packed | (codes[:, k * w : (k + 1) * w] << (pbits * k))
    return packed, scale, zero


def _make_kernel(g: int, rank: int, nrows: int, qcfg: QuantConfig,
                 asym: bool, blk: int):
    def kernel(pos_ref, wr_ref, *rest):
        lat_ref, codes_in, scale_in, *rest = rest
        if asym:
            zero_in, *rest = rest
            codes_out, scale_out, zero_out = rest
        else:
            codes_out, scale_out = rest
        bi = pl.program_id(0)
        off = pos_ref[bi] % blk  # in-block lane offset of the write column
        wr = wr_ref[bi]

        packed, scale, zero = _quantize_pack_rows(
            lat_ref[0].astype(jnp.float32), qcfg, rank)

        # lane-mask select against the aliased input block: writes the
        # column IFF this lane is writeable, preserves everything else
        # bit-for-bit (the write_at_lanes_masked no-op contract)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        hit = jnp.logical_and(lane == off, wr != 0)  # (1, blk)
        # packed (G, nrows) -> column layout (G, nrows, 1) via transpose of
        # the lane/sublane roles; minor-dim insertion must happen at 32 bit
        # (Mosaic: "insertion of minor dim ... only supported for 32-bit
        # types"), so reshape in int32 and narrow after
        col = packed[:, :, None].astype(jnp.uint8)  # (G, nrows, 1)
        codes_out[...] = jnp.where(hit[None], col, codes_in[...])
        scale_out[...] = jnp.where(hit, scale, scale_in[...])
        if asym:
            zero_out[...] = jnp.where(hit, zero, zero_in[...])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("qcfg", "rank", "interpret"),
)
def append_token_quantized(
    lat: jax.Array,        # (B, G, rank) new latent column (one token)
    codes: jax.Array,      # (B, G, nrows, S_max) uint8 rank-major packed
    scale: jax.Array,      # (B, G, S_max) f32 per-token scales
    pos: jax.Array,        # (B,) int32 write positions (caller clamps)
    writeable: jax.Array,  # (B,) bool/int no-op mask
    *,
    qcfg: QuantConfig,
    rank: int,
    zero: Optional[jax.Array] = None,  # (B, G, S_max) f32, asym only
    interpret: bool = False,
):
    """Quantize one token's latents and write them into the rank-major
    packed cache at per-lane positions -- one fused op replacing the
    quantize/pack/slice/select/update chain.  Returns the updated
    (codes, scale[, zero]) buffers (aliased: in-place under donation)."""
    assert append_supported(qcfg)
    asym = not qcfg.sym
    assert (zero is not None) == asym
    b, g, r = lat.shape
    assert r == rank
    nrows = packed_nrows(rank, qcfg.pack_bits)
    s_max = codes.shape[-1]
    assert codes.shape == (b, g, nrows, s_max)
    blk = min(128, s_max)
    assert s_max % blk == 0
    # scale/zero arrive either squeezed (B, G, S) (stacked layout) or with
    # the per-row unit n_sc axis (B, G, 1, S) (standard layout); taking the
    # 4D buffer DIRECTLY matters for in-place aliasing -- a pre-kernel
    # [:, :, 0, :] squeeze materializes a slice copy that XLA then has to
    # copy back to satisfy the alias (measured ~1 ms/step of copy/slice
    # traffic at 7B, docs/BENCH.md round-4)
    unit_sc = scale.ndim == 4
    assert scale.shape == ((b, g, 1, s_max) if unit_sc else (b, g, s_max))

    def blk_idx(bi, p, w):
        return (bi, 0, 0, p[bi] // blk)

    def blk_idx_s(bi, p, w):
        return (bi, 0, p[bi] // blk)

    def blk_idx_s4(bi, p, w):
        return (bi, 0, 0, p[bi] // blk)

    sc_spec = (pl.BlockSpec((None, g, None, blk), blk_idx_s4) if unit_sc
               else pl.BlockSpec((None, g, blk), blk_idx_s))

    kernel = _make_kernel(g, rank, nrows, qcfg, asym, blk)
    in_specs = [
        pl.BlockSpec((1, g, rank), lambda bi, *_: (bi, 0, 0)),
        pl.BlockSpec((None, g, nrows, blk), blk_idx),
        sc_spec,
    ]
    out_specs = [
        pl.BlockSpec((None, g, nrows, blk), blk_idx),
        sc_spec,
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(codes.shape, codes.dtype),
        jax.ShapeDtypeStruct(scale.shape, scale.dtype),
    ]
    args = [lat, codes, scale.astype(jnp.float32)]
    # operand index -> output index (operands count scalar-prefetch args
    # first: pos, writeable, then lat)
    aliases = {3: 0, 4: 1}
    if asym:
        in_specs.append(sc_spec)
        out_specs.append(sc_spec)
        out_shapes.append(jax.ShapeDtypeStruct(zero.shape, jnp.float32))
        args.append(zero.astype(jnp.float32))
        aliases[5] = 2

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shapes),
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        jnp.asarray(pos, jnp.int32),
        jnp.asarray(writeable, jnp.int32),
        *args,
    )
    return out
