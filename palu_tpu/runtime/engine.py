"""The unified Palu inference engine: one implementation that is both the
accuracy track (real latent cache, optional real quantization) and the
latency track (fused decode) -- unlike the reference's two disjoint stacks
(SURVEY.md section 1).

  prefill: project -> write latents to cache -> reconstruct K/V from the
           cache (so attention sees exactly what future decode steps will
           read, including quantization error) -> RoPE -> causal MHA ->
           dense o_proj.
  decode:  project 1 token -> append latents -> fused flash-decode over the
           latent cache (reconstruct-K + RoPE + online softmax + latent-V) ->
           U_v-fused o_proj.  jit-compiled with the cache donated, which is
           the XLA equivalent of the reference's CUDA-graph capture
           (run_latency_attention.py:81-90).

Reference math being reproduced: kernel/palu_attention.py:147-263.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quant
from ..core import wquant
from ..core.wquant import wdot
from ..models import llama
from ..models.config import ModelConfig
from ..ops import attention as att_ops
from . import cache as cache_lib

__all__ = ["EngineConfig", "Engine", "build_decode_b"]


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    s_max: int = 2048
    batch: int = 1
    dtype: Any = jnp.bfloat16
    qcfg: Optional[quant.QuantConfig] = None
    decode_chunk: int = 512
    use_pallas: bool = False  # fused Pallas decode kernel (TPU)
    pallas_interpret: bool = False  # interpret mode (CPU tests)
    # store unquantized latents rank-major (B, G, r, S) so the v4 transposed
    # kernel streams them directly (857us vs 1191us at the 64K headline
    # point, docs/BENCH.md); excluded when seq_axis is set (the seq-sharded
    # combine consumes (B, G, S, r))
    rank_major_fp: bool = False
    mesh: Any = None  # jax.sharding.Mesh for shard_map'd kernels (TP decode)
    # name of a mesh axis sharding the latent cache along the sequence dim;
    # decode then runs the flash-decoding seq-parallel combine
    # (attention.flash_decode_latent_seq_sharded). bf16 cache only.
    seq_axis: Optional[str] = None
    # sequence-block size for the fused Pallas decode kernels; None uses
    # decode_chunk (rounded to a divisor of s_max)
    pallas_block: Optional[int] = None
    # sequence-block size for the fused Pallas PREFILL kernel; None picks
    # 1024 (the on-chip sweep optimum at the 64K headline point -- decode
    # prefers 2048, so the two are configured independently)
    prefill_block: Optional[int] = None
    # 16 = keep weights in `dtype`; 8 = store the large dense projections
    # (q_proj, o_proj/fused, MLP, lm_head) as int8 codes + per-channel
    # scales (core/wquant) -- halves weight HBM and weight-read time per
    # decode step; 4 = packed int4 codes with per-(128-group, channel)
    # scales (GPTQ/AWQ-class storage; ops/pallas/gemv_int4 streams them
    # at half the int8 byte count). The low-rank VT/U factors stay in
    # `dtype` either way (vt_bits=8 opts VT into int8).
    weight_bits: int = 16
    # 8 = additionally store the VT down-projection factors as int8
    # (requires weight_bits=8): saves ~0.5 GB HBM at 7B/32L; the latents
    # are re-quantized to 2-4 bits at the cache write anyway so the extra
    # error is far below the cache quantizer's (core/wquant.py)
    vt_bits: int = 16
    # 8 = int8 embedding table with per-vocab-row scales (requires
    # weight_bits=8): halves the V x H table (262 -> 131 MB at 7B) and
    # covers the tied lm_head via the transposed codes (core/wquant.py)
    embed_bits: int = 16
    # Stack per-layer weights and cache buffers on a leading (L, ...) axis
    # and decode through ONE lax.scan layer body whose v4 kernel selects
    # the layer via a scalar-prefetched index (no per-layer cache slice).
    # Requires: use_pallas, no mesh/seq_axis, all layers low-rank with
    # uniform ranks, homogeneous biases, and a rank-major cache (packed
    # quantized or rank_major_fp). True forces it (raises when
    # ineligible). None currently resolves to FALSE: on chip the stacked
    # KERNEL is slightly faster (710 vs 772 us/layer at 3-bit/64K,
    # tools/tpu_stacked_kernel_ab.py) but the scan body loses the
    # cross-layer pipelining the unrolled HLO gets, measuring 41.2 vs
    # 35.3 ms/step at true-32-layer 7B (docs/BENCH.md round-4); the
    # unrolled per-layer decode is the production default until that scan
    # overhead is closed.
    stacked_decode: Optional[bool] = None
    # LAYER-major chunked prefill: each layer reconstructs its K/V prefix
    # once per power-of-two run instead of once per chunk (~8.5x less
    # reconstruct work at 64K/4096, docs/BENCH.md round-4 prefill). None =
    # auto (on when eligible: use_pallas, no seq_axis, not stacked,
    # all-low-rank; TP/DP meshes ARE eligible via the shard_map'd run
    # body); False = always chunk-major (serving-style interleaving);
    # True = force (raises when ineligible).
    layer_major_prefill: Optional[bool] = None
    # round-5 v4-kernel formulation knobs (ops/pallas/palu_decode4):
    # kernel_v_byte_dot -- V path dots the raw nibble-container bytes and
    # recovers the lo outputs at finalize: numerically exact, half the
    # V-side unpack VPU work. None = auto (on when the cache is per-row
    # nibble-container and the chip A/B favors it -- docs/BENCH.md
    # round-5 formulation table). kernel_int8_dots -- K reconstruct dots
    # on the int8 MXU path (2x rate; the query-folded operand rounds to
    # int8 per-row instead of bf16, an error of the same class). Opt-in.
    kernel_v_byte_dot: Optional[bool] = None
    kernel_int8_dots: bool = False
    kernel_fuse_uv: bool = False  # one stacked (2W, rk) reconstruct dot
    # per group (identical algebra; chip A/B: 611 us with v_byte_dot at
    # the 3-bit/64K point vs 626 base -- within the ~+/-30us noise band,
    # kept as an opt-in knob)
    kernel_int8_rot: bool = False  # FULL-int K path: int8 MXU dots +
    # int32 rotation on static int8 tables (palu_decode4.int8_rot).
    # Opt-in THROUGHPUT MODE: ~2e-2 relative attention-output deviation
    # (same class as kernel_int8_dots), requires per-row sub-byte codes


def build_decode_b(u_k: np.ndarray, cfg: ModelConfig) -> np.ndarray:
    """Group the per-kv-head U_k into per-q-head reconstruction matrices
    B: (G, heads_per_group, rk, hd) (reference builds (num_heads, rank, hd),
    kernel/palu_attention.py:107-114; ours keeps the group axis explicit and
    extends to GQA by sharing B across the `rep` q-heads of each kv head)."""
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    rep = nh // nkv
    gs = cfg.head_group_size
    g = cfg.num_kv_groups
    rk = u_k.shape[1]
    hpg = nh // g
    b = np.empty((g, hpg, rk, hd), dtype=np.float32)
    for gi in range(g):
        for hj in range(hpg):
            j_local = hj // rep  # kv head within group
            b[gi, hj] = u_k[gi, :, j_local * hd : (j_local + 1) * hd]
    # returns HOST numpy: _b_v builds lazily inside an active prefill trace,
    # and a jnp.asarray there would cache a tracer across traces
    return b


def _stack_layers(layers, owned: bool = False):
    """Per-layer param dicts -> one tree with a leading (L,) axis on every
    leaf. With owned=True (the engine owns the list, e.g. it came out of
    wquant.quantize_params) each layer's DEVICE leaf is nulled in place as
    soon as its column is stacked, so peak extra device memory is one
    stacked leaf (~1.4 GB for the 7B int8 MLP down), not a second full copy
    of the weights (which would not fit beside them on a 16 GB chip).
    Host numpy leaves stack in host RAM and upload once."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(layers[0])
    for l in layers[1:]:
        if jax.tree_util.tree_structure(l) != treedef:
            raise ValueError("stacked_decode requires homogeneous layers")

    def get(node, path):
        for p in path:
            node = node[p.key if hasattr(p, "key") else p.idx]
        return node

    def null(node, path):
        for p in path[:-1]:
            node = node[p.key if hasattr(p, "key") else p.idx]
        last = path[-1]
        node[last.key if hasattr(last, "key") else last.idx] = None

    out_leaves = []
    for path, leaf0 in paths_leaves:
        col = [get(l, path) for l in layers]
        if all(isinstance(a, np.ndarray) for a in col):
            st = jnp.asarray(np.stack(col))
        else:
            col = [jnp.asarray(a) for a in col]
            if owned:
                for l in layers:
                    null(l, path)
            st = jnp.stack(col)
        out_leaves.append(st)
        col = None
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


class Engine:
    """Latent-KV generation engine for one model. Not a pytree -- holds
    params plus derived decode weights and jitted step functions."""

    def __init__(self, params, cfg: ModelConfig, ecfg: EngineConfig):
        pre_stacked = "layers_stacked" in params
        if not pre_stacked:
            # ragged (fisher-search) checkpoints: pad per-group ranks up to
            # the layer max so static-shape cache/kernels see uniform ranks
            params, cfg = llama.pad_ragged_params(params, cfg)
        self.params = params
        self.cfg = cfg
        self.ecfg = ecfg
        # The chunked decode/prefill paths read fixed-size chunks with
        # dynamic_slice, which silently clamps at the buffer end: a chunk
        # size that does not divide s_max would double-count shifted keys
        # with wrong RoPE positions in the tail. Derive the largest divisor
        # of s_max not exceeding the requested decode_chunk.
        chunk = max(1, min(ecfg.decode_chunk, ecfg.s_max))
        while ecfg.s_max % chunk:
            chunk -= 1
        self._chunk = chunk
        # fused-kernel seq block: defaults to the decode chunk but can be
        # raised independently (on-chip sweep: 4-bit v4 is fastest at 2048
        # while prefill activation memory prefers a smaller decode_chunk)
        pb = ecfg.pallas_block if ecfg.pallas_block is not None else chunk
        pb = max(1, min(pb, ecfg.s_max))
        while ecfg.s_max % pb:
            pb -= 1
        self._pallas_block = pb
        fb = ecfg.prefill_block if ecfg.prefill_block is not None else 1024
        fb = max(1, min(fb, ecfg.s_max))
        while ecfg.s_max % fb:
            fb -= 1
        self._prefill_block = fb
        # fused quantize+pack+append decode writes (ops/pallas/cache_append):
        # rank-major per-row quantized caches at byte-aligned pack widths.
        # TP/DP meshes run the same kernel per-shard via shard_map (batch
        # over data, kv groups over model, _append_fused); only a
        # seq-sharded cache keeps the GSPMD append (the write position is
        # shard-relative there).
        from ..ops.pallas.cache_append import append_supported

        self._fused_append = (
            ecfg.use_pallas
            and append_supported(ecfg.qcfg)
            and ecfg.seq_axis is None
            and (ecfg.s_max % 128 == 0 or ecfg.s_max < 128)
        )
        # trace-time record of which decode attention paths dispatched
        # (static branch selection happens while tracing, so this is exact);
        # surfaced by the multichip dryrun so a log reader can verify the
        # fused kernel -- not a fallback -- handled each round
        self._decode_paths: set = set()
        # resolved v4 formulation knobs (splatted into every quantized v4
        # kernel call): v_byte_dot auto-resolves ON for per-row nibble-
        # container caches (chip A/B: exact and faster, docs/BENCH.md
        # round-5); int8_dots is opt-in and validated here
        qk = ecfg.qcfg
        knob_ok = (qk is not None and qk.enabled and qk.group_size == 0)
        vbd = ecfg.kernel_v_byte_dot
        if vbd is None:
            # sym rides the fold_qoff zero-corrections (kernel default),
            # asym its real zero rows -- both eligible
            vbd = knob_ok and qk.pack_bits == 4
        elif vbd and not (knob_ok and qk.pack_bits == 4):
            raise ValueError(
                "kernel_v_byte_dot needs a per-row nibble-container cache "
                "(QuantConfig.group_size == 0, pack width 4)")
        if ecfg.kernel_int8_dots and not (knob_ok and qk.pack_bits <= 4):
            raise ValueError(
                "kernel_int8_dots needs per-row sub-byte codes "
                "(QuantConfig.group_size == 0, pack width <= 4)")
        self._kernel_knobs = {}
        if vbd:
            self._kernel_knobs["v_byte_dot"] = True
        if ecfg.kernel_int8_dots:
            self._kernel_knobs["int8_dots"] = True
        if ecfg.kernel_fuse_uv:
            if not knob_ok:
                raise ValueError(
                    "kernel_fuse_uv needs a per-row quantized cache "
                    "(QuantConfig.group_size == 0)")
            self._kernel_knobs["fuse_uv"] = True
        if ecfg.kernel_int8_rot:
            if not (knob_ok and qk.pack_bits <= 4):
                raise ValueError(
                    "kernel_int8_rot needs per-row sub-byte codes "
                    "(QuantConfig.group_size == 0, pack width <= 4)")
            self._kernel_knobs["int8_rot"] = True
        if ecfg.rank_major_fp and ecfg.seq_axis is not None and not ecfg.use_pallas:
            raise ValueError(
                "rank_major_fp + seq_axis requires use_pallas: the rank-major "
                "seq-sharded combine runs the v4 kernel per shard"
            )
        if (
            ecfg.seq_axis is not None
            and ecfg.qcfg is not None
            and ecfg.qcfg.enabled
            and ecfg.qcfg.group_size > 0
        ):
            # per-chunk caches shard over seq ONLY in the rank-major layout
            # (scale/zero row stacks carry the sequence on their last axis);
            # group sizes the rank-major layout cannot take would fall to a
            # seq-major cache no sharded path consumes
            for i in range(cfg.num_hidden_layers):
                for which in ("k_proj", "v_proj"):
                    r = cfg.uniform_rank_for(i, which)
                    if r is not None and not cache_lib.rank_major_chunked(
                        ecfg.qcfg, r
                    ):
                        raise ValueError(
                            "seq_axis with per-chunk scales requires the "
                            "rank-major layout: group_size must be a "
                            f"multiple of 8 dividing every rank (layer {i} "
                            f"{which} rank {r}, group_size "
                            f"{ecfg.qcfg.group_size})"
                        )
        # rope_scaling (models/rope.py): default schedule -> None (kernels
        # compute in-kernel from theta); scaled -> baked-in constants
        from ..models import rope as rope_mod

        inv_freq, rope_scale = rope_mod.inv_freq_and_scale(cfg)
        if cfg.rope_scaling:
            self._inv_freq = inv_freq
            self._inv_freq_static = tuple(float(x) for x in inv_freq)
            self._rope_scale = float(rope_scale)
        else:
            self._inv_freq = None
            self._inv_freq_static = None
            self._rope_scale = 1.0
        if ecfg.weight_bits not in (16, 8, 4):
            raise ValueError(f"weight_bits must be 16, 8 or 4, got {ecfg.weight_bits}")
        if ecfg.vt_bits not in (16, 8):
            raise ValueError(f"vt_bits must be 16 or 8, got {ecfg.vt_bits}")
        if ecfg.vt_bits == 8 and ecfg.weight_bits == 16:
            raise ValueError("vt_bits=8 requires weight_bits=8 or 4")
        if ecfg.embed_bits not in (16, 8):
            raise ValueError(f"embed_bits must be 16 or 8, got {ecfg.embed_bits}")
        if ecfg.embed_bits == 8 and ecfg.weight_bits == 16:
            raise ValueError("embed_bits=8 requires weight_bits=8 or 4")
        if pre_stacked:
            # constructed from another stacked engine's params (e.g. the
            # ServingEngine's shared-params prefill engine): weights are
            # already stacked (and already int8 when weight_bits == 8)
            self._stacked = True
            if ecfg.stacked_decode is False:
                raise ValueError("params are layer-stacked; stacked_decode "
                                 "cannot be disabled for them")
            reason = self._stacked_ineligible_reason()
            if reason:
                raise ValueError(f"stacked params but ineligible config: {reason}")
            # rebuild per-layer derived (b_k, k_bias, o_bias_corr) from host
            # slices of the stacked attn weights, then stack them back
            st_attn = self.params["layers_stacked"]["attn"]
            need = {"k_proj": st_attn["k_proj"], "v_proj": st_attn["v_proj"]}
            if st_attn["v_proj"].get("b") is not None:
                need["o_proj"] = {"w": st_attn["o_proj"]["w"]}
            host = jax.tree.map(np.asarray, {"attn": need})
            fake_layers = [
                jax.tree.map(lambda a: a[i], host)
                for i in range(cfg.num_hidden_layers)
            ]
            if "o_proj" not in need:
                for fl in fake_layers:
                    fl["attn"]["o_proj"] = {"w": None}
            self.derived = self._build_derived(fake_layers)
            self._build_derived_stacks()
        else:
            self.derived = self._build_derived()
            if ecfg.weight_bits in (8, 4):
                # after _build_derived (which folds full-precision o_proj
                # into the qwen2 v-bias correction and b_k)
                self.params = wquant.quantize_params(
                    self.params, vt=ecfg.vt_bits == 8,
                    embed=ecfg.embed_bits == 8, bits=ecfg.weight_bits)
            reason = self._stacked_ineligible_reason()
            if ecfg.stacked_decode is True and reason:
                raise ValueError(f"stacked_decode unavailable: {reason}")
            # None -> False: unrolled decode is currently faster on chip
            # (see EngineConfig.stacked_decode)
            self._stacked = bool(ecfg.stacked_decode)
            if self._stacked:
                new_params = dict(self.params)
                layers = new_params.pop("layers")
                # weight_bits 8/4: quantize_params built a fresh device
                # tree only we reference -> release leaves while stacking
                new_params["layers_stacked"] = _stack_layers(
                    layers, owned=ecfg.weight_bits in (8, 4)
                )
                self.params = new_params
                self._build_derived_stacks()
        self._prefill_jit = jax.jit(self._prefill_impl, donate_argnums=(1,))
        self._decode_jit = jax.jit(self._decode_impl, donate_argnums=(1,))

    # -- build ---------------------------------------------------------------

    def _stacked_ineligible_reason(self) -> Optional[str]:
        """None when the layer-stacked scanned decode can serve this config,
        else a human-readable reason for the per-layer fallback."""
        ecfg, cfg = self.ecfg, self.cfg
        if not ecfg.use_pallas:
            return "use_pallas is off"
        if ecfg.mesh is not None or ecfg.seq_axis is not None:
            return "mesh/seq_axis decode runs the per-layer shard_map paths"
        quantized = ecfg.qcfg is not None and ecfg.qcfg.enabled
        n = cfg.num_hidden_layers
        rks = {cfg.uniform_rank_for(i, "k_proj") for i in range(n)}
        rvs = {cfg.uniform_rank_for(i, "v_proj") for i in range(n)}
        if len(rks) != 1 or len(rvs) != 1 or None in rks or None in rvs:
            return "requires all-low-rank k/v with uniform ranks across layers"
        rk, rv = rks.pop(), rvs.pop()
        if quantized:
            if not (
                cache_lib.rank_major(ecfg.qcfg)
                or (
                    cache_lib.rank_major_chunked(ecfg.qcfg, rk)
                    and cache_lib.rank_major_chunked(ecfg.qcfg, rv)
                )
            ):
                return "quantized cache layout is not rank-major"
        elif not ecfg.rank_major_fp:
            return "fp cache must be rank_major_fp (v4 kernel layout)"
        if "layers_stacked" in self.params:
            attns = [self.params["layers_stacked"]["attn"]]
        else:
            attns = [l["attn"] for l in self.params["layers"]]
        for a in attns:
            if "VT" not in a["k_proj"] or "VT" not in a["v_proj"]:
                return "dense k/v layer present"
        # k/v biases (qwen2) are supported -- the v4 kernel folds the
        # pre-RoPE k-bias and the v-bias is a constant o_bias_corr -- but
        # must be present in either all layers or none (homogeneous xs)
        for key in ("k_proj", "v_proj"):
            has = {a[key].get("b") is not None for a in attns}
            if len(has) > 1:
                return f"{key} bias present in only some layers"
        return None

    def _build_derived_stacks(self) -> None:
        """Stack the per-layer derived decode weights for the scanned
        stacked decode's xs: b_k always; k_bias / o_bias_corr (qwen2) when
        present (stacked eligibility guarantees all-or-none)."""
        self._bk_stack = jnp.asarray(
            np.stack([np.asarray(d["b_k"]) for d in self.derived])
        )
        self._kbias_stack = (
            jnp.stack([jnp.asarray(d["k_bias"]) for d in self.derived])
            if all("k_bias" in d for d in self.derived)
            else None
        )
        self._ocorr_stack = (
            jnp.stack([jnp.asarray(d["o_bias_corr"]) for d in self.derived])
            if all("o_bias_corr" in d for d in self.derived)
            else None
        )

    def _build_derived(self, layers=None):
        cfg = self.cfg
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        rep = nh // nkv
        derived = []
        if layers is None:
            layers = self.params["layers"]
        for i, layer in enumerate(layers):
            attn = layer["attn"]
            entry = {}
            if "VT" in attn["k_proj"]:
                entry["b_k"] = build_decode_b(
                    np.asarray(attn["k_proj"]["U"], dtype=np.float32), self.cfg
                ).astype(self.ecfg.dtype)
                if attn["k_proj"].get("b") is not None:
                    # qwen2: K = lat @ U + b -> per-(group, q-head) bias
                    # applied pre-RoPE inside the fused attention
                    bk = np.asarray(attn["k_proj"]["b"], np.float32)  # (G, gd)
                    g = cfg.num_kv_groups
                    hpg = nh // g
                    kb = np.empty((g, hpg, hd), np.float32)
                    for gi in range(g):
                        for hj in range(hpg):
                            j_local = hj // rep
                            kb[gi, hj] = bk[gi, j_local * hd : (j_local + 1) * hd]
                    entry["k_bias"] = jnp.asarray(kb, self.ecfg.dtype)
            if "VT" in attn["v_proj"]:
                # b_v (per-head V reconstruction for the XLA chunked-prefill
                # fallback) is built LAZILY at first prefill trace (_b_v):
                # at 7B scale it is ~200 MB of HBM a decode-only engine
                # never reads (round-2 advisor finding)
                if attn["v_proj"].get("b") is not None:
                    bv_ = np.asarray(attn["v_proj"]["b"], np.float32)  # (G, gd)
                    g = cfg.num_kv_groups
                    hpg = nh // g
                    vb = np.empty((g, hpg, hd), np.float32)
                    for gi in range(g):
                        for hj in range(hpg):
                            j_local = hj // rep
                            vb[gi, hj] = bv_[gi, j_local * hd : (j_local + 1) * hd]
                    entry["v_bias"] = jnp.asarray(vb, self.ecfg.dtype)
            if "VT" in attn["v_proj"] and attn["v_proj"].get("b") is not None:
                # V = lat @ U + b_v; softmax weights sum to 1, so the bias
                # passes through attention unchanged -> constant correction
                # after the fused o_proj
                bv = np.asarray(attn["v_proj"]["b"], np.float32)  # (G, gd)
                g = cfg.num_kv_groups
                hpg = nh // g
                per_qhead = np.empty((nh, hd), np.float32)
                for gi in range(g):
                    for hj in range(hpg):
                        j_local = hj // rep
                        per_qhead[gi * hpg + hj] = bv[gi, j_local * hd : (j_local + 1) * hd]
                o_w = attn["o_proj"]["w"]  # (nh*hd, H)
                if wquant.is_quantized_weight(o_w):
                    # engine built from already-quantized params (e.g. the
                    # ServingEngine's shared-params prefill engine)
                    if "wq4" in o_w:
                        o_w = np.asarray(wquant.unpack_weight4(o_w), np.float32)
                    else:
                        o_w = np.asarray(o_w["wq8"], np.float32) * np.asarray(
                            o_w["ws"], np.float32
                        )
                else:
                    if self.ecfg.weight_bits in (8, 4):
                        # derive corr from the SAME dequantized codes a
                        # rebuild from quantized params sees, so first-build
                        # and rebuilt engines compute identical logits
                        if self.ecfg.weight_bits == 4:
                            qw = wquant.quantize_weight4(o_w)
                            o_w = np.asarray(wquant.unpack_weight4(qw),
                                             np.float32)
                        else:
                            qw = wquant.quantize_weight(o_w)
                            o_w = np.asarray(qw["wq8"], np.float32) * np.asarray(
                                qw["ws"], np.float32
                            )
                    else:
                        o_w = np.asarray(o_w, np.float32)
                corr = per_qhead.reshape(-1) @ o_w  # (H,)
                entry["o_bias_corr"] = jnp.asarray(corr, self.ecfg.dtype)
            derived.append(entry)
        return derived

    def _b_v(self, i: int):
        """Per-head V reconstruction matrices for the XLA chunked-prefill
        fallback, built on first prefill TRACE and cached (prefill attends
        at head_dim, not rv; flash_prefill_latent's value-path note).
        Decode-only engines never pay its HBM (~6.3 MB/layer at 7B)."""
        entry = self.derived[i]
        if "b_v" not in entry:
            attn = self.params["layers"][i]["attn"]
            entry["b_v"] = build_decode_b(
                np.asarray(attn["v_proj"]["U"], dtype=np.float32), self.cfg
            ).astype(self.ecfg.dtype)
        return entry["b_v"]

    def init_cache(self):
        init = (
            cache_lib.init_cache_stacked if self._stacked else cache_lib.init_cache
        )
        return init(
            self.cfg,
            self.ecfg.batch,
            self.ecfg.s_max,
            dtype=self.ecfg.dtype,
            qcfg=self.ecfg.qcfg,
            rank_major_fp=self.ecfg.rank_major_fp,
        )

    # -- prefill -------------------------------------------------------------

    def _prefill_impl(self, params, cache, input_ids, last_pos):
        """last_pos (B,): index of the last REAL token per lane; input_ids
        may be right-padded to a length bucket (pad tokens are causally
        invisible to real ones and their cache slots are overwritten by
        decode, which starts at last_pos+1)."""
        if self._stacked:
            return self._prefill_impl_stacked(params, cache, input_ids, last_pos)
        cfg, ecfg = self.cfg, self.ecfg
        b, s = input_ids.shape
        x = wquant.embed_rows(params["embed"], input_ids, ecfg.dtype)
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        cos, sin = llama.rope_cos_sin_for(cfg, positions)
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

        new_layers = []
        for i, (p_layer, entry) in enumerate(zip(params["layers"], cache["layers"])):
            attn = p_layer["attn"]
            h = llama.rms_norm(x, p_layer["input_norm"], cfg.rms_norm_eps)

            q = wdot(h, attn["q_proj"]["w"])
            if attn["q_proj"].get("b") is not None:
                q = q + attn["q_proj"]["b"]
            q = q.reshape(b, s, nh, hd)
            q = llama.apply_rope(q.astype(jnp.float32), cos, sin).astype(ecfg.dtype)

            k_raw = llama.project_kv(h, attn["k_proj"])  # latent (b,s,G,rk) or dense
            v_raw = llama.project_kv(h, attn["v_proj"])

            k_dense = "VT" not in attn["k_proj"]
            v_dense = "VT" not in attn["v_proj"]
            entry = dict(entry)
            # ---- write cache (latents are cached pre-RoPE; dense K is
            # cached post-RoPE) then read back so attention sees what decode
            # will see (incl. quantization error) ----
            if k_dense:
                k_full = k_raw.reshape(b, s, nkv, hd)
                k_roped = llama.apply_rope(k_full.astype(jnp.float32), cos, sin)
                upd = k_roped.astype(ecfg.dtype).transpose(0, 2, 1, 3)
                entry["k"] = cache_lib.write_at(entry["k"], {"lat": upd}, 0)
                k = k_roped.astype(ecfg.dtype)
            else:
                lat = k_raw.transpose(0, 2, 1, 3)  # (B, G, S, rk)
                entry["k"] = cache_lib.write_prefill(entry["k"], lat, ecfg.qcfg, ecfg.dtype, 0, ecfg.rank_major_fp)
                rk = lat.shape[-1]
                lat_q = cache_lib.decode_latents(
                    cache_lib.seq_slice(entry["k"], 0, s, dynamic=False),
                    ecfg.qcfg, rk, ecfg.dtype,
                ).transpose(0, 2, 1, 3)
                k = llama.reconstruct_kv(lat_q, attn["k_proj"]).reshape(b, s, nkv, hd)
                k = llama.apply_rope(k.astype(jnp.float32), cos, sin).astype(ecfg.dtype)

            if v_dense:
                v = v_raw.reshape(b, s, nkv, hd)
                entry["v"] = cache_lib.write_at(
                    entry["v"], {"lat": v.astype(ecfg.dtype).transpose(0, 2, 1, 3)}, 0
                )
            else:
                lat = v_raw.transpose(0, 2, 1, 3)
                entry["v"] = cache_lib.write_prefill(entry["v"], lat, ecfg.qcfg, ecfg.dtype, 0, ecfg.rank_major_fp)
                rv = lat.shape[-1]
                lat_q = cache_lib.decode_latents(
                    cache_lib.seq_slice(entry["v"], 0, s, dynamic=False),
                    ecfg.qcfg, rv, ecfg.dtype,
                ).transpose(0, 2, 1, 3)
                v = llama.reconstruct_kv(lat_q, attn["v_proj"]).reshape(b, s, nkv, hd)

            attn_out = att_ops.mha_prefill(q, k, v, cfg.sliding_window)
            x = x + wdot(attn_out, attn["o_proj"]["w"])

            h2 = llama.rms_norm(x, p_layer["post_norm"], cfg.rms_norm_eps)
            x = x + llama.mlp_forward(h2, p_layer["mlp"])
            new_layers.append(entry)

        x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        lm_head = wquant.tied_head(params)
        x_last = jnp.take_along_axis(x, last_pos[:, None, None], axis=1)  # (B,1,H)
        logits = wdot(x_last, lm_head)
        new_cache = {"layers": new_layers, "length": (last_pos + 1).astype(jnp.int32)}
        return logits, new_cache

    def _prefill_impl_stacked(self, params, cache, input_ids, last_pos):
        """One-shot prefill for stacked engines (accuracy track): same
        write-then-read-back semantics as _prefill_impl, per-layer STATIC
        views over the stacked weights/cache. Stacked eligibility guarantees
        all-low-rank k/v."""
        cfg, ecfg = self.cfg, self.ecfg
        b, s = input_ids.shape
        x = wquant.embed_rows(params["embed"], input_ids, ecfg.dtype)
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        cos, sin = llama.rope_cos_sin_for(cfg, positions)
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        rk = cfg.uniform_rank_for(0, "k_proj")
        rv = cfg.uniform_rank_for(0, "v_proj")
        stack = cache["stack"]
        zero_off = jnp.zeros((b,), jnp.int32)

        for i in range(cfg.num_hidden_layers):
            wl = jax.tree.map(lambda a: a[i], params["layers_stacked"])
            attn = wl["attn"]
            h = llama.rms_norm(x, wl["input_norm"], cfg.rms_norm_eps)

            q = wdot(h, attn["q_proj"]["w"])
            if attn["q_proj"].get("b") is not None:
                q = q + attn["q_proj"]["b"]
            q = q.reshape(b, s, nh, hd)
            q = llama.apply_rope(q.astype(jnp.float32), cos, sin).astype(ecfg.dtype)

            def write(side, lat):
                return cache_lib.write_at_lanes_stacked(
                    stack[side],
                    cache_lib.stacked_squeeze(
                        cache_lib._encode(lat, ecfg.qcfg, ecfg.dtype,
                                          ecfg.rank_major_fp),
                        ecfg.qcfg,
                    ),
                    zero_off, i,
                )

            def read_back(side, rank):
                view = cache_lib.stacked_unsqueeze(
                    cache_lib.layer_view(stack[side], i), ecfg.qcfg)
                return cache_lib.decode_latents(
                    cache_lib.seq_slice(view, 0, s, dynamic=False),
                    ecfg.qcfg, rank, ecfg.dtype,
                ).transpose(0, 2, 1, 3)

            stack = dict(stack)
            stack["k"] = write("k", llama.project_kv(h, attn["k_proj"]).transpose(0, 2, 1, 3))
            k = llama.reconstruct_kv(read_back("k", rk), attn["k_proj"]).reshape(
                b, s, nkv, hd)
            k = llama.apply_rope(k.astype(jnp.float32), cos, sin).astype(ecfg.dtype)
            stack["v"] = write("v", llama.project_kv(h, attn["v_proj"]).transpose(0, 2, 1, 3))
            v = llama.reconstruct_kv(read_back("v", rv), attn["v_proj"]).reshape(
                b, s, nkv, hd)

            attn_out = att_ops.mha_prefill(q, k, v, cfg.sliding_window)
            x = x + wdot(attn_out, attn["o_proj"]["w"])

            h2 = llama.rms_norm(x, wl["post_norm"], cfg.rms_norm_eps)
            x = x + llama.mlp_forward(h2, wl["mlp"])

        x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        lm_head = wquant.tied_head(params)
        x_last = jnp.take_along_axis(x, last_pos[:, None, None], axis=1)
        logits = wdot(x_last, lm_head)
        return logits, {
            "stack": stack, "length": (last_pos + 1).astype(jnp.int32)
        }

    # -- chunked prefill -----------------------------------------------------

    def _prefill_chunk_body(self, params, cache, ids_chunk, offset):
        """One prefill chunk at per-lane `offset` (B,), WITHOUT the final
        norm / lm_head (so the scanned multi-chunk prefill pays lm_head once,
        not per chunk). Returns (hidden (B, s, H), new_cache). Requires
        all-low-rank k/v layers (always true for Palu-compressed models).
        Activation memory is O(chunk * decode_chunk)."""
        if self._stacked:
            return self._prefill_chunk_body_stacked(params, cache, ids_chunk, offset)
        cfg, ecfg = self.cfg, self.ecfg
        b, s = ids_chunk.shape
        x = wquant.embed_rows(params["embed"], ids_chunk, ecfg.dtype)
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        positions = offset[:, None] + jnp.arange(s)[None, :]
        cos, sin = llama.rope_cos_sin_for(cfg, positions)
        chunk = self._chunk
        num_chunks = ecfg.s_max // chunk

        new_layers = []
        for i, (p_layer, entry, der) in enumerate(
            zip(params["layers"], cache["layers"], self.derived)
        ):
            attn = p_layer["attn"]
            if "VT" not in attn["k_proj"] or "VT" not in attn["v_proj"]:
                raise NotImplementedError("chunked prefill requires low-rank k/v")
            h = llama.rms_norm(x, p_layer["input_norm"], cfg.rms_norm_eps)

            q = wdot(h, attn["q_proj"]["w"])
            if attn["q_proj"].get("b") is not None:
                q = q + attn["q_proj"]["b"]
            q = q.reshape(b, s, nh, hd)
            q = llama.apply_rope(q.astype(jnp.float32), cos, sin).astype(ecfg.dtype)

            entry = dict(entry)
            lat_k = llama.project_kv(h, attn["k_proj"]).transpose(0, 2, 1, 3)
            entry["k"] = cache_lib.write_at_lanes(
                entry["k"], cache_lib._encode(lat_k, ecfg.qcfg, ecfg.dtype, ecfg.rank_major_fp), offset
            )
            lat_v = llama.project_kv(h, attn["v_proj"]).transpose(0, 2, 1, 3)
            entry["v"] = cache_lib.write_at_lanes(
                entry["v"], cache_lib._encode(lat_v, ecfg.qcfg, ecfg.dtype, ecfg.rank_major_fp), offset
            )

            rk = attn["k_proj"]["U"].shape[1]
            rv = attn["v_proj"]["U"].shape[1]

            if ecfg.use_pallas and ecfg.seq_axis is None:
                # fused Pallas prefill: reconstruct+RoPE the needed prefix
                # once per chunk (XLA), then one online-softmax kernel pass
                # keeps all (Cq, C) probability intermediates in VMEM --
                # the XLA path below writes them to HBM per chunk pair
                # (docs/BENCH.md "Prefill / TTFT")
                attn_out = self._prefill_attn_pallas(
                    q, entry, attn, rk, rv, offset, offset + s
                )
            else:
                def read(side, rank):
                    def fn(idx):
                        buf = cache_lib.seq_slice(entry[side], idx * chunk, chunk)
                        return cache_lib.decode_latents(buf, ecfg.qcfg, rank, ecfg.dtype)
                    return fn

                out = att_ops.flash_prefill_latent(
                    q, read("k", rk), read("v", rv), der["b_k"],
                    num_chunks, chunk, offset, hd, cfg.rope_theta, rv,
                    cfg.sliding_window, k_bias=der.get("k_bias"),
                    inv_freq=self._inv_freq, rope_scale=self._rope_scale,
                    b_v=self._b_v(i), v_bias=der.get("v_bias"),
                )  # (B, s, nh, hd) -- V reconstructed, o_proj unfused
                attn_out = out.astype(ecfg.dtype).reshape(b, s, nh * hd)
            x = x + wdot(attn_out, attn["o_proj"]["w"])

            h2 = llama.rms_norm(x, p_layer["post_norm"], cfg.rms_norm_eps)
            x = x + llama.mlp_forward(h2, p_layer["mlp"])
            new_layers.append(entry)

        new_cache = {"layers": new_layers, "length": offset + s}
        return x, new_cache

    def _prefill_chunk_body_stacked(self, params, cache, ids_chunk, offset):
        """Stacked-engine prefill chunk: a Python loop over layers reads
        per-layer STATIC views of the stacked weights/cache (XLA fuses the
        slices into the consumers) and writes each chunk's latents directly
        into the (L, ...) buffers, then runs the same fused Pallas prefill
        attention as the per-layer engine."""
        cfg, ecfg = self.cfg, self.ecfg
        b, s = ids_chunk.shape
        x = wquant.embed_rows(params["embed"], ids_chunk, ecfg.dtype)
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        positions = offset[:, None] + jnp.arange(s)[None, :]
        cos, sin = llama.rope_cos_sin_for(cfg, positions)
        stack = cache["stack"]
        rk = cfg.uniform_rank_for(0, "k_proj")
        rv = cfg.uniform_rank_for(0, "v_proj")

        for i in range(cfg.num_hidden_layers):
            wl = jax.tree.map(lambda a: a[i], params["layers_stacked"])
            attn = wl["attn"]
            h = llama.rms_norm(x, wl["input_norm"], cfg.rms_norm_eps)

            q = wdot(h, attn["q_proj"]["w"])
            if attn["q_proj"].get("b") is not None:
                q = q + attn["q_proj"]["b"]
            q = q.reshape(b, s, nh, hd)
            q = llama.apply_rope(q.astype(jnp.float32), cos, sin).astype(ecfg.dtype)

            lat_k = llama.project_kv(h, attn["k_proj"]).transpose(0, 2, 1, 3)
            lat_v = llama.project_kv(h, attn["v_proj"]).transpose(0, 2, 1, 3)
            stack = {
                "k": cache_lib.write_at_lanes_stacked(
                    stack["k"],
                    cache_lib.stacked_squeeze(
                        cache_lib._encode(lat_k, ecfg.qcfg, ecfg.dtype,
                                          ecfg.rank_major_fp),
                        ecfg.qcfg,
                    ),
                    offset, i,
                ),
                "v": cache_lib.write_at_lanes_stacked(
                    stack["v"],
                    cache_lib.stacked_squeeze(
                        cache_lib._encode(lat_v, ecfg.qcfg, ecfg.dtype,
                                          ecfg.rank_major_fp),
                        ecfg.qcfg,
                    ),
                    offset, i,
                ),
            }
            entry = {
                "k": cache_lib.stacked_unsqueeze(
                    cache_lib.layer_view(stack["k"], i), ecfg.qcfg),
                "v": cache_lib.stacked_unsqueeze(
                    cache_lib.layer_view(stack["v"], i), ecfg.qcfg),
            }
            attn_out = self._prefill_attn_pallas(
                q, entry, attn, rk, rv, offset, offset + s
            )
            x = x + wdot(attn_out, attn["o_proj"]["w"])

            h2 = llama.rms_norm(x, wl["post_norm"], cfg.rms_norm_eps)
            x = x + llama.mlp_forward(h2, wl["mlp"])

        return x, {"stack": stack, "length": offset + s}

    def _decode_stacked_impl(self, params, cache, token_ids, active):
        """One decode step through ONE scanned layer body: stacked weights
        ride the scan's xs (sliced per iteration straight from HBM), the
        stacked cache rides the CARRY (updated in place via
        dynamic_update_slice; as xs/ys it would cost two full cache copies),
        and the v4 kernel's scalar-prefetched layer index reads blocks
        directly from the (L, ...) buffers. Same math as the per-layer
        _decode_impl (differential test: tests/test_engine_stacked.py)."""
        cfg, ecfg = self.cfg, self.ecfg
        b = token_ids.shape[0]
        pos = cache["length"]
        writeable = jnp.logical_and(active, pos < ecfg.s_max)
        pos_w = jnp.minimum(pos, ecfg.s_max - 1)
        x = wquant.embed_rows(params["embed"], token_ids, ecfg.dtype)  # (B, 1, H)
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        cos, sin = llama.rope_cos_sin_for(cfg, pos[:, None])
        kv_len = jnp.where(writeable, pos + 1, pos)
        quantized = ecfg.qcfg is not None and ecfg.qcfg.enabled
        rk = cfg.uniform_rank_for(0, "k_proj")
        rv = cfg.uniform_rank_for(0, "v_proj")
        block_s = self._pallas_block
        from ..ops.pallas import palu_decode4 as pk4

        def layer(carry, inp):
            x, stack = carry
            wl, b_k, li = inp["w"], inp["b_k"], inp["li"]
            attn = wl["attn"]
            h = llama.rms_norm(x, wl["input_norm"], cfg.rms_norm_eps)

            q = wdot(h, attn["q_proj"]["w"])
            if attn["q_proj"].get("b") is not None:
                q = q + attn["q_proj"]["b"]
            q = q.reshape(b, 1, nh, hd)
            q = llama.apply_rope(q.astype(jnp.float32), cos, sin).astype(
                ecfg.dtype
            )[:, 0]

            lat_k = llama.project_kv(h, attn["k_proj"]).transpose(0, 2, 1, 3)
            lat_v = llama.project_kv(h, attn["v_proj"]).transpose(0, 2, 1, 3)
            stack = {
                "k": cache_lib.write_at_lanes_stacked(
                    stack["k"],
                    cache_lib.stacked_squeeze(
                        cache_lib._encode(lat_k, ecfg.qcfg, ecfg.dtype,
                                          ecfg.rank_major_fp),
                        ecfg.qcfg,
                    ),
                    pos_w, li, writeable,
                ),
                "v": cache_lib.write_at_lanes_stacked(
                    stack["v"],
                    cache_lib.stacked_squeeze(
                        cache_lib._encode(lat_v, ecfg.qcfg, ecfg.dtype,
                                          ecfg.rank_major_fp),
                        ecfg.qcfg,
                    ),
                    pos_w, li, writeable,
                ),
            }
            kb, vb = stack["k"], stack["v"]
            k_bias = inp.get("k_bias")
            if not quantized:
                lat_out = pk4.palu_flash_decode4(
                    q, b_k, kb["lat_t"], vb["lat_t"], kv_len,
                    rk=rk, rv=rv, block_s=block_s, theta=cfg.rope_theta,
                    sliding_window=cfg.sliding_window,
                    interpret=ecfg.pallas_interpret,
                    inv_freq_static=self._inv_freq_static,
                    rope_scale=self._rope_scale, layer_idx=li, k_bias=k_bias,
                )
            else:
                zeros = {} if ecfg.qcfg.sym else {
                    "xk_zero": kb["zero_t"], "xv_zero": vb["zero_t"],
                }
                lat_out = pk4.palu_flash_decode4_quantized(
                    q, b_k, kb["codes_t"], kb["scale_t"],
                    vb["codes_t"], vb["scale_t"], kv_len,
                    qcfg=ecfg.qcfg, rk=rk, rv=rv, block_s=block_s,
                    theta=cfg.rope_theta, sliding_window=cfg.sliding_window,
                    interpret=ecfg.pallas_interpret,
                    inv_freq_static=self._inv_freq_static,
                    rope_scale=self._rope_scale, layer_idx=li,
                    k_bias=k_bias, **zeros, **self._kernel_knobs,
                )
            lat_out = lat_out.astype(ecfg.dtype).reshape(b, nh * rv)
            out = wdot(lat_out, attn["o_proj"]["w_fused"])
            if "o_corr" in inp:
                out = out + inp["o_corr"]
            x = x + out[:, None, :]

            h2 = llama.rms_norm(x, wl["post_norm"], cfg.rms_norm_eps)
            x = x + llama.mlp_forward(h2, wl["mlp"])
            return (x, stack), None

        xs = {
            "w": params["layers_stacked"],
            "b_k": self._bk_stack,
            "li": jnp.arange(cfg.num_hidden_layers),
        }
        if self._kbias_stack is not None:
            xs["k_bias"] = self._kbias_stack
        if self._ocorr_stack is not None:
            xs["o_corr"] = self._ocorr_stack
        (x, stack), _ = jax.lax.scan(layer, (x, cache["stack"]), xs)
        x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        lm_head = wquant.tied_head(params)
        logits = wdot(x, lm_head)
        return logits, {"stack": stack, "length": kv_len}

    def _lm_head_logits(self, params, x):
        x = llama.rms_norm(x, params["final_norm"], self.cfg.rms_norm_eps)
        lm_head = wquant.tied_head(params)
        return wdot(x, lm_head)

    def _prefill_chunk_impl(self, params, cache, ids_chunk, offset):
        x, new_cache = self._prefill_chunk_body(params, cache, ids_chunk, offset)
        # (B, s, V) -- caller picks the last real token
        return self._lm_head_logits(params, x), new_cache

    def _prefill_scan_impl(self, params, cache, ids, base_offset):
        """Scan `n` prefill chunks inside ONE executable: ids (B, n, chunk).
        Removes the per-chunk host dispatch (~10 ms each through this
        sandbox's TPU tunnel -- ~0.3 s of a 64K prefill) and runs lm_head
        only on the final chunk. Returns (last-chunk logits, cache)."""
        b, n, chunk = ids.shape

        def body(carry, inp):
            cache, _ = carry
            i, ids_chunk = inp
            off = base_offset + i * chunk
            x, cache = self._prefill_chunk_body(params, cache, ids_chunk, off)
            return (cache, x), None

        x0 = jnp.zeros((b, chunk, wquant.embed_dim(params["embed"])), self.ecfg.dtype)
        (cache, x), _ = jax.lax.scan(
            body, (cache, x0),
            (jnp.arange(n), ids.transpose(1, 0, 2)),
        )
        return self._lm_head_logits(params, x), cache

    def _prefill_layer_major_impl(self, params, cache, ids, base_offset,
                                  needed):
        """LAYER-major prefill of a run of chunks: the whole run advances
        one layer at a time, so each layer dequantizes + reconstructs +
        ropes its K/V prefix exactly ONCE.  The chunk-major scan
        (_prefill_scan_impl) re-reconstructs the entire prefix for every
        chunk -- at 64K/4096 that is ~8.5x redundant reconstruct work,
        ~75 ms/layer of the 0.583 s/layer round-3 prefill (docs/BENCH.md).
        The attention FLOPs (the real S^2 roofline) are unchanged: the same
        prefill_flash kernel runs per (q-chunk, prefix) with identical
        q_offset/kv_len semantics, so logits match the chunk-major path.

        ids: (B, m, C); base_offset: (B,) run start (chunks before the run
        were already written by previous runs); needed: STATIC count of
        cache-read chunks covering [0, base + m*C) for the one-shot
        reconstruct.  Activation cost: one (B, m*C, H) hidden buffer
        updated chunk-wise in place + the per-layer (B, nkv, S_max, hd)
        K/V scratch -- O(S) extra HBM, not O(L*S).

        The reference has no prefill story at all (its latency harness
        seeds the cache with random latents, run_latency_attention.py)."""
        from ..ops.pallas.prefill_flash import prefill_flash

        cfg, ecfg = self.cfg, self.ecfg
        b, m, C = ids.shape
        run = m * C
        nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        x = wquant.embed_rows(params["embed"], ids.reshape(b, run), ecfg.dtype)
        positions = base_offset[:, None] + jnp.arange(run)[None, :]
        cos_all, sin_all = llama.rope_cos_sin_for(cfg, positions)

        new_layers = []
        for i, (p_layer, entry, der) in enumerate(
            zip(params["layers"], cache["layers"], self.derived)
        ):
            attn = p_layer["attn"]
            # pass A: full-run latents -> one cache write per side
            h = llama.rms_norm(x, p_layer["input_norm"], cfg.rms_norm_eps)
            entry = dict(entry)
            lat_k = llama.project_kv(h, attn["k_proj"]).transpose(0, 2, 1, 3)
            entry["k"] = cache_lib.write_at_lanes(
                entry["k"],
                cache_lib._encode(lat_k, ecfg.qcfg, ecfg.dtype,
                                  ecfg.rank_major_fp),
                base_offset,
            )
            lat_v = llama.project_kv(h, attn["v_proj"]).transpose(0, 2, 1, 3)
            entry["v"] = cache_lib.write_at_lanes(
                entry["v"],
                cache_lib._encode(lat_v, ecfg.qcfg, ecfg.dtype,
                                  ecfg.rank_major_fp),
                base_offset,
            )
            rk = attn["k_proj"]["U"].shape[1]
            rv = attn["v_proj"]["U"].shape[1]

            # reconstruct + rope the K/V prefix ONCE for the whole run
            k_full, v_full = self._reconstruct_dense(entry, attn, rk, rv,
                                                     needed)

            # pass B: attention + MLP, chunk-wise in place
            def chunk_body(c, x, p_layer=p_layer, attn=attn,
                           k_full=k_full, v_full=v_full):
                xc = jax.lax.dynamic_slice_in_dim(x, c * C, C, axis=1)
                hc = llama.rms_norm(xc, p_layer["input_norm"],
                                    cfg.rms_norm_eps)
                q = wdot(hc, attn["q_proj"]["w"])
                if attn["q_proj"].get("b") is not None:
                    q = q + attn["q_proj"]["b"]
                q = q.reshape(b, C, nh, hd)
                cos = jax.lax.dynamic_slice_in_dim(cos_all, c * C, C, axis=1)
                sin = jax.lax.dynamic_slice_in_dim(sin_all, c * C, C, axis=1)
                q = llama.apply_rope(q.astype(jnp.float32), cos, sin).astype(
                    ecfg.dtype)
                q_off = base_offset + c * C
                out = self._flash_sharded(
                    q.transpose(0, 2, 1, 3), k_full, v_full, q_off,
                    q_off + C,
                )
                attn_out = out.transpose(0, 2, 1, 3).reshape(b, C, nh * hd)
                xc = xc + wdot(attn_out, attn["o_proj"]["w"])
                h2 = llama.rms_norm(xc, p_layer["post_norm"],
                                    cfg.rms_norm_eps)
                xc = xc + llama.mlp_forward(h2, p_layer["mlp"])
                return jax.lax.dynamic_update_slice_in_dim(
                    x, xc, c * C, axis=1)

            x = jax.lax.fori_loop(0, m, chunk_body, x)
            new_layers.append(entry)

        # logits for the run's LAST chunk only (caller gathers the real
        # last token), matching _prefill_scan_impl's contract
        logits = self._lm_head_logits(params, x[:, (m - 1) * C:])
        new_cache = {"layers": new_layers,
                     "length": base_offset + run}
        return logits, new_cache

    def _layer_major_eligible(self) -> bool:
        """Layer-major prefill needs the fused Pallas prefill path (its
        reconstruct-once structure) on an unstacked engine with
        all-low-rank k/v.  TP/DP meshes are eligible (the run body's
        kernel call goes through _flash_sharded, head-group-parallel via
        shard_map, and everything else in the body is GSPMD-partitionable
        XLA); only a seq-sharded cache is not (the one-shot prefix
        reconstruct assumes the whole sequence on every shard)."""
        if not self.ecfg.use_pallas or self._stacked:
            return False
        if self.ecfg.seq_axis is not None:
            return False
        return all(
            "VT" in l["attn"]["k_proj"] and "VT" in l["attn"]["v_proj"]
            for l in self.params["layers"]
        )

    def _prefill_lm_jit(self, needed: int):
        """Per-`needed` jitted layer-major run (needed = static count of
        cache-read chunks the reconstruct covers; O(log^2 s_max) distinct
        values across the power-of-two run decomposition)."""
        jits = getattr(self, "_lm_jits", None)
        if jits is None:
            jits = self._lm_jits = {}
        if needed not in jits:
            jits[needed] = jax.jit(
                functools.partial(self._prefill_layer_major_impl,
                                  needed=needed),
                donate_argnums=(1,),
            )
        return jits[needed]

    def _reconstruct_dense(self, entry, attn, rk, rv, needed):
        """Dequantize + reconstruct (per KV head, qwen2 bias included) +
        RoPE the first `needed` cache-read chunks of a layer's latent
        buffers into (B, nkv, S_max, hd) dense K/V scratch whose live range
        is one layer. `needed` may be a traced scalar (chunk-major prefill)
        or a static int (layer-major prefill)."""
        cfg, ecfg = self.cfg, self.ecfg
        b = entry["k"][next(iter(entry["k"]))].shape[0]
        nkv, hd = cfg.num_key_value_heads, cfg.head_dim
        chunk = self._chunk
        s_max = ecfg.s_max

        k_full = jnp.zeros((b, nkv, s_max, hd), ecfg.dtype)
        v_full = jnp.zeros((b, nkv, s_max, hd), ecfg.dtype)

        def body(j, bufs):
            kf, vf = bufs
            lat_k = cache_lib.decode_latents(
                cache_lib.seq_slice(entry["k"], j * chunk, chunk),
                ecfg.qcfg, rk, ecfg.dtype,
            ).transpose(0, 2, 1, 3)  # (B, C, G, rk)
            kblk = llama.reconstruct_kv(lat_k, attn["k_proj"]).reshape(
                b, chunk, nkv, hd
            )
            pos = j * chunk + jnp.arange(chunk)
            cos, sin = llama.rope_cos_sin_for(
                cfg, jnp.broadcast_to(pos[None], (b, chunk))
            )
            kblk = llama.apply_rope(kblk.astype(jnp.float32), cos, sin)
            lat_v = cache_lib.decode_latents(
                cache_lib.seq_slice(entry["v"], j * chunk, chunk),
                ecfg.qcfg, rv, ecfg.dtype,
            ).transpose(0, 2, 1, 3)
            vblk = llama.reconstruct_kv(lat_v, attn["v_proj"]).reshape(
                b, chunk, nkv, hd
            )
            kf = jax.lax.dynamic_update_slice(
                kf, kblk.astype(ecfg.dtype).transpose(0, 2, 1, 3),
                (0, 0, j * chunk, 0),
            )
            vf = jax.lax.dynamic_update_slice(
                vf, vblk.astype(ecfg.dtype).transpose(0, 2, 1, 3),
                (0, 0, j * chunk, 0),
            )
            return kf, vf

        return jax.lax.fori_loop(0, needed, body, (k_full, v_full))

    def _prefill_attn_pallas(self, q, entry, attn, rk, rv, q_off, kv_len):
        """Chunked-prefill attention through the fused Pallas flash kernel
        (ops/pallas/prefill_flash.py). q: (B, Cq, nh, hd) roped; returns
        (B, Cq, nh*hd) for the unfused o_proj.

        The needed cache prefix is dequantized, reconstructed (per KV head,
        qwen2 bias included) and roped in XLA -- a tiny fraction of the
        attention FLOPs -- into (B, nkv, S_max, hd) scratch whose live range
        is one layer; the kernel then streams it once with the online
        softmax fully in VMEM. Scaled-rope and bias models are supported
        because RoPE/bias happen here, not in the kernel."""
        from ..ops.pallas.prefill_flash import prefill_flash

        cfg, ecfg = self.cfg, self.ecfg
        b, cq, nh, hd = q.shape
        needed = (jnp.max(kv_len) - 1) // self._chunk + 1
        k_full, v_full = self._reconstruct_dense(entry, attn, rk, rv, needed)
        q_t = q.transpose(0, 2, 1, 3)  # (B, nh, Cq, hd)
        out = self._flash_sharded(q_t, k_full, v_full, q_off, kv_len)
        return out.transpose(0, 2, 1, 3).reshape(b, cq, nh * hd)

    def _flash_sharded(self, q_t, k_full, v_full, q_off, kv_len):
        """prefill_flash on (B, nh, Cq, hd) q / (B, nkv, S, hd) dense K/V --
        direct on one device, shard_map'd over (data=batch, model=heads)
        when the engine has a TP mesh (pallas_call is not GSPMD-
        partitionable; the kernel is head-parallel so the per-shard call is
        exact).  Shared by the chunk-major attention (_prefill_attn_pallas)
        and the layer-major run body, so both prefill orders are
        mesh-eligible."""
        from ..ops.pallas.prefill_flash import prefill_flash

        cfg, ecfg = self.cfg, self.ecfg

        def kernel_call(q_, k_, v_, off_, kvl_):
            # exp2 + folded log2(e) scale: identical softmax via the
            # hardware pow2 path (9.22 vs 9.34 ms/chunk on chip,
            # docs/BENCH.md round-5 prefill)
            return prefill_flash(
                q_, k_, v_, off_, kvl_,
                block_s=self._prefill_block,
                sliding_window=cfg.sliding_window,
                interpret=ecfg.pallas_interpret,
                compute_dtype=ecfg.dtype, exp2=True,
            )

        if ecfg.mesh is not None:
            from jax.sharding import PartitionSpec as P
            from palu_tpu.parallel.mesh import shard_map_nocheck

            return shard_map_nocheck(
                kernel_call,
                mesh=ecfg.mesh,
                in_specs=(
                    P("data", "model", None, None),
                    P("data", "model", None, None),
                    P("data", "model", None, None),
                    P("data"),
                    P("data"),
                ),
                out_specs=P("data", "model", None, None),
            )(q_t, k_full, v_full, q_off, kv_len)
        return kernel_call(q_t, k_full, v_full, q_off, kv_len)

    def _ensure_chunk_jits(self):
        if not hasattr(self, "_prefill_chunk_jit"):
            self._prefill_chunk_jit = jax.jit(
                self._prefill_chunk_impl, donate_argnums=(1,)
            )
            self._prefill_scan_jit = jax.jit(
                self._prefill_scan_impl, donate_argnums=(1,)
            )
            # last-real-token gather, jitted once (a fresh dynamic slice per
            # distinct prompt length would recompile per length)
            self._last_gather_jit = jax.jit(
                lambda lg, i: jnp.take_along_axis(lg, i[:, None, None], axis=1)
            )

    def prefill_chunk(self, ids_chunk, cache, off):
        """Advance ONE fixed-size prefill chunk at sequence offset `off`
        (the serving loop interleaves these with decode steps so a long
        admission never stalls running requests). ids_chunk must already be
        padded to the engine chunk size; pad positions are causally
        invisible. Returns (chunk logits, cache) -- the caller tracks the
        real length and fixes cache["length"] when the prompt completes."""
        self._ensure_chunk_jits()
        offset = jnp.broadcast_to(jnp.asarray(off, jnp.int32), (self.ecfg.batch,))
        return self._prefill_chunk_jit(
            self.params, cache, jnp.asarray(ids_chunk), offset
        )

    def prefill_chunked(self, input_ids, chunk_size: int = 512, cache=None):
        """Stream a long prompt through fixed-size chunks. Returns
        (last-token logits (B, 1, V), cache)."""
        self._ensure_chunk_jits()
        input_ids = np.asarray(input_ids)
        b, total = input_ids.shape
        if b != self.ecfg.batch:
            raise ValueError(f"batch {b} != engine batch {self.ecfg.batch}")
        if total > self.ecfg.s_max:
            raise ValueError(f"prompt {total} exceeds s_max {self.ecfg.s_max}")
        if cache is None:
            cache = self.init_cache()
        # pad to a whole number of chunks (pad positions are causally
        # invisible; decode starts from the real length set below)
        n_chunks = -(-total // chunk_size)
        padded = np.zeros((b, n_chunks * chunk_size), input_ids.dtype)
        padded[:, :total] = input_ids
        # decompose into descending powers of two: each power-of-two run
        # goes through ONE scanned executable (no per-chunk host dispatch),
        # and the set of compiled program shapes stays O(log(s_max/chunk))
        lm = self.ecfg.layer_major_prefill
        use_lm = self._layer_major_eligible() if lm is None else lm
        if use_lm and not self._layer_major_eligible():
            raise ValueError("layer_major_prefill=True but the engine is "
                             "ineligible (needs use_pallas, no seq_axis, "
                             "not stacked, all-low-rank k/v)")
        logits = None
        off_chunks = 0
        remaining = n_chunks
        while remaining:
            m = 1 << (remaining.bit_length() - 1)
            off = off_chunks * chunk_size
            offset = jnp.full((b,), off, jnp.int32)
            ids = padded[:, off : off + m * chunk_size]
            if use_lm and m >= 2:
                # layer-major run: reconstruct-once per layer
                needed = -(-(off + m * chunk_size) // self._chunk)
                logits, cache = self._prefill_lm_jit(needed)(
                    self.params, cache,
                    jnp.asarray(ids.reshape(b, m, chunk_size)), offset,
                )
            elif m == 1:
                logits, cache = self._prefill_chunk_jit(
                    self.params, cache, jnp.asarray(ids), offset
                )
            else:
                logits, cache = self._prefill_scan_jit(
                    self.params, cache,
                    jnp.asarray(ids.reshape(b, m, chunk_size)), offset,
                )
            off_chunks += m
            remaining -= m
        last = self._last_gather_jit(
            logits, jnp.full((b,), (total - 1) % chunk_size, jnp.int32)
        )
        # fix length for the padded tail
        cache = dict(cache)
        cache["length"] = jnp.full((b,), total, jnp.int32)
        return last, cache

    # -- decode --------------------------------------------------------------

    def _decode_impl(self, params, cache, token_ids, active):
        """token_ids: (B, 1); active: (B,) bool. One step; appends to the
        cache at `length` for active, non-full lanes. Inactive lanes (idle
        serving lanes) and full lanes get a no-op write and a frozen length,
        so nothing is ever corrupted on-device and no host-side capacity
        guard (device->host sync in the hot loop) is needed."""
        if self._stacked:
            return self._decode_stacked_impl(params, cache, token_ids, active)
        cfg, ecfg = self.cfg, self.ecfg
        b = token_ids.shape[0]
        pos = cache["length"]  # (B,) per-lane lengths
        writeable = jnp.logical_and(active, pos < ecfg.s_max)  # (B,)
        pos_w = jnp.minimum(pos, ecfg.s_max - 1)
        x = wquant.embed_rows(params["embed"], token_ids, ecfg.dtype)  # (B, 1, H)
        nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        positions = pos[:, None]  # (B, 1)
        cos, sin = llama.rope_cos_sin_for(cfg, positions)

        kv_len = jnp.where(writeable, pos + 1, pos)
        new_layers = []
        for i, (p_layer, entry, der) in enumerate(
            zip(params["layers"], cache["layers"], self.derived)
        ):
            attn = p_layer["attn"]
            h = llama.rms_norm(x, p_layer["input_norm"], cfg.rms_norm_eps)

            q = wdot(h, attn["q_proj"]["w"])
            if attn["q_proj"].get("b") is not None:
                q = q + attn["q_proj"]["b"]
            q = q.reshape(b, 1, nh, hd)
            q = llama.apply_rope(q.astype(jnp.float32), cos, sin).astype(ecfg.dtype)
            q = q[:, 0]  # (B, nh, hd)

            k_raw = llama.project_kv(h, attn["k_proj"])
            v_raw = llama.project_kv(h, attn["v_proj"])

            k_dense = "VT" not in attn["k_proj"]
            v_dense = "VT" not in attn["v_proj"]
            entry = dict(entry)
            if k_dense:
                k_new = k_raw.reshape(b, 1, nkv, hd)
                k_new = llama.apply_rope(k_new.astype(jnp.float32), cos, sin)
                upd = {"lat": k_new.astype(ecfg.dtype).transpose(0, 2, 1, 3)}
                entry["k"] = cache_lib.write_at_lanes_masked(
                    entry["k"], upd, pos_w, writeable
                )
            else:
                lat = k_raw.transpose(0, 2, 1, 3)
                if self._fused_append:
                    entry["k"] = self._append_fused(entry["k"], lat, pos_w,
                                                    writeable)
                else:
                    entry["k"] = cache_lib.write_at_lanes_masked(
                        entry["k"], cache_lib._encode(lat, ecfg.qcfg, ecfg.dtype, ecfg.rank_major_fp),
                        pos_w, writeable,
                    )
            if v_dense:
                upd = {"lat": v_raw.reshape(b, 1, nkv, hd).astype(ecfg.dtype).transpose(0, 2, 1, 3)}
                entry["v"] = cache_lib.write_at_lanes_masked(
                    entry["v"], upd, pos_w, writeable
                )
            else:
                lat = v_raw.transpose(0, 2, 1, 3)
                if self._fused_append:
                    entry["v"] = self._append_fused(entry["v"], lat, pos_w,
                                                    writeable)
                else:
                    entry["v"] = cache_lib.write_at_lanes_masked(
                        entry["v"], cache_lib._encode(lat, ecfg.qcfg, ecfg.dtype, ecfg.rank_major_fp),
                        pos_w, writeable,
                    )

            attn_out = self._decode_attention(q, entry, attn, der, kv_len, k_dense, v_dense)
            x = x + attn_out[:, None, :]

            h2 = llama.rms_norm(x, p_layer["post_norm"], cfg.rms_norm_eps)
            x = x + llama.mlp_forward(h2, p_layer["mlp"])
            new_layers.append(entry)

        x = llama.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        lm_head = wquant.tied_head(params)
        logits = wdot(x, lm_head)
        new_cache = {"layers": new_layers, "length": kv_len}
        return logits, new_cache

    def _append_fused(self, bufs, lat, pos_w, writeable):
        """One fused Pallas op (quantize + pack + masked column write) per
        layer side instead of the ~12-op XLA chain -- the per-step append
        machinery was ~1.5 ms of the 35 ms 7B/64K step plus a share of the
        inter-op scheduling gaps (docs/BENCH.md round-4 decomposition).
        lat: (B, G, 1, rank)."""
        from ..ops.pallas.cache_append import append_token_quantized

        qcfg = self.ecfg.qcfg
        ecfg = self.ecfg
        rank = lat.shape[-1]

        def call(lat_, codes_, scale_, pos_, w_, *maybe_zero):
            return append_token_quantized(
                lat_, codes_, scale_, pos_, w_, qcfg=qcfg, rank=rank,
                zero=maybe_zero[0] if maybe_zero else None,
                interpret=ecfg.pallas_interpret,
            )

        # scale/zero buffers pass VERBATIM (with their unit n_sc axis): a
        # pre-kernel squeeze would materialize slice copies around the
        # in-place alias (cache_append docstring)
        zero_tail = () if qcfg.sym else (bufs["zero_t"],)
        args = (lat[:, :, 0, :], bufs["codes_t"], bufs["scale_t"],
                pos_w, writeable) + zero_tail
        if ecfg.mesh is not None:
            # head-group-parallel per-shard append (pallas_call is not
            # GSPMD-partitionable): batch over `data`, kv groups over
            # `model`; per-shard aliasing keeps the write in place
            from jax.sharding import PartitionSpec as P
            from palu_tpu.parallel.mesh import shard_map_nocheck

            bgs = P("data", "model", None, None)
            out = shard_map_nocheck(
                call,
                mesh=ecfg.mesh,
                in_specs=(P("data", "model", None), bgs, bgs,
                          P("data"), P("data")) + (bgs,) * len(zero_tail),
                out_specs=(bgs, bgs) + (bgs,) * len(zero_tail),
            )(*args)
        else:
            out = call(*args)
        new = {"codes_t": out[0], "scale_t": out[1]}
        if not qcfg.sym:
            new["zero_t"] = out[2]
        return new

    def _decode_attention(self, q, entry, attn, der, kv_len, k_dense, v_dense):
        cfg, ecfg = self.cfg, self.ecfg
        b, nh, hd = q.shape
        chunk = self._chunk
        num_chunks = ecfg.s_max // chunk

        if k_dense and v_dense:
            # dense fallback: flash decode over full KV
            self._decode_paths.add("dense-flash")
            out = self._dense_flash_decode(q, entry, kv_len, chunk, num_chunks)
            return wdot(out, attn["o_proj"]["w"])

        rk = attn["k_proj"]["U"].shape[1]
        rv = attn["v_proj"]["U"].shape[1]

        quantized = ecfg.qcfg is not None and ecfg.qcfg.enabled
        if (
            ecfg.seq_axis is not None
            and ecfg.mesh is not None
            and ecfg.use_pallas
            and (
                ecfg.rank_major_fp
                or (
                    quantized
                    and (
                        cache_lib.rank_major(ecfg.qcfg)
                        or (
                            cache_lib.rank_major_chunked(ecfg.qcfg, rk)
                            and cache_lib.rank_major_chunked(ecfg.qcfg, rv)
                        )
                    )
                )
            )
        ):
            # sequence-parallel decode over a RANK-MAJOR cache (packed
            # low-bit -- per-row or per-chunk scales -- or bf16 transposed):
            # per-shard v4 kernel with a position offset, flash-decoding
            # stat combine; composes with qwen2 k-bias and static-scaled
            # rope (both fold inside the kernel)
            n_shards = ecfg.mesh.shape[ecfg.seq_axis]
            s_local = ecfg.s_max // n_shards
            self._decode_paths.add(
                "v4-seq-sharded" + ("-quantized" if quantized else "-fp"))
            lat_out = att_ops.flash_decode_latent_seq_sharded_rank_major(
                q, entry["k"], entry["v"], der["b_k"], kv_len,
                ecfg.mesh, ecfg.seq_axis,
                qcfg=ecfg.qcfg if quantized else None, rk=rk, rv=rv,
                block_s=min(self._pallas_block, s_local),
                theta=cfg.rope_theta, sliding_window=cfg.sliding_window,
                interpret=ecfg.pallas_interpret, rope_scale=self._rope_scale,
                inv_freq_static=self._inv_freq_static,
                k_bias=der.get("k_bias"),
                kernel_knobs=self._kernel_knobs,
            )
            lat_out = lat_out.astype(ecfg.dtype).reshape(b, nh * rv)
            out = wdot(lat_out, attn["o_proj"]["w_fused"])
            if "o_bias_corr" in der:
                out = out + der["o_bias_corr"]
            return out

        if (
            ecfg.seq_axis is not None
            and ecfg.mesh is not None
            and not quantized
            and not ecfg.rank_major_fp
            and "k_bias" not in der
        ):
            # sequence-parallel decode: each seq shard computes partial flash
            # stats over its cache slice, combined via pmax/psum.
            # k_bias (qwen2) is excluded HERE only: the token-major bf16
            # seq-sharded kernel has no bias-logit fold, so qwen2+seq_axis
            # lands on the XLA fallback below (which reconstructs K with the
            # bias added before RoPE); the rank-major and quantized
            # seq-sharded paths fold k_bias in-kernel like single-chip
            n_shards = ecfg.mesh.shape[ecfg.seq_axis]
            s_local = ecfg.s_max // n_shards
            chunk_s = min(chunk, s_local)
            while s_local % chunk_s:
                chunk_s -= 1
            self._decode_paths.add("seq-sharded-bf16-token-major")
            lat_out = att_ops.flash_decode_latent_seq_sharded(
                q, entry["k"]["lat"], entry["v"]["lat"], der["b_k"], kv_len,
                ecfg.mesh, ecfg.seq_axis, chunk_s, hd, cfg.rope_theta,
                cfg.sliding_window, inv_freq=self._inv_freq,
                rope_scale=self._rope_scale,
            )
            lat_out = lat_out.astype(ecfg.dtype).reshape(b, nh * rv)
            out = wdot(lat_out, attn["o_proj"]["w_fused"])
            if "o_bias_corr" in der:
                out = out + der["o_bias_corr"]
            return out

        rm = cache_lib.rank_major(ecfg.qcfg)
        # per-chunk (group_size > 0) caches also run fused when init_cache
        # chose the rank-major layout (chunk divides both ranks); detect
        # from the buffers so dispatch always matches the actual layout
        rm_chunked = (
            quantized
            and ecfg.qcfg.group_size > 0
            and not k_dense and not v_dense
            and "codes_t" in entry["k"]
            and "codes_t" in entry["v"]
        )
        # v4 paths (rank-major packed / rank-major fp) fuse static-scaled
        # rope tables AND the qwen2 pre-RoPE k-bias (cache-independent
        # logit corrections, palu_decode4._make_kernel4 docstring); only
        # the v1 seq-major fp kernel lacks the bias fold.
        v4_dispatch = rm or rm_chunked or (not quantized and ecfg.rank_major_fp)
        if (
            ecfg.use_pallas
            and (not quantized or rm or rm_chunked)
            and ("k_bias" not in der or v4_dispatch)
        ):
            from ..ops.pallas import palu_decode as pk
            from ..ops.pallas import palu_decode4 as pk4

            # rank-major quantized caches all run the v4 transposed kernel;
            # asym passes its per-token zero rows and the kernel folds the
            # zero term past the big dots (palu_decode4.py docstring 4b);
            # per-chunk scales (rm_chunked) dequantize in VMEM pre-dot.
            # v2 remains only as a benchmark comparison point.
            use_v4 = rm or rm_chunked
            block_s = self._pallas_block
            k_bias = der.get("k_bias")
            path = ("v4-fused-quantized" if use_v4
                    else "v4-fused-fp" if ecfg.rank_major_fp and not quantized
                    else "v1-fused-bf16")
            self._decode_paths.add(
                path + ("(shard_map)" if ecfg.mesh is not None else ""))

            def kernel_call(q_, b_k_, k_bufs, v_bufs, kv_len_, k_bias_=None):
                if ecfg.rank_major_fp and not quantized:
                    return pk4.palu_flash_decode4(
                        q_, b_k_, k_bufs["lat_t"], v_bufs["lat_t"], kv_len_,
                        rk=rk, rv=rv, block_s=block_s,
                        theta=cfg.rope_theta, sliding_window=cfg.sliding_window,
                        interpret=ecfg.pallas_interpret,
                        inv_freq_static=self._inv_freq_static,
                        rope_scale=self._rope_scale, k_bias=k_bias_,
                    )
                if use_v4:
                    g_ = k_bufs["scale_t"].shape[1]
                    s_max_ = k_bufs["scale_t"].shape[3]
                    if rm_chunked:
                        # per-chunk: pass the (B, G, n_sc, S) row stacks raw
                        ksc, vsc = k_bufs["scale_t"], v_bufs["scale_t"]
                        zeros = {} if ecfg.qcfg.sym else {
                            "xk_zero": k_bufs["zero_t"],
                            "xv_zero": v_bufs["zero_t"],
                        }
                    else:
                        ksc = k_bufs["scale_t"].reshape(-1, g_, s_max_)
                        vsc = v_bufs["scale_t"].reshape(-1, g_, s_max_)
                        zeros = {} if ecfg.qcfg.sym else {
                            "xk_zero": k_bufs["zero_t"].reshape(-1, g_, s_max_),
                            "xv_zero": v_bufs["zero_t"].reshape(-1, g_, s_max_),
                        }
                    return pk4.palu_flash_decode4_quantized(
                        q_, b_k_,
                        k_bufs["codes_t"],
                        ksc,
                        v_bufs["codes_t"],
                        vsc,
                        kv_len_,
                        qcfg=ecfg.qcfg, rk=rk, rv=rv, block_s=block_s,
                        theta=cfg.rope_theta, sliding_window=cfg.sliding_window,
                        interpret=ecfg.pallas_interpret,
                        inv_freq_static=self._inv_freq_static,
                        rope_scale=self._rope_scale, k_bias=k_bias_,
                        **zeros, **self._kernel_knobs,
                    )
                return pk.palu_flash_decode(
                    q_, b_k_, k_bufs["lat"], v_bufs["lat"], kv_len_,
                    block_s=block_s, theta=cfg.rope_theta,
                    sliding_window=cfg.sliding_window,
                    interpret=ecfg.pallas_interpret,
                    inv_freq_static=self._inv_freq_static,
                    rope_scale=self._rope_scale,
                )

            if ecfg.mesh is not None:
                # pallas_call is not GSPMD-partitionable; run per-shard via
                # shard_map: head groups over `model`, batch over `data`. The
                # fused o_proj matmul outside triggers the psum.
                from jax.sharding import PartitionSpec as P
                from palu_tpu.parallel.mesh import shard_map_nocheck

                buf_spec_k = jax.tree.map(
                    lambda _: P("data", "model", None, None), entry["k"]
                )
                buf_spec_v = jax.tree.map(
                    lambda _: P("data", "model", None, None), entry["v"]
                )
                extra = () if k_bias is None else (k_bias,)
                extra_specs = () if k_bias is None else (P("model", None, None),)
                lat_out = shard_map_nocheck(
                    kernel_call,
                    mesh=ecfg.mesh,
                    in_specs=(
                        P("data", "model", None),
                        P("model", None, None, None),
                        buf_spec_k,
                        buf_spec_v,
                        P("data"),
                    ) + extra_specs,
                    out_specs=P("data", "model", None),
                )(q, der["b_k"], entry["k"], entry["v"],
                  jnp.broadcast_to(kv_len, (b,)), *extra)
            else:
                lat_out = kernel_call(q, der["b_k"], entry["k"], entry["v"],
                                      kv_len, k_bias)
            lat_out = lat_out.astype(ecfg.dtype).reshape(b, nh * rv)
            out = wdot(lat_out, attn["o_proj"]["w_fused"])
            if "o_bias_corr" in der:
                out = out + der["o_bias_corr"]
            return out

        def read_k(idx):
            buf = cache_lib.seq_slice(entry["k"], idx * chunk, chunk)
            return cache_lib.decode_latents(buf, ecfg.qcfg, rk, ecfg.dtype)

        def read_v(idx):
            buf = cache_lib.seq_slice(entry["v"], idx * chunk, chunk)
            return cache_lib.decode_latents(buf, ecfg.qcfg, rv, ecfg.dtype)

        self._decode_paths.add("xla-chunked-fallback")
        lat_out = att_ops.flash_decode_latent(
            q,
            read_k,
            read_v,
            der["b_k"],
            num_chunks,
            chunk,
            kv_len,
            hd,
            cfg.rope_theta,
            rv,
            cfg.sliding_window,
            k_bias=der.get("k_bias"),
            inv_freq=self._inv_freq,
            rope_scale=self._rope_scale,
        )  # (B, nh, rv)
        lat_out = lat_out.astype(ecfg.dtype).reshape(b, nh * rv)
        out = wdot(lat_out, attn["o_proj"]["w_fused"])
        if "o_bias_corr" in der:
            out = out + der["o_bias_corr"]
        return out

    def _dense_flash_decode(self, q, entry, kv_len, chunk, num_chunks):
        """fp16/bf16-KV baseline decode (the reference's non-palu baseline,
        run_latency_attention.py --palu absent)."""
        cfg = self.cfg
        b, nh, hd = q.shape
        nkv = cfg.num_key_value_heads
        rep = nh // nkv
        q_g = q.reshape(b, nkv, rep, hd)

        def body(carry, idx):
            m, l, acc = carry
            kblk = jax.lax.dynamic_slice_in_dim(entry["k"]["lat"], idx * chunk, chunk, axis=2)
            vblk = jax.lax.dynamic_slice_in_dim(entry["v"]["lat"], idx * chunk, chunk, axis=2)
            logits = jnp.einsum(
                "bgrd,bgcd->bgrc", q_g.astype(jnp.float32), kblk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) / np.sqrt(hd)
            pos = idx * chunk + jnp.arange(chunk)
            valid = pos[None, :] < kv_len[:, None]  # (B, C)
            if cfg.sliding_window is not None:
                valid &= pos[None, :] > (kv_len[:, None] - 1) - cfg.sliding_window
            vmask = valid[:, None, None, :]
            logits = jnp.where(vmask, logits, -1e30)
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])
            p = jnp.where(vmask, p, 0.0)
            l_new = l * alpha + jnp.sum(p, axis=-1)
            pv = jnp.einsum(
                "bgrc,bgcd->bgrd", p, vblk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return (m_new, l_new, acc * alpha[..., None] + pv), None

        m0 = jnp.full((b, nkv, rep), -1e30, jnp.float32)
        l0 = jnp.zeros((b, nkv, rep), jnp.float32)
        acc0 = jnp.zeros((b, nkv, rep, hd), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(num_chunks))
        out = (acc / l[..., None]).reshape(b, nh * hd)
        return out.astype(self.ecfg.dtype)

    # -- public API ----------------------------------------------------------

    def prefill(self, input_ids, cache=None, real_len=None):
        """Full (one-shot) prefill. `real_len` (int or (B,) array) marks the
        true prompt length when input_ids is right-padded."""
        input_ids = jnp.asarray(input_ids)
        if input_ids.shape[0] != self.ecfg.batch:
            raise ValueError(
                f"batch {input_ids.shape[0]} != engine batch {self.ecfg.batch}"
            )
        if input_ids.shape[1] > self.ecfg.s_max:
            raise ValueError(
                f"prompt length {input_ids.shape[1]} exceeds cache s_max "
                f"{self.ecfg.s_max}"
            )
        if cache is None:
            cache = self.init_cache()
        if real_len is None:
            real_len = input_ids.shape[1]
        last_pos = jnp.broadcast_to(
            jnp.asarray(real_len, jnp.int32) - 1, (input_ids.shape[0],)
        )
        return self._prefill_jit(self.params, cache, input_ids, last_pos)

    def prefill_auto(self, input_ids, cache=None):
        """Prefill with a compile count independent of the prompt length:
        fixed-chunk streaming when every k/v layer is low-rank (always true
        for Palu-compressed models), else a padded power-of-two bucket."""
        if self._stacked:  # stacked eligibility implies all-low-rank
            return self.prefill_chunked(
                input_ids, chunk_size=self._chunk, cache=cache
            )
        all_lowrank = all(
            "VT" in l["attn"]["k_proj"] and "VT" in l["attn"]["v_proj"]
            for l in self.params["layers"]
        )
        if all_lowrank:
            return self.prefill_chunked(
                input_ids, chunk_size=self._chunk, cache=cache
            )
        return self.prefill_bucketed(input_ids, cache=cache)

    def prefill_bucketed(self, input_ids, cache=None):
        """Prefill with the prompt right-padded to a power-of-two bucket
        (capped at s_max), so N different prompt lengths compile only
        O(log s_max) executables instead of one each."""
        input_ids = np.asarray(input_ids)
        real = input_ids.shape[1]
        bucket = 32
        while bucket < real:
            bucket *= 2
        bucket = min(bucket, self.ecfg.s_max)
        if bucket < real:
            raise ValueError(f"prompt {real} exceeds s_max {self.ecfg.s_max}")
        if bucket > real:
            input_ids = np.pad(input_ids, ((0, 0), (0, bucket - real)))
        return self.prefill(jnp.asarray(input_ids), cache=cache, real_len=real)

    def decode(self, token_ids, cache, active=None):
        """One decode step. `active` (B,) bool marks lanes that should
        append + advance (continuous batching); defaults to all lanes.
        Full lanes are handled on-device (no-op write, frozen length) --
        there is no host-side capacity check, so the hot loop has no
        device->host sync besides fetching the sampled token."""
        if active is None:
            active = jnp.ones((self.ecfg.batch,), jnp.bool_)
        return self._decode_jit(
            self.params, cache, jnp.asarray(token_ids), jnp.asarray(active)
        )

    def generate(self, input_ids, max_new_tokens: int, greedy: bool = True,
                 eos_token_id: Optional[int] = None,
                 sampling=None, seed: int = 0):
        """Generation loop (reference run_long_bench.py:63-81 uses HF greedy
        generate; `sampling` -- a runtime.sampling.SamplingParams -- enables
        temperature / top-k / top-p with a deterministic per-step PRNG key
        folded from `seed`). Prefill goes through the fixed-chunk streaming
        path when every k/v layer is low-rank, else a padded length bucket --
        both keep the number of compiled executables independent of how many
        distinct prompt lengths are evaluated (run_longbench feeds thousands)."""
        import functools

        input_ids = np.asarray(input_ids)
        # cap at cache capacity (the prompt occupies input length slots)
        max_new_tokens = min(max_new_tokens, self.ecfg.s_max - input_ids.shape[1])

        if sampling is not None and sampling.temperature > 0.0:
            from .sampling import sample as _sample

            base_key = jax.random.key(seed)
            samp_jit = jax.jit(functools.partial(_sample, params=sampling))

            def pick(lg, step):
                key = jax.random.fold_in(base_key, step)
                return np.asarray(samp_jit(lg[:, -1], key=key))[:, None]
        else:
            def pick(lg, step):
                return np.asarray(jnp.argmax(lg[:, -1], axis=-1))[:, None]

        logits, cache = self.prefill_auto(input_ids)
        out_tokens = []
        next_tok = pick(logits, 0)
        for step in range(max_new_tokens):
            out_tokens.append(next_tok)
            if eos_token_id is not None and (next_tok == eos_token_id).all():
                break
            logits, cache = self.decode(next_tok, cache)
            next_tok = pick(logits, step + 1)
        return np.concatenate(out_tokens, axis=1)
