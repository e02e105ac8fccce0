"""Shared CLI flags (reference utils.py:101-110 add_common_args)."""

from __future__ import annotations

import argparse


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--model_name_or_path", type=str, required=True,
                        help="local HF dir (dense or palu* compressed)")
    parser.add_argument("--lt_bits", type=int, default=16,
                        help="bits for low-rank latents; <16 quantizes")
    parser.add_argument("--lt_group_size", type=int, default=0)
    parser.add_argument("--lt_sym", action="store_true")
    parser.add_argument("--lt_clip_ratio", type=float, default=1.0)
    parser.add_argument("--lt_hadamard", action="store_true",
                        help="apply the Hadamard rotation to latents (fused "
                        "into VT/U weights at load time)")
    parser.add_argument("--lt_container", type=int, default=0,
                        help="cache storage field width per code (0 = lt_bits"
                        "; e.g. 4 stores 3-bit codes in nibbles: identical "
                        "accuracy, ~25%% faster fused decode, 4/3x cache "
                        "bytes -- docs/BENCH.md round-4)")
    parser.add_argument("--use_cpu", action="store_true")
    return parser


def quant_config_from_args(args):
    from ..core.quant import QuantConfig

    return QuantConfig(
        bits=args.lt_bits,
        group_size=args.lt_group_size,
        sym=args.lt_sym,
        clip_ratio=args.lt_clip_ratio,
        hadamard=args.lt_hadamard,
        container=getattr(args, "lt_container", 0),
    )


def load_for_eval(args, dtype=None):
    """Load params/cfg; fuse Hadamard into low-rank weights if requested
    (reference configure_latent_quantizer + fused_hadamard_matrix,
    svd_linear.py:142-168)."""
    import jax

    if getattr(args, "use_cpu", False):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ..core import lowrank
    from ..models import hf_io, llama

    dtype = dtype or jnp.bfloat16
    params, cfg = hf_io.load_params(args.model_name_or_path, dtype=dtype)
    if args.lt_hadamard:
        new_layers = []
        for layer in params["layers"]:
            attn = dict(layer["attn"])
            for which in ("k_proj", "v_proj"):
                p = attn[which]
                if "VT" not in p:
                    continue
                ranks = [p["U"].shape[1]] * p["U"].shape[0]
                lr = lowrank.LowRankWeights(
                    VT=np.asarray(p["VT"], np.float32).T,
                    U=[np.asarray(u, np.float32).T for u in p["U"]],
                    ranks=ranks,
                )
                lr = lowrank.fuse_hadamard(lr)
                newp = {
                    "VT": jnp.asarray(lr.VT.T, dtype=dtype),
                    "U": jnp.asarray(np.stack([u.T for u in lr.U]), dtype=dtype),
                }
                if p.get("b") is not None:
                    newp["b"] = p["b"]
                attn[which] = newp
            if "VT" in attn["v_proj"]:
                attn["o_proj"] = dict(attn["o_proj"])
                attn["o_proj"]["w_fused"] = llama.fuse_o_proj(
                    np.asarray(attn["o_proj"]["w"], np.float32),
                    np.asarray(attn["v_proj"]["U"], np.float32),
                    cfg,
                ).astype(dtype)
            new_layers.append({**layer, "attn": attn})
        params = {**params, "layers": new_layers}
    return params, cfg
