"""Attention/TPOT latency bench CLI (reference run_latency_attention.py):
random-weight model, cache seeded with random latents at --prompt_len,
timed decode steps.

  python -m palu_tpu.cli.run_latency_attention --palu --prompt_len 65536 \\
      --total_rank_k 1024 --total_rank_v 3072 --group_size 4
"""

from __future__ import annotations

import argparse
import json


def build_model(args):
    import jax
    import jax.numpy as jnp

    from ..models import ModelConfig, llama

    hwr = None
    if args.palu:
        g = args.num_heads // args.group_size
        hwr = {}
        for i in range(args.num_layers):
            hwr[f"model.layers.{i}.self_attn.k_proj"] = [args.total_rank_k // g] * g
            hwr[f"model.layers.{i}.self_attn.v_proj"] = [args.total_rank_v // g] * g
    cfg = ModelConfig(
        vocab_size=args.vocab_size,
        hidden_size=args.num_heads * args.head_dim,
        intermediate_size=args.intermediate_size
        or int(args.num_heads * args.head_dim * 8 / 3) // 128 * 128,
        num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
        num_key_value_heads=args.num_kv_heads or args.num_heads,
        max_position_embeddings=args.prompt_len + args.n_steps + 16,
        head_group_size=args.group_size,
        head_wise_ranks=hwr,
    )
    params = llama.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    return params, cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--palu", action="store_true",
                        help="low-rank latent cache (vs dense-KV baseline)")
    parser.add_argument("--prompt_len", type=int, default=65536)
    parser.add_argument("--n_steps", type=int, default=100)
    parser.add_argument("--num_layers", type=int, default=1,
                        help="1 = attention-module bench (reference default)")
    parser.add_argument("--num_heads", type=int, default=32)
    parser.add_argument("--num_kv_heads", type=int, default=None)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument("--vocab_size", type=int, default=32000)
    parser.add_argument("--intermediate_size", type=int, default=None)
    parser.add_argument("--group_size", type=int, default=4)
    parser.add_argument("--total_rank_k", type=int, default=1024)
    parser.add_argument("--total_rank_v", type=int, default=3072)
    parser.add_argument("--lt_bits", type=int, default=16)
    parser.add_argument("--lt_sym", action="store_true")
    parser.add_argument("--lt_container", type=int, default=0)
    parser.add_argument("--decode_chunk", type=int, default=512)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--no_pallas", action="store_true")
    parser.add_argument("--v_byte_dot", choices=["auto", "0", "1"],
                        default="auto",
                        help="v4 kernel V byte-plane dots (exact; auto = on "
                             "for per-row nibble-container caches)")
    parser.add_argument("--int8_dots", action="store_true",
                        help="v4 kernel K reconstruct on the int8 MXU path")
    parser.add_argument("--int8_rot", action="store_true",
                        help="full-int K path (throughput mode: int8 dots "
                             "+ int32 rotation on static int8 tables; "
                             "~2e-2 attention deviation)")
    parser.add_argument("--trace_dir", type=str, default=None)
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from ..core.quant import QuantConfig
    from ..runtime.engine import Engine, EngineConfig
    from ..runtime.profiler import profile_tpot

    params, cfg = build_model(args)
    s_max = ((args.prompt_len + args.n_steps + 16) // args.decode_chunk + 1) * args.decode_chunk
    qcfg = (QuantConfig(bits=args.lt_bits, sym=getattr(args, 'lt_sym', False),
                    container=getattr(args, 'lt_container', 0))
        if args.lt_bits < 16 else None)
    engine = Engine(
        params, cfg,
        EngineConfig(
            s_max=s_max, batch=args.batch, dtype=jnp.bfloat16, qcfg=qcfg,
            decode_chunk=args.decode_chunk,
            use_pallas=args.palu and not args.no_pallas,
            kernel_v_byte_dot=(None if args.v_byte_dot == "auto"
                               else args.v_byte_dot == "1"),
            kernel_int8_dots=args.int8_dots,
            kernel_int8_rot=args.int8_rot,
        ),
    )
    stats = profile_tpot(engine, args.prompt_len, args.n_steps,
                         trace_dir=args.trace_dir)
    stats["mode"] = "palu" if args.palu else "dense"
    stats["lt_bits"] = args.lt_bits
    if args.json:
        print(json.dumps(stats))
    else:
        print(f"[{stats['mode']}] prompt_len={args.prompt_len} "
              f"TPOT={stats['tpot_ms']:.3f}ms "
              f"(p20 {stats['p20_ms']:.3f} / p80 {stats['p80_ms']:.3f}) "
              f"= {stats['tokens_per_s']:.1f} tok/s")


if __name__ == "__main__":
    main()
