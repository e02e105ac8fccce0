"""Continuous-batching serving throughput bench: a stream of synthetic
requests with mixed prompt lengths through ServingEngine (random-weight
model, like the reference's latency track).

  python -m palu_tpu.cli.serve_bench --num_requests 32 --lanes 8 \\
      --prompt_len 512 --max_new_tokens 64
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_requests", type=int, default=16)
    parser.add_argument("--lanes", type=int, default=4)
    parser.add_argument("--prompt_len", type=int, default=256)
    parser.add_argument("--max_new_tokens", type=int, default=32)
    parser.add_argument("--s_max", type=int, default=1024)
    parser.add_argument("--num_layers", type=int, default=2)
    parser.add_argument("--num_heads", type=int, default=16)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument("--group_size", type=int, default=4)
    parser.add_argument("--rank", type=int, default=128)
    parser.add_argument("--lt_bits", type=int, default=16)
    parser.add_argument("--weight_bits", type=int, default=16,
                        help="8 = int8 weight-only storage (core/wquant)")
    parser.add_argument("--vocab_size", type=int, default=32000)
    parser.add_argument("--decode_chunk", type=int, default=256)
    parser.add_argument("--use_cpu", action="store_true")
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    import jax

    if args.use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..core.quant import QuantConfig
    from ..models import ModelConfig, llama
    from ..runtime.engine import EngineConfig
    from ..runtime.serving import ServingEngine

    g = args.num_heads // args.group_size
    hwr = {}
    for i in range(args.num_layers):
        hwr[f"model.layers.{i}.self_attn.k_proj"] = [args.rank] * g
        hwr[f"model.layers.{i}.self_attn.v_proj"] = [args.rank] * g
    cfg = ModelConfig(
        vocab_size=args.vocab_size,
        hidden_size=args.num_heads * args.head_dim,
        intermediate_size=args.num_heads * args.head_dim * 2,
        num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
        num_key_value_heads=args.num_heads,
        max_position_embeddings=args.s_max,
        head_group_size=args.group_size,
        head_wise_ranks=hwr,
    )
    params = llama.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    qcfg = QuantConfig(bits=args.lt_bits) if args.lt_bits < 16 else None
    srv = ServingEngine(
        params, cfg,
        EngineConfig(s_max=args.s_max, batch=args.lanes, dtype=jnp.bfloat16,
                     qcfg=qcfg, decode_chunk=args.decode_chunk,
                     weight_bits=args.weight_bits),
    )

    rng = np.random.default_rng(0)
    for rid in range(args.num_requests):
        plen = int(rng.integers(args.prompt_len // 2, args.prompt_len + 1))
        srv.submit(rid, rng.integers(1, cfg.vocab_size, (1, plen)),
                   args.max_new_tokens)

    # warmup compiles (first step pays prefill+decode compilation)
    srv.step()
    t0 = time.perf_counter()
    srv.run_until_done()
    elapsed = time.perf_counter() - t0
    stats = srv.sched.stats()
    out = {
        "requests": stats["finished"],
        "total_tokens": stats["tokens"],
        "elapsed_s": round(elapsed, 3),
        "tokens_per_s": round(stats["tokens"] / elapsed, 1),
        "lanes": args.lanes,
        "scheduler": type(srv.sched).__name__,
    }
    print(json.dumps(out) if args.json else out)


if __name__ == "__main__":
    main()
