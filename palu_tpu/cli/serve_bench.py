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
    parser.add_argument("--lt_sym", action="store_true")
    parser.add_argument("--lt_container", type=int, default=0)
    parser.add_argument("--weight_bits", type=int, default=16,
                        help="8 = int8 weight-only storage; 4 = packed int4 "
                             "with per-group-128 scales (core/wquant)")
    parser.add_argument("--vocab_size", type=int, default=32000)
    parser.add_argument("--decode_chunk", type=int, default=256)
    parser.add_argument("--pallas_block", type=int, default=2048)
    parser.add_argument("--int8_rot", action="store_true",
                        help="full-int decode kernel (throughput mode)")
    parser.add_argument("--use_cpu", action="store_true")
    parser.add_argument("--json", action="store_true")
    parser.add_argument("--steady_steps", type=int, default=0,
                        help="also measure the steady-state decode cadence "
                        "over N steps with all lanes active, with the "
                        "fixed dispatch+fetch cost measured and removed "
                        "(docs/BENCH.md RTT-differencing methodology)")
    parser.add_argument("--sample_frac", type=float, default=0.0,
                        help="fraction of requests using temperature "
                        "sampling (exercises the fused batched sampler)")
    parser.add_argument("--chained_ref", type=int, default=0,
                        help="also measure the bare engine's chained-scan "
                        "TPOT over N steps at the same shape (the serving "
                        "loop's per-step overhead = steady corrected step "
                        "minus this)")
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
    qcfg = (QuantConfig(bits=args.lt_bits, sym=getattr(args, 'lt_sym', False),
                    container=getattr(args, 'lt_container', 0))
        if args.lt_bits < 16 else None)
    srv = ServingEngine(
        params, cfg,
        # use_pallas: the fused v4 decode kernel (the production decode
        # path); without it serving measures the XLA dequant fallback --
        # a ~30x step-time difference at quantized 64K-class configs
        EngineConfig(s_max=args.s_max, batch=args.lanes, dtype=jnp.bfloat16,
                     qcfg=qcfg, decode_chunk=args.decode_chunk,
                     weight_bits=args.weight_bits,
                     use_pallas=(not args.use_cpu
                                 and jax.default_backend() == "tpu"),
                     pallas_block=args.pallas_block,
                     kernel_int8_rot=args.int8_rot),
    )

    from ..runtime.sampling import SamplingParams

    rng = np.random.default_rng(0)
    for rid in range(args.num_requests):
        plen = int(rng.integers(args.prompt_len // 2, args.prompt_len + 1))
        sp = (SamplingParams(temperature=1.0, top_k=32)
              if rng.random() < args.sample_frac else None)
        srv.submit(rid, rng.integers(1, cfg.vocab_size, (1, plen)),
                   args.max_new_tokens, sampling=sp)

    steady = None
    if args.steady_steps:
        # fill every lane (admission + prefill) then measure the pure
        # decode cadence. step() is inherently serial (the next step's
        # tokens come from this step's fetch), so each call pays one
        # host dispatch + result fetch; on a tunneled backend that fixed
        # cost dwarfs the device step, so we measure it with a trivial
        # jitted fetch in the same process and subtract -- the corrected
        # cadence is what a local (non-tunneled) host would see.
        import jax as _jax
        import jax.numpy as _jnp

        while srv.sched.num_queued() and srv.step():
            if all(a != -1 for a in srv.sched.active()):
                break
        srv.step()  # decode-path compile
        null = _jax.jit(lambda a: a + 1)
        na = _jnp.zeros((args.lanes,), _jnp.int32)
        _ = np.asarray(null(na))
        t_null = []
        for _i in range(20):
            t0 = time.perf_counter()
            _ = np.asarray(null(na))
            t_null.append(time.perf_counter() - t0)
        t_null = float(np.median(t_null))
        t_steps = []
        for _i in range(args.steady_steps):
            t0 = time.perf_counter()
            if not srv.step():
                break
            t_steps.append(time.perf_counter() - t0)
        step_wall = float(np.median(t_steps)) if t_steps else float("nan")
        corrected = max(step_wall - t_null, 1e-9)
        steady = {
            "step_wall_ms": round(step_wall * 1e3, 3),
            "dispatch_fetch_ms": round(t_null * 1e3, 3),
            "step_corrected_ms": round(corrected * 1e3, 3),
            "steady_tokens_per_s": round(args.lanes / corrected, 1),
            "steady_steps_measured": len(t_steps),
        }
        if args.chained_ref:
            # bare-engine chained TPOT at the SAME shape: the serving
            # loop's own per-step cost is the difference
            from ..runtime import profiler

            ref = profiler.profile_tpot_chained(
                srv.engine, args.prompt_len, n_steps=args.chained_ref,
                k_calls=3)
            steady["engine_chained_tpot_ms"] = round(ref["tpot_ms"], 3)
            steady["serving_overhead_ms"] = round(
                corrected * 1e3 - ref["tpot_ms"], 3)

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
    if steady:
        out["steady"] = steady
    print(json.dumps(out) if args.json else out)


if __name__ == "__main__":
    main()
