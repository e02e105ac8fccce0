"""Full-model decode TPOT through the PRODUCT Engine (runtime/engine.py),
not a hand-built bench model: the BASELINE metric ("decode tokens/s/chip at
7B") measured on the exact code path a user of the framework runs.

True 32-layer 7B widths (hidden 4096, 32 q heads, inter 11008, rank_k 1024,
rank_v 3072, gs 4), random weights (the reference's latency track also uses
random weights, run_latency_attention.py:40-55), weight_bits=8 so the full
depth fits one v5e chip beside a 64K packed latent cache.

Measurement: profiler.profile_tpot_chained — N greedy decode steps chained
in ONE executable through Engine._decode_impl (argmax fed back on-device),
multi-call differencing cancels the sandbox's ~40 ms tunnel dispatch+fetch
exactly (docs/BENCH.md methodology).

Params are built HOST-SIDE in bf16 numpy so the fp32 originals never touch
the chip (at 32 layers they would OOM it); Engine(weight_bits=8) quantizes
the large dense projections to int8 on-device one weight at a time.

Usage: python tools/tpu_engine_bench.py
Env: LAYERS=32 BITS=3 SEQ=65536 STEPS=64 K=3 BLOCK=2048 WBITS=8 STACKED=0 CONTAINER=0
     TTFT=0 (1 = measure full-model chunked-prefill TTFT instead of decode
     TPOT; LM=auto|0|1 picks layer-major vs chunk-major prefill;
     PCHUNK prefill chunk size, default 4096)
     VBYTE=auto|0|1 (v4 kernel v_byte_dot), I8DOTS=0|1 (int8 MXU K dots)
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import ml_dtypes
import jax
import jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from palu_tpu.models.config import ModelConfig
from palu_tpu.core.quant import QuantConfig
from palu_tpu.runtime.engine import Engine, EngineConfig
from palu_tpu.runtime import profiler

L = int(os.environ.get("LAYERS", 32))
BITS = int(os.environ.get("BITS", 3))
SEQ = int(os.environ.get("SEQ", 65536))
STEPS = int(os.environ.get("STEPS", 64))
K = int(os.environ.get("K", 3))
BLOCK = int(os.environ.get("BLOCK", 2048))
WBITS = int(os.environ.get("WBITS", 8))
STACKED = os.environ.get("STACKED", "auto")  # auto | 1 | 0
CONTAINER = int(os.environ.get("CONTAINER", 0))  # storage field width
TTFT = os.environ.get("TTFT", "0") == "1"
FA = os.environ.get("FA", "1")  # 0 disables the fused append kernel
VT8 = os.environ.get("VT8", "0") == "1"  # int8 VT factors (vt_bits=8)
LM_ENV = os.environ.get("LM", "auto")
PCHUNK = int(os.environ.get("PCHUNK", 4096))
VBYTE = os.environ.get("VBYTE", "auto")  # auto | 1 | 0
I8DOTS = os.environ.get("I8DOTS", "0") == "1"
FUSEUV = os.environ.get("FUSEUV", "0") == "1"
I8ROT = os.environ.get("I8ROT", "0") == "1"


H, NH, HD = 4096, 32, 128
INTER, VOCAB = 11008, 32000
GS = 4
RK, RV = 128, 384  # per group (totals 1024 / 3072)

bf16 = ml_dtypes.bfloat16
rng = np.random.default_rng(0)


def nrm(shape, s=0.02):
    return (rng.standard_normal(shape, dtype=np.float32) * s).astype(bf16)


def build_cfg():
    ranks = {}
    for i in range(L):
        ranks[f"model.layers.{i}.self_attn.k_proj"] = [RK] * (NH // GS)
        ranks[f"model.layers.{i}.self_attn.v_proj"] = [RV] * (NH // GS)
    return ModelConfig(
        vocab_size=VOCAB, hidden_size=H, intermediate_size=INTER,
        num_hidden_layers=L, num_attention_heads=NH, num_key_value_heads=NH,
        head_group_size=GS, head_wise_ranks=ranks,
    )


def build_params(cfg):
    g, gd = cfg.num_kv_groups, cfg.group_dim
    layers = []
    for _ in range(L):
        layers.append({
            "input_norm": np.ones((H,), bf16),
            "post_norm": np.ones((H,), bf16),
            "attn": {
                "q_proj": {"w": nrm((H, NH * HD))},
                "k_proj": {"VT": nrm((H, g * RK)), "U": nrm((g, RK, gd), 0.05)},
                "v_proj": {"VT": nrm((H, g * RV)), "U": nrm((g, RV, gd), 0.05)},
                # decode uses only the fused o_proj; random stands in for
                # o_proj @ U_v (timing-equivalent, tools/tpu_model_bench.py).
                # TTFT (prefill) additionally needs the UNFUSED o_proj --
                # the prefill paths project the dense attention output
                "o_proj": ({"w_fused": nrm((NH * RV, H)),
                            "w": nrm((NH * HD, H))} if TTFT
                           else {"w_fused": nrm((NH * RV, H))}),
            },
            "mlp": {
                "gate": nrm((H, INTER)),
                "up": nrm((H, INTER)),
                "down": nrm((INTER, H)),
            },
        })
    return {
        "embed": nrm((VOCAB, H)),
        "layers": layers,
        "final_norm": np.ones((H,), bf16),
        "lm_head": nrm((H, VOCAB)),
    }


def main():
    # s_max: SEQ plus headroom for the chained steps, rounded to the block
    n_extra = STEPS * (1 + 1 + K) * 3 + 64
    s_max = -(-(SEQ + n_extra) // BLOCK) * BLOCK
    cfg = build_cfg()
    qcfg = QuantConfig(bits=BITS, group_size=0, sym=True, container=CONTAINER)
    ek = {}
    if STACKED != "auto":
        ek["stacked_decode"] = STACKED == "1"
    if LM_ENV != "auto":
        ek["layer_major_prefill"] = LM_ENV == "1"
    if VBYTE != "auto":
        ek["kernel_v_byte_dot"] = VBYTE == "1"
    if I8DOTS:
        ek["kernel_int8_dots"] = True
    if FUSEUV:
        ek["kernel_fuse_uv"] = True
    if I8ROT:
        ek["kernel_int8_rot"] = True
    ecfg = EngineConfig(
        s_max=s_max, batch=1, qcfg=qcfg, decode_chunk=BLOCK,
        use_pallas=True, pallas_block=BLOCK, weight_bits=WBITS,
        vt_bits=8 if VT8 else 16, **ek,
    )
    print(f"# building params ({L} layers, host bf16)...", flush=True)
    t0 = time.time()
    params = build_params(cfg)
    print(f"# params built in {time.time()-t0:.0f}s; engine init "
          f"(weight_bits={WBITS} quantizes on device)...", flush=True)
    t0 = time.time()
    eng = Engine(params, cfg, ecfg)
    if FA == "0":
        eng._fused_append = False
    # move the remaining host leaves to device ONCE (jit args in numpy form
    # would re-upload every call and pollute the timing)
    eng.params = jax.tree.map(jnp.asarray, eng.params)
    jax.block_until_ready(eng.params)
    print(f"# engine ready in {time.time()-t0:.0f}s "
          f"(stacked={getattr(eng, '_stacked', False)}); "
          f"mem={profiler.device_memory_stats().get('bytes_in_use', 0)/2**30:.2f} GiB",
          flush=True)
    if TTFT:
        ids = np.random.default_rng(1).integers(0, VOCAB, (1, SEQ))
        t0 = time.time()
        logits, cache = eng.prefill_chunked(ids, chunk_size=PCHUNK)
        _ = np.asarray(logits[0, -1, :1])  # fetch closes the pipeline
        compile_s = time.time() - t0
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            logits, cache = eng.prefill_chunked(ids, chunk_size=PCHUNK)
            _ = np.asarray(logits[0, -1, :1])
            reps.append(time.perf_counter() - t0)
        del cache
        ttft_s = min(reps)
        res = {"ttft_s": ttft_s, "ttft_s_per_layer": ttft_s / L,
               "compile_s": compile_s, "prefill_chunk": PCHUNK,
               "layer_major": LM_ENV, "layers": L, "bits": BITS,
               "container": CONTAINER, "seq": SEQ, "weight_bits": WBITS}
        print(f"# TTFT {ttft_s:.2f} s ({ttft_s/L*1e3:.0f} ms/layer, {L} layers, "
              f"lm={LM_ENV}, compile {compile_s:.0f}s)", flush=True)
        print(json.dumps(res))
        return

    trace_dir = os.environ.get("TRACE") or None
    res = profiler.profile_tpot_chained(eng, SEQ, n_steps=STEPS, k_calls=K,
                                        trace_dir=trace_dir)
    res.update(layers=L, bits=BITS, container=CONTAINER, fused_append=eng._fused_append, seq=SEQ, s_max=s_max, weight_bits=WBITS,
               stacked=bool(getattr(eng, "_stacked", False)),
               kernel_knobs=sorted(eng._kernel_knobs))
    print(f"# TPOT {res['tpot_ms']:.2f} ms/step ({res['tokens_per_s']:.1f} tok/s, "
          f"{L} layers, {BITS}-bit cache, compile {res['compile_s']:.0f}s)",
          flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
