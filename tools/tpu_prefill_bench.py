"""TTFT bench: chunked prefill of long prompts through the real Engine on
one chip (7B-width single decoder layer, random weights; per-layer numbers
extrapolate like the full-model decode bench, tools/tpu_model_bench.py).

The reference never benchmarks prefill (its latency harness pre-fills the
cache with random latents, run_latency_attention.py:57-80); a serving
framework needs the TTFT side of the latency story too.  Chunks are
dispatched asynchronously (data dependency via the cache carry) and one
host fetch closes the pipeline, so tunnel dispatch overlaps compute.

Usage: python tools/tpu_prefill_bench.py [seqs...]  (default 4096 16384 65536)
Env: CHUNK (2048), BITS (4; 0 = bf16 latents),
     MODE (chunked | full; full = one-shot Engine.prefill, which
     reconstructs K/V and dispatches to the Pallas flash kernel),
     LM (auto | 0 | 1: layer-major prefill -- reconstruct the K/V prefix
     once per layer per run instead of once per chunk)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from palu_tpu.compression import compress_params
from palu_tpu.core.quant import QuantConfig
from palu_tpu.models import ModelConfig, llama
from palu_tpu.runtime.engine import Engine, EngineConfig

seqs = [int(x) for x in (sys.argv[1:] or ["4096", "16384", "65536"])]
chunk = int(os.environ.get("CHUNK", 2048))
bits = int(os.environ.get("BITS", 4))
container = int(os.environ.get("CONTAINER", 0))
mode = os.environ.get("MODE", "chunked")
pallas = bool(int(os.environ.get("PALLAS", "1")))  # fused Pallas prefill kernel
pblock = int(os.environ.get("PBLOCK", "0")) or None  # kernel seq block
lm_env = os.environ.get("LM", "auto")
lm = None if lm_env == "auto" else lm_env == "1"

cfg = ModelConfig(
    vocab_size=32000,
    hidden_size=4096,
    intermediate_size=11008,
    num_hidden_layers=1,
    num_attention_heads=32,
    num_key_value_heads=32,
    max_position_embeddings=max(seqs),
)
params = llama.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
selection = {
    "model.layers.0.self_attn.k_proj": [128] * 8,   # rank_k 1024
    "model.layers.0.self_attn.v_proj": [384] * 8,   # rank_v 3072
}
params, cfg = compress_params(params, cfg, selection, "svd", head_group_size=4)

qcfg = (QuantConfig(bits=bits, group_size=0, sym=True,
                    container=container) if bits else None)
print(f"devices: {jax.devices()}  mode={mode} chunk={chunk} "
      f"bits={bits or 'bf16'} pallas={pallas} pblock={pblock} lm={lm_env}", flush=True)

for seq in seqs:
    ecfg = EngineConfig(s_max=seq, batch=1, qcfg=qcfg, decode_chunk=chunk,
                        use_pallas=pallas, prefill_block=pblock,
                        layer_major_prefill=lm)
    eng = Engine(params, cfg, ecfg)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, seq))

    def run():
        if mode == "full":
            return eng.prefill(ids)
        return eng.prefill_chunked(ids, chunk_size=chunk)

    t0 = time.time()
    logits, cache = run()
    _ = np.asarray(logits[0, -1, :1])  # fetch closes the async pipeline
    compile_s = time.time() - t0

    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        logits, cache = run()
        _ = np.asarray(logits[0, -1, :1])
        reps.append(time.perf_counter() - t0)
    ttft = min(reps)
    print(f"seq={seq:6d}: TTFT {ttft*1e3:8.1f} ms/layer "
          f"({seq/ttft/1e6:.2f} Mtok/s/layer, compile {compile_s:.0f}s)",
          flush=True)
