"""Standalone efficiency probe of the Pallas chunked-prefill kernel
(ops/pallas/prefill_flash.py) at the 64K headline shape: one q-chunk vs a
full 64K prefix, swept over block_s. Chained calls (data dependency via q)
for converged-clock measurement (docs/BENCH.md methodology)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from palu_tpu.ops.pallas.prefill_flash import prefill_flash

S = int(os.environ.get("SEQ", 65536))
CQ = int(os.environ.get("CQ", 2048))
CHAIN = int(os.environ.get("CHAIN", 16))
nh, hd = 32, 128
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (1, nh, CQ, hd), jnp.bfloat16)
k = jax.random.normal(key, (1, nh, S, hd), jnp.bfloat16)
v = jax.random.normal(key, (1, nh, S, hd), jnp.bfloat16)
off = jnp.asarray([S - CQ], jnp.int32)
kvl = jnp.asarray([S], jnp.int32)

# useful flops for the final chunk: q attends ~S positions (minus intra-
# chunk causal half): pairs ~= CQ*S - CQ^2/2
pairs = CQ * S - CQ * CQ // 2
flops = pairs * hd * nh * 2 * 2

PIPE = [p == "1" for p in os.environ.get("PIPE", "0,1").split(",")]
BLOCKS = [int(b) for b in os.environ.get("BLOCKS", "512,1024,2048").split(",")]
for pipelined in PIPE:
    for bs in BLOCKS:
        def chain(q, k, v):
            def body(qc, _):
                o = prefill_flash(qc, k, v, off, kvl, block_s=bs,
                                  pipelined=pipelined,
                                  exp2=os.environ.get("EXP2", "0") == "1")
                return o.astype(qc.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=CHAIN)
            return out
        f = jax.jit(chain)
        try:
            t0 = time.time(); r = f(q, k, v); np.asarray(r.ravel()[:1])
        except Exception as e:
            print(f"pipe={int(pipelined)} block_s={bs:5d}: FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:100]}",
                  flush=True)
            continue
        comp = time.time() - t0
        reps = []
        for _ in range(3):
            t0 = time.perf_counter(); r = f(q, k, v); np.asarray(r.ravel()[:1])
            reps.append(time.perf_counter() - t0)
        per = min(reps) / CHAIN
        print(f"pipe={int(pipelined)} block_s={bs:5d}: {per*1e3:8.2f} ms/call  "
              f"{flops/per/1e12:6.1f} TFLOP/s eff={flops/per/197e12*100:4.1f}% "
              f"(compile {comp:.0f}s)", flush=True)
