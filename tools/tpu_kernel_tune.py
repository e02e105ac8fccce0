"""Device-side-looped kernel timing (the host->tunnel dispatch is ~ms, so
per-call host timing is meaningless here): chain N kernel invocations in one
jitted fori_loop with a data dependency, divide by N.

Usage: python tools/tpu_kernel_tune.py [seq_len] [block_s ...]
"""
import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from palu_tpu.ops.pallas.palu_decode import palu_flash_decode

seq = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
blocks = [int(b) for b in sys.argv[2:]] or [512, 1024, 2048]
N = 50

g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((1, 32, hd)), jnp.bfloat16)
b_k = jnp.asarray(rng.standard_normal((g, hpg, rk, hd)) * 0.1, jnp.bfloat16)
x_k = jnp.asarray(rng.standard_normal((1, g, seq, rk)), jnp.bfloat16)
x_v = jnp.asarray(rng.standard_normal((1, g, seq, rv)), jnp.bfloat16)
kvl = jnp.asarray(seq, jnp.int32)

bytes_read = g * seq * (rk + rv) * 2
sol_us = bytes_read / 819e9 * 1e6

for bs in blocks:
    @jax.jit
    def chained(q):
        def body(i, q):
            out = palu_flash_decode(q, b_k, x_k, x_v, kvl, block_s=bs)
            return q * (1.0 + 1e-6 * jnp.mean(out).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, N, body, q)

    t0 = time.time()
    r = chained(q0); r.block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    r = chained(q0); r.block_until_ready()
    total = time.time() - t0
    per_call = total / N * 1e6
    print(f"seq={seq} block_s={bs}: {per_call:.0f} us/call "
          f"(SoL {sol_us:.0f} us, {100*sol_us/per_call:.0f}%), compile {compile_s:.0f}s",
          flush=True)
