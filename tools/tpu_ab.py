"""A/B kernel-variant timing on the real chip with device-side loops."""
import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from palu_tpu.ops.pallas.palu_decode import palu_flash_decode

seq = 65536
N = 30
g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((1, 32, hd)), jnp.bfloat16)
b_k = jnp.asarray(rng.standard_normal((g, hpg, rk, hd)) * 0.1, jnp.bfloat16)
x_k = jnp.asarray(rng.standard_normal((1, g, seq, rk)), jnp.bfloat16)
x_v = jnp.asarray(rng.standard_normal((1, g, seq, rv)), jnp.bfloat16)
kvl = jnp.asarray(seq, jnp.int32)
sol_us = g * seq * (rk + rv) * 2 / 819e9 * 1e6

variants = []
for hma in (True, False):
    for bs in (1024, 2048):
        variants.append((hma, bs))

for hma, bs in variants:
    @jax.jit
    def chained(q):
        def body(i, q):
            out = palu_flash_decode(q, b_k, x_k, x_v, kvl, block_s=bs,
                                    head_major_acc=hma)
            return q * (1.0 + 1e-6 * jnp.mean(out).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, N, body, q)

    t0 = time.time()
    r = chained(q0); r.block_until_ready()
    comp = time.time() - t0
    t0 = time.time()
    r = chained(q0); r.block_until_ready()
    per = (time.time() - t0) / N * 1e6
    print(f"head_major={hma} block_s={bs}: {per:.0f} us/call "
          f"({100*sol_us/per:.0f}% SoL; SoL={sol_us:.0f}us) compile {comp:.0f}s",
          flush=True)
