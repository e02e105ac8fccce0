import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from palu_tpu.ops.pallas.palu_decode import palu_flash_decode

g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
rng = np.random.default_rng(0)
seq = 262144
q0 = jnp.asarray(rng.standard_normal((1, 32, hd)), jnp.bfloat16)
b_k = jnp.asarray(rng.standard_normal((g, hpg, rk, hd)) * 0.1, jnp.bfloat16)
x_k = jnp.asarray(rng.standard_normal((1, g, seq, rk)), jnp.bfloat16)
x_v = jnp.asarray(rng.standard_normal((1, g, seq, rv)), jnp.bfloat16)
kvl = jnp.asarray(seq, jnp.int32)
sol = g * seq * (rk + rv) * 2 / 819e9 * 1e6
bump = jax.jit(lambda q: q * jnp.bfloat16(1.0001))

for hma in (True, False):
    for bs in (1024, 2048):
        q = q0
        out = palu_flash_decode(q, b_k, x_k, x_v, kvl, block_s=bs, head_major_acc=hma)
        _ = np.asarray(out[0, 0, :1])  # fetch forces real completion
        ts = []
        for i in range(15):
            q = bump(q); _ = np.asarray(q[0, 0, :1])
            t0 = time.perf_counter()
            out = palu_flash_decode(q, b_k, x_k, x_v, kvl, block_s=bs, head_major_acc=hma)
            _ = np.asarray(out[0, 0, :1])  # block_until_ready acks early on axon
            ts.append(time.perf_counter() - t0)
        us = np.median(ts) * 1e6
        print(f"hma={hma} bs={bs}: {us:.0f}us ({100*sol/us:.0f}% SoL, SoL={sol:.0f}us)", flush=True)
