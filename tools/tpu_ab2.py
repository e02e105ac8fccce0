"""A/B kernel variants with single big-seq calls (dispatch ~2-3ms amortized
by ~20ms device time at 256K; fori_loop wrappers take 25min to compile
remotely, single pallas calls compile in seconds)."""
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

def bench_fn(fn, rep=40):
    fn().block_until_ready()
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter(); fn().block_until_ready()
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e6

for seq in (262144,):
    q0 = jnp.asarray(rng.standard_normal((1, 32, hd)), jnp.bfloat16)
    b_k = jnp.asarray(rng.standard_normal((g, hpg, rk, hd)) * 0.1, jnp.bfloat16)
    x_k = jnp.asarray(rng.standard_normal((1, g, seq, rk)), jnp.bfloat16)
    x_v = jnp.asarray(rng.standard_normal((1, g, seq, rv)), jnp.bfloat16)
    kvl = jnp.asarray(seq, jnp.int32)
    sol = g * seq * (rk + rv) * 2 / 819e9 * 1e6
    # dispatch overhead estimate: trivial op round trip
    tiny = jax.jit(lambda x: x + 1)
    t_disp = bench_fn(lambda: tiny(q0))
    print(f"dispatch overhead ~{t_disp:.0f}us", flush=True)
    for hma in (True, False):
        for bs in (1024, 2048):
            t0=time.time()
            us = bench_fn(lambda: palu_flash_decode(
                q0, b_k, x_k, x_v, kvl, block_s=bs, head_major_acc=hma))
            dev = us - t_disp
            print(f"seq={seq} hma={hma} bs={bs}: {us:.0f}us total, "
                  f"~{dev:.0f}us device ({100*sol/dev:.0f}% SoL, SoL={sol:.0f}us) "
                  f"[incl compile {time.time()-t0:.0f}s]", flush=True)
