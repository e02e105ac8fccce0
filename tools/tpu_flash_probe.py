"""Probe flash-attention variants at 64K on chip: stock kernel block sizes,
splash attention, and a raw matmul to calibrate the MXU rate (scratch)."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

S = int(os.environ.get("SEQ", 65536))
nh, hd = 32, 128
key = jax.random.PRNGKey(0)
print("devices:", jax.devices(), flush=True)

def timeit(name, fn, *args, reps=3):
    t0 = time.time(); out = fn(*args); jax.tree.leaves(out)[0].block_until_ready()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1]); comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s}: {min(ts)*1e3:9.1f} ms (compile {comp:.0f}s)", flush=True)
    return min(ts)

# MXU calibration: 8192^3 matmul = 1.1 TFLOP
a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
bm = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
t = timeit("matmul 8192^3", jax.jit(lambda a, b: a @ b), a, bm)
print(f"  -> {2*8192**3/t/1e12:.0f} TFLOP/s", flush=True)

q = jax.random.normal(key, (1, nh, S, hd), jnp.bfloat16)
k = jax.random.normal(key, (1, nh, S, hd), jnp.bfloat16)
v = jax.random.normal(key, (1, nh, S, hd), jnp.bfloat16)
flops = S * S / 2 * nh * hd * 4  # causal QK + PV

from jax.experimental.pallas.ops.tpu.flash_attention import (
    flash_attention, BlockSizes)

t = timeit("flash default blocks", jax.jit(functools.partial(
    flash_attention, causal=True, sm_scale=1.0/np.sqrt(hd))), q, k, v)
print(f"  -> {flops/t/1e12:.0f} TFLOP/s eff", flush=True)

for bq, bk in [(512, 512), (256, 1024)]:
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_q_dkv=bq,
        block_k_dkv=bk, block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
    )
    t = timeit(f"flash bq={bq} bk={bk}", jax.jit(functools.partial(
        flash_attention, causal=True, sm_scale=1.0/np.sqrt(hd),
        block_sizes=bs)), q, k, v)
    print(f"  -> {flops/t/1e12:.0f} TFLOP/s eff", flush=True)

try:
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )
    def splash(q, k, v):
        mask = sm.MultiHeadMask(
            [sm.CausalMask((S, S)) for _ in range(nh)])
        kernel = sk.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1)
        return jax.vmap(kernel)(q * (1.0/np.sqrt(hd)), k, v)
    t = timeit("splash causal", jax.jit(splash), q, k, v)
    print(f"  -> {flops/t/1e12:.0f} TFLOP/s eff", flush=True)
except Exception as e:
    print("splash failed:", repr(e), flush=True)
