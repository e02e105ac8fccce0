"""Decompose 64K prefill cost on chip: bare flash-attention kernel, K/V
reconstruct matmuls, quantize+pack write, MLP — to find where the one-shot
prefill's time goes (scratch tool)."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

S = int(os.environ.get("SEQ", 65536))
nh, hd, hidden, inter = 32, 128, 4096, 11008
key = jax.random.PRNGKey(0)

def timeit(name, fn, *args):
    t0 = time.time(); out = fn(*args); jax.tree.leaves(out)[0].block_until_ready()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1]); comp = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        reps.append(time.perf_counter() - t0)
    print(f"{name:24s}: {min(reps)*1e3:9.1f} ms (compile {comp:.0f}s)", flush=True)

from palu_tpu.ops import attention as att
q = jax.random.normal(key, (1, S, nh, hd), jnp.bfloat16)
k = jax.random.normal(key, (1, S, nh, hd), jnp.bfloat16)
v = jax.random.normal(key, (1, S, nh, hd), jnp.bfloat16)
timeit("mha_prefill (flash)", jax.jit(att.mha_prefill), q, k, v)

# K/V reconstruct: (S, 1024) @ (1024, 4096) and (S, 3072) @ (3072, 4096)
latk = jax.random.normal(key, (S, 1024), jnp.bfloat16)
wk = jax.random.normal(key, (1024, hidden), jnp.bfloat16)
latv = jax.random.normal(key, (S, 3072), jnp.bfloat16)
wv = jax.random.normal(key, (3072, hidden), jnp.bfloat16)
timeit("K+V reconstruct", jax.jit(lambda a, b, c, d: (a @ b, c @ d)), latk, wk, latv, wv)

# quantize+pack 4-bit of K+V latents
from palu_tpu.core import quant as qm
from palu_tpu.core.quant import QuantConfig
qc = QuantConfig(bits=4, group_size=0, sym=True)
lk4 = jax.random.normal(key, (1, 8, S, 128), jnp.bfloat16)
lv4 = jax.random.normal(key, (1, 8, S, 384), jnp.bfloat16)
def quantpack(a, b):
    kc, ks, _ = qm.quantize_affine(a, qc)
    vc, vs, _ = qm.quantize_affine(b, qc)
    return qm.pack_codes_t(kc, 4), ks, qm.pack_codes_t(vc, 4), vs
timeit("quantize+pack 4-bit", jax.jit(quantpack), lk4, lv4)

# MLP at S tokens
x = jax.random.normal(key, (1, S, hidden), jnp.bfloat16)
wg = jax.random.normal(key, (hidden, inter), jnp.bfloat16)
wu = jax.random.normal(key, (hidden, inter), jnp.bfloat16)
wd = jax.random.normal(key, (inter, hidden), jnp.bfloat16)
def mlp(x, wg, wu, wd):
    return (jax.nn.silu(x @ wg) * (x @ wu)) @ wd
timeit("MLP", jax.jit(mlp), x, wg, wu, wd)
