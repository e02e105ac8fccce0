"""Dissect bench.py's quantized decode STEP into its components on-chip.

The 3-bit step is 1.165 ms while the standalone kernel converges at
~860 us; this times each component in its own chained executable to find
where the other ~300 us live:

  proj    -- x @ wq, x @ vt_k, x @ vt_v (+ rope on q)
  projcat -- same math with one concatenated [wq|vt_k|vt_v] GEMV
  qpack   -- quantize_affine + pack_codes_t of the new latent column
             + 4x dynamic_update_slice into the (donated) cache buffers
  kernel  -- palu_flash_decode4_quantized at the bench operating point
  oproj   -- (1, nh*rv) @ wo_fused

Usage: python tools/tpu_step_dissect.py [bits] [chain]
"""
import sys, os, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from palu_tpu.core import quant as qm
from palu_tpu.core.quant import QuantConfig, packed_nrows
from palu_tpu.ops.pallas.palu_decode4 import palu_flash_decode4_quantized

bits = int(sys.argv[1]) if len(sys.argv) > 1 else 3
NCH = int(sys.argv[2]) if len(sys.argv) > 2 else 96
seq = 65536
block_s = 1024 if bits == 3 else 2048
num_heads, head_dim, gsz = 32, 128, 4
g = num_heads // gsz
rk, rv = 1024 // g, 3072 // g
hidden = num_heads * head_dim
s_max = (seq + 256 + 2048) // 2048 * 2048
qcfg = QuantConfig(bits=bits, group_size=0, sym=True)

rng = np.random.default_rng(0)
bf = jnp.bfloat16
x0 = jnp.asarray(rng.standard_normal((1, hidden)) * 0.1, bf)
wq = jnp.asarray(rng.standard_normal((hidden, hidden)) * 0.02, bf)
vt_k = jnp.asarray(rng.standard_normal((hidden, g * rk)) * 0.02, bf)
vt_v = jnp.asarray(rng.standard_normal((hidden, g * rv)) * 0.02, bf)
wcat = jnp.concatenate([wq, vt_k, vt_v], axis=1)
b_k = jnp.asarray(rng.standard_normal((g, gsz, rk, head_dim)) * 0.05, bf)
wo = jnp.asarray(rng.standard_normal((num_heads * rv, hidden)) * 0.02, bf)
kc0 = jnp.zeros((1, g, packed_nrows(rk, bits), s_max), jnp.uint8)
ks0 = jnp.zeros((1, g, s_max), jnp.float32)
vc0 = jnp.zeros((1, g, packed_nrows(rv, bits), s_max), jnp.uint8)
vs0 = jnp.zeros((1, g, s_max), jnp.float32)
kvl = jnp.asarray(seq, jnp.int32)
q0 = jnp.asarray(rng.standard_normal((1, num_heads, head_dim)), bf)
av0 = jnp.asarray(rng.standard_normal((1, num_heads, rv)), jnp.float32)


def rope_q(q, pos):
    halfd = head_dim // 2
    inv = 1.0 / (10000.0 ** (jnp.arange(halfd, dtype=jnp.float32) * 2 / head_dim))
    f = pos.astype(jnp.float32) * inv
    cos2 = jnp.concatenate([jnp.cos(f), jnp.cos(f)])[None, None, :]
    sin2 = jnp.concatenate([jnp.sin(f), jnp.sin(f)])[None, None, :]
    qf = q.astype(jnp.float32)
    rot = jnp.concatenate([-qf[..., halfd:], qf[..., :halfd]], axis=-1)
    return (qf * cos2 + rot * sin2).astype(bf)


def proj(x, pos):
    q = rope_q((x @ wq).reshape(1, num_heads, head_dim), pos)
    lat_k = (x @ vt_k).reshape(1, g, 1, rk)
    lat_v = (x @ vt_v).reshape(1, g, 1, rv)
    return q, lat_k, lat_v


def projcat(x, pos):
    y = x @ wcat
    q = rope_q(y[:, :hidden].reshape(1, num_heads, head_dim), pos)
    lat_k = y[:, hidden : hidden + g * rk].reshape(1, g, 1, rk)
    lat_v = y[:, hidden + g * rk :].reshape(1, g, 1, rv)
    return q, lat_k, lat_v


def qpack(lat_k, lat_v, kc, ks, vc, vs, pos):
    ck, sk_, _ = qm.quantize_affine(lat_k, qcfg)
    cv, sv_, _ = qm.quantize_affine(lat_v, qcfg)
    kc = jax.lax.dynamic_update_slice(kc, qm.pack_codes_t(ck, bits), (0, 0, 0, pos))
    ks = jax.lax.dynamic_update_slice(ks, sk_[..., 0], (0, 0, pos))
    vc = jax.lax.dynamic_update_slice(vc, qm.pack_codes_t(cv, bits), (0, 0, 0, pos))
    vs = jax.lax.dynamic_update_slice(vs, sv_[..., 0], (0, 0, pos))
    return kc, ks, vc, vs


def timeit(name, make_chained, *args, donate=()):
    cj = jax.jit(make_chained, donate_argnums=donate)
    t0 = time.time()
    out = cj(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = cj(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:8s}: {best / NCH * 1e6:7.1f} us/call (compile {compile_s:.0f}s)",
          flush=True)


# --- proj / projcat ---
def mk_proj(fn):
    def chained(x):
        def body(c, i):
            q, lk, lv = fn(c, kvl + i)
            nxt = x0 + 0.001 * (q.reshape(1, -1)[:, :hidden]
                                + lk.reshape(1, -1)[:, :1]).astype(bf)
            return nxt, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(NCH))
        return c
    return chained


timeit("proj", mk_proj(proj), x0)
timeit("projcat", mk_proj(projcat), x0)


# --- qpack ---
def qpack_chained(lk0, lv0, kc, ks, vc, vs):
    def body(carry, i):
        kc, ks, vc, vs = carry
        out = qpack(lk0 * (1.0 + 1e-6 * i), lv0, kc, ks, vc, vs, kvl + i)
        return out, ()
    carry, _ = jax.lax.scan(body, (kc, ks, vc, vs), jnp.arange(NCH))
    return carry


lk0 = jnp.asarray(rng.standard_normal((1, g, 1, rk)), bf)
lv0 = jnp.asarray(rng.standard_normal((1, g, 1, rv)), bf)
timeit("qpack", qpack_chained, lk0, lv0, kc0, ks0, vc0, vs0,
       donate=(2, 3, 4, 5))

# --- kernel ---
kc = jnp.asarray(rng.integers(0, 255, kc0.shape), jnp.uint8)
vc = jnp.asarray(rng.integers(0, 255, vc0.shape), jnp.uint8)
ks = jnp.asarray(rng.random(ks0.shape) * 0.1 + 0.01, jnp.float32)
vs = jnp.asarray(rng.random(vs0.shape) * 0.1 + 0.01, jnp.float32)


def kernel_chained(q, kc, ks, vc, vs):
    def body(c, _):
        out = palu_flash_decode4_quantized(
            c, b_k, kc, ks, vc, vs, kvl, qcfg=qcfg, rk=rk, rv=rv,
            block_s=block_s)
        nxt = q * (1.0 + 1e-6 * jnp.mean(out).astype(bf))
        return nxt, ()
    c, _ = jax.lax.scan(body, q, jnp.arange(NCH))
    return c


timeit("kernel", kernel_chained, q0, kc, ks, vc, vs)


# --- oproj ---
def oproj_chained(av):
    def body(c, _):
        y = c.astype(bf).reshape(1, num_heads * rv) @ wo
        nxt = av * (1.0 + 1e-6 * jnp.mean(y).astype(jnp.float32))
        return nxt, ()
    c, _ = jax.lax.scan(body, av, jnp.arange(NCH))
    return c


timeit("oproj", oproj_chained, av0)
