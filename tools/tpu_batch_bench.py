"""Concurrent-streams decode bench: how many 64K-context lanes fit on one
chip, and the aggregate tokens/s, palu 4-bit latents vs dense bf16 KV.

The reference's latency protocol is bs=1 (run_latency_attention.py:57-106);
serving throughput per chip is set by how many concurrent contexts the HBM
holds.  At 64K: dense bf16 KV = 1.0 GiB/lane (HBM exhausts above ~14
lanes), palu 4-bit latents = 0.13 GiB/lane.  This tool measures
chained-scan decode TPOT at the headline operating point (32 heads, hd 128,
rank_k 1024, rank_v 3072, gs 4) for a batch grid, reporting aggregate tok/s
per variant; OOM rows are reported as such.

Usage: python tools/tpu_batch_bench.py [bs...]   (default 1 4 8 16)
Env: SEQ (65536, must divide by both blocks), CHAIN (96),
     PALU_BLOCK (2048), DENSE_BLOCK (1024),
     BITS (4; 2 = 2-bit exact packing -- as fast as the nibble variants
     on chip at HALF the bytes, docs/BENCH.md round-4 container table),
     DENSE (1; 0 skips the dense baseline rows)
"""
import functools
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

from palu_tpu.core import quant as qm
from palu_tpu.core.quant import QuantConfig
from palu_tpu.ops.pallas.palu_decode4 import palu_flash_decode4_quantized

seq = int(os.environ.get("SEQ", 65536))
NCH = int(os.environ.get("CHAIN", 96))
PALU_BLOCK = int(os.environ.get("PALU_BLOCK", 2048))
DENSE_BLOCK = int(os.environ.get("DENSE_BLOCK", 1024))
BITS = int(os.environ.get("BITS", 4))
DENSE = os.environ.get("DENSE", "1") == "1"
assert seq % PALU_BLOCK == 0 and seq % DENSE_BLOCK == 0, (
    f"SEQ={seq} must be a multiple of both block sizes "
    f"({PALU_BLOCK}, {DENSE_BLOCK}); a remainder would silently drop the "
    f"sequence tail from the dense baseline")
g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
nh = g * hpg
batches = [int(x) for x in (sys.argv[1:] or ["1", "4", "8", "16"])]


def time_chained(fn, q0, args):
    def chained(q, *a):
        def body(q, _):
            out = fn(q, *a)
            s = (jnp.sum(out) * 1e-12).astype(jnp.bfloat16)
            return q0 + s, ()

        qf, _ = jax.lax.scan(body, q, None, length=NCH)
        return qf

    cj = jax.jit(chained)
    t0 = time.time()
    out = cj(q0, *args)
    _ = np.asarray(out[0, 0, :1])  # fetch forces real completion on axon
    compile_s = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = cj(out, *args)
        _ = np.asarray(out[0, 0, :1])
        reps.append((time.perf_counter() - t0) / NCH)
    return min(reps) * 1e6, compile_s


def run_palu(bs, block_s=PALU_BLOCK):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q0 = jax.random.normal(ks[0], (bs, nh, hd), jnp.bfloat16)
    b_k = jax.random.normal(ks[1], (g, hpg, rk, hd), jnp.bfloat16) * 0.1
    qc = QuantConfig(bits=BITS, group_size=0, sym=True)
    # quantize lane 0 and broadcast: identical bytes per lane, same traffic
    x_k = jax.random.normal(ks[2], (1, g, seq, rk), jnp.bfloat16)
    x_v = jax.random.normal(ks[3], (1, g, seq, rv), jnp.bfloat16)
    kc, kss, _ = qm.quantize_affine(x_k, qc)
    vc, vss, _ = qm.quantize_affine(x_v, qc)
    pk = qm.pack_codes_t(kc, qc.pack_bits)
    pv = qm.pack_codes_t(vc, qc.pack_bits)
    args = (
        b_k,
        jnp.broadcast_to(pk, (bs,) + pk.shape[1:]).copy(),
        jnp.broadcast_to(kss[..., 0], (bs, g, seq)).copy(),
        jnp.broadcast_to(pv, (bs,) + pv.shape[1:]).copy(),
        jnp.broadcast_to(vss[..., 0], (bs, g, seq)).copy(),
        jnp.full((bs,), seq, jnp.int32),
    )
    fn = jax.jit(functools.partial(
        palu_flash_decode4_quantized, qcfg=qc, rk=rk, rv=rv, block_s=block_s))
    return time_chained(fn, q0, args)


def run_dense(bs, chunk=DENSE_BLOCK):
    """Seq-blocked online-softmax decode over a dense bf16 KV cache — the
    same baseline formulation as bench.py's dense step, batched."""
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    q0 = jax.random.normal(ks[0], (bs, nh, hd), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bs, nh, seq, hd), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bs, nh, seq, hd), jnp.bfloat16)

    def fn(q_, kc, vc):
        qf = q_.astype(jnp.float32)[:, :, None, :] / np.sqrt(hd)

        def body(carry, i):
            m, l, acc = carry
            kb = jax.lax.dynamic_slice_in_dim(kc, i * chunk, chunk, 2)
            vb = jax.lax.dynamic_slice_in_dim(vc, i * chunk, chunk, 2)
            lg = jnp.einsum("bhqd,bhcd->bhqc", qf, kb.astype(jnp.float32))
            mn = jnp.maximum(m, lg.max(-1))
            al = jnp.exp(m - mn)
            p = jnp.exp(lg - mn[..., None])
            ln = l * al + p.sum(-1)
            pv = jnp.einsum("bhqc,bhcd->bhqd", p, vb.astype(jnp.float32))
            return (mn, ln, acc * al[..., None] + pv), None

        m0 = jnp.full((bs, nh, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((bs, nh, 1), jnp.float32)
        a0 = jnp.zeros((bs, nh, 1, hd), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0),
                                      jnp.arange(seq // chunk))
        return (acc / l[..., None])[:, :, 0, :]

    return time_chained(jax.jit(fn), q0, (k, v))


gb = 1024**3
print(f"devices: {jax.devices()}  seq={seq} chain={NCH}", flush=True)
for bs in batches:
    variants = [(f"palu{BITS}", run_palu,
                 (rk + rv) * g * BITS / 8 * seq + 2 * g * seq * 4)]
    if DENSE:
        variants.append(("dense", run_dense, 2 * nh * hd * seq * 2))
    for name, runner, bytes_per_lane in variants:
        cache_gb = bs * bytes_per_lane / gb
        try:
            us, compile_s = runner(bs)
            agg = bs / (us * 1e-6)
            print(f"bs={bs:3d} {name}: {us:8.0f} us/step  {agg:8.0f} tok/s "
                  f"(cache {cache_gb:.2f} GB, compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:  # XLA OOM raises RuntimeError/XlaRuntimeError
            msg = str(e).split("\n")[0][:100]
            print(f"bs={bs:3d} {name}: DOES NOT FIT (cache {cache_gb:.2f} GB): "
                  f"{msg}", flush=True)
