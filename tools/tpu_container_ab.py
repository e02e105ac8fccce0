"""A/B the v4 quantized decode kernel's CONTAINER storage at the engine's
operating point (3-bit sym, 64K, block 2048, seg_sum, fold_qoff): exact
3-bit two-plane packing vs 3-bit codes in 4-bit nibbles, with the plain
4-bit kernel as the expected-speed reference (same unpack geometry).

The round-4 trace decomposition (docs/BENCH.md) pins the 3-bit kernel at
~700 us/layer, VPU-bound on the ~6-op/value two-plane unpack; the nibble
container halves that to one shift+mask per value for 4/3x cache reads.

Usage: python tools/tpu_container_ab.py
Env: SEQ=65536 BS=2048 L=32 CHAIN=32 K=3
"""
import sys, os, time, json
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

SEQ = int(os.environ.get("SEQ", 65536))
BS = int(os.environ.get("BS", 2048))
CHAIN = int(os.environ.get("CHAIN", 32))
K = int(os.environ.get("K", 3))
g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
nh = g * hpg
s_max = (SEQ + BS - 1) // BS * BS

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
q0 = jax.random.normal(ks[0], (1, nh, hd), jnp.bfloat16)
b_k = jax.random.normal(ks[1], (g, hpg, rk, hd), jnp.bfloat16) * 0.1
kvl = jnp.full((1,), SEQ, jnp.int32)


def seed(qc):
    @jax.jit
    def _seed(key):
        k1, k2 = jax.random.split(key)

        def enc(k, r):
            lat = jax.random.normal(k, (1, g, s_max, r), jnp.float32)
            c, s, _ = qm.quantize_affine(lat, qc)
            return qm.pack_codes_t(c, qc.pack_bits), s[..., 0]

        kc, kss = enc(k1, rk)
        vc, vs = enc(k2, rv)
        return kc, kss, vc, vs

    out = _seed(key)
    jax.block_until_ready(out)
    return out


def chained(fn):
    def run(q, *a):
        def body(q, i):
            o = fn(q, i, *a)
            return q + o[:, :, 0:hd].astype(jnp.bfloat16) * jnp.bfloat16(1e-6), None
        q, _ = jax.lax.scan(body, q, jnp.arange(CHAIN))
        return q
    return jax.jit(run)


def timeit(run, args):
    t0 = time.time()
    out = run(q0, *args)
    _ = np.asarray(out[0, 0, :1])
    compile_s = time.time() - t0

    def t(ncalls):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _i in range(ncalls):
                o = run(q0, *args)
            _ = np.asarray(o[0, 0, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = t(1), t(K)
    us = (tk - t1) / ((K - 1) * CHAIN) * 1e6
    return us, compile_s


def main():
    results = {}
    for label, qc in [
        ("3bit-exact", QuantConfig(bits=3, group_size=0, sym=True)),
        ("3bit-in-4", QuantConfig(bits=3, group_size=0, sym=True, container=4)),
        ("4bit", QuantConfig(bits=4, group_size=0, sym=True)),
        ("2bit", QuantConfig(bits=2, group_size=0, sym=True)),
        ("2bit-in-4", QuantConfig(bits=2, group_size=0, sym=True, container=4)),
    ]:
        bufs = seed(qc)

        def call(q, i, kc, kss, vc, vs, qc=qc):
            return palu_flash_decode4_quantized(
                q, b_k, kc, kss, vc, vs, kvl, qcfg=qc, rk=rk, rv=rv,
                block_s=BS)

        us, cs = timeit(chained(call), bufs)
        nbytes = sum(int(np.prod(b.shape)) * b.dtype.itemsize for b in bufs)
        print(f"# {label:11s}: {us:8.1f} us/call  cache {nbytes/1e6:6.1f} MB"
              f"  (compile {cs:.0f}s)", flush=True)
        results[label] = {"us": us, "cache_mb": nbytes / 1e6}
    print(json.dumps({"results": results, "seq": SEQ, "bs": BS,
                      "chain": CHAIN}))


if __name__ == "__main__":
    main()
