"""A/B the v4 quantized decode kernel: per-layer buffers vs layer-stacked
(L, ...) buffers with the scalar-prefetched layer index, at the engine's
operating point (3-bit sym, 64K, block 2048, seg_sum). Diagnoses the
engine-bench gap (stacked 41.2 ms vs unrolled 35.3 ms/step at 32L): if the
stacked KERNEL itself is slower (e.g. the prefetched-scalar index map
inhibiting DMA double-buffering), it shows up here; if not, the overhead
is in the scan body around it.

Usage: python tools/tpu_stacked_kernel_ab.py
Env: SEQ=65536 BS=2048 BITS=3 L=32 CHAIN=32 K=3
"""
import sys, os, time, functools, json
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
BITS = int(os.environ.get("BITS", 3))
L = int(os.environ.get("L", 32))
CHAIN = int(os.environ.get("CHAIN", 32))
K = int(os.environ.get("K", 3))
g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
nh = g * hpg
qc = QuantConfig(bits=BITS, group_size=0, sym=True)
s_max = (SEQ + BS - 1) // BS * BS

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
q0 = jax.random.normal(ks[0], (1, nh, hd), jnp.bfloat16)
b_k = jax.random.normal(ks[1], (g, hpg, rk, hd), jnp.bfloat16) * 0.1
kvl = jnp.full((1,), SEQ, jnp.int32)


@jax.jit
def seed(key):
    k1, k2 = jax.random.split(key)

    def enc(k, r, nr):
        lat = jax.random.normal(k, (1, g, s_max, r), jnp.float32)
        c, s, _ = qm.quantize_affine(lat, qc)
        return qm.pack_codes_t(c, BITS), s[..., 0]

    kc, kss = enc(k1, rk, packed_nrows(rk, BITS))
    vc, vs = enc(k2, rv, packed_nrows(rv, BITS))
    return kc, kss, vc, vs


def stacked_bufs(bufs):
    # broadcast one layer's content to (L, ...): timing only needs shapes
    out = tuple(
        jnp.asarray(jnp.broadcast_to(a, (L,) + a.shape)) for a in bufs
    )
    jax.block_until_ready(out)
    return out


def chained(fn):
    def run(q, *a):
        def body(q, i):
            o = fn(q, i, *a)  # (1, nh, rv)
            # data dependency chains the calls without changing q materially
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
    base = seed(key)
    jax.block_until_ready(base)
    kc, kss, vc, vs = base

    def per_layer(q, i, kc, kss, vc, vs):
        return palu_flash_decode4_quantized(
            q, b_k, kc, kss, vc, vs, kvl, qcfg=qc, rk=rk, rv=rv,
            block_s=BS)

    us, cs = timeit(chained(per_layer), base)
    print(f"# per-layer      : {us:8.1f} us/call (compile {cs:.0f}s)", flush=True)

    st = stacked_bufs(base)

    def stacked_cycle(q, i, kc, kss, vc, vs):
        return palu_flash_decode4_quantized(
            q, b_k, kc, kss, vc, vs, kvl, qcfg=qc, rk=rk, rv=rv,
            block_s=BS, layer_idx=i % L)

    us2, cs2 = timeit(chained(stacked_cycle), st)
    print(f"# stacked cycle  : {us2:8.1f} us/call (compile {cs2:.0f}s)", flush=True)

    def stacked_fixed(q, i, kc, kss, vc, vs):
        return palu_flash_decode4_quantized(
            q, b_k, kc, kss, vc, vs, kvl, qcfg=qc, rk=rk, rv=rv,
            block_s=BS, layer_idx=jnp.int32(0) * i)

    us3, cs3 = timeit(chained(stacked_fixed), st)
    print(f"# stacked fixed 0: {us3:8.1f} us/call (compile {cs3:.0f}s)", flush=True)

    def per_layer_fold(q, i, kc, kss, vc, vs):
        return palu_flash_decode4_quantized(
            q, b_k, kc, kss, vc, vs, kvl, qcfg=qc, rk=rk, rv=rv,
            block_s=BS, fold_qoff=True)

    us4, cs4 = timeit(chained(per_layer_fold), base)
    print(f"# fold_qoff      : {us4:8.1f} us/call (compile {cs4:.0f}s)", flush=True)

    def per_layer_rot16(q, i, kc, kss, vc, vs):
        return palu_flash_decode4_quantized(
            q, b_k, kc, kss, vc, vs, kvl, qcfg=qc, rk=rk, rv=rv,
            block_s=BS, rot_dtype=jnp.bfloat16)

    us5, cs5 = timeit(chained(per_layer_rot16), base)
    print(f"# rot bf16       : {us5:8.1f} us/call (compile {cs5:.0f}s)", flush=True)

    def per_layer_both(q, i, kc, kss, vc, vs):
        return palu_flash_decode4_quantized(
            q, b_k, kc, kss, vc, vs, kvl, qcfg=qc, rk=rk, rv=rv,
            block_s=BS, fold_qoff=True, rot_dtype=jnp.bfloat16)

    us6, cs6 = timeit(chained(per_layer_both), base)
    print(f"# fold+rot16     : {us6:8.1f} us/call (compile {cs6:.0f}s)", flush=True)
    print(json.dumps({"per_layer_us": us, "stacked_cycle_us": us2,
                      "stacked_fixed_us": us3, "fold_qoff_us": us4,
                      "rot_bf16_us": us5, "fold_rot16_us": us6,
                      "seq": SEQ, "bs": BS, "bits": BITS, "L": L}))


if __name__ == "__main__":
    main()
