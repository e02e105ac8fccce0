"""A/B the round-5 v4-kernel FORMULATION knobs at the engine's operating
point (3-bit sym codes in a 4-bit nibble container, 64K, block 2048,
seg_sum, fold_qoff):

  base        : round-4 production config (the ~614 us/layer floor,
                docs/BENCH.md round-4 container table)
  vbyte       : V path dots the raw container bytes + one hi plane,
                lo outputs recovered at finalize (exact; half the V-side
                per-value unpack VPU work)
  int8        : K reconstruct dots on the int8 MXU path (2x rate over the
                ~350 us/layer of bf16 reconstruct MACs)
  int8+vbyte  : both

The container A/B proved storage width no longer matters below ~620 us;
these knobs attack the per-value op count and the MXU dot rate, the two
costs that remain.

Usage: python tools/tpu_formulation_ab.py
Env: SEQ=65536 BS=2048 CHAIN=32 K=3 BITS=3 CONTAINER=4
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
from palu_tpu.core.quant import QuantConfig
from palu_tpu.ops.pallas.palu_decode4 import palu_flash_decode4_quantized

SEQ = int(os.environ.get("SEQ", 65536))
BS = int(os.environ.get("BS", 2048))
CHAIN = int(os.environ.get("CHAIN", 32))
K = int(os.environ.get("K", 3))
BITS = int(os.environ.get("BITS", 3))
CONTAINER = int(os.environ.get("CONTAINER", 4))
g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
nh = g * hpg
s_max = (SEQ + BS - 1) // BS * BS

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
q0 = jax.random.normal(ks[0], (1, nh, hd), jnp.bfloat16)
b_k = jax.random.normal(ks[1], (g, hpg, rk, hd), jnp.bfloat16) * 0.1
kvl = jnp.full((1,), SEQ, jnp.int32)
qc = QuantConfig(bits=BITS, group_size=0, sym=True, container=CONTAINER)


def seed():
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
    bufs = seed()
    results = {}
    ref = None
    import ast
    extra = ast.literal_eval(os.environ.get("VARIANTS", "0")) if \
        os.environ.get("VARIANTS") else None
    variants = [
        ("base", {}),
        ("vbyte", dict(v_byte_dot=True)),
        ("int8", dict(int8_dots=True)),
        ("int8+vbyte", dict(int8_dots=True, v_byte_dot=True)),
        ("fuse_uv", dict(fuse_uv=True)),
        ("fuse_uv+vbyte", dict(fuse_uv=True, v_byte_dot=True)),
        ("int8_rot", dict(int8_rot=True)),
        ("int8_rot+vbyte", dict(int8_rot=True, v_byte_dot=True)),
    ]
    if extra is not None:
        variants = [v for v in variants if v[0] in extra]
    for label, kw in variants:
        def call(q, i, kc, kss, vc, vs, kw=kw):
            return palu_flash_decode4_quantized(
                q, b_k, kc, kss, vc, vs, kvl, qcfg=qc, rk=rk, rv=rv,
                block_s=BS, **kw)

        try:
            us, cs = timeit(chained(call), bufs)
        except Exception as e:  # a knob that fails to compile is a result
            print(f"# {label:11s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            results[label] = {"error": str(e)[:400]}
            continue
        # single uncained call for numerics vs base
        out = np.asarray(
            jax.jit(lambda q, kc, kss, vc, vs: call(q, 0, kc, kss, vc, vs))(
                q0, *bufs), np.float32)
        if label == "base":
            ref = out
            err = 0.0
        elif ref is None:  # base failed or filtered out: no error column
            err = float("nan")
        else:
            err = float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9))
        print(f"# {label:11s}: {us:8.1f} us/call  rel_err_vs_base {err:.2e}"
              f"  (compile {cs:.0f}s)", flush=True)
        results[label] = {"us": us, "rel_err": err}
    print(json.dumps({"results": results, "seq": SEQ, "bs": BS,
                      "chain": CHAIN, "bits": BITS, "container": CONTAINER}))


if __name__ == "__main__":
    main()
