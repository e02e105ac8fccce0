"""A/B the v1 vs v2 fused decode kernels on the real chip at the headline
operating point (32 heads, hd 128, rank_k 1024, rank_v 3072, gs 4, 64K).

Usage: python tools/tpu_ab_v2.py [variants...]
  variants: v1 v2 v1q3 v2q3 v1q4 v2q4 v2q2 xla (default: v1 v2 v2q3 v2q4)

Default timing is CHAINED: CHAIN (default 32) kernel invocations linked by
a data dependency inside ONE executable (lax.scan), so host dispatch --
measured at 1.5-2.4 ms/call through the tunnel, i.e. larger than the
kernels themselves -- cancels out entirely.  Set DIRECT=1 for the old
async-dispatch per-call loop (only meaningful above the dispatch floor).
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
from palu_tpu.core.quant import QuantConfig
from palu_tpu.ops.pallas.palu_decode import palu_flash_decode, palu_flash_decode_quantized
from palu_tpu.ops.pallas.archive.palu_decode2 import palu_flash_decode2, palu_flash_decode2_quantized
from palu_tpu.ops.pallas.archive.palu_decode3 import palu_flash_decode3_quantized, sz_pack
from palu_tpu.ops.pallas.palu_decode4 import (
    palu_flash_decode4,
    palu_flash_decode4_quantized,
)
from palu_tpu.ops import attention as att_ops

seq = int(os.environ.get("SEQ", 65536))
kvl_live = int(os.environ.get("KVL", seq))  # live context < seq buffer: tests block skip
block_s = int(os.environ.get("BS", 1024))
g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
nh = g * hpg

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
q0 = jax.random.normal(ks[0], (1, nh, hd), jnp.bfloat16)
b_k = jax.random.normal(ks[1], (g, hpg, rk, hd), jnp.bfloat16) * 0.1
x_k = jax.random.normal(ks[2], (1, g, seq, rk), jnp.bfloat16)
x_v = jax.random.normal(ks[3], (1, g, seq, rv), jnp.bfloat16)
kvl = jnp.full((1,), kvl_live, jnp.int32)

variants = sys.argv[1:] or ["v1", "v2", "v2q3", "v2q4"]
bump = jax.jit(lambda a: a * jnp.bfloat16(1.0001))

sol_bf16 = g * seq * (rk + rv) * 2 / 819e9 * 1e6


def quant_args_v1(bits):
    qc = QuantConfig(bits=bits, group_size=0)
    kc, kss, kb = qm.quantize(x_k, qc)
    vc, vss, vb = qm.quantize(x_v, qc)
    return qc, (qm.pack_codes(kc, bits), kss, kb, qm.pack_codes(vc, bits), vss, vb)


def quant_args_v2(bits):
    qc = QuantConfig(bits=bits, group_size=0)
    kc, kss, kz = qm.quantize_affine(x_k, qc)
    vc, vss, vz = qm.quantize_affine(x_v, qc)
    return qc, (qm.pack_codes_t(kc, bits), kss[..., 0], kz[..., 0],
                qm.pack_codes_t(vc, bits), vss[..., 0], vz[..., 0])


def make_fn(variant):
    if variant == "v1":
        fn = jax.jit(functools.partial(palu_flash_decode, block_s=block_s))
        args = (b_k, x_k, x_v, kvl)
        sol = sol_bf16
    elif variant == "v2":
        fn = jax.jit(functools.partial(palu_flash_decode2, block_s=block_s))
        args = (b_k, x_k, jnp.swapaxes(x_v, 2, 3), kvl)
        sol = sol_bf16
    elif variant.startswith("v1q"):
        bits = int(variant[3:])
        qc, qargs = quant_args_v1(bits)
        fn = jax.jit(functools.partial(
            palu_flash_decode_quantized, qcfg=qc, rk=rk, rv=rv,
            block_s=block_s))
        args = (b_k,) + qargs + (kvl,)
        sol = sol_bf16 * (bits / 16 + 0.02)
    elif variant.startswith("v2q"):
        bits = int(variant[3:])
        qc, qargs = quant_args_v2(bits)
        fn = jax.jit(functools.partial(
            palu_flash_decode2_quantized, qcfg=qc, rk=rk, rv=rv,
            block_s=block_s))
        args = (b_k,) + qargs + (kvl,)
        sol = sol_bf16 * (bits / 16 + 0.02)
    elif variant.startswith("v3q"):
        bits = int(variant[3:])
        qc = QuantConfig(bits=bits, group_size=0)
        kc, kss, kz = qm.quantize_affine(x_k, qc)
        vc, vss, vz = qm.quantize_affine(x_v, qc)
        fn = jax.jit(functools.partial(
            palu_flash_decode3_quantized, qcfg=qc, rk=rk, rv=rv,
            block_s=block_s))
        args = (b_k, qm.pack_codes_t(kc, bits), sz_pack(kss[..., 0], kz[..., 0]),
                qm.pack_codes_t(vc, bits), sz_pack(vss[..., 0], vz[..., 0]), kvl)
        sol = sol_bf16 * (bits / 16 + 0.02)
    elif variant.startswith("v4a"):
        # asym (zero-point) v4: the reference's canonical accuracy config
        bits = int(variant[3:])
        qc = QuantConfig(bits=bits, group_size=0, sym=False)
        kc, kss, kz = qm.quantize_affine(x_k, qc)
        vc, vss, vz = qm.quantize_affine(x_v, qc)
        fn = jax.jit(functools.partial(
            palu_flash_decode4_quantized, qcfg=qc, rk=rk, rv=rv,
            block_s=block_s, seg_sum=os.environ.get("SEG", "") == "1"))
        args = (b_k, qm.pack_codes_t(kc, bits), kss[..., 0],
                qm.pack_codes_t(vc, bits), vss[..., 0], kvl)
        fn = functools.partial(fn, xk_zero=kz[..., 0], xv_zero=vz[..., 0])
        sol = sol_bf16 * (bits / 16 + 0.02)
    elif variant.startswith("v4s"):
        # seg_sum: per-head sublane reduction replaces the 16x-row-padded
        # segment dot
        bits = int(variant[3:])
        qc = QuantConfig(bits=bits, group_size=0, sym=True)
        kc, kss, kz = qm.quantize_affine(x_k, qc)
        vc, vss, vz = qm.quantize_affine(x_v, qc)
        fn = jax.jit(functools.partial(
            palu_flash_decode4_quantized, qcfg=qc, rk=rk, rv=rv,
            block_s=block_s, seg_sum=True))
        args = (b_k, qm.pack_codes_t(kc, bits), kss[..., 0],
                qm.pack_codes_t(vc, bits), vss[..., 0], kvl)
        sol = sol_bf16 * (bits / 16 + 0.02)
    elif variant.startswith("v4g"):
        # per-chunk scales (--lt_group_size > 0): in-VMEM pre-dot dequant;
        # chunk size from env GSZ (default 128)
        bits = int(variant[3:])
        gsz = int(os.environ.get("GSZ", 128))
        qc = QuantConfig(bits=bits, group_size=gsz, sym=True)
        kc, kss, _ = qm.quantize_affine(x_k, qc)
        vc, vss, _ = qm.quantize_affine(x_v, qc)
        fn = jax.jit(functools.partial(
            palu_flash_decode4_quantized, qcfg=qc, rk=rk, rv=rv,
            block_s=block_s))
        args = (b_k, qm.pack_codes_t(kc, bits), jnp.swapaxes(kss, -1, -2),
                qm.pack_codes_t(vc, bits), jnp.swapaxes(vss, -1, -2), kvl)
        sol = sol_bf16 * (bits / 16 + 0.02 * (rk // gsz + 1))
    elif variant.startswith("v4q"):
        # "v4q4r" = bf16 in-kernel rotation (rot_dtype); "v4q4" = fp32
        rot = jnp.bfloat16 if variant.endswith("r") else jnp.float32
        bits = int(variant.rstrip("r")[3:])
        qc = QuantConfig(bits=bits, group_size=0, sym=True)
        kc, kss, kz = qm.quantize_affine(x_k, qc)
        vc, vss, vz = qm.quantize_affine(x_v, qc)
        fn = jax.jit(functools.partial(
            palu_flash_decode4_quantized, qcfg=qc, rk=rk, rv=rv,
            block_s=block_s, rot_dtype=rot))
        args = (b_k, qm.pack_codes_t(kc, bits), kss[..., 0],
                qm.pack_codes_t(vc, bits), vss[..., 0], kvl)
        sol = sol_bf16 * (bits / 16 + 0.02)
    elif variant == "v4":
        fn = jax.jit(functools.partial(
            palu_flash_decode4, rk=rk, rv=rv, block_s=block_s,
            seg_sum=os.environ.get("SEG", "") == "1"))
        args = (b_k, jnp.swapaxes(x_k, 2, 3), jnp.swapaxes(x_v, 2, 3), kvl)
        sol = sol_bf16
    elif variant == "xla":
        # pure-XLA lax.scan flash decode over the latent cache (the dense
        # baseline at its own SoL is also XLA-scan -- does XLA pipeline
        # the streaming better than the pallas grid?)
        chunk = block_s

        def xla_fn(q_, b_k_, x_k_, x_v_, kvl_):
            return att_ops.flash_decode_latent(
                q_,
                lambda i: jax.lax.dynamic_slice_in_dim(x_k_, i * chunk, chunk, 2),
                lambda i: jax.lax.dynamic_slice_in_dim(x_v_, i * chunk, chunk, 2),
                b_k_, seq // chunk, chunk, kvl_, hd, 10000.0, rv, None)

        fn = jax.jit(xla_fn)
        args = (b_k, x_k, x_v, kvl)
        sol = sol_bf16
    else:
        raise SystemExit(f"unknown variant {variant}")
    return fn, args, sol


NCH = int(os.environ.get("CHAIN", 32))
direct = os.environ.get("DIRECT", "") == "1"


def time_direct(fn, args):
    t0 = time.time()
    out = fn(q0, *args)
    _ = np.asarray(out[0, 0, :1])
    compile_s = time.time() - t0
    # async-dispatch N executions, one fetch (amortizes ~30ms tunnel RTT)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(NCH):
            out = fn(q0, *args)
        _ = np.asarray(out[0, 0, :1])
        reps.append((time.perf_counter() - t0) / NCH)
    return min(reps) * 1e6, compile_s


def time_chained(fn, args):
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

    # multi-call differencing: the tunnel costs ~38-44 ms fixed
    # dispatch+fetch per call; (t_k - t_1)/((k-1)*NCH) cancels it exactly
    # (back-to-back calls pipeline via async dispatch)
    def timed(ncalls):
        nonlocal out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(ncalls):
                out = cj(out, *args)
            _ = np.asarray(out[0, 0, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tk = timed(4)
    return (tk - t1) / (3 * NCH) * 1e6, compile_s


print(f"devices: {jax.devices()}  seq={seq} block_s={block_s} chain={0 if direct else NCH} "
      f"bf16-SoL={sol_bf16:.0f}us", flush=True)
for variant in variants:
    fn, args, sol = make_fn(variant)
    us, compile_s = (time_direct if direct else time_chained)(fn, args)
    print(f"{variant:5s}: {us:7.0f} us ({100*sol/us:3.0f}% SoL~{sol:.0f}us), "
          f"compile {compile_s:.0f}s", flush=True)
