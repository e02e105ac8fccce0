"""Measure the isolated cost of sub-byte dequant strategies inside a Pallas
grid at the headline operating point (g=8, rk=128, rv=384, seq 64K,
block_s 1024), with carry-threaded chained timing (NCH env, default 64).

The converged A/B (CHAIN=256) shows v1q4 = 1838us vs bf16 v1 = 1180us and
pure streaming = 839us: the quantized kernels pay ~1.3ms of VPU work to
touch 268M values. Physics says extraction should cost ~2-3 ops/value;
suspects are the sublane concatenate (physical relayout) and the
LHS-transposed dot_general (another relayout) in _unpack_rank_major users.

Variants (all stream the REAL packed byte volume for K+V except conv8):
  base       -- stream packed codes, no extraction (DMA+grid floor)
  ext4cc     -- v2's current 4-bit: extract, CONCAT sublane-wise, convert
  ext4nc     -- extract, NO concat: per-part convert + per-part reduce
  ext4mm     -- extract, no concat, per-part MATMUL vs sliced stationary B
                (the real K+V path shape: (rk_sub,BS)^T@(rk_sub,W) etc.)
  ext4ccmm   -- v2's current full path: concat + transposed dot (K) +
                natural dot (V)
  ext3cc     -- v2's current 3-bit (8x bitplane assembly + concat)
  ext3nc     -- 3-bit, no concat, per-part reduce
  conv8      -- int8 codes (no sub-byte): pure convert cost, 2x bytes

Usage: python tools/tpu_unpack_probe.py [variants...]
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

seq = int(os.environ.get("SEQ", 65536))
BS = int(os.environ.get("BS", 1024))
NCH = int(os.environ.get("NCH", 64))
g, rk, rv, hd = 8, 128, 384, 128
W = hd // 2

key = jax.random.PRNGKey(0)
# rank-major packed codes, (g, packed_rows, S): 4-bit -> rank/2 rows
pk4 = jax.random.randint(key, (g, rk // 2, seq), 0, 255, jnp.uint8)
pv4 = jax.random.randint(key, (g, rv // 2, seq), 0, 255, jnp.uint8)
pk3 = jax.random.randint(key, (g, 3 * rk // 8, seq), 0, 255, jnp.uint8)
pv3 = jax.random.randint(key, (g, 3 * rv // 8, seq), 0, 255, jnp.uint8)
ck8 = jax.random.randint(key, (g, rk, seq), -127, 127, jnp.int8)
cv8 = jax.random.randint(key, (g, rv, seq), -127, 127, jnp.int8)
b1 = jax.random.normal(key, (g, rk, W), jnp.bfloat16) * 0.1
bv = jax.random.normal(key, (g, BS, 8), jnp.bfloat16) * 0.1  # stand-in p


def _mk(kernel_body, args, specs):
    def fn(c, *a):
        return pl.pallas_call(
            kernel_body,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            grid=(seq // BS,),
            in_specs=[pl.BlockSpec((8, 128), lambda si: (0, 0))] + specs,
            out_specs=pl.BlockSpec((8, 128), lambda si: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(c, *a)
    return fn, args


def spec4(rows):
    return pl.BlockSpec((g, rows, BS), lambda si: (0, 0, si))


def _frame(c_ref, out_ref, acc, contrib):
    sblk = pl.program_id(0)

    @pl.when(sblk == 0)
    def _i():
        acc[...] = c_ref[...]

    acc[...] = acc[...] + contrib

    @pl.when(sblk == pl.num_programs(0) - 1)
    def _f():
        out_ref[...] = acc[...]


def unpack4_parts(ref, gi):
    c = ref[gi].astype(jnp.int32)  # (rows, BS)
    return [(c & 15), ((c >> 4) & 15)]


def unpack3_parts(ref, gi, rank):
    c = ref[gi].astype(jnp.int32)
    r = rank // 8
    b0, b1_, b2 = c[0 * r: 1 * r], c[1 * r: 2 * r], c[2 * r: 3 * r]
    return [(((b0 >> k) & 1) | (((b1_ >> k) & 1) << 1) | (((b2 >> k) & 1) << 2))
            for k in range(8)]


def make(variant):
    if variant == "base":
        def body(c_ref, kref, vref, out_ref, acc):
            s = (kref[0][0:8, 0:128].astype(jnp.int32)
                 + vref[0][0:8, 0:128].astype(jnp.int32)).astype(jnp.float32)
            _frame(c_ref, out_ref, acc, s * 1e-20)
        return _mk(body, [pk4, pv4], [spec4(rk // 2), spec4(rv // 2)])

    if variant in ("ext4cc", "ext4nc"):
        cc = variant == "ext4cc"

        def body(c_ref, kref, vref, out_ref, acc):
            s = jnp.zeros((8, 128), jnp.float32)
            for ref, rows in ((kref, rk), (vref, rv)):
                for gi in range(g):
                    parts = unpack4_parts(ref, gi)
                    if cc:
                        u = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
                        s = s + jnp.sum(u.astype(jnp.float32), axis=0,
                                        keepdims=True)[:, 0:128] * 1e-20
                    else:
                        for p in parts:
                            u = p.astype(jnp.bfloat16)
                            s = s + jnp.sum(u.astype(jnp.float32), axis=0,
                                            keepdims=True)[:, 0:128] * 1e-20
            _frame(c_ref, out_ref, acc, s)
        return _mk(body, [pk4, pv4], [spec4(rk // 2), spec4(rv // 2)])

    if variant == "ext4mm":
        def body(c_ref, kref, vref, b1ref, pref, out_ref, acc):
            s = jnp.zeros((8, 128), jnp.float32)
            for gi in range(g):
                # K path: sum_k part_k(rows,BS) contracted with B rows
                parts = unpack4_parts(kref, gi)
                xb = jnp.zeros((BS, W), jnp.float32)
                for k, p in enumerate(parts):
                    bslice = b1ref[gi][k * (rk // 2):(k + 1) * (rk // 2), :]
                    xb = xb + jax.lax.dot_general(
                        p.astype(jnp.bfloat16), bslice.astype(jnp.bfloat16),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                s = s + jnp.sum(xb[0:8, :], axis=1, keepdims=True) * 1e-20
                # V path: natural (rows,BS)@(BS,hpg) per part
                partsv = unpack4_parts(vref, gi)
                pg = pref[gi].astype(jnp.bfloat16)
                for k, p in enumerate(partsv):
                    out = jnp.dot(p.astype(jnp.bfloat16), pg,
                                  preferred_element_type=jnp.float32)
                    s = s + jnp.sum(out[0:8, :], axis=1,
                                    keepdims=True) * 1e-20
            _frame(c_ref, out_ref, acc, s)
        return _mk(body, [pk4, pv4, b1, bv],
                   [spec4(rk // 2), spec4(rv // 2),
                    pl.BlockSpec((g, rk, W), lambda si: (0, 0, 0)),
                    pl.BlockSpec((g, BS, 8), lambda si: (0, 0, 0))])

    if variant == "ext4ccmm":
        def body(c_ref, kref, vref, b1ref, pref, out_ref, acc):
            s = jnp.zeros((8, 128), jnp.float32)
            for gi in range(g):
                ck = jnp.concatenate(unpack4_parts(kref, gi), axis=0
                                     ).astype(jnp.bfloat16)
                xb = jax.lax.dot_general(
                    ck, b1ref[gi].astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (BS, W)
                s = s + jnp.sum(xb[0:8, :], axis=1, keepdims=True) * 1e-20
                cv = jnp.concatenate(unpack4_parts(vref, gi), axis=0
                                     ).astype(jnp.bfloat16)
                pv = jnp.dot(cv, pref[gi].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                s = s + pv[0:8, 0:8].sum() * 1e-20
            _frame(c_ref, out_ref, acc, s)
        return _mk(body, [pk4, pv4, b1, bv],
                   [spec4(rk // 2), spec4(rv // 2),
                    pl.BlockSpec((g, rk, W), lambda si: (0, 0, 0)),
                    pl.BlockSpec((g, BS, 8), lambda si: (0, 0, 0))])

    if variant in ("ext3cc", "ext3nc"):
        cc = variant == "ext3cc"

        def body(c_ref, kref, vref, out_ref, acc):
            s = jnp.zeros((8, 128), jnp.float32)
            for ref, rank in ((kref, rk), (vref, rv)):
                for gi in range(g):
                    parts = unpack3_parts(ref, gi, rank)
                    if cc:
                        u = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
                        s = s + jnp.sum(u.astype(jnp.float32), axis=0,
                                        keepdims=True)[:, 0:128] * 1e-20
                    else:
                        for p in parts:
                            u = p.astype(jnp.bfloat16)
                            s = s + jnp.sum(u.astype(jnp.float32), axis=0,
                                            keepdims=True)[:, 0:128] * 1e-20
            _frame(c_ref, out_ref, acc, s)
        return _mk(body, [pk3, pv3], [spec4(3 * rk // 8), spec4(3 * rv // 8)])

    if variant == "conv8":
        def body(c_ref, kref, vref, out_ref, acc):
            s = jnp.zeros((8, 128), jnp.float32)
            for ref in (kref, vref):
                for gi in range(g):
                    u = ref[gi].astype(jnp.int32).astype(jnp.bfloat16)
                    s = s + jnp.sum(u.astype(jnp.float32), axis=0,
                                    keepdims=True)[:, 0:128] * 1e-20
            _frame(c_ref, out_ref, acc, s)
        return _mk(body, [ck8, cv8], [spec4(rk), spec4(rv)])

    raise SystemExit(f"unknown variant {variant}")


def run(name, fn, args):
    def chained(seed, *a):
        def body(c, _):
            out = fn(c, *a)
            return out * 1e-20 + seed * 0.5, ()
        c, _ = jax.lax.scan(body, seed, None, length=NCH)
        return c

    cj = jax.jit(chained)
    seed0 = jnp.zeros((8, 128), jnp.float32)
    t0 = time.time()
    out = cj(seed0, *args)
    _ = np.asarray(out)
    compile_s = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = cj(out * 1e-30, *args)
        _ = np.asarray(out)
        reps.append((time.perf_counter() - t0) / NCH)
    us = min(reps) * 1e6
    print(f"{name:9s}: {us:7.0f} us/call, compile {compile_s:.0f}s", flush=True)


variants = sys.argv[1:] or ["base", "ext4nc", "ext4cc", "ext4mm", "ext4ccmm",
                            "ext3nc", "ext3cc", "conv8"]
print(f"devices: {jax.devices()} seq={seq} BS={BS} chain={NCH} "
      f"values={g*seq*(rk+rv)/1e6:.0f}M", flush=True)
for v in variants:
    fn, args = make(v)
    run(v, fn, args)
