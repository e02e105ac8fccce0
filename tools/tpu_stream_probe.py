"""Isolate the Pallas streaming floor: why does a no-compute grid that
streams the 537MB latent cache run at ~31% of HBM speed-of-light (chained
dissect: noop 2101us vs SoL 656us)?

Every chained invocation consumes the scan carry as a kernel INPUT; an
invariant pallas_call is hoisted out of the scan by XLA and "per-call"
time becomes fiction (NCH=64 measured 141% of SoL before the carry was
threaded through).

Probes (all chained, no host dispatch in the loop):
  bs<N>     -- noop grid, split-g layout (v1's BlockSpecs) at block_s=N.
  merged<N> -- cache stored (S, g*r): each block is ONE contiguous DMA
               (vs 16 split-g sub-DMAs) at block_s=N.
  konly<N>  -- stream only the K cache (134MB): does time scale with bytes?
  xla<N>    -- XLA lax.scan dynamic-slice reduction over the same arrays.
  xlasum    -- one fused whole-array jnp.sum: XLA's best-case streaming,
               the practical-bandwidth reference point for this chip.

Usage: python tools/tpu_stream_probe.py [probe ...]
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
g, rk, rv = 8, 128, 384
NCH = int(os.environ.get("NCH", 16))

key = jax.random.PRNGKey(0)
x_k = jax.random.normal(key, (1, g, seq, rk), jnp.bfloat16)
x_v = jax.random.normal(key, (1, g, seq, rv), jnp.bfloat16)
x_m = jax.random.normal(key, (seq, g * (rk + rv)), jnp.bfloat16)  # merged


def noop_kernel(c_ref, *refs):
    out_ref = refs[-2]
    acc = refs[-1]
    sblk = pl.program_id(0)

    @pl.when(sblk == 0)
    def _i():
        acc[...] = c_ref[...]

    acc[...] = acc[...] + 1.0

    @pl.when(sblk == pl.num_programs(0) - 1)
    def _f():
        out_ref[...] = acc[...]


def _noop_call(block_s, specs, args, c):
    return pl.pallas_call(
        noop_kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        grid=(seq // block_s,),
        in_specs=[pl.BlockSpec((8, 128), lambda si: (0, 0))] + specs,
        out_specs=pl.BlockSpec((8, 128), lambda si: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(c, *args)


def make_split(block_s, konly=False):
    specs = [pl.BlockSpec((None, g, block_s, rk), lambda si: (0, 0, si, 0))]
    args = [x_k]
    if not konly:
        specs.append(pl.BlockSpec((None, g, block_s, rv), lambda si: (0, 0, si, 0)))
        args.append(x_v)
    return (lambda c, *a: _noop_call(block_s, specs, a, c)), args


def make_merged(block_s):
    specs = [pl.BlockSpec((block_s, g * (rk + rv)), lambda si: (si, 0))]
    return (lambda c, xm: _noop_call(block_s, specs, (xm,), c)), [x_m]


def make_xla(block_s):
    def fn(c0, xk, xv):
        def body(c, i):
            kb = jax.lax.dynamic_slice_in_dim(xk, i * block_s, block_s, 2)
            vb = jax.lax.dynamic_slice_in_dim(xv, i * block_s, block_s, 2)
            s = jnp.sum(kb.astype(jnp.float32)) + jnp.sum(vb.astype(jnp.float32))
            return c + s * 1e-20, ()
        c, _ = jax.lax.scan(body, c0[0, 0], jnp.arange(seq // block_s))
        return jnp.broadcast_to(c, (8, 128))

    return fn, [x_k, x_v]


def make_xlasum():
    def fn(c0, xk, xv):
        s = jnp.sum(xk.astype(jnp.float32)) + jnp.sum(xv.astype(jnp.float32))
        return c0 + s * 1e-20

    return fn, [x_k, x_v]


def run(name, fn, args, nbytes):
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
    sol = nbytes / 819e9 * 1e6
    gbs = nbytes / (us * 1e-6) / 1e9
    print(f"{name:12s}: {us:7.0f} us ({100*sol/us:3.0f}% SoL~{sol:.0f}us, "
          f"{gbs:.0f} GB/s), compile {compile_s:.0f}s", flush=True)


full_bytes = g * seq * (rk + rv) * 2
probes = sys.argv[1:] or ["bs1024", "bs4096", "merged1024", "merged4096",
                          "konly1024", "xla2048", "xlasum"]
print(f"devices: {jax.devices()} seq={seq} chain={NCH} "
      f"full={full_bytes/1e6:.0f}MB", flush=True)
for p in probes:
    if p.startswith("bs"):
        fn, args = make_split(int(p[2:]))
        run(p, fn, args, full_bytes)
    elif p.startswith("merged"):
        fn, args = make_merged(int(p[6:]))
        run(p, fn, args, full_bytes)
    elif p.startswith("konly"):
        fn, args = make_split(int(p[5:]), konly=True)
        run(p, fn, args, g * seq * rk * 2)
    elif p == "xlasum":
        fn, args = make_xlasum()
        run(p, fn, args, full_bytes)
    elif p.startswith("xla"):
        fn, args = make_xla(int(p[3:]))
        run(p, fn, args, full_bytes)
    else:
        raise SystemExit(f"unknown probe {p}")
