"""Isolate the Pallas streaming floor: why does a no-compute grid that
streams the 537MB latent cache run at ~35% of HBM speed-of-light (chained
dissect: noop 2101us vs SoL 656us)?

Probes (all chained x32, no host dispatch in the loop):
  bs<N>     -- noop grid, split-g layout (v1's BlockSpecs) at block_s=N:
               if time ~ #grid-steps, per-step overhead dominates; if flat,
               DMA efficiency dominates.
  merged<N> -- noop grid, cache stored (S, g*r) so each block is ONE
               contiguous DMA (vs 16 split-g sub-DMAs) at block_s=N.
  konly<N>  -- noop grid streaming only the K cache (134MB): does time
               scale with bytes at fixed step count?
  xla       -- XLA lax.scan reduction over the same split-g arrays (no
               pallas): XLA's own pipelining as the reference point.

Usage: python tools/tpu_stream_probe.py [probe ...]
"""
import sys, os, time, functools
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
NCH = 16

key = jax.random.PRNGKey(0)
x_k = jax.random.normal(key, (1, g, seq, rk), jnp.bfloat16)
x_v = jax.random.normal(key, (1, g, seq, rv), jnp.bfloat16)
x_m = jax.random.normal(key, (seq, g * (rk + rv)), jnp.bfloat16)  # merged


def noop_kernel(*refs):
    out_ref = refs[-2]
    acc = refs[-1]
    sblk = pl.program_id(0)

    @pl.when(sblk == 0)
    def _i():
        acc[...] = jnp.zeros_like(acc)

    acc[0:1, 0:1] = acc[0:1, 0:1] + 1.0

    @pl.when(sblk == pl.num_programs(0) - 1)
    def _f():
        out_ref[...] = jnp.broadcast_to(acc[0:1, 0:1], out_ref.shape)


def make_split(block_s, konly=False):
    specs = [pl.BlockSpec((None, g, block_s, rk), lambda si: (0, 0, si, 0))]
    args = [x_k]
    if not konly:
        specs.append(pl.BlockSpec((None, g, block_s, rv), lambda si: (0, 0, si, 0)))
        args.append(x_v)

    def fn(*a):
        return pl.pallas_call(
            noop_kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            grid=(seq // block_s,),
            in_specs=specs,
            out_specs=pl.BlockSpec((8, 128), lambda si: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(*a)

    return fn, args


def make_merged(block_s):
    def fn(xm):
        return pl.pallas_call(
            noop_kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            grid=(seq // block_s,),
            in_specs=[pl.BlockSpec((block_s, g * (rk + rv)),
                                   lambda si: (si, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda si: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(xm)

    return fn, [x_m]


def make_xla(block_s):
    def fn(xk, xv):
        def body(c, i):
            kb = jax.lax.dynamic_slice_in_dim(xk, i * block_s, block_s, 2)
            vb = jax.lax.dynamic_slice_in_dim(xv, i * block_s, block_s, 2)
            s = jnp.sum(kb.astype(jnp.float32)) + jnp.sum(vb.astype(jnp.float32))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(seq // block_s))
        return jnp.broadcast_to(c, (8, 128))

    return fn, [x_k, x_v]


def run(name, fn, args, nbytes):
    def chained(seed, *a):
        def body(c, _):
            out = fn(*a)
            return c + out[0, 0] * 1e-20, ()
        c, _ = jax.lax.scan(body, seed, None, length=NCH)
        return c

    cj = jax.jit(chained)
    t0 = time.time()
    out = cj(jnp.float32(0), *args)
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
    print(f"{name:12s}: {us:7.0f} us ({100*sol/us:3.0f}% SoL~{sol:.0f}us), "
          f"compile {compile_s:.0f}s", flush=True)


full_bytes = g * seq * (rk + rv) * 2
probes = sys.argv[1:] or ["bs1024", "bs2048", "bs4096", "merged1024",
                          "merged4096", "konly1024", "xla2048"]
print(f"devices: {jax.devices()} seq={seq} chain={NCH} "
      f"full={full_bytes/1e6:.0f}MB", flush=True)
for p in probes:
    if p.startswith("bs"):
        bs = int(p[2:])
        fn, args = make_split(bs)
        run(p, fn, args, full_bytes)
    elif p.startswith("merged"):
        bs = int(p[6:])
        fn, args = make_merged(bs)
        run(p, fn, args, full_bytes)
    elif p.startswith("konly"):
        bs = int(p[5:])
        fn, args = make_split(bs, konly=True)
        run(p, fn, args, g * seq * rk * 2)
    elif p.startswith("xla"):
        bs = int(p[3:])
        fn, args = make_xla(bs)
        run(p, fn, args, full_bytes)
    else:
        raise SystemExit(f"unknown probe {p}")
