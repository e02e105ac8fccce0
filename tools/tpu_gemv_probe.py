"""Why does the decode step's bs=1 GEMV stream weights at only ~215 GB/s?

bench.py's 3-bit step spends ~305 us outside the attention kernel; the
step dissect shows proj (66 MB of weights) alone takes 309 us vs a
~103 us practical-BW floor (640 GB/s, docs/BENCH.md streaming study).
This probes (1, K) @ (K, N) bf16 GEMV formulations chained in one
executable (data-dependent carry, NCH calls):

  xla      -- plain x @ W                      (what bench.py does today)
  xla8     -- (8, K) @ W padded batch          (same bytes, 8x flops)
  xlaT     -- W pre-transposed, dot_general contracting on dim 1
  pallas   -- blocked pallas GEMV: grid over N tiles, (K, bn) blocks
  pallasT  -- blocked pallas GEMV on W^T: (bn, K) blocks, dot on lanes
  all3     -- wq + vt_k + vt_v in one scan body (the bench proj combo)

Usage: python tools/tpu_gemv_probe.py [probe ...]; NCH=96 env.
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

K = N = 4096
NCH = int(os.environ.get("NCH", 96))
BN = int(os.environ.get("BN", 512))
probes = sys.argv[1:] or ["xla", "xla8", "xlaT", "pallas", "pallasT", "all3"]

rng = np.random.default_rng(0)
bf = jnp.bfloat16
W = jnp.asarray(rng.standard_normal((K, N)) * 0.02, bf)
WT = jnp.asarray(np.asarray(W, np.float32).T, bf)
x1 = jnp.asarray(rng.standard_normal((1, K)) * 0.1, bf)
x8 = jnp.asarray(rng.standard_normal((8, K)) * 0.1, bf)
vt_k = jnp.asarray(rng.standard_normal((K, 1024)) * 0.02, bf)
vt_v = jnp.asarray(rng.standard_normal((K, 3072)) * 0.02, bf)

mb = K * N * 2 / 1e6
sol640 = K * N * 2 / 640e9 * 1e6


def gemv_pallas(x, w, bn=BN):
    def kern(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((x.shape[0], K), lambda j: (0, 0)),
            pl.BlockSpec((K, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((x.shape[0], bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], N), w.dtype),
    )(x, w)


def gemv_pallas_t(x, wt, bn=BN):
    # W^T stored (N, K); each block (bn, K) reduced against x over lanes
    def kern(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((x.shape[0], K), lambda j: (0, 0)),
            pl.BlockSpec((bn, K), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((x.shape[0], bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], N), wt.dtype),
    )(x, wt)


def run(name, fn, x, nbytes_mb):
    def chained(xx):
        def body(c, _):
            y = fn(c)
            nxt = x * (1.0 + 1e-6 * jnp.mean(y[:1, :8]).astype(bf))
            return nxt, ()
        c, _ = jax.lax.scan(body, xx, jnp.arange(NCH))
        return c

    cj = jax.jit(chained)
    t0 = time.time()
    out = cj(x)
    _ = np.asarray(out)[:1, :1]
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = cj(out)
        _ = np.asarray(out)[:1, :1]
        best = min(best, time.perf_counter() - t0)
    us = best / NCH * 1e6
    print(f"{name:8s}: {us:7.1f} us ({nbytes_mb / us * 1e3:4.0f} GB/s)"
          f" compile {compile_s:.0f}s", flush=True)


for p in probes:
    if p == "xla":
        run("xla", lambda c: c @ W, x1, mb)
    elif p == "xla8":
        run("xla8", lambda c: c @ W, x8, mb)
    elif p == "xlaT":
        run("xlaT", lambda c: jax.lax.dot_general(
            c, WT, (((1,), (1,)), ((), ()))), x1, mb)
    elif p == "pallas":
        run("pallas", lambda c: gemv_pallas(c, W), x1, mb)
    elif p == "pallasT":
        run("pallasT", lambda c: gemv_pallas_t(c, WT), x1, mb)
    elif p == "all3":
        mb3 = (K * N + K * 1024 + K * 3072) * 2 / 1e6
        def all3(c):
            q = c @ W
            lk = c @ vt_k
            lv = c @ vt_v
            return jnp.concatenate([q, lk, lv], axis=1)
        run("all3", all3, x1, mb3)


if "nop" in probes:
    run("nop", lambda c: c * jnp.bfloat16(1.0001), x1, 0.001)


# ---- int8-weight GEMV probes at the MLP shape (full-model WBITS=8 path):
# does XLA stream int8 codes at 1 byte/weight with the convert fused into
# the operand read, or does it materialize a bf16 copy? Timing uses
# multi-call DIFFERENCING (t_k - t_1 cancels the ~40 ms tunnel RTT).
K2, N2 = 4096, 11008
W8 = {"q": jnp.asarray(rng.integers(-127, 128, (K2, N2)), jnp.int8),
      "s": jnp.asarray(rng.standard_normal((1, N2)) * 0.001, jnp.float32)}
W2bf = jnp.asarray(rng.standard_normal((K2, N2)) * 0.02, bf)
x2 = jnp.asarray(rng.standard_normal((1, K2)) * 0.1, bf)
mb2_i8 = K2 * N2 / 1e6
mb2_bf = K2 * N2 * 2 / 1e6


def run_diff(name, fn, x, nbytes_mb, kcalls=4):
    def chained(xx):
        def body(c, _):
            y = fn(c)
            nxt = x * (1.0 + 1e-6 * jnp.mean(y[:1, :8].astype(jnp.float32)).astype(bf))
            return nxt, ()
        c, _ = jax.lax.scan(body, xx, jnp.arange(NCH))
        return c

    cj = jax.jit(chained)
    t0 = time.time()
    out = cj(x)
    _ = np.asarray(out)[:1, :1]
    compile_s = time.time() - t0

    def timed(nc):
        nonlocal out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(nc):
                out = cj(out)
            _ = np.asarray(out)[:1, :1]
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = timed(1), timed(kcalls)
    us = (tk - t1) / ((kcalls - 1) * NCH) * 1e6
    print(f"{name:10s}: {us:7.1f} us ({nbytes_mb / us * 1e3:4.0f} GB/s of its"
          f" own bytes) compile {compile_s:.0f}s", flush=True)


def mm8(c, w):
    y = jax.lax.dot_general(c, w["q"].astype(bf), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * w["s"]).astype(bf)


from palu_tpu.ops.pallas.gemv_int8 import gemv_int8, mlp_gemv_int8

for p in probes:
    if p == "kmlp":
        # fused Pallas MLP kernel at the 7B shape (gate+up+silu*mul+down in
        # one pass; every weight byte read once at int8)
        W8b = {"wq8": jnp.asarray(rng.integers(-127, 128, (K2, N2)), jnp.int8),
               "ws": jnp.asarray(rng.standard_normal((1, N2)) * 0.001, jnp.float32)}
        W8c = {"wq8": jnp.asarray(rng.integers(-127, 128, (K2, N2)), jnp.int8),
               "ws": W8b["ws"]}
        W8d = {"wq8": jnp.asarray(rng.integers(-127, 128, (N2, K2)), jnp.int8),
               "ws": jnp.asarray(rng.standard_normal((1, K2)) * 0.001, jnp.float32)}
        bn = int(os.environ.get("KBN", 0))
        run_diff("kmlp", lambda c: mlp_gemv_int8(W8b and c, W8b, W8c, W8d, block_n=bn),
                 x2, 3 * mb2_i8)
    elif p == "kgemv":
        W8g = {"wq8": jnp.asarray(rng.integers(-127, 128, (K2, N2)), jnp.int8),
               "ws": jnp.asarray(rng.standard_normal((1, N2)) * 0.001, jnp.float32)}
        bn = int(os.environ.get("KBN", 0))
        run_diff("kgemv", lambda c: gemv_int8(c, W8g, block_n=bn), x2, mb2_i8)
    elif p == "i8":
        run_diff("i8", lambda c: mm8(c, W8), x2, mb2_i8)
    elif p == "i8noscale":
        run_diff("i8noscale", lambda c: jax.lax.dot_general(
            c, W8["q"].astype(bf), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(bf), x2, mb2_i8)
    elif p == "bfmlp":
        run_diff("bfmlp", lambda c: (c @ W2bf).astype(bf), x2, mb2_bf)
    elif p == "i8mlp3":
        # gate/up/down in one body like the model bench layer
        W8b = {"q": jnp.asarray(rng.integers(-127, 128, (K2, N2)), jnp.int8),
               "s": W8["s"]}
        W8d = {"q": jnp.asarray(rng.integers(-127, 128, (N2, K2)), jnp.int8),
               "s": jnp.asarray(rng.standard_normal((1, K2)) * 0.001, jnp.float32)}
        def mlp3(c):
            h = jax.nn.silu(mm8(c, W8).astype(jnp.float32)).astype(bf) * mm8(c, W8b)
            return mm8(h, W8d)
        run_diff("i8mlp3", mlp3, x2, 3 * mb2_i8)
