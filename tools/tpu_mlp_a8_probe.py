"""Probe: is the fused int8 MLP GEMV convert-bound, and does W8A8 fix it?

The production mlp_gemv_int8 converts every int8 weight to bf16 on the VPU
before its MXU dots (~135M converts/layer at 7B -- comparable to the DMA
time, so the kernel sits at 272 us vs the 165 us HBM floor). Variant `a8`
quantizes the ACTIVATION row to int8 in-kernel (per-row dynamic scale,
4096 + 256 elements -- trivial) and feeds the MXU raw int8 x int8
(preferred int32, 2x MXU rate, zero weight converts).

Variants: w8a16 (production), a8 (int8 x int8).
Usage: python tools/tpu_mlp_a8_probe.py
Env: H=4096 INTER=11008 CHAIN=64 K=3 BN=256
"""
import sys, os, time, functools, json
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from palu_tpu.ops.pallas.gemv_int8 import mlp_gemv_int8

H = int(os.environ.get("H", 4096))
INTER = int(os.environ.get("INTER", 11008))
CHAIN = int(os.environ.get("CHAIN", 64))
K = int(os.environ.get("K", 3))
BN = int(os.environ.get("BN", 256))

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
x0 = jax.random.normal(ks[0], (1, H), jnp.bfloat16) * 0.1


def qw(k, shape):
    w = jax.random.normal(k, shape, jnp.float32) * 0.02
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    return {"wq8": jnp.round(w / s).astype(jnp.int8), "ws": s}


wg = qw(ks[1], (H, INTER))
wu = qw(ks[2], (H, INTER))
wd = qw(ks[3], (INTER, H))
jax.block_until_ready((wg, wu, wd))


def _mlp_kernel_a8(x_ref, wg_ref, gs_ref, wu_ref, us_ref, wd_ref, ds_ref,
                   o_ref, acc_ref):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # quantize the activation row once per tile (B*H elements; trivial
    # next to the H*bn weight tiles), then int8 x int8 MXU dots
    xb = x_ref[...].astype(jnp.float32)
    xs = jnp.max(jnp.abs(xb), axis=1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-30)
    xq = jnp.round(xb / xs).astype(jnp.int8)
    g = jax.lax.dot_general(
        xq, wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * (xs * gs_ref[...])
    u = jax.lax.dot_general(
        xq, wu_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * (xs * us_ref[...])
    h = jax.nn.silu(g) * u  # (B, bn) f32
    hs = jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0
    hs = jnp.maximum(hs, 1e-30)
    hq = jnp.round(h / hs).astype(jnp.int8)
    acc_ref[...] += jax.lax.dot_general(
        hq, wd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * hs

    @pl.when(j == nj - 1)
    def _fin():
        o_ref[...] = (acc_ref[...] * ds_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn",))
def mlp_a8(x, wg, wu, wd, bn=BN):
    b, hdim = x.shape
    inter = wg["wq8"].shape[1]
    return pl.pallas_call(
        _mlp_kernel_a8,
        grid=(inter // bn,),
        in_specs=[
            pl.BlockSpec((b, hdim), lambda j: (0, 0)),
            pl.BlockSpec((hdim, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
            pl.BlockSpec((hdim, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
            pl.BlockSpec((bn, hdim), lambda j: (j, 0)),
            pl.BlockSpec((1, hdim), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, hdim), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hdim), x.dtype),
        scratch_shapes=[pltpu.VMEM((b, hdim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, wg["wq8"], wg["ws"].astype(jnp.float32),
      wu["wq8"], wu["ws"].astype(jnp.float32),
      wd["wq8"], wd["ws"].astype(jnp.float32))


def chained(fn):
    @jax.jit
    def run(x):
        def body(x, _):
            o = fn(x)
            return x + o * jnp.bfloat16(1e-6), None
        x, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return x
    return run


def timeit(name, fn):
    run = chained(fn)
    t0 = time.time()
    o = run(x0); _ = np.asarray(o[0, :1])
    cs = time.time() - t0

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(n):
                o = run(x0)
            _ = np.asarray(o[0, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = t(1), t(K)
    us = (tk - t1) / ((K - 1) * CHAIN) * 1e6
    print(f"# {name}: {us:7.1f} us/layer (compile {cs:.0f}s)", flush=True)
    return us


def main():
    sol = (2 * H * INTER + INTER * H) / 819e9 * 1e6
    print(f"# HBM floor {sol:.0f} us ({(2*H*INTER+INTER*H)/2**20:.0f} MB int8)")
    r = {}
    r["w8a16"] = timeit("w8a16 (production)", lambda x: mlp_gemv_int8(x, wg, wu, wd))
    r["a8"] = timeit("a8 int8xint8     ", lambda x: mlp_a8(x, wg, wu, wd))
    # numeric check: relative error of a8 vs w8a16 on one call
    a = np.asarray(mlp_gemv_int8(x0, wg, wu, wd), np.float32)
    b = np.asarray(mlp_a8(x0, wg, wu, wd), np.float32)
    rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
    print(f"# a8 vs w8a16 max rel err: {rel:.4f}")
    r.update(rel_err=rel, floor_us=sol)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
