"""Dissect the merged decode kernel's time on the real chip.

Hypothesis under test: the value-path matmul (hpg, BS) @ (BS, rv) is
MXU-cycle-bound at N_tiles * K cycles independent of block size:
(G*rv/128) * S = 24 * 65536 cycles ~= 1.6 ms -- i.e. the whole measured
bf16 TPOT, meaning the kernel is NOT memory-bound and the quantized
variants can't win until the value path is restructured.

Variants timed (each a standalone copy of the merged kernel body):
  full      -- faithful copy of the production kernel
  novalue   -- value accumulate removed (K reconstruct + logits + softmax only)
  nologits  -- K path removed (reads xk but only sums it); value path kept
  dmaonly   -- reads xk/xv, trivial reduction, no matmuls (pure-bandwidth)

Usage: python tools/tpu_dissect.py [seq] [block_s]
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

from palu_tpu.ops.pallas.palu_decode import split_b_halves, _q_blockdiag, _rope_tables

seq = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
block_s = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
N = 50
g, hpg, rk, rv, hd = 8, 4, 128, 384, 128
nh = g * hpg
half = hd // 2
theta = 10000.0


def make_kernel(mode):
    def kernel(kv_len_ref, q1_ref, q2_ref, b1_ref, b2_ref, xk_ref, xv_ref,
               out_ref, m_scr, l_scr, acc_scr):
        sblk = pl.program_id(1)
        nblk = pl.num_programs(1)
        kv_len = kv_len_ref[pl.program_id(0)]

        @pl.when(sblk == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        cdt = jnp.bfloat16
        pos_start = sblk * block_s
        pos = jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0) + pos_start
        valid = pos < kv_len

        if mode == "noop":
            acc_scr[0:1, 0:1] = acc_scr[0:1, 0:1] + 1.0

            @pl.when(sblk == nblk - 1)
            def _fin0():
                out_ref[...] = jnp.broadcast_to(acc_scr[0:1, 0:1], out_ref.shape).astype(out_ref.dtype)
            return
        if mode == "dmaonly":
            s = jnp.sum(xk_ref[...].astype(jnp.float32)) + jnp.sum(xv_ref[...].astype(jnp.float32))
            acc_scr[0:1, 0:1] = acc_scr[0:1, 0:1] + s

            @pl.when(sblk == nblk - 1)
            def _fin():
                out_ref[...] = jnp.broadcast_to(acc_scr[0:1, 0:1], out_ref.shape).astype(out_ref.dtype)
            return

        if mode in ("full", "novalue"):
            cos, sin = _rope_tables(jnp.int32(pos_start), block_s, half, theta, hpg)
            cos = cos.astype(jnp.float32)
            sin = sin.astype(jnp.float32)
            parts = []
            for gi in range(g):
                x = xk_ref[gi].astype(cdt)
                xb1 = jnp.dot(x, b1_ref[gi].astype(cdt), preferred_element_type=jnp.float32)
                xb2 = jnp.dot(x, b2_ref[gi].astype(cdt), preferred_element_type=jnp.float32)
                r1 = (xb1 * cos - xb2 * sin).astype(cdt)
                r2 = (xb2 * cos + xb1 * sin).astype(cdt)
                lg = (jnp.dot(r1, q1_ref[gi].astype(cdt), preferred_element_type=jnp.float32)
                      + jnp.dot(r2, q2_ref[gi].astype(cdt), preferred_element_type=jnp.float32))
                parts.append(lg)
            logits = jnp.concatenate(parts, axis=1) * (1.0 / np.sqrt(hd))
        else:  # nologits: fake logits from xk without matmuls (still reads xk)
            colsum = jnp.sum(xk_ref[0].astype(jnp.float32), axis=1, keepdims=True) * 1e-6
            logits = jnp.broadcast_to(colsum, (block_s, nh))
        logits = jnp.where(valid, logits, -1e30)

        m_prev = m_scr[0:1, :]
        l_prev = l_scr[0:1, :]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        p = jnp.where(valid, p, 0.0)
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)

        if mode == "novalue":
            acc_scr[0:1, :] += jnp.sum(p, axis=0, keepdims=True).T[: 1, :]
        else:
            p_t = p.astype(cdt).T
            alpha_col = alpha.T
            for gi in range(g):
                xv = xv_ref[gi].astype(cdt)
                pv = jnp.dot(p_t[gi * hpg:(gi + 1) * hpg, :], xv,
                             preferred_element_type=jnp.float32)
                sl = slice(gi * hpg, (gi + 1) * hpg)
                acc_scr[sl, :] = acc_scr[sl, :] * alpha_col[sl] + pv
        m_scr[0:1, :] = m_new
        l_scr[0:1, :] = l_new

        @pl.when(sblk == nblk - 1)
        def _fin():
            out_ref[...] = (acc_scr[...] / l_scr[0:1, :].T).astype(out_ref.dtype)

    return kernel


def call(mode, q1, q2, b1, b2, x_k, x_v, kvl):
    kernel = make_kernel(mode)
    grid = (1, seq // block_s)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        compiler_params=cp,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, g, hpg * half, hpg), lambda bi, si, *_: (bi, 0, 0, 0)),
                pl.BlockSpec((None, g, hpg * half, hpg), lambda bi, si, *_: (bi, 0, 0, 0)),
                pl.BlockSpec((g, rk, hpg * half), lambda bi, si, *_: (0, 0, 0)),
                pl.BlockSpec((g, rk, hpg * half), lambda bi, si, *_: (0, 0, 0)),
                pl.BlockSpec((None, g, block_s, rk), lambda bi, si, *_: (bi, 0, si, 0)),
                pl.BlockSpec((None, g, block_s, rv), lambda bi, si, *_: (bi, 0, si, 0)),
            ],
            out_specs=pl.BlockSpec((None, nh, rv), lambda bi, si, *_: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((8, nh), jnp.float32),
                pltpu.VMEM((8, nh), jnp.float32),
                pltpu.VMEM((nh, rv), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, nh, rv), jnp.float32),
    )(kvl, q1, q2, b1, b2, x_k, x_v)


key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
q0 = jax.random.normal(ks[0], (1, nh, hd), jnp.bfloat16)
b_k = jax.random.normal(ks[1], (g, hpg, rk, hd), jnp.bfloat16) * 0.1
x_k = jax.random.normal(ks[2], (1, g, seq, rk), jnp.bfloat16)
x_v = jax.random.normal(ks[3], (1, g, seq, rv), jnp.bfloat16)
kvl = jnp.full((1,), seq, jnp.int32)
b1, b2 = split_b_halves(b_k)
q1, q2 = _q_blockdiag(q0, g, hpg, half)

bytes_read = g * seq * (rk + rv) * 2
sol_us = bytes_read / 819e9 * 1e6
print(f"seq={seq} block_s={block_s} read={bytes_read/1e6:.0f}MB SoL={sol_us:.0f}us")

NCH = int(os.environ.get("NCH", 32))
for mode in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["full", "novalue", "nologits", "dmaonly", "noop"]):
    # arrays must be jit ARGUMENTS: closure-captured buffers become HLO
    # constants and make the compile pathological.
    # CHAINED timing: NCH invocations linked by a data dependency in one
    # executable -- host dispatch through the tunnel costs 1.5-2.4 ms/call,
    # MORE than these kernels, so per-call dispatch loops only measure the
    # host (round-1's "1.6ms floor" was exactly that artifact).
    def chained(q1_, q2_, b1_, b2_, xk_, xv_, kvl_, _mode=mode):
        def body(c, _):
            out = call(_mode, c, q2_, b1_, b2_, xk_, xv_, kvl_)
            s = (jnp.sum(out) * 1e-12).astype(q1_.dtype)
            return q1_ + s, ()
        qf, _ = jax.lax.scan(body, q1_, None, length=NCH)
        return qf

    fn = jax.jit(chained)
    t0 = time.time()
    out = fn(q1, q2, b1, b2, x_k, x_v, kvl)
    _ = np.asarray(out[0, 0, :1])  # fetch forces real completion on axon
    compile_s = time.time() - t0
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(q1, q2, b1, b2, x_k, x_v, kvl)
        _ = np.asarray(out[0, 0, :1])
        reps.append((time.perf_counter() - t0) / NCH)
    per_call = min(reps) * 1e6
    print(f"{mode:9s}: {per_call:7.0f} us/call ({100*sol_us/per_call:3.0f}% SoL), compile {compile_s:.0f}s", flush=True)
