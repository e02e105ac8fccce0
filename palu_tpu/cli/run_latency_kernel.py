"""Reconstruction-kernel micro-bench CLI (reference run_latency_kernel.py /
abx_rope.py:173-228): fused Pallas decode kernel vs the XLA low-rank path vs
a dense W.X GEMV baseline, across sequence lengths.

  python -m palu_tpu.cli.run_latency_kernel --total_rank 1024 \\
      --target_seq_lens 4096 16384 65536 262144
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _bench(fn, warmup=10, rep=50):
    for _ in range(warmup):
        out = fn()
    out.block_until_ready()
    times = []
    for _ in range(rep):
        t0 = time.perf_counter()
        out = fn()
        out.block_until_ready()
        times.append((time.perf_counter() - t0) * 1e6)
    t = np.asarray(times)
    return float(np.median(t)), float(np.percentile(t, 20)), float(np.percentile(t, 80))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--total_rank", type=int, default=1024)
    parser.add_argument("--total_rank_v", type=int, default=None)
    parser.add_argument("--num_heads", type=int, default=32)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument("--group_size", type=int, default=4)
    parser.add_argument("--target_seq_lens", nargs="+", type=int,
                        default=[4096, 16384, 65536, 262144])
    parser.add_argument("--block_s", type=int, default=512)
    parser.add_argument("--lt_bits", type=int, default=16)
    parser.add_argument("--providers", nargs="+",
                        default=["WX", "xla", "ours"])
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ..core.quant import QuantConfig
    from ..core import quant as quant_mod
    from ..ops import attention as att_ops
    from ..ops.pallas.palu_decode import (
        palu_flash_decode,
        palu_flash_decode_quantized,
    )

    g = args.num_heads // args.group_size
    hpg = args.num_heads // g
    rk = args.total_rank // g
    rv = (args.total_rank_v or args.total_rank) // g
    hd = args.head_dim
    rng = np.random.default_rng(0)

    rows = []
    for seq_len in args.target_seq_lens:
        s_max = (seq_len + args.block_s - 1) // args.block_s * args.block_s
        q = jnp.asarray(rng.standard_normal((1, args.num_heads, hd)), jnp.bfloat16)
        b_k = jnp.asarray(rng.standard_normal((g, hpg, rk, hd)) * 0.1, jnp.bfloat16)
        x_k = jnp.asarray(rng.standard_normal((1, g, s_max, rk)), jnp.bfloat16)
        x_v = jnp.asarray(rng.standard_normal((1, g, s_max, rv)), jnp.bfloat16)
        kvl = jnp.full((1,), seq_len, jnp.int32)
        row = {"seq_len": seq_len}

        if "ours" in args.providers:
            if args.lt_bits < 16:
                qc = QuantConfig(bits=args.lt_bits, group_size=0)
                kc, ks, kb = quant_mod.quantize(x_k, qc)
                vc, vs, vb = quant_mod.quantize(x_v, qc)
                kcp = quant_mod.pack_codes(kc, args.lt_bits)
                vcp = quant_mod.pack_codes(vc, args.lt_bits)
                fn = lambda: palu_flash_decode_quantized(
                    q, b_k, kcp, ks, kb, vcp, vs, vb, kvl,
                    qcfg=qc, rk=rk, rv=rv, block_s=args.block_s)
            else:
                fn = lambda: palu_flash_decode(
                    q, b_k, x_k, x_v, kvl, block_s=args.block_s)
            row["ours_us"], row["ours_p20"], row["ours_p80"] = _bench(fn)

        if "xla" in args.providers:
            chunk = args.block_s

            @jax.jit
            def xla_fn(q_, xk_, xv_, kvl_):
                return att_ops.flash_decode_latent(
                    q_,
                    lambda i: jax.lax.dynamic_slice_in_dim(xk_, i * chunk, chunk, 2),
                    lambda i: jax.lax.dynamic_slice_in_dim(xv_, i * chunk, chunk, 2),
                    b_k, s_max // chunk, chunk, kvl_, hd, 10000.0, rv, None)

            row["xla_us"], _, _ = _bench(lambda: xla_fn(q, x_k, x_v, kvl))

        if "WX" in args.providers:
            # dense-KV flash-decode baseline: reads 2*nh*hd*seq from HBM
            k_dense = jnp.asarray(
                rng.standard_normal((1, args.num_heads, s_max, hd)), jnp.bfloat16)
            v_dense = jnp.asarray(
                rng.standard_normal((1, args.num_heads, s_max, hd)), jnp.bfloat16)
            chunk = args.block_s

            @jax.jit
            def dense_fn(q_, k_, v_, kvl_):
                qg = q_.reshape(1, args.num_heads, 1, hd)

                def body(carry, i):
                    m, l, acc = carry
                    kb_ = jax.lax.dynamic_slice_in_dim(k_, i * chunk, chunk, 2)
                    vb_ = jax.lax.dynamic_slice_in_dim(v_, i * chunk, chunk, 2)
                    lg = jnp.einsum("bhqd,bhcd->bhqc", qg.astype(jnp.float32),
                                    kb_.astype(jnp.float32)) / np.sqrt(hd)
                    pos = i * chunk + jnp.arange(chunk)
                    lg = jnp.where((pos < kvl_)[None, None, None], lg, -1e30)
                    mn = jnp.maximum(m, lg.max(-1))
                    al = jnp.exp(m - mn)
                    p = jnp.exp(lg - mn[..., None])
                    p = jnp.where((pos < kvl_)[None, None, None], p, 0.0)
                    ln = l * al + p.sum(-1)
                    pv = jnp.einsum("bhqc,bhcd->bhqd", p, vb_.astype(jnp.float32))
                    return (mn, ln, acc * al[..., None] + pv), None

                m0 = jnp.full((1, args.num_heads, 1), -1e30, jnp.float32)
                l0 = jnp.zeros((1, args.num_heads, 1), jnp.float32)
                a0 = jnp.zeros((1, args.num_heads, 1, hd), jnp.float32)
                (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0),
                                              jnp.arange(s_max // chunk))
                return acc / l[..., None]

            row["WX_us"], _, _ = _bench(lambda: dense_fn(q, k_dense, v_dense, kvl))

        rows.append(row)
        if args.json:
            print(json.dumps(row))
        else:
            parts = [f"seq={seq_len}"]
            for key in ("WX_us", "xla_us", "ours_us"):
                if key in row:
                    parts.append(f"{key.split('_')[0]}={row[key]:.0f}us")
            print("  ".join(parts))
    return rows


if __name__ == "__main__":
    main()
