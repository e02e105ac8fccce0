"""Headline benchmark: Palu latent-KV decode vs dense-KV decode on one TPU
chip, at the reference's canonical operating point (run_latency_attention.py
README.md:117-121: 32 heads, head_dim 128, rank_k 1024, rank_v 3072, head
group size 4, prompt 65536, bs 1; 256 timed decode steps chained in one
executable -- the reference times 100 CUDA-event reps on an already-hot GPU
(run_latency_attention.py:98-105); on this tunneled TPU the chip ramps
clocks over ~100ms of sustained load, so 100-step chains measure a
half-ramped chip and 256 steps are needed for converged, variant-order-
independent numbers; docs/BENCH.md "clock ramping").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value = Palu attention-module decode throughput (tokens/s) and
vs_baseline = speedup over the dense-KV (fp16/bf16) attention baseline on
the same chip. The reference publishes no absolute numbers (BASELINE.md), so
the dense baseline measured on identical hardware is the comparison point.
"""

import json
import os
import sys
import time

import numpy as np


def _setup_jax():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # fail fast if the TPU tunnel is unreachable: jax.devices() blocks
    # inside a C call forever on a dead tunnel (not even SIGALRM-
    # interruptible), so probe the relay's TCP port first when the session
    # is configured for the tunneled axon backend
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        import socket

        for port in (8082, 8083):
            try:
                socket.create_connection(("127.0.0.1", port), timeout=5).close()
            except OSError:
                print(f"bench: TPU tunnel port {port} unreachable -- "
                      "backend init would hang; aborting",
                      file=sys.stderr, flush=True)
                raise SystemExit(3)
    return jax


def bench_attention_module(
    jax,
    prompt_len=65536,
    num_heads=32,
    head_dim=128,
    group_size=4,
    total_rank_k=1024,
    total_rank_v=3072,
    n_steps=256,
    warmup=5,
    block_s=1024,
    log=print,
):
    import jax.numpy as jnp

    from palu_tpu.core import quant as quant_mod
    from palu_tpu.core.quant import QuantConfig
    interp = jax.default_backend() != "tpu"  # CPU smoke runs use interpret mode

    g = num_heads // group_size
    hpg = num_heads // g
    rk = total_rank_k // g
    rv = total_rank_v // g
    hidden = num_heads * head_dim
    # rounded to a multiple of 2*block_s: the 4-bit variant runs its kernel
    # at block 2048 (see the sweep note below) and s_max must divide evenly
    s_max = (prompt_len + n_steps + 2 * block_s) // (2 * block_s) * (2 * block_s)

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    wq = jnp.asarray(rng.standard_normal((hidden, hidden)) * 0.02, bf)
    vt_k = jnp.asarray(rng.standard_normal((hidden, g * rk)) * 0.02, bf)
    vt_v = jnp.asarray(rng.standard_normal((hidden, g * rv)) * 0.02, bf)
    b_k = jnp.asarray(rng.standard_normal((g, hpg, rk, head_dim)) * 0.05, bf)
    wo_fused = jnp.asarray(rng.standard_normal((num_heads * rv, hidden)) * 0.02, bf)
    wk_dense = jnp.asarray(rng.standard_normal((hidden, hidden)) * 0.02, bf)
    wv_dense = jnp.asarray(rng.standard_normal((hidden, hidden)) * 0.02, bf)
    wo_dense = jnp.asarray(rng.standard_normal((hidden, hidden)) * 0.02, bf)

    # ---- palu step: project -> append latents (rank-major) -> fused v4
    # transposed kernel -> o_fused ----
    from palu_tpu.ops.pallas.palu_decode4 import palu_flash_decode4

    def palu_step(x, xk, xv, pos):
        q = (x @ wq).reshape(1, num_heads, head_dim)
        # rope on q at pos
        half = head_dim // 2
        inv = 1.0 / (10000.0 ** (jnp.arange(half, dtype=jnp.float32) * 2 / head_dim))
        f = pos.astype(jnp.float32) * inv
        cos, sin = jnp.cos(f), jnp.sin(f)
        cos2 = jnp.concatenate([cos, cos])[None, None, :]
        sin2 = jnp.concatenate([sin, sin])[None, None, :]
        qf = q.astype(jnp.float32)
        rot = jnp.concatenate([-qf[..., half:], qf[..., :half]], axis=-1)
        q = (qf * cos2 + rot * sin2).astype(bf)
        lat_k = (x @ vt_k).reshape(1, g, rk, 1)
        lat_v = (x @ vt_v).reshape(1, g, rv, 1)
        xk = jax.lax.dynamic_update_slice(xk, lat_k, (0, 0, 0, pos))
        xv = jax.lax.dynamic_update_slice(xv, lat_v, (0, 0, 0, pos))
        out = palu_flash_decode4(q, b_k, xk, xv, pos + 1, rk=rk, rv=rv,
                                 block_s=2 * block_s, interpret=interp)
        y = out.astype(bf).reshape(1, num_heads * rv) @ wo_fused
        return y, xk, xv

    palu_jit = jax.jit(palu_step, donate_argnums=(1, 2))

    # ---- palu quantized steps (v4 transposed kernel, symmetric rank-major
    # cache): project -> quantize+pack new column -> fused dequant decode ----
    from palu_tpu.ops.pallas.palu_decode4 import palu_flash_decode4_quantized

    def make_quant_step(qcfg, q_block_s, **kernel_kw):
        def palu_q_step(x, kc, ks, vc, vs, pos):
            q = (x @ wq).reshape(1, num_heads, head_dim)
            half = head_dim // 2
            inv = 1.0 / (10000.0 ** (jnp.arange(half, dtype=jnp.float32) * 2 / head_dim))
            f = pos.astype(jnp.float32) * inv
            cos2 = jnp.concatenate([jnp.cos(f), jnp.cos(f)])[None, None, :]
            sin2 = jnp.concatenate([jnp.sin(f), jnp.sin(f)])[None, None, :]
            qf = q.astype(jnp.float32)
            rot = jnp.concatenate([-qf[..., half:], qf[..., :half]], axis=-1)
            q = (qf * cos2 + rot * sin2).astype(bf)
            lat_k = (x @ vt_k).reshape(1, g, 1, rk)
            lat_v = (x @ vt_v).reshape(1, g, 1, rv)
            ck, sk_, _zk = quant_mod.quantize_affine(lat_k, qcfg)
            cv, sv_, _zv = quant_mod.quantize_affine(lat_v, qcfg)
            kc = jax.lax.dynamic_update_slice(
                kc, quant_mod.pack_codes_t(ck, qcfg.pack_bits), (0, 0, 0, pos))
            ks = jax.lax.dynamic_update_slice(ks, sk_[..., 0], (0, 0, pos))
            vc = jax.lax.dynamic_update_slice(
                vc, quant_mod.pack_codes_t(cv, qcfg.pack_bits), (0, 0, 0, pos))
            vs = jax.lax.dynamic_update_slice(vs, sv_[..., 0], (0, 0, pos))
            out = palu_flash_decode4_quantized(
                q, b_k, kc, ks, vc, vs, pos + 1,
                qcfg=qcfg, rk=rk, rv=rv, block_s=q_block_s, interpret=interp,
                **kernel_kw,
            )
            y = out.astype(bf).reshape(1, num_heads * rv) @ wo_fused
            return y, kc, ks, vc, vs

        return jax.jit(palu_q_step, donate_argnums=(1, 2, 3, 4))

    # ---- dense step: project -> rope -> append KV -> flash decode -> o ----
    def dense_step(x, kc, vc, pos):
        q = (x @ wq).reshape(1, num_heads, 1, head_dim)
        k = (x @ wk_dense).reshape(1, num_heads, 1, head_dim)
        v = (x @ wv_dense).reshape(1, num_heads, 1, head_dim)
        half = head_dim // 2
        inv = 1.0 / (10000.0 ** (jnp.arange(half, dtype=jnp.float32) * 2 / head_dim))
        f = pos.astype(jnp.float32) * inv
        cos = jnp.concatenate([jnp.cos(f), jnp.cos(f)])[None, None, None, :]
        sin = jnp.concatenate([jnp.sin(f), jnp.sin(f)])[None, None, None, :]

        def rope(t):
            tf = t.astype(jnp.float32)
            rot = jnp.concatenate([-tf[..., half:], tf[..., :half]], axis=-1)
            return (tf * cos + rot * sin).astype(bf)

        q, k = rope(q), rope(k)
        kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, pos, 0))
        vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, pos, 0))
        chunk = block_s

        def body(carry, i):
            m, l, acc = carry
            kb = jax.lax.dynamic_slice_in_dim(kc, i * chunk, chunk, 2)
            vb = jax.lax.dynamic_slice_in_dim(vc, i * chunk, chunk, 2)
            lg = jnp.einsum(
                "bhqd,bhcd->bhqc", q.astype(jnp.float32), kb.astype(jnp.float32)
            ) / np.sqrt(head_dim)
            posv = i * chunk + jnp.arange(chunk)
            ok = posv <= pos
            lg = jnp.where(ok[None, None, None], lg, -1e30)
            mn = jnp.maximum(m, lg.max(-1))
            al = jnp.exp(m - mn)
            p = jnp.exp(lg - mn[..., None])
            p = jnp.where(ok[None, None, None], p, 0.0)
            ln = l * al + p.sum(-1)
            pv = jnp.einsum("bhqc,bhcd->bhqd", p, vb.astype(jnp.float32))
            return (mn, ln, acc * al[..., None] + pv), None

        m0 = jnp.full((1, num_heads, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((1, num_heads, 1), jnp.float32)
        a0 = jnp.zeros((1, num_heads, 1, head_dim), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), jnp.arange(s_max // chunk))
        out = (acc / l[..., None]).astype(bf).reshape(1, hidden)
        return out @ wo_dense, kc, vc

    dense_jit = jax.jit(dense_step, donate_argnums=(1, 2))

    def run(step, bufs, k_calls=4):
        """Chain n_steps decode steps inside ONE executable (lax.scan with a
        data dependency; the XLA analog of the reference's CUDA-graph
        capture), then time by MULTI-CALL DIFFERENCING: the tunneled backend
        has a ~38-44 ms fixed dispatch+fetch round trip per jitted call
        (measured with a tiny jit; round 3), so a single chained call
        overstates the per-step time by RTT/n_steps (~0.15 ms at 256).
        Back-to-back calls pipeline on device (async dispatch); timing one
        call and k calls and taking (t_k - t_1)/((k-1)*n_steps) cancels the
        round trip exactly and yields true device time per step."""
        x0 = jnp.asarray(rng.standard_normal((1, hidden)) * 0.1, bf)
        pos0 = jnp.asarray(prompt_len, jnp.int32)

        def chained(x, bufs):
            def body(carry, i):
                x, bufs = carry
                y, *new_bufs = step(x, *bufs, pos0 + i)
                x_next = x0 + (0.001 * y).astype(bf)
                return (x_next, list(new_bufs)), ()

            (x_out, bufs), _ = jax.lax.scan(
                body, (x, bufs), jnp.arange(n_steps)
            )
            return x_out, bufs

        chained_jit = jax.jit(chained, donate_argnums=(1,))
        x_out, bufs = chained_jit(x0, bufs)  # compile + warmup run
        _ = np.asarray(x_out[0, :1])  # fetch: block_until_ready can ack
        # before compute on tunneled backends

        def timed(ncalls):
            nonlocal x_out, bufs
            best = float("inf")       # 3 reps, min: clocks ramp over ~100ms
            for _rep in range(3):
                t0 = time.perf_counter()
                for _ in range(ncalls):
                    x_out, bufs = chained_jit(x_out, bufs)
                _ = np.asarray(x_out[0, :1])
                best = min(best, time.perf_counter() - t0)
            return best

        t1 = timed(1)
        tk = timed(k_calls)
        return float((tk - t1) / ((k_calls - 1) * n_steps) * 1e3)

    log(f"# compiling palu step (s_max={s_max})...", file=sys.stderr)
    xk0 = jnp.zeros((1, g, rk, s_max), bf)
    xv0 = jnp.zeros((1, g, rv, s_max), bf)
    palu_ms = run(palu_jit, [xk0, xv0])
    log(f"# palu TPOT: {palu_ms:.3f} ms", file=sys.stderr)

    from palu_tpu.core.quant import packed_nrows

    quant_ms = {}
    variants = [
        ("4bit", QuantConfig(bits=4, group_size=0, sym=True)),
        # HEADLINE: 3-bit quantization (8-level grid, the reference's
        # --lt_bits 3 protocol) stored in 4-bit nibbles
        # (QuantConfig.container=4): same codes/accuracy, ~20% faster
        # fused decode (614 vs 776 us/layer on chip,
        # tools/tpu_container_ab.py) for 4/3x the cache bytes -- still
        # ~10x under the dense bf16 KV and 4x under the reference's
        # fake-quant (bf16-resident) latents
        ("3bit", QuantConfig(bits=3, group_size=0, sym=True, container=4)),
        ("3bit_exact", QuantConfig(bits=3, group_size=0, sym=True)),
        ("2bit", QuantConfig(bits=2, group_size=0, sym=True)),
        # THROUGHPUT MODE: same 3-bit container codes through the full-int
        # K path (int8 MXU dots + int32 rotation on static int8 tables,
        # palu_decode4.int8_rot) -- 395 vs 554 us/layer on chip
        # (tools/tpu_formulation_ab.py round-5); ~2e-2 relative attention-
        # output deviation, NLL-contract-tested
        ("3bit_turbo", QuantConfig(bits=3, group_size=0, sym=True,
                                   container=4), dict(int8_rot=True)),
    ]
    for name, qcfg_b, *kkw in variants:
        log(f"# compiling palu {name} step...", file=sys.stderr)
        # block sweep on chip (chain-96 A/B, tools/tpu_ab_v2.py): with the
        # seg_sum kernel every bit width is fastest at block 2048
        # (4-bit 574us vs 587 @1024, 580 @4096; 3-bit 739 vs 755/756)
        step_jit = make_quant_step(qcfg_b, 2 * block_s,
                                   **(kkw[0] if kkw else {}))
        pb = qcfg_b.pack_bits
        kc0 = jnp.zeros((1, g, packed_nrows(rk, pb), s_max), jnp.uint8)
        ks0 = jnp.zeros((1, g, s_max), jnp.float32)
        vc0 = jnp.zeros((1, g, packed_nrows(rv, pb), s_max), jnp.uint8)
        vs0 = jnp.zeros((1, g, s_max), jnp.float32)
        quant_ms[name] = run(step_jit, [kc0, ks0, vc0, vs0])
        log(f"# palu {name} TPOT: {quant_ms[name]:.3f} ms", file=sys.stderr)

    log("# compiling dense step...", file=sys.stderr)
    kc0 = jnp.zeros((1, num_heads, s_max, head_dim), bf)
    vc0 = jnp.zeros((1, num_heads, s_max, head_dim), bf)
    dense_ms = run(dense_jit, [kc0, vc0])
    log(f"# dense TPOT: {dense_ms:.3f} ms", file=sys.stderr)
    return palu_ms, quant_ms, dense_ms


def main():
    jax = _setup_jax()
    prompt_len = int(os.environ.get("BENCH_PROMPT_LEN", 65536))
    n_steps = int(os.environ.get("BENCH_STEPS", 256))

    def log(*a, **k):
        print(*a, **k)
        sys.stderr.flush()

    palu_ms, quant_ms, dense_ms = bench_attention_module(
        jax, prompt_len=prompt_len, n_steps=n_steps, log=log
    )
    result = {
        "metric": "palu latent-KV attention decode tokens/s at 64K prompt, "
                  "3-bit sym-quantized cache in nibble-container storage (v4 "
                  "fused-dequant kernel; rank_k 1024, rank_v 3072, gs 4, 1 "
                  "chip; vs_baseline = speedup over dense bf16-KV flash "
                  "decode; the BASELINE.json north-star operating point -- "
                  "other variants reported alongside)",
        "value": round(1000.0 / quant_ms["3bit"], 2),
        "unit": "tokens/s",
        "vs_baseline": round(dense_ms / quant_ms["3bit"], 3),
        "palu_bf16_ms": round(palu_ms, 3),
        "palu_4bit_ms": round(quant_ms["4bit"], 3),
        "palu_3bit_ms": round(quant_ms["3bit"], 3),
        "palu_3bit_exact_ms": round(quant_ms["3bit_exact"], 3),
        "palu_2bit_ms": round(quant_ms["2bit"], 3),
        "palu_3bit_turbo_ms": round(quant_ms["3bit_turbo"], 3),
        "vs_baseline_3bit_turbo": round(dense_ms / quant_ms["3bit_turbo"], 3),
        "vs_baseline_4bit": round(dense_ms / quant_ms["4bit"], 3),
        "vs_baseline_3bit_exact": round(dense_ms / quant_ms["3bit_exact"], 3),
        "vs_baseline_2bit": round(dense_ms / quant_ms["2bit"], 3),
        "dense_ms": round(dense_ms, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
