"""Full-model decode throughput on one chip: tokens/s for a 7B-class
Palu-compressed decoder at long context (BASELINE metric: "decode
tokens/s/chip at 7B"), vs the dense-KV baseline at the longest context that
fits.

Random weights (the reference's latency track also runs on random weights,
run_latency_attention.py:40-55), stacked per-layer and scanned, so the HLO
contains ONE decode-layer body regardless of depth; 7B widths (hidden 4096,
32 q heads, inter 11008, rank_k 1024, rank_v 3072, gs 4). Depth defaults to
20 layers: at 32 layers the bf16 weights (14.5 GB) plus a 64K latent cache
exceed the 15.75 GB HBM of one v5e; tokens/s/layer extrapolates. The cache
is donated into the chained-decode executable (in-place update; without
donation XLA copies the full multi-GB cache per call) and re-seeded per
timed rep. A dense
bf16 KV cache at 64K would need ~25 GB for the cache ALONE -- the dense
baseline therefore runs at its largest feasible context instead, which is
the Palu value proposition in one number.

Variants: palu3 / palu4 (3/4-bit packed latent cache, fused-dequant v4
kernel) at SEQ (default 65536); dense at DENSE_SEQ (default 4096).

Timing: N decode steps chained in one lax.scan executable, one host fetch
(docs/BENCH.md methodology).

WBITS=8 stores every large weight matrix as int8 with per-output-channel
symmetric scales (dequant fused into the matmul by XLA as a convert on the
operand read). That halves weight bytes, letting the TRUE 32-layer 7B config
fit beside a 64K 4-bit latent cache (bf16 weights alone are 14.3 GB at 32L;
int8 is ~7.8 GB) — the 7B tokens/s figure then needs no per-layer
extrapolation.

Usage: python tools/tpu_model_bench.py [variants...]   (default: palu3 dense)
Env: LAYERS=24 SEQ=65536 DENSE_SEQ=4096 STEPS=50 WBITS=16
"""
import sys, os, time, functools, json
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from palu_tpu.core import quant as qm
from palu_tpu.core.quant import QuantConfig, packed_nrows
from palu_tpu.ops.pallas.palu_decode4 import palu_flash_decode4_quantized
from palu_tpu.ops.pallas.gemv_int8 import mlp_gemv_int8

L = int(os.environ.get("LAYERS", 20))
SEQ = int(os.environ.get("SEQ", 65536))
DENSE_SEQ = int(os.environ.get("DENSE_SEQ", 4096))
STEPS = int(os.environ.get("STEPS", 50))
BLOCK_S = int(os.environ.get("BS", 1024))
INTERP = bool(int(os.environ.get("INTERP", "0")))
# step-dissection variants: "" (full, layer-stacked kernel indexing),
# "slice" (old XLA dynamic_index per-layer cache slice), "nokernel", "nomlp"
DISSECT = os.environ.get("DISSECT", "")

H = int(os.environ.get("HIDDEN", 4096))
NH, HD = int(os.environ.get("HEADS", 32)), 128
INTER, VOCAB = int(os.environ.get("INTER", 11008)), 32000
GS, G = 4, 8
RK, RV = 128, 384  # per group (totals 1024 / 3072)
HPG = NH // G
THETA = 10000.0
WBITS = int(os.environ.get("WBITS", 16))  # 16 = bf16, 8 = int8 weight storage
MLPK = bool(int(os.environ.get("MLPK", "1")))  # fused Pallas MLP GEMV kernel
# (ops/pallas/gemv_int8) instead of three XLA int8 GEMVs; WBITS=8 only


def wq8_random(key, shape, s=0.02):
    """Random (L,)+shape weights generated AND int8-quantized one layer at a
    time (lax.map) so the full-precision stack never materializes -- at 32
    layers the bf16 originals alone (14.3 GB) would OOM the chip."""
    def one(k):
        w = jax.random.normal(k, shape, jnp.float32) * s
        sc = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
        return jnp.round(w / sc).astype(jnp.int8), sc.astype(jnp.float32)
    q, sc = jax.lax.map(one, jax.random.split(key, L))
    return {"q": q, "s": sc}


def mm(h, w):
    """h @ w where w is bf16 (L stripped) or an int8 {q, s} dict."""
    if isinstance(w, dict):
        y = jax.lax.dot_general(
            h, w["q"].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * w["s"]).astype(jnp.bfloat16)
    return h @ w


def log(*a):
    print(*a, flush=True)


def stacked_weights(key, dense_kv: bool):
    """Per-layer weights stacked on a leading L axis, built on device."""
    ks = iter(jax.random.split(key, 24))
    nrm_bf16 = lambda shape, s=0.02: (jax.random.normal(next(ks), (L,) + shape, jnp.bfloat16) * s)
    if WBITS == 8:
        nrm = lambda shape, s=0.02: jax.jit(
            wq8_random, static_argnums=(1,))(next(ks), shape, s)
    else:
        nrm = nrm_bf16
    w = {
        "ln1": jnp.ones((L, H), jnp.bfloat16),
        "ln2": jnp.ones((L, H), jnp.bfloat16),
        "wq": nrm((H, NH * HD)),
        "gate": nrm((H, INTER)),
        "up": nrm((H, INTER)),
        "down": nrm((INTER, H)),
    }
    if dense_kv:
        w["wk"] = nrm((H, NH * HD))
        w["wv"] = nrm((H, NH * HD))
        w["wo"] = nrm((NH * HD, H))
    else:
        # vt_k/vt_v and b_k stay bf16 even at WBITS=8: the engine's
        # weight_bits=8 deliberately keeps the latent projections and
        # reconstruction operands full precision (wquant._ATTN_KEYS never
        # touches k_proj/v_proj), so the bench must match its read set
        w["vt_k"] = nrm_bf16((H, G * RK))
        w["vt_v"] = nrm_bf16((H, G * RV))
        w["b_k"] = nrm_bf16((G, HPG, RK, HD), 0.05)  # kernel operand: bf16
        w["wo_fused"] = nrm((NH * RV, H))
    return w


def rms(x, g):
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype) * g


def rope_q(q, pos):
    half = HD // 2
    inv = 1.0 / (THETA ** (jnp.arange(0, HD, 2, dtype=jnp.float32) / HD))
    f = pos.astype(jnp.float32) * inv
    cos = jnp.concatenate([jnp.cos(f), jnp.cos(f)])
    sin = jnp.concatenate([jnp.sin(f), jnp.sin(f)])
    rot = jnp.concatenate([-q[..., half:], q[..., :half]], axis=-1)
    return (q * cos + rot * sin).astype(q.dtype)


def build_palu(bits):
    qc = QuantConfig(bits=bits, group_size=0, sym=True)
    w = stacked_weights(jax.random.PRNGKey(0), dense_kv=False)
    s_max = (SEQ + STEPS + BLOCK_S) // BLOCK_S * BLOCK_S
    nrk, nrv = packed_nrows(RK, bits), packed_nrows(RV, bits)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def seed_cache(key):
        ks = jax.random.split(key, 2)
        # quantize a random latent slab once, reuse per layer (content is
        # irrelevant for timing; shapes/dtypes are what matter)
        def enc(k, r, nr):
            lat = jax.random.normal(k, (1, G, s_max, r), jnp.float32)
            c, s, _z = qm.quantize_affine(lat, qc)
            # leaves keep the (L, B=1, ...) layout; scan strips L per layer
            return (jnp.broadcast_to(qm.pack_codes_t(c, bits), (L, 1, G, nr, s_max)),
                    jnp.broadcast_to(s[..., 0], (L, 1, G, s_max)))
        kc, kss = enc(ks[0], RK, nrk)
        vc, vs = enc(ks[1], RV, nrv)
        return dict(kc=kc, ks=kss, vc=vc, vs=vs)

    def make_cache():
        # NOTE broadcast_to materializes on write; force independent buffers
        c = jax.tree.map(jnp.asarray, seed_cache(key))
        jax.block_until_ready(c)
        return c

    def step(x, cache, pos, w):
        """x (1, H) hidden state; one decode step through all layers.

        The full (L, ...) cache stays in the loop CARRY and is updated with
        per-layer dynamic_update_slice (aliasable, in place). Scanning it as
        xs/ys instead forces XLA to hold input AND output stacks (a full
        second multi-GB cache copy — the round-2 OOM)."""
        def layer(carry, inp):
            x, cache = carry
            wl, l = inp
            h = rms(x, wl["ln1"])
            q = mm(h, wl["wq"]).reshape(1, NH, HD)
            q = rope_q(q, pos)
            lat_k = mm(h, wl["vt_k"]).reshape(1, G, 1, RK)
            lat_v = mm(h, wl["vt_v"]).reshape(1, G, 1, RV)
            kc2, ks2, _kz2 = qm.quantize_affine(lat_k, qc)
            vc2, vs2, _vz2 = qm.quantize_affine(lat_v, qc)
            kcp = qm.pack_codes_t(kc2, bits)[:, :, :, 0]  # (1, G, nrk)
            vcp = qm.pack_codes_t(vc2, bits)[:, :, :, 0]
            p = pos[0]
            cache = {
                "kc": jax.lax.dynamic_update_slice(
                    cache["kc"], kcp[None, ..., None], (l, 0, 0, 0, p)),
                "vc": jax.lax.dynamic_update_slice(
                    cache["vc"], vcp[None, ..., None], (l, 0, 0, 0, p)),
                "ks": jax.lax.dynamic_update_slice(
                    cache["ks"], ks2[None, :, :, :, 0], (l, 0, 0, p)),
                "vs": jax.lax.dynamic_update_slice(
                    cache["vs"], vs2[None, :, :, :, 0], (l, 0, 0, p)),
            }
            if DISSECT == "slice":
                # old path: XLA dynamic_index materializes a per-layer cache
                # slice (~104MB copy) before the kernel reads it
                cl = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
                    cache,
                )
                lat_out = palu_flash_decode4_quantized(
                    q, wl["b_k"], cl["kc"], cl["ks"],
                    cl["vc"], cl["vs"], pos + 1,
                    qcfg=qc, rk=RK, rv=RV, block_s=BLOCK_S, theta=THETA,
                    interpret=INTERP,
                )  # (1, NH, RV)
            elif DISSECT == "nokernel":
                lat_out = jnp.zeros((1, NH, RV), jnp.float32) + ks2.sum()
            else:
                # layer-stacked cache: the kernel's scalar-prefetched layer
                # index selects blocks directly from the (L, ...) buffers
                lat_out = palu_flash_decode4_quantized(
                    q, wl["b_k"], cache["kc"], cache["ks"],
                    cache["vc"], cache["vs"], pos + 1,
                    qcfg=qc, rk=RK, rv=RV, block_s=BLOCK_S, theta=THETA,
                    interpret=INTERP, layer_idx=l,
                )  # (1, NH, RV)
            x = x + mm(lat_out.astype(jnp.bfloat16).reshape(1, NH * RV), wl["wo_fused"])
            h2 = rms(x, wl["ln2"])
            if DISSECT != "nomlp":
                if MLPK and WBITS == 8:
                    x = x + mlp_gemv_int8(
                        h2, {"wq8": wl["gate"]["q"], "ws": wl["gate"]["s"]},
                        {"wq8": wl["up"]["q"], "ws": wl["up"]["s"]},
                        {"wq8": wl["down"]["q"], "ws": wl["down"]["s"]},
                        interpret=INTERP)
                else:
                    x = x + mm(jax.nn.silu(mm(h2, wl["gate"])) * mm(h2, wl["up"]), wl["down"])
            return (x, cache), ()

        (x, cache), _ = jax.lax.scan(layer, (x, cache), (w, jnp.arange(L)))
        return x, cache

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(x0, cache, wt):
        def body(carry, i):
            x, cache = carry
            pos = jnp.full((1,), SEQ + i, jnp.int32)
            x, cache = step(x, cache, pos, wt)
            # feed output back in (data dependency chains the steps)
            return (x * jnp.bfloat16(0.125), cache), ()
        (x, cache), _ = jax.lax.scan(body, (x0, cache), jnp.arange(STEPS))
        return x, cache  # returning the cache lets calls chain (differencing)

    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, H), jnp.bfloat16) * 0.1
    return run, x0, make_cache, w


def build_dense():
    w = stacked_weights(jax.random.PRNGKey(0), dense_kv=True)
    s_max = (DENSE_SEQ + STEPS + BLOCK_S) // BLOCK_S * BLOCK_S
    @jax.jit
    def seed_cache():
        k0 = jax.random.normal(jax.random.PRNGKey(3), (L, 1, NH, s_max, HD), jnp.bfloat16)
        v0 = jax.random.normal(jax.random.PRNGKey(4), (L, 1, NH, s_max, HD), jnp.bfloat16)
        return {"k": k0, "v": v0}

    def make_cache():
        c = seed_cache()
        jax.block_until_ready(c)
        return c

    chunk = BLOCK_S

    def step(x, cache, pos, w):
        def layer(carry, inp):
            x, cache = carry
            wl, l = inp
            h = rms(x, wl["ln1"])
            q = rope_q(mm(h, wl["wq"]).reshape(1, NH, HD), pos)
            k_new = rope_q(mm(h, wl["wk"]).reshape(1, NH, HD), pos)
            v_new = mm(h, wl["wv"]).reshape(1, NH, HD)
            p = pos[0]
            cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], k_new[None, :, :, None], (l, 0, 0, p, 0)),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], v_new[None, :, :, None], (l, 0, 0, p, 0)),
            }
            kc = jax.lax.dynamic_index_in_dim(cache["k"], l, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(cache["v"], l, 0, keepdims=False)
            kv_len = pos + 1

            def body(carry2, idx):
                m, l, acc = carry2
                kb = jax.lax.dynamic_slice_in_dim(kc, idx * chunk, chunk, 2)
                vb = jax.lax.dynamic_slice_in_dim(vc, idx * chunk, chunk, 2)
                lg = jnp.einsum("bhd,bhcd->bhc", q.astype(jnp.float32),
                                kb.astype(jnp.float32)) / np.sqrt(HD)
                ps = idx * chunk + jnp.arange(chunk)
                valid = ps[None, :] < kv_len[:, None]
                lg = jnp.where(valid[:, None], lg, -1e30)
                m2 = jnp.maximum(m, jnp.max(lg, axis=-1))
                alpha = jnp.exp(m - m2)
                pr = jnp.exp(lg - m2[..., None])
                pr = jnp.where(valid[:, None], pr, 0.0)
                l2 = l * alpha + jnp.sum(pr, axis=-1)
                pv = jnp.einsum("bhc,bhcd->bhd", pr, vb.astype(jnp.float32))
                return (m2, l2, acc * alpha[..., None] + pv), ()

            m0 = jnp.full((1, NH), -1e30, jnp.float32)
            l0 = jnp.zeros((1, NH), jnp.float32)
            a0 = jnp.zeros((1, NH, HD), jnp.float32)
            (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0),
                                          jnp.arange(s_max // chunk))
            att = (acc / l[..., None]).astype(jnp.bfloat16).reshape(1, NH * HD)
            x = x + mm(att, wl["wo"])
            h2 = rms(x, wl["ln2"])
            x = x + mm(jax.nn.silu(mm(h2, wl["gate"])) * mm(h2, wl["up"]), wl["down"])
            return (x, cache), ()

        (x, cache), _ = jax.lax.scan(layer, (x, cache), (w, jnp.arange(L)))
        return x, cache

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(x0, cache, wt):
        def body(carry, i):
            x, cache = carry
            pos = jnp.full((1,), DENSE_SEQ + i, jnp.int32)
            x, cache = step(x, cache, pos, wt)
            return (x * jnp.bfloat16(0.125), cache), ()
        (x, cache), _ = jax.lax.scan(body, (x0, cache), jnp.arange(STEPS))
        return x, cache

    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, H), jnp.bfloat16) * 0.1
    return run, x0, make_cache, w


def time_variant(name, build, k_calls=3):
    """Multi-call differencing (docs/BENCH.md methodology, round 3): the
    tunnel costs ~38-44 ms fixed dispatch+fetch per call; timing 1 call and
    k back-to-back calls (the donated cache threads through) and taking
    (t_k - t_1)/((k-1)*STEPS) cancels it exactly."""
    run, x0, make_cache, w0 = build()
    log(f"# {name}: compiling...")
    t0 = time.time()
    out, cache = run(x0, make_cache(), w0)
    _ = np.asarray(out[0, :1])
    log(f"# {name}: compile+first {time.time()-t0:.0f}s")

    def timed(ncalls):
        nonlocal cache
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(ncalls):
                out, cache = run(x0, cache, w0)
            _ = np.asarray(out[0, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tk = timed(k_calls)
    tpot = (tk - t1) / ((k_calls - 1) * STEPS) * 1e3
    log(f"# {name}: TPOT {tpot:.2f} ms/step ({1e3/tpot:.1f} tok/s, {L} layers)")
    return tpot


if __name__ == "__main__":
    variants = sys.argv[1:] or ["palu3", "dense"]
    results = {}
    for v in variants:
        if v == "dense":
            results[v] = time_variant(f"dense bf16-KV @{DENSE_SEQ}", build_dense)
        else:
            bits = int(v[-1])
            results[v] = time_variant(
                f"palu {bits}-bit latent-KV @{SEQ}",
                functools.partial(build_palu, bits),
            )
    log(json.dumps({"layers": L, "seq": SEQ, "dense_seq": DENSE_SEQ,
                    "tpot_ms": results}))
