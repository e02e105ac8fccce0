"""TPOT (time-per-output-token) profiling harness.

Reference protocol (run_latency_attention.py:57-106): seed the cache with
random content at a given prompt length, then time N decode steps. CUDA
events + CUDA-graph capture become `block_until_ready` timing of the jitted,
cache-donating decode step; optional `jax.profiler.trace` replaces
torch.profiler chrome traces (SURVEY.md section 5 tracing).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .engine import Engine

__all__ = ["seed_cache_random", "profile_tpot"]


def _random_buf(rng, k: str, buf):
    """Random content matched to a cache leaf's role (layout-agnostic:
    covers seq-major AND rank-major ("_t") quantized layouts)."""
    shape, dtype = buf.shape, buf.dtype
    if k in ("lat", "lat_t"):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)
    if k in ("codes", "codes_t"):
        return jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    if k in ("zero_t", "base"):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * 0.05, dtype
        )
    # scales / scale_t: small positive
    return jnp.asarray(
        np.abs(rng.standard_normal(shape)).astype(np.float32) * 0.05, dtype
    )


def seed_cache_random(engine: Engine, prompt_len: int, seed: int = 0):
    """Fill the cache with random latents up to prompt_len (the reference
    seeds DynamicCache with randn latents, run_latency_attention.py:142-146)."""
    rng = np.random.default_rng(seed)
    cache = engine.init_cache()
    if "stack" in cache:  # layer-stacked engine: leaves carry (L, ...)
        return {
            "stack": {
                side: {k: _random_buf(rng, k, buf) for k, buf in bufs.items()}
                for side, bufs in cache["stack"].items()
            },
            "length": jnp.full(
                (engine.ecfg.batch,), min(prompt_len, engine.ecfg.s_max),
                jnp.int32,
            ),
        }
    new_layers = []
    for entry in cache["layers"]:
        new_entry = {}
        for side, bufs in entry.items():
            new_entry[side] = {k: _random_buf(rng, k, buf) for k, buf in bufs.items()}
        new_layers.append(new_entry)
    return {
        "layers": new_layers,
        "length": jnp.full((engine.ecfg.batch,), prompt_len, jnp.int32),
    }


def profile_tpot(
    engine: Engine,
    prompt_len: int,
    n_steps: int = 100,
    warmup: int = 10,
    trace_dir: Optional[str] = None,
    seed: int = 0,
) -> dict:
    """Returns {"tpot_ms": median ms/token, "p20_ms", "p80_ms", "tokens_per_s"}."""
    cache = seed_cache_random(engine, prompt_len, seed)
    token = jnp.zeros((engine.ecfg.batch, 1), jnp.int32)
    act = jnp.ones((engine.ecfg.batch,), jnp.bool_)

    # warmup + compile (uses the raw jitted step: no host sync per step)
    for _ in range(warmup):
        logits, cache = engine._decode_jit(engine.params, cache, token, act)
    _ = np.asarray(logits[:, :, :1])  # fetch: forces completion even on
    # tunneled backends where block_until_ready acks early

    times = []
    ctx = jax.profiler.trace(trace_dir) if trace_dir else _null_ctx()
    with ctx:
        for _ in range(n_steps):
            t0 = time.perf_counter()
            logits, cache = engine._decode_jit(engine.params, cache, token, act)
            _ = np.asarray(logits[:, :, :1])
            times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    return {
        "tpot_ms": float(np.median(times)),
        "p20_ms": float(np.percentile(times, 20)),
        "p80_ms": float(np.percentile(times, 80)),
        "tokens_per_s": float(engine.ecfg.batch * 1e3 / np.median(times)),
        "n_steps": n_steps,
        "prompt_len": prompt_len,
    }


def chained_decode_fn(engine: Engine, n_steps: int):
    """One jitted executable running `n_steps` greedy decode steps through
    the PRODUCT engine step (`Engine._decode_impl`) chained by a lax.scan,
    feeding each step's argmax token into the next. This is the honest way
    to measure TPOT through a high-latency dispatch path (this sandbox's
    ~40 ms TPU tunnel): steps are chained on-device, so one host dispatch
    covers n_steps tokens, and `profile_tpot_chained` differences multi-call
    timings to cancel the remaining fixed dispatch+fetch cost exactly
    (docs/BENCH.md methodology, round 3)."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, cache, token, active):
        def body(carry, _):
            tok, cache = carry
            logits, cache = engine._decode_impl(params, cache, tok, active)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (tok, cache), None

        (tok, cache), _ = jax.lax.scan(
            body, (token, cache), None, length=n_steps
        )
        return tok, cache

    return run


def profile_tpot_chained(
    engine: Engine,
    prompt_len: int,
    n_steps: int = 64,
    k_calls: int = 3,
    reps: int = 3,
    seed: int = 0,
    trace_dir: Optional[str] = None,
) -> dict:
    """TPOT through the product engine with dispatch cost cancelled.

    Times 1 call and `k_calls` back-to-back calls of the chained-scan
    executable (the donated cache threads through) and reports
    (t_k - t_1) / ((k_calls - 1) * n_steps): the per-call fixed cost
    (host dispatch, tunnel RTT, result fetch) appears once in both terms
    and cancels. `reps` takes the best of several attempts per term."""
    run = chained_decode_fn(engine, n_steps)
    cache = seed_cache_random(engine, prompt_len, seed)
    token = jnp.zeros((engine.ecfg.batch, 1), jnp.int32)
    act = jnp.ones((engine.ecfg.batch,), jnp.bool_)

    t0 = time.perf_counter()
    tok, cache = run(engine.params, cache, token, act)
    _ = np.asarray(tok)
    compile_s = time.perf_counter() - t0

    def timed(ncalls):
        nonlocal cache
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _i in range(ncalls):
                tok, cache = run(engine.params, cache, token, act)
            _ = np.asarray(tok)
            best = min(best, time.perf_counter() - t0)
        return best

    ctx = jax.profiler.trace(trace_dir) if trace_dir else _null_ctx()
    with ctx:
        t1 = timed(1)
        tk = timed(k_calls)
    tpot_ms = (tk - t1) / ((k_calls - 1) * n_steps) * 1e3
    return {
        "tpot_ms": float(tpot_ms),
        "tokens_per_s": float(engine.ecfg.batch * 1e3 / tpot_ms),
        "n_steps": n_steps,
        "k_calls": k_calls,
        "prompt_len": prompt_len,
        "compile_s": float(compile_s),
        "t1_s": float(t1),
        "tk_s": float(tk),
    }


def device_memory_stats() -> dict:
    """HBM usage of the first device (torch.profiler memory-timeline analog;
    SURVEY.md section 5). Keys vary by backend; {} when unsupported."""
    try:
        return dict(jax.local_devices()[0].memory_stats() or {})
    except Exception:
        return {}


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
