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


def seed_cache_random(engine: Engine, prompt_len: int, seed: int = 0):
    """Fill the cache with random latents up to prompt_len (the reference
    seeds DynamicCache with randn latents, run_latency_attention.py:142-146)."""
    rng = np.random.default_rng(seed)
    cache = engine.init_cache()
    qcfg = engine.ecfg.qcfg
    new_layers = []
    for entry in cache["layers"]:
        new_entry = {}
        for side, bufs in entry.items():
            new_bufs = {}
            for k, buf in bufs.items():
                shape = buf.shape
                if k == "lat":
                    vals = rng.standard_normal(shape).astype(np.float32)
                    new_bufs[k] = jnp.asarray(vals, buf.dtype)
                elif k == "codes":
                    new_bufs[k] = jnp.asarray(
                        rng.integers(0, 256, shape, dtype=np.uint8)
                    )
                else:  # scales / base
                    new_bufs[k] = jnp.asarray(
                        np.abs(rng.standard_normal(shape)).astype(np.float32) * 0.05
                    )
            new_entry[side] = new_bufs
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
