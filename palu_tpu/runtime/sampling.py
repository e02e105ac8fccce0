"""Token sampling: greedy / temperature / top-k / top-p.

The reference generates greedily everywhere except a do_sample quirk for
vicuna/longchat (utils.py:94-96); a serving framework needs the standard
sampler family, implemented here as a pure function over logits usable both
host-side (numpy) and jit-side (jnp).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample"]


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 = greedy
    top_k: int = 0  # 0 = no top-k
    top_p: float = 1.0  # 1 = no nucleus filtering


def sample(
    logits: jax.Array,  # (B, V)
    params: SamplingParams,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns (B,) sampled token ids."""
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    assert key is not None, "sampling needs a PRNG key"
    logits = logits.astype(jnp.float32) / params.temperature

    if params.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -params.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)

    return jax.random.categorical(key, logits, axis=-1)
