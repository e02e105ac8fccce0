"""Whitening calibration: per-layer input Gram matrices -> Cholesky factors.

Reference semantics (palu/decomposition.py:20-191, adapted from SVD-LLM):
run calibration batches through the model layer by layer; for each layer
accumulate X^T X over the inputs seen by k_proj/v_proj; Cholesky-factor the
(fp64) Gram with an eigenvalue-shift repair if it is not PSD.

TPU-native: no hooks or Catcher hacks -- the input to k_proj and v_proj is
exactly the post-input-layernorm hidden state, so one jitted per-layer step
returns (layer_output, gram_contribution) and a lax-free host loop streams
layers. Gram accumulates in fp32 on device (reference accumulates fp32 too,
decomposition.py:127-131); the Cholesky runs in fp64 on host
(decomposition.py:150-152).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lowrank import cholesky_with_psd_repair
from ..models import llama
from ..models.config import ModelConfig

__all__ = ["whiten_scale_matrices"]


def whiten_scale_matrices(
    params,
    cfg: ModelConfig,
    batches: List[np.ndarray],
    model_id: str = None,
    use_cache: bool = True,
) -> List[np.ndarray]:
    """Returns one Cholesky scale matrix S (hidden, hidden) per layer
    (shared by that layer's k_proj and v_proj, which see identical inputs).

    Cached per model id like the reference's cache/whiten/*_fp16.pt
    (decomposition.py:31)."""
    import os

    cache_file = None
    if model_id and use_cache:
        cache_dir = os.path.join(os.environ.get("PALU_CACHE_DIR", "cache"), "whiten")
        cache_file = os.path.join(
            cache_dir, f"{model_id.replace('/', '_')}_scaling_matrices.npz"
        )
        if os.path.exists(cache_file):
            data = np.load(cache_file)
            return [data[f"l_{i}"] for i in range(cfg.num_hidden_layers)]

    @jax.jit
    def embed_step(p, ids):
        return p["embed"][ids]

    @functools.partial(jax.jit, static_argnames=("layer_idx",))
    def layer_step(p, x, layer_idx):
        pl_ = p["layers"][layer_idx]
        h = llama.rms_norm(x, pl_["input_norm"], cfg.rms_norm_eps)
        hf = h.astype(jnp.float32).reshape(-1, h.shape[-1])
        gram = hf.T @ hf
        b, s, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        mask = llama._causal_mask(s, s, jnp.float32, cfg.sliding_window)
        out = llama.decoder_layer(x, pl_, cfg, positions, mask)
        return out, gram

    # Stream: keep all batch activations, advance one layer at a time
    # (decomposition.py:122-186 does the same with inps/outs buffers).
    acts = [embed_step(params, jnp.asarray(b)) for b in batches]
    scales = []
    for li in range(cfg.num_hidden_layers):
        gram_total = None
        new_acts = []
        for x in acts:
            out, gram = layer_step(params, x, li)
            gram_total = gram if gram_total is None else gram_total + gram
            new_acts.append(out)
        acts = new_acts
        scales.append(cholesky_with_psd_repair(np.asarray(gram_total, dtype=np.float64)))
    if cache_file:
        os.makedirs(os.path.dirname(cache_file), exist_ok=True)
        np.savez(cache_file, **{f"l_{i}": s for i, s in enumerate(scales)})
    return scales
