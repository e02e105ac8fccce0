"""Fisher-information calibration for rank allocation.

Reference semantics (palu/rank_search.py:36-84): for each calibration batch,
run forward + backward of the mean token cross-entropy; accumulate
grad(W)^2 per k/v projection weight; finally divide by the number of batches
and take sqrt. Rank search then uses per-group means of that matrix.

TPU-native: a single jitted value-and-grad step differentiating ONLY the
k/v projection weights (everything else is a non-diff argument), accumulated
in-device; no module surgery or hooks.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig

__all__ = ["calib_fisher_info", "fisher_group_means"]


def _split_kv(params):
    """Partition params into (kv_weights, rest) where kv_weights holds the
    dense k/v projection weight per layer: {layer_idx: {"k_proj": w, "v_proj": w}}."""
    kv = {}
    for i, layer in enumerate(params["layers"]):
        entry = {}
        for which in ("k_proj", "v_proj"):
            p = layer["attn"][which]
            if "w" in p:
                entry[which] = p["w"]
        if entry:
            kv[str(i)] = entry
    return kv


def _merge_kv(params, kv):
    layers = []
    for i, layer in enumerate(params["layers"]):
        attn = dict(layer["attn"])
        for which in ("k_proj", "v_proj"):
            if str(i) in kv and which in kv[str(i)]:
                attn[which] = {**attn[which], "w": kv[str(i)][which]}
        layers.append({**layer, "attn": attn})
    return {**params, "layers": layers}


def calib_fisher_info(
    params,
    cfg: ModelConfig,
    batches: List[np.ndarray],
) -> Dict[str, np.ndarray]:
    """Returns {module_name: fisher matrix (out, in)} for every dense k/v
    projection, where module_name follows the HF convention
    `model.layers.{i}.self_attn.{k,v}_proj`."""

    kv0 = _split_kv(params)

    def loss_fn(kv, rest_params, input_ids):
        p = _merge_kv(rest_params, kv)
        logits = llama.forward(p, input_ids, cfg)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        labels = input_ids[:, 1:]
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return jnp.mean(nll)

    grad_fn = jax.jit(jax.grad(loss_fn))

    fisher = jax.tree.map(jnp.zeros_like, kv0)
    for batch in batches:
        ids = jnp.asarray(batch)
        if ids.ndim == 1:
            ids = ids[None, :]
        g = grad_fn(kv0, params, ids)
        fisher = jax.tree.map(
            lambda f, gi: f + gi.astype(jnp.float32) ** 2, fisher, g
        )

    n = max(1, len(batches))
    fisher = jax.tree.map(lambda f: jnp.sqrt(f / n), fisher)

    out = {}
    for i_str, entry in fisher.items():
        for which, mat in entry.items():
            # our weights are (in, out); reference fisher is on (out, in)
            out[f"model.layers.{i_str}.self_attn.{which}"] = np.asarray(mat).T
    return out


def fisher_group_means(
    fisher: Dict[str, np.ndarray], num_groups: int
) -> Dict[str, List[float]]:
    """Per-head-group mean of each fisher matrix (rank_search.py:125-131):
    reshape (out, in) -> (G, out/G, in), mean over all but the group axis."""
    out = {}
    for name, mat in fisher.items():
        g = mat.reshape(num_groups, -1, mat.shape[-1])
        out[name] = [float(g[i].mean()) for i in range(num_groups)]
    return out
