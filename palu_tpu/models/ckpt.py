"""TPU-native (orbax) checkpointing of compressed params + rank metadata.

The HF-format path (`hf_io.py`) is the interoperability surface: it
round-trips checkpoints with the reference's palullama/palumistral/paluqwen2
repos (reference dump: utils.py:48-76). This module is the PRODUCTION
surface for TPU pods: orbax writes each array as a (optionally sharded)
tensorstore, restores directly to devices with target shardings, and skips
the HF state-dict renames/transposes entirely -- the SURVEY section-5
"orbax-style checkpoint of decomposed params + rank metadata" equivalent of
the reference's save_pretrained flow.

Layout:
  <dir>/params/...      orbax PyTree checkpoint of the params tree
  <dir>/model_config.json   ModelConfig as JSON (incl. head_wise_ranks)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax

from .config import ModelConfig

__all__ = ["save_native", "load_native"]


def save_native(save_dir: str, params: Any, cfg: ModelConfig) -> None:
    """Write an orbax checkpoint of `params` plus the model config."""
    import orbax.checkpoint as ocp

    os.makedirs(save_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(save_dir, "params"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
    with open(os.path.join(save_dir, "model_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)


def load_native(
    save_dir: str,
    shardings: Optional[Any] = None,
    dtype=None,
) -> tuple:
    """Restore (params, cfg) from `save_dir`.

    shardings: optional pytree of jax.sharding.Sharding (same structure as
    params, e.g. from `parallel.param_shardings`) -- arrays are restored
    directly into that placement, which is how a pod restores a TP-sharded
    model without materializing it on one host.
    dtype: optional cast applied after restore.
    """
    import orbax.checkpoint as ocp

    with open(os.path.join(save_dir, "model_config.json")) as f:
        raw = json.load(f)
    cfg = ModelConfig(**raw)

    path = os.path.abspath(os.path.join(save_dir, "params"))
    with ocp.StandardCheckpointer() as ckptr:
        if shardings is not None:
            meta = ckptr.metadata(path).item_metadata
            # .tree: the metadata as a PLAIN pytree (the wrapper object has
            # a custom treedef that cannot pair with the shardings tree)
            target = jax.tree.map(
                lambda m, s: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=s),
                meta.tree, shardings,
            )
            params = ckptr.restore(path, target)
        else:
            params = ckptr.restore(path)
    if dtype is not None:
        params = jax.tree.map(
            lambda a: a.astype(dtype) if hasattr(a, "astype") else a, params
        )
    return params, cfg
