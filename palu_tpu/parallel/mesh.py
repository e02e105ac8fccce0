"""Mesh + sharding rules: tensor parallelism over Palu head groups, data
parallelism over batch.

The reference has no parallelism of any kind (SURVEY.md section 2.3: no
torch.distributed import anywhere; README.md:88 forbids multi-GPU eval), so
this is new, TPU-first design: Palu's math is embarrassingly parallel over
KV head groups (each group's VT slice, U factor, latent cache slab, and the
matching q heads are independent until the o_proj reduction), so

  - `model` axis: shards head groups G (and q heads, and the o_proj/-fused
    input dim -> XLA inserts one psum per layer at the o_proj reduction)
  - `data` axis: shards the batch (requests) -- continuous-batching traffic
    rides this axis across hosts (DCN), TP rides ICI.

Everything is declarative: `param_shardings`/`cache_shardings` build a
NamedSharding pytree matching the params/cache trees; jit + GSPMD inserts
the collectives. Multi-host: `jax.distributed.initialize()` then the same
mesh over all devices.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "param_shardings", "cache_shardings", "shard_tree",
    "shard_map_nocheck",
]


def shard_map_nocheck(f, *, mesh, in_specs, out_specs):
    """`jax.shard_map` with the replication check disabled, spanning the
    check_rep -> check_vma API rename (jax >= 0.9 uses check_vma)."""
    import inspect

    kw = {}
    if "check_vma" in inspect.signature(jax.shard_map).parameters:
        kw["check_vma"] = False
    else:  # pragma: no cover - older jax
        kw["check_rep"] = False
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data * model > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {len(devices)}")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def _wq_aware(leaf, ns, *spec):
    """Sharding for a dense weight that may be int8-quantized (core/wquant):
    codes get the weight's spec, the (1, out) scale row shards on the
    weight's output axis."""
    from ..core.wquant import is_quantized_weight

    if is_quantized_weight(leaf):
        if "wq4" in leaf:
            # packed codes shard like the weight; the (in/128, out) group
            # scales shard on BOTH axes the same way (groups live along in)
            return {"wq4": ns(*spec), "ws": ns(*spec)}
        return {"wq8": ns(*spec), "ws": ns(None, spec[-1] if spec else None)}
    return ns(*spec)


def _attn_shardings(attn: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    ns = lambda *spec: NamedSharding(mesh, P(*spec))
    out: Dict[str, Any] = {}
    # q_proj (H, nh*hd): column (head) parallel
    out["q_proj"] = {"w": _wq_aware(attn["q_proj"]["w"], ns, None, "model")}
    if attn["q_proj"].get("b") is not None:
        out["q_proj"]["b"] = ns("model")
    for which in ("k_proj", "v_proj"):
        p = attn[which]
        if "VT" in p:
            e = {
                "VT": ns(None, "model"),  # (H, G*r): groups over model
                "U": ns("model", None, None),  # (G, r, d)
            }
            if p.get("b") is not None:
                e["b"] = ns("model", None)
        else:
            e = {"w": ns(None, "model")}
            if p.get("b") is not None:
                e["b"] = ns("model")
        out[which] = e
    # o_proj (nh*hd, H) and fused (nh*rv, H): row parallel -> psum
    out["o_proj"] = {"w": _wq_aware(attn["o_proj"]["w"], ns, "model", None)}
    if "w_fused" in attn["o_proj"]:
        out["o_proj"]["w_fused"] = _wq_aware(
            attn["o_proj"]["w_fused"], ns, "model", None
        )
    return out


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding pytree for a model params tree (megatron-style TP)."""
    ns = lambda *spec: NamedSharding(mesh, P(*spec))
    layers = []
    for layer in params["layers"]:
        layers.append(
            {
                "input_norm": ns(),
                "post_norm": ns(),
                "attn": _attn_shardings(layer["attn"], mesh),
                "mlp": {
                    "gate": _wq_aware(layer["mlp"]["gate"], ns, None, "model"),
                    "up": _wq_aware(layer["mlp"]["up"], ns, None, "model"),
                    "down": _wq_aware(layer["mlp"]["down"], ns, "model", None),
                },
            }
        )
    return {
        "embed": ns(),
        "layers": layers,
        "final_norm": ns(),
        "lm_head": None if params.get("lm_head") is None
        else _wq_aware(params["lm_head"], ns),
    }


def cache_shardings(cache: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Latent cache (B, G, S, r): batch over data, head groups over model."""
    ns = lambda *spec: NamedSharding(mesh, P(*spec))
    layers = []
    for entry in cache["layers"]:
        layers.append(
            {
                side: {k: ns("data", "model", None, None) for k in bufs}
                for side, bufs in entry.items()
            }
        )
    return {"layers": layers, "length": ns()}


def shard_tree(tree, shardings):
    """device_put a pytree with a matching sharding pytree."""
    return jax.tree.map(
        lambda x, s: x if s is None or x is None else jax.device_put(x, s),
        tree,
        shardings,
        is_leaf=lambda x: x is None,
    )
