"""Pipeline parallelism: layer-axis sharding for models larger than one
chip's HBM (70B-class; SURVEY section 2.3 lists PP as optional for >1-host).

The reference has no parallelism at all; its closest analog is accelerate's
`device_map="auto"` naive layer placement (utils.py:88), which runs stages
strictly sequentially. This module is the TPU-native version: the layer
stack is split into S contiguous stages, each stage's weights live on one
`stage`-axis mesh shard, and activations flow stage-to-stage with
`lax.ppermute` inside a shard_map. Microbatches (lane groups) are pipelined
GPipe-style: with M microbatches the bubble fraction is (S-1)/(M+S-1).

Decode at batch 1 gains no throughput from PP (latency = sum of stage
latencies) -- the point is fitting the model; combine with the `model` axis
for TP x PP. Implementation is SPMD: every stage executes every tick and a
stage mask selects whether its output is real; XLA's collective pipelining
overlaps the ppermute with the next tick's compute.

Weights layout: `stack_stage_params` re-packs per-layer pytrees into
stage-stacked arrays [n_layers_per_stage, ...] so one scan per stage covers
its layers (static shapes, single compile).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["split_stages", "stage_sharded_forward", "make_stage_mesh"]


def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), ("stage",))


def split_stages(layers: List[Any], n_stages: int) -> List[List[Any]]:
    """Contiguous layer partition; first stages take the remainder."""
    n = len(layers)
    base, rem = divmod(n, n_stages)
    out, i = [], 0
    for s in range(n_stages):
        k = base + (1 if s < rem else 0)
        out.append(layers[i : i + k])
        i += k
    return out


def _stack_trees(trees: List[Any]) -> Any:
    """[tree, tree, ...] -> tree of stacked leaves (leading layer axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def stage_sharded_forward(
    params: Dict[str, Any],
    n_stages: int,
    mesh: Mesh,
    layer_fn: Callable[[jax.Array, Any], jax.Array],
    pre_fn: Callable[[Dict[str, Any], jax.Array], jax.Array],
    post_fn: Callable[[Dict[str, Any], jax.Array], jax.Array],
):
    """Build a pipelined forward: x -> pre_fn (stage 0) -> stages of
    scan(layer_fn) connected by ppermute -> post_fn (last stage).

    Requires n_layers % n_stages == 0 (equal stacked stage shapes under
    SPMD). Returns fn(input_ids_embedding_input) operating on a microbatch
    axis M: input (M, ...) is fed microbatch-by-microbatch; M >= 1.
    """
    layers = params["layers"]
    if len(layers) % n_stages:
        raise ValueError(
            f"{len(layers)} layers not divisible into {n_stages} equal stages"
        )
    stages = split_stages(layers, n_stages)
    # stage-stacked params: leaves (n_stages, layers_per_stage, ...)
    stacked = _stack_trees([_stack_trees(s) for s in stages])
    stage_sharding = jax.tree.map(
        lambda x: NamedSharding(mesh, P("stage")), stacked
    )
    stacked = jax.tree.map(jax.device_put, stacked, stage_sharding)
    other = {k: v for k, v in params.items() if k != "layers"}

    from palu_tpu.parallel.mesh import shard_map_nocheck

    def fn(xs: jax.Array) -> jax.Array:
        """xs: (M, B, S) token ids (or embeddings fed to pre_fn). Returns
        (M, B, S, ...) of post_fn outputs."""
        m = xs.shape[0]

        def shard_fn(stage_params, xs_rep):
            sid = jax.lax.axis_index("stage")

            def run_stage(x):
                def body(h, layer_p):
                    return layer_fn(h, layer_p), None

                h, _ = jax.lax.scan(body, x, stage_params)
                return h

            n_ticks = m + n_stages - 1
            outs = []
            # ring buffer of the activation each stage holds this tick
            state = jnp.zeros_like(pre_fn(other, xs_rep[0]))
            for t in range(n_ticks):  # static unroll: ticks are few
                mb = min(t, m - 1)
                entering = pre_fn(other, xs_rep[mb])
                x_in = jnp.where(sid == 0, entering, state)
                active = jnp.logical_and(sid <= t, t - sid < m)
                y = run_stage(x_in)
                y = jnp.where(active, y, state)
                # pass to next stage (last stage's output exits)
                state = jax.lax.ppermute(
                    y, "stage",
                    [(i, (i + 1) % n_stages) for i in range(n_stages)],
                )
                # collect exits: microbatch t-(S-1) leaves at tick t
                if t >= n_stages - 1:
                    outs.append(post_fn(other, y))
            out = jnp.stack(outs)  # (M, ...) valid only on the last stage
            # broadcast the last stage's result to all shards
            last = n_stages - 1
            out = jax.lax.psum(
                jnp.where(sid == last, out, jnp.zeros_like(out)), "stage"
            )
            return out

        return shard_map_nocheck(
            shard_fn,
            mesh=mesh,
            in_specs=(P("stage"), P()),
            out_specs=P(),
        )(stacked, xs)

    return fn
