"""Worker process for test_multiprocess.py: one of two real jax processes
forming a (data=2, model=4) pod mesh over 8 virtual CPU devices (4 per
process).  This exercises the TRUE multi-host code path — jax.distributed
bootstrap, a global mesh whose data axis spans processes (the DCN analog;
TP stays process-local like ICI on a pod), host-local batch feeding via
host_local_batch_slice, cross-process GSPMD collectives — not the
single-process 8-virtual-device simulation the rest of the suite uses.

Protocol: argv = [process_id, coordinator_port].  Prints "MP_OK <pid>" on
success; any assertion failure exits non-zero and the parent test fails.

Reference multi-device story being replaced: the reference has NO
distributed support at all (SURVEY.md §2.3; device_map="auto" only,
/root/reference/utils.py:88) — this path is new capability required by the
BASELINE north star (multi-host sharded latent KV with continuous batching
across hosts).
"""

import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from palu_tpu.parallel.multihost import (
        host_local_batch_slice,
        initialize_multihost,
        make_pod_mesh,
    )

    initialize_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from palu_tpu.compression import compress_params
    from palu_tpu.models import ModelConfig, llama
    from palu_tpu.parallel import cache_shardings, param_shardings, shard_tree
    from palu_tpu.runtime.engine import Engine, EngineConfig

    # deterministic tiny model — both processes build identical params
    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        max_position_embeddings=64,
    )
    params = llama.init_params(cfg, jax.random.key(7))
    selection = {}
    for i in range(cfg.num_hidden_layers):
        selection[f"model.layers.{i}.self_attn.k_proj"] = [8] * 4
        selection[f"model.layers.{i}.self_attn.v_proj"] = [8] * 4
    params, cfg = compress_params(params, cfg, selection, "svd", head_group_size=2)

    mesh = make_pod_mesh(model_parallelism=4)
    assert mesh.devices.shape == (2, 4)
    # data row i must live entirely on process i (DP over DCN, TP inside)
    for row, owner in ((0, 0), (1, 1)):
        assert all(d.process_index == owner for d in mesh.devices[row]), mesh.devices

    # each host feeds only its own lanes of the global batch
    sl = host_local_batch_slice(4, mesh)
    assert (sl.start, sl.stop) == (2 * pid, 2 * pid + 2), sl

    rng = np.random.default_rng(7)
    global_ids = rng.integers(0, cfg.vocab_size, (4, 12))
    step_tok = rng.integers(0, cfg.vocab_size, (4, 1))

    ecfg = EngineConfig(s_max=16, batch=4, dtype=jnp.float32, decode_chunk=8)

    # single-device reference, computed process-locally
    ref = Engine(params, cfg, ecfg)
    ref_logits, ref_cache = ref.prefill(global_ids)
    ref_step, _ = ref.decode(step_tok, ref_cache)
    ref_logits, ref_step = np.asarray(ref_logits), np.asarray(ref_step)

    # multi-host sharded run over the pod mesh
    sharded_params = shard_tree(params, param_shardings(params, mesh))
    eng = Engine(sharded_params, cfg, ecfg)
    cache0 = shard_tree(eng.init_cache(), cache_shardings(eng.init_cache(), mesh))
    logits, cache = eng.prefill(global_ids, cache0)
    step, _ = eng.decode(step_tok, cache)

    got_logits = multihost_utils.process_allgather(logits, tiled=True)
    got_step = multihost_utils.process_allgather(step, tiled=True)

    err = np.abs(np.asarray(got_logits) - ref_logits).max()
    assert err < 2e-3, f"prefill logits mismatch across hosts: {err}"
    err = np.abs(np.asarray(got_step) - ref_step).max()
    assert err < 2e-3, f"decode step mismatch across hosts: {err}"

    print(f"MP_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
