"""Worker for test_multiprocess.py::test_two_process_continuous_batching.

Two real jax processes run ONE ServingEngine each over the shared
(data=2, model=4) pod mesh: the same request stream is submitted on both
hosts (lockstep global scheduler), each host prefills only the lanes it
owns, latents enter the cache via host-local shard writes, and the decode
loop is one global SPMD program per step with a per-step allgather of the
sampled token ids — the BASELINE north star's "continuous batching across
hosts" running for real (the rest of the suite simulates multi-chip in a
single process).

Checks: the multi-host outputs for EVERY request (including lanes owned by
the other host) equal a single-device unsharded ServingEngine's outputs.
Protocol: argv = [process_id, coordinator_port]; prints "MP_SERVING_OK
<pid>" on success.
"""

import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from palu_tpu.parallel.multihost import initialize_multihost, make_pod_mesh

    initialize_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np
    import jax.numpy as jnp

    from palu_tpu.compression import compress_params
    from palu_tpu.core.quant import QuantConfig
    from palu_tpu.models import ModelConfig, llama
    from palu_tpu.runtime.engine import EngineConfig
    from palu_tpu.runtime.serving import ServingEngine

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        max_position_embeddings=64,
    )
    params = llama.init_params(cfg, jax.random.key(11))
    selection = {}
    for i in range(cfg.num_hidden_layers):
        selection[f"model.layers.{i}.self_attn.k_proj"] = [8] * 4
        selection[f"model.layers.{i}.self_attn.v_proj"] = [8] * 4
    params, cfg = compress_params(params, cfg, selection, "svd", head_group_size=2)

    qcfg = QuantConfig(bits=4, group_size=0, sym=True)
    rng = np.random.default_rng(11)
    # 5 requests through 4 lanes forces lane recycling mid-run
    prompts = [rng.integers(0, cfg.vocab_size, (n,)) for n in (5, 7, 4, 6, 3)]

    def run(mesh, chunks=None):
        ecfg = EngineConfig(
            s_max=16, batch=4, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
            mesh=mesh,
        )
        srv = ServingEngine(params, cfg, ecfg, prefer_native=False,
                            prefill_chunks_per_step=chunks)
        for rid, p in enumerate(prompts):
            assert srv.submit(rid, p, max_new_tokens=4)
        return srv.run_until_done(max_steps=80)

    ref = run(None)  # single-device, process-local

    mesh = make_pod_mesh(model_parallelism=4)
    out = run(mesh)

    assert set(ref) == set(out), (sorted(ref), sorted(out))
    for rid in sorted(ref):
        assert ref[rid] == out[rid], (rid, ref[rid], out[rid])

    # chunked-prefill interleaving on the SAME 2-process mesh (round-5:
    # lockstep chunk counters, owner-computed chunks, synced first tokens)
    out2 = run(make_pod_mesh(model_parallelism=4), chunks=1)
    assert set(ref) == set(out2), (sorted(ref), sorted(out2))
    for rid in sorted(ref):
        assert ref[rid] == out2[rid], (rid, ref[rid], out2[rid])

    print(f"MP_SERVING_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
