"""Differential tests against the ACTUAL reference implementation.

/root/reference (read-only) is imported with its CUDA-only / unpackaged
deps stubbed (fast_hadamard_transform, loguru) and its torch accuracy-track
code runs on CPU as the oracle: our decomposition, quantizer, and
rank-rounding mechanics are compared against the reference's own outputs,
not against a re-derivation.  This is the strongest parity evidence
available in a zero-egress sandbox (no real checkpoints to eval).

Oracle surfaces:
- palu/model/modules/quant.py::quantize_tensor (fake latent quantization)
- palu/model/modules/svd_linear.py::HeadwiseLowRankModule.from_linear /
  .from_linear_whiten (per-head-group SVD / whitened G-LRD)
- palu/rank_search.py::rounding_search_result / split_values

Skipped when the reference tree is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "palu")),
    reason="reference tree not mounted",
)

torch = pytest.importorskip("torch")


def _stub_missing_deps():
    import importlib.machinery

    if "fast_hadamard_transform" not in sys.modules:
        # pure-torch stand-in for the Dao-AILab CUDA ext (unnormalized FWHT
        # over the last dim, Sylvester order, times `scale`); only needed to
        # satisfy the reference's import chain
        mod = types.ModuleType("fast_hadamard_transform")
        # transformers' import_utils probes find_spec on this name
        mod.__spec__ = importlib.machinery.ModuleSpec(
            "fast_hadamard_transform", None)

        def hadamard_transform(x, scale=1.0):
            n = x.shape[-1]
            assert n & (n - 1) == 0, "power-of-two length required"
            y = x
            h = 1
            while h < n:
                y = y.reshape(*x.shape[:-1], n // (2 * h), 2, h)
                y = torch.stack(
                    [y[..., 0, :] + y[..., 1, :], y[..., 0, :] - y[..., 1, :]],
                    dim=-2,
                ).reshape(*x.shape)
                h *= 2
            return y * scale

        mod.hadamard_transform = hadamard_transform
        sys.modules["fast_hadamard_transform"] = mod

    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")
        lg.__spec__ = importlib.machinery.ModuleSpec("loguru", None)

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        lg.logger = _Logger()
        sys.modules["loguru"] = lg


@pytest.fixture(scope="module")
def ref():
    """Import the reference's leaf modules WITHOUT executing
    palu/model/__init__.py (it eagerly registers model classes against a
    transformers version this sandbox does not ship).  Synthesizing the
    package skeleton lets the leaf modules' relative imports resolve while
    skipping every __init__ side effect."""
    _stub_missing_deps()
    for name, sub in (
        ("palu", "palu"),
        ("palu.model", "palu/model"),
        ("palu.model.modules", "palu/model/modules"),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [os.path.join(REF, sub)]
            sys.modules[name] = pkg
    import importlib

    quant = importlib.import_module("palu.model.modules.quant")
    svd_linear = importlib.import_module("palu.model.modules.svd_linear")

    return types.SimpleNamespace(
        quantize_tensor=quant.quantize_tensor,
        HeadwiseLowRankModule=svd_linear.HeadwiseLowRankModule,
    )


@pytest.mark.parametrize(
    "bits,gs,sym,clip",
    [(3, 0, False, 1.0), (4, 32, True, 1.0), (2, 64, False, 0.9),
     (4, 0, True, 0.8), (8, 0, False, 1.0)],
)
def test_fake_quantizer_matches_reference(ref, bits, gs, sym, clip):
    from palu_tpu.core.quant import QuantConfig, fake_quantize

    rng = np.random.default_rng(0)
    w = rng.normal(size=(48, 128)).astype(np.float32)

    want = ref.quantize_tensor(
        torch.from_numpy(w), n_bits=bits, group_size=gs, sym=sym,
        clip_ratio=clip,
    ).numpy()
    got = np.asarray(
        fake_quantize(w, QuantConfig(bits=bits, group_size=gs, sym=sym,
                                     clip_ratio=clip)))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_svd_decomposition_matches_reference(ref):
    """Full-rank from_linear (the reference asserts exact reconstruction
    there, svd_linear.py:50): per-group factors must reproduce the same
    dense product and the same forward."""
    from palu_tpu.core.lowrank import decompose_svd

    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 48)).astype(np.float32)  # 4 groups x 16
    ranks = [16, 16, 16, 16]

    lin = torch.nn.Linear(48, 64, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
    mod = ref.HeadwiseLowRankModule.from_linear(lin, ranks)

    ours = decompose_svd(w, ranks)

    off = 0
    for g, r in enumerate(ranks):
        ref_prod = (mod.U[g].weight @ mod.VT.weight[off : off + r]).detach().numpy()
        our_prod = ours.U[g] @ ours.VT[off : off + r]
        assert np.allclose(our_prod, ref_prod, atol=1e-4), (
            g, np.abs(our_prod - ref_prod).max())
        off += r

    x = rng.normal(size=(1, 5, 48)).astype(np.float32)  # (B, S, in): ref forward needs dim 3
    want = mod(torch.from_numpy(x)).detach().numpy()
    got = x @ ours.reconstruct_dense().T
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


@pytest.mark.parametrize("ranks", [[8, 8, 8, 8], [4, 12, 8, 8]])
def test_whiten_decomposition_matches_reference(ref, ranks):
    """Truncated whitened G-LRD against the reference's
    _per_head_whiten_decomposition_from_weight, including RAGGED per-group
    ranks (the fisher search output shape).  The truncated-SVD product
    L @ R is unique for distinct singular values, so cross-implementation
    comparison of the dense product (and the forward) is well-defined."""
    from palu_tpu.core.lowrank import cholesky_with_psd_repair, decompose_whiten

    rng = np.random.default_rng(2)
    w = rng.normal(size=(64, 48)).astype(np.float32)
    calib = rng.normal(size=(256, 48)).astype(np.float32)
    gram = calib.T @ calib
    scale = cholesky_with_psd_repair(gram)

    lin = torch.nn.Linear(48, 64, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
    lin.scaling_diag_matrix = torch.from_numpy(scale)
    mod = ref.HeadwiseLowRankModule.from_linear_whiten(lin, ranks)

    ours = decompose_whiten(w, scale, ranks)

    off = 0
    for g, r in enumerate(ranks):
        ref_prod = (mod.U[g].weight @ mod.VT.weight[off : off + r]).detach().numpy()
        our_prod = ours.U[g] @ ours.VT[off : off + r]
        assert np.allclose(our_prod, ref_prod, atol=2e-3), (
            g, np.abs(our_prod - ref_prod).max())
        off += r

    x = rng.normal(size=(1, 5, 48)).astype(np.float32)  # (B, S, in): ref forward needs dim 3
    want = mod(torch.from_numpy(x)).detach().numpy()
    got = x @ ours.reconstruct_dense().T
    assert np.allclose(got, want, atol=2e-3), np.abs(got - want).max()


def test_rank_mechanics_match_reference():
    """rounding_search_result + split_values bit-identical to the
    reference's (palu/rank_search.py:11-17, :28-33).  The reference module
    pulls in its whole model registry at import; the two functions are
    extracted by executing only their source segment."""
    _stub_missing_deps()
    src = open(os.path.join(REF, "palu", "rank_search.py")).read()
    ns: dict = {}
    # execute only the two pure helper functions (no torch/model imports)
    import ast

    tree = ast.parse(src)
    wanted = {"rounding_search_result", "split_values"}
    body = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in wanted]
    assert {n.name for n in body} == wanted
    exec(compile(ast.Module(body=body, type_ignores=[]), "<ref>", "exec"), ns)

    from palu_tpu.compression.rank_search import (
        rounding_search_result,
        split_values,
    )

    data = {
        "model.layers.0.self_attn.k_proj": [347.3, 812.9],
        "model.layers.1.self_attn.v_proj": [15.2, 64.0, 1.0],
    }
    # reference helpers mutate in place -> give them their own deep copy
    import copy

    want_round = ns["rounding_search_result"](copy.deepcopy(data))
    got_round = rounding_search_result(data)
    assert got_round == want_round

    data2 = {"layer": [512.0, 256.0]}
    want_split = ns["split_values"](copy.deepcopy(data2), 4)
    got_split = split_values(data2, 4)
    assert got_split == want_split


# ---------------------------------------------------------------------------
# Full-pipeline oracle: reference compress -> reference dump -> our load ->
# ppl-on-same-tokens parity (the strongest zero-egress accuracy evidence:
# it pulls the whole chain, not just the links)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def refpipe():
    """Import the reference's decomposition / quant_utils / root utils.py
    with the palu.model package skeleton (no __init__ side effects); wire
    HeadwiseLowRankModule onto the skeleton so the reference's relative
    imports (`from .model import HeadwiseLowRankModule`,
    decomposition.py:8, quant_utils.py:1, utils.py:6) resolve."""
    _stub_missing_deps()
    for name, sub in (
        ("palu", "palu"),
        ("palu.model", "palu/model"),
        ("palu.model.modules", "palu/model/modules"),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [os.path.join(REF, sub)]
            sys.modules[name] = pkg
    import importlib
    import importlib.util

    svd_linear = importlib.import_module("palu.model.modules.svd_linear")
    sys.modules["palu.model"].HeadwiseLowRankModule = svd_linear.HeadwiseLowRankModule
    sys.modules["palu.model.modules"].HeadwiseLowRankModule = (
        svd_linear.HeadwiseLowRankModule
    )
    decomposition = importlib.import_module("palu.decomposition")
    quant_utils = importlib.import_module("palu.quant_utils")
    spec = importlib.util.spec_from_file_location(
        "palu_ref_utils", os.path.join(REF, "utils.py"))
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)
    return types.SimpleNamespace(
        decomposition=decomposition,
        quant_utils=quant_utils,
        utils=ref_utils,
        HeadwiseLowRankModule=svd_linear.HeadwiseLowRankModule,
    )


def _nll(logits: np.ndarray, ids: np.ndarray) -> float:
    """Mean shifted cross-entropy (run_ppl_eval.py:95-112 semantics)."""
    lg = logits[:, :-1].astype(np.float64)
    tgt = ids[:, 1:]
    m = lg.max(-1, keepdims=True)
    lse = m[..., 0] + np.log(np.exp(lg - m).sum(-1))
    tok = np.take_along_axis(lg, tgt[..., None], axis=-1)[..., 0]
    return float((lse - tok).mean())


@pytest.fixture(scope="module")
def pipeline(refpipe, tmp_path_factory):
    """Run the REFERENCE pipeline end to end on a tiny random llama:
    whiten-compress with the reference's compress_model (scaling matrices
    fed through its own whiten-cache branch, decomposition.py:50-66),
    dump with the reference's dump_to_huggingface_repos, and capture the
    reference model's logits at fp32 and at its canonical quantized
    accuracy config (3-bit ASYM + Hadamard: --lt_sym is opt-in,
    /root/reference/utils.py:106, README.md:78-86).

    fp32 throughout (not fp16) to isolate INTEGRATION parity -- RoPE
    placement, GQA grouping, quant-hook position -- from dtype noise;
    dtype handling is covered by the module-level oracles above."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg).float().eval()
    model.config._name_or_path = "tiny-llama-oracle"

    rng = np.random.default_rng(0)
    calib = torch.from_numpy(rng.integers(0, 256, (4, 128)).astype(np.int64))

    # Gram (X^T X, fp64) of each k/v_proj input -- identical math to the
    # reference's calibration hook (decomposition.py:125-139, which cannot
    # run here: it calls .cuda() unconditionally, :150-166) -- written in
    # the reference's own whiten-cache format so the attach step is 100%
    # reference code.
    grams: dict = {}
    handles = []

    def mk_hook(key):
        def pre(mod, inp):
            x = inp[0].detach().double().reshape(-1, inp[0].shape[-1])
            grams[key] = grams.get(key, 0) + x.T @ x
        return pre

    n_layers = hf_cfg.num_hidden_layers
    for li in range(n_layers):
        sa = model.model.layers[li].self_attn
        for name in ("k_proj", "v_proj"):
            handles.append(
                getattr(sa, name).register_forward_pre_hook(mk_hook((li, name))))
    with torch.no_grad():
        model(calib)
    for h in handles:
        h.remove()

    scaling_matrices = []
    for li in range(n_layers):
        scaling_matrices.append({
            f"self_attn.{name}": torch.linalg.cholesky(grams[(li, name)]).float()
            for name in ("k_proj", "v_proj")
        })

    work = tmp_path_factory.mktemp("oracle")
    cachedir = work / "cache" / "whiten"
    cachedir.mkdir(parents=True)
    torch.save(list(scaling_matrices),
               cachedir / "tiny-llama-oracle_w2_scaling_matrices_fp16.pt")

    # rank 32 per group (g=2, gs=4, group_dim 64): reduced rank, and a
    # power of two so the Hadamard rotation is the plain FWHT in both
    # implementations (reference get_hadK(32) -> K=1)
    selection = {
        f"model.layers.{li}.self_attn.{p}": [32, 32]
        for li in range(n_layers) for p in ("k_proj", "v_proj")
    }
    args = types.SimpleNamespace(
        decompose_method="whiten", use_cache=True, calib_dataset="wikitext2")
    old_gcd = refpipe.decomposition.get_calib_data
    refpipe.decomposition.get_calib_data = lambda *a, **k: []  # cache branch
    old_cwd = os.getcwd()
    try:
        os.chdir(work)  # the reference resolves cache/whiten relative to cwd
        refpipe.decomposition.compress_model(model, None, args, "cpu", selection)
    finally:
        os.chdir(old_cwd)
        refpipe.decomposition.get_calib_data = old_gcd

    assert isinstance(
        model.model.layers[0].self_attn.k_proj, refpipe.HeadwiseLowRankModule)

    ids = rng.integers(0, 256, (2, 64)).astype(np.int64)
    with torch.no_grad():
        ref_fp_logits = model(torch.from_numpy(ids)).logits.float().numpy()

    dump_dir = str(work / "ckpt")

    class _StubTok:  # tokenizer is not part of the parity surface
        def save_pretrained(self, path):
            pass

    refpipe.utils.dump_to_huggingface_repos(model, _StubTok(), dump_dir, None)

    # quantizer config AFTER the fp capture: it rotates weights in place
    refpipe.quant_utils.configure_latent_quantizer(
        model, n_bits=3, group_size=0, sym=False, clip_ratio=1.0, hadamard=True)
    with torch.no_grad():
        ref_q3_logits = model(torch.from_numpy(ids)).logits.float().numpy()

    return types.SimpleNamespace(
        dump_dir=dump_dir, ids=ids,
        ref_fp_logits=ref_fp_logits, ref_q3_logits=ref_q3_logits,
    )


def _engine_stepwise(engine, ids):
    p = ids.shape[1] // 2
    logits, cache = engine.prefill(ids[:, :p])
    outs = [np.asarray(logits[:, -1])]
    for t in range(p, ids.shape[1]):
        logits, cache = engine.decode(ids[:, t : t + 1], cache)
        outs.append(np.asarray(logits[:, -1]))
    return np.stack(outs, axis=1)  # (B, len - p + 1, vocab)


def test_full_pipeline_fp_parity(pipeline):
    """Reference-compressed + reference-dumped checkpoint through OUR
    loader, forward, and Engine must reproduce the reference model's ppl
    on the same tokens (fp latents)."""
    import jax.numpy as jnp

    from palu_tpu.models import hf_io, llama
    from palu_tpu.runtime.engine import Engine, EngineConfig

    params, cfg = hf_io.load_params(pipeline.dump_dir, dtype=jnp.float32)
    ids = pipeline.ids
    ours = np.asarray(llama.forward(params, jnp.asarray(ids), cfg))
    assert ours.shape == pipeline.ref_fp_logits.shape
    nll_ref = _nll(pipeline.ref_fp_logits, ids)
    nll_ours = _nll(ours, ids)
    assert abs(nll_ours - nll_ref) < 1e-3, (nll_ours, nll_ref)
    assert np.allclose(ours, pipeline.ref_fp_logits, atol=5e-3), np.abs(
        ours - pipeline.ref_fp_logits).max()

    # the unified engine (real latent cache, prefill + stepwise decode)
    eng = Engine(params, cfg, EngineConfig(
        s_max=128, batch=2, dtype=jnp.float32, decode_chunk=16))
    step = _engine_stepwise(eng, ids)
    p = ids.shape[1] // 2
    ref_tail = pipeline.ref_fp_logits[:, p - 1:]
    assert np.allclose(step, ref_tail, atol=5e-3), np.abs(step - ref_tail).max()


def test_full_pipeline_q3_hadamard_parity(pipeline):
    """3-bit ASYM + Hadamard (the reference's canonical quantized accuracy
    config): our fake-quant accuracy forward AND our Engine with a REAL
    packed quantized cache must match the reference's fake-quant ppl on
    the same tokens."""
    import jax.numpy as jnp

    from palu_tpu.cli import common
    from palu_tpu.core import quant as quant_mod
    from palu_tpu.core.quant import QuantConfig
    from palu_tpu.models import llama
    from palu_tpu.runtime.engine import Engine, EngineConfig

    args = types.SimpleNamespace(
        model_name_or_path=pipeline.dump_dir, lt_hadamard=True)
    params, cfg = common.load_for_eval(args, dtype=jnp.float32)
    ids = pipeline.ids
    qcfg = QuantConfig(bits=3, group_size=0, sym=False, clip_ratio=1.0)
    nll_ref = _nll(pipeline.ref_q3_logits, ids)

    # (a) accuracy-track forward, fake-quant hook at the same position
    ours = np.asarray(llama.forward(
        params, jnp.asarray(ids), cfg,
        quantize_latent=lambda lat: quant_mod.fake_quantize(lat, qcfg)))
    nll_fake = _nll(ours, ids)
    assert abs(nll_fake - nll_ref) < 5e-3, (nll_fake, nll_ref)

    # (b) the engine with a REAL packed 3-bit cache (quantize-on-append,
    # fused dequant at decode)
    eng = Engine(params, cfg, EngineConfig(
        s_max=128, batch=2, dtype=jnp.float32, decode_chunk=16, qcfg=qcfg))
    step = _engine_stepwise(eng, ids)
    p = ids.shape[1] // 2
    full = np.concatenate([ours[:, p - 1 : p], step[:, 1:]], axis=1)
    nll_eng = _nll(
        np.concatenate([ours[:, : p - 1], full], axis=1), ids)
    assert abs(nll_eng - nll_ref) < 1e-2, (nll_eng, nll_ref)
    # and the decode-step logits agree with the reference tail pointwise
    ref_tail = pipeline.ref_q3_logits[:, p - 1:]
    assert np.abs(step - ref_tail).max() < 0.15, np.abs(step - ref_tail).max()
