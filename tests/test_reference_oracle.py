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
    if "fast_hadamard_transform" not in sys.modules:
        # pure-torch stand-in for the Dao-AILab CUDA ext (unnormalized FWHT
        # over the last dim, Sylvester order, times `scale`); only needed to
        # satisfy the reference's import chain
        mod = types.ModuleType("fast_hadamard_transform")

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
