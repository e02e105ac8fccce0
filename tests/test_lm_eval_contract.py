"""lm-eval 0.4.x API contract for JaxLM (round-3 VERDICT missing #3).

The reference's zero-shot protocol is lm-eval 0.4.2's `simple_evaluate`
(/root/reference/run_lm_eval.py:15-40). That package is not installable in
this sandbox (zero egress), so this test vendors a faithful stub of the
0.4.x `lm_eval.api.model.LM` abstract interface -- the exact abstract
method names, request `Instance.args` shapes, and result types -- installs
it as `lm_eval`, reloads the adapter, and drives JaxLM through all three
entry points. If the adapter drifts from the interface (renamed method,
wrong arity, wrong result shape), this fails the way the real package
would."""

import abc
import importlib
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from test_engine import _lowrank_model


class _StubLM(abc.ABC):
    """Mirror of lm_eval.api.model.LM (0.4.x): abstract request methods plus
    the rank/world_size attributes the harness reads for sharding."""

    def __init__(self) -> None:
        self._rank = 0
        self._world_size = 1
        self.cache_hook = None

    @abc.abstractmethod
    def loglikelihood(self, requests):
        ...

    @abc.abstractmethod
    def loglikelihood_rolling(self, requests):
        ...

    @abc.abstractmethod
    def generate_until(self, requests):
        ...

    @property
    def rank(self):
        return self._rank

    @property
    def world_size(self):
        return self._world_size

    def set_cache_hook(self, cache_hook) -> None:
        self.cache_hook = cache_hook


class _Instance:
    """lm_eval.api.instance.Instance carries the request in `.args`."""

    def __init__(self, args):
        self.args = args


class _Tok:
    """Whitespace 'tokenizer' exposing the HF surface JaxLM touches."""

    bos_token_id = 1
    eos_token_id = 2

    def __call__(self, text, add_special_tokens=True):
        ids = [self.bos_token_id] if add_special_tokens else []
        ids += [3 + (hash(w) % 60) for w in text.split()]
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{int(i)}" for i in np.asarray(ids).reshape(-1))


@pytest.fixture()
def adapter_with_stub(monkeypatch):
    lm_eval_mod = types.ModuleType("lm_eval")
    api_mod = types.ModuleType("lm_eval.api")
    model_mod = types.ModuleType("lm_eval.api.model")
    model_mod.LM = _StubLM
    lm_eval_mod.api = api_mod
    api_mod.model = model_mod
    calls = {}

    def fake_simple_evaluate(model=None, tasks=None, **kw):
        calls["model"] = model
        calls["tasks"] = tasks
        return {"results": {t: {} for t in tasks}}

    lm_eval_mod.simple_evaluate = fake_simple_evaluate
    monkeypatch.setitem(sys.modules, "lm_eval", lm_eval_mod)
    monkeypatch.setitem(sys.modules, "lm_eval.api", api_mod)
    monkeypatch.setitem(sys.modules, "lm_eval.api.model", model_mod)
    import palu_tpu.evals.lm_eval_adapter as adapter

    adapter = importlib.reload(adapter)
    assert adapter._HAVE_LM_EVAL
    yield adapter, calls
    # restore the module for other tests (stub removed by monkeypatch)
    sys.modules.pop("palu_tpu.evals.lm_eval_adapter", None)


def test_jaxlm_satisfies_lm_abc_and_result_contracts(adapter_with_stub):
    adapter, _ = adapter_with_stub
    params, cfg = _lowrank_model(rank=16, gs=2)
    lm = adapter.JaxLM(params, cfg, _Tok(), max_length=32, max_gen_toks=4)
    # ABC satisfied: instantiation would raise TypeError on missing methods
    assert isinstance(lm, _StubLM)
    assert lm.rank == 0 and lm.world_size == 1

    lls = lm.loglikelihood([
        _Instance(("the quick brown", " fox")),
        _Instance(("", " hello")),  # empty context -> BOS-only
    ])
    assert len(lls) == 2
    for ll, greedy in lls:
        assert isinstance(ll, float) and np.isfinite(ll) and ll <= 0.0
        assert isinstance(greedy, bool)

    rolls = lm.loglikelihood_rolling([_Instance(("a b c d",))])
    assert len(rolls) == 1 and isinstance(rolls[0], float)

    outs = lm.generate_until([
        _Instance(("a b", {"until": ["t999"], "max_gen_toks": 3})),
    ])
    assert len(outs) == 1 and isinstance(outs[0], str)


def test_simple_evaluate_wires_jaxlm(adapter_with_stub):
    adapter, calls = adapter_with_stub
    params, cfg = _lowrank_model(rank=16, gs=2)
    res = adapter.simple_evaluate(params, cfg, _Tok(), ["arc_easy"])
    assert isinstance(calls["model"], adapter.JaxLM)
    assert calls["tasks"] == ["arc_easy"]
    assert "results" in res
