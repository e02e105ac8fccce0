"""lm-eval (EleutherAI lm-evaluation-harness) adapter.

The reference wraps its model in lm-eval 0.4.2's HFLM (run_lm_eval.py:15-40).
When the lm_eval package is installed, `JaxLM` plugs our params/config into
`lm_eval.simple_evaluate` for the exact published protocol; otherwise use
palu_tpu.evals.zero_shot (built-in harness, same loglikelihood math).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..core.quant import QuantConfig
from .zero_shot import loglikelihood_batch

__all__ = ["JaxLM", "simple_evaluate"]

try:
    from lm_eval.api.model import LM as _LMBase

    _HAVE_LM_EVAL = True
except ImportError:  # pragma: no cover - env without lm_eval
    _LMBase = object
    _HAVE_LM_EVAL = False


class JaxLM(_LMBase):
    """lm-eval LM implementation over a palu_tpu model."""

    def __init__(self, params, cfg, tokenizer, qcfg: Optional[QuantConfig] = None,
                 max_length: int = 2048):
        if _HAVE_LM_EVAL:
            super().__init__()
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.qcfg = qcfg
        self.max_length = max_length

    # --- lm-eval API ---

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        reqs = []
        for req in requests:
            context, continuation = req.args
            ctx_ids = self.tokenizer(context)["input_ids"] if context else [
                self.tokenizer.bos_token_id
            ]
            cont_ids = self.tokenizer(continuation, add_special_tokens=False)[
                "input_ids"
            ]
            total = (ctx_ids + cont_ids)[-self.max_length :]
            cut = len(total) - len(cont_ids)
            reqs.append((total[:cut], total[cut:]))
        return loglikelihood_batch(self.params, self.cfg, reqs, self.qcfg)

    def loglikelihood_rolling(self, requests) -> List[float]:
        out = []
        for req in requests:
            (text,) = req.args
            ids = self.tokenizer(text)["input_ids"][: self.max_length]
            res = loglikelihood_batch(
                self.params, self.cfg, [(ids[:1], ids[1:])], self.qcfg
            )
            out.append(res[0][0])
        return out

    def generate_until(self, requests) -> List[str]:
        raise NotImplementedError(
            "use palu_tpu.runtime.engine.Engine.generate for generation tasks"
        )


def simple_evaluate(params, cfg, tokenizer, tasks, qcfg=None, **kw):
    """lm_eval.simple_evaluate over JaxLM (requires lm_eval installed)."""
    if not _HAVE_LM_EVAL:
        raise ImportError(
            "lm_eval is not installed; use palu_tpu.evals.zero_shot.run_zero_shot"
        )
    import lm_eval

    return lm_eval.simple_evaluate(
        model=JaxLM(params, cfg, tokenizer, qcfg), tasks=tasks, **kw
    )
