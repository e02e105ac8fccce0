from .config import ModelConfig, kv_info  # noqa: F401
from . import llama, hf_io  # noqa: F401

# Registry: HF model_type -> family handled by the unified llama-family
# implementation (reference keeps three separate model trees + an
# AVAILABLE_MODELS dict, palu/model/__init__.py:28-41).
AVAILABLE_MODELS = {
    "llama": "llama",
    "palullama": "llama",
    "mistral": "mistral",
    "palumistral": "mistral",
    "qwen2": "qwen2",
    "paluqwen2": "qwen2",
}
