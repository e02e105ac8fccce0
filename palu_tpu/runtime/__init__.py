from .engine import Engine, EngineConfig  # noqa: F401
from .cache import init_cache, cache_nbytes  # noqa: F401
from .profiler import profile_tpot, seed_cache_random  # noqa: F401
