from .compress import compress_params, search_ranks, kv_module_names  # noqa: F401
from .rank_search import rank_search, rounding_search_result, split_values  # noqa: F401
from .fisher import calib_fisher_info, fisher_group_means  # noqa: F401
from .whiten import whiten_scale_matrices  # noqa: F401
from .calibration import get_calib_batches, synthetic_batches  # noqa: F401
