"""Device kernels: NMS/top-k, assignment solvers, AE grouping."""

from .nms import chunked_top_k, heatmap_nms, top_k_peaks
from .hungarian import greedy_assign, hungarian, hungarian_prefix
from .group import StaticGroupCfg, adjust, match_by_tag, parse_batch, parse_single, refine
from .group_ref import GroupParams, parse_np

__all__ = [
    "chunked_top_k", "heatmap_nms", "top_k_peaks",
    "greedy_assign", "hungarian", "hungarian_prefix",
    "StaticGroupCfg", "adjust", "match_by_tag", "parse_batch", "parse_single",
    "refine", "GroupParams", "parse_np",
]
