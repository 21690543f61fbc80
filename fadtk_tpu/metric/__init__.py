from .stats import (
    calc_embd_statistics,
    calculate_embd_statistics_online,
    merge_partial_stats,
    welford_init,
    welford_update,
    welford_merge,
    welford_finalize,
)
from .frechet import (
    FrechetBaseline,
    calc_frechet_distance,
    frechet_distance,
    trace_sqrtm_product_ns,
)

__all__ = [
    "FrechetBaseline",
    "calc_embd_statistics",
    "calculate_embd_statistics_online",
    "merge_partial_stats",
    "welford_init",
    "welford_update",
    "welford_merge",
    "welford_finalize",
    "frechet_distance",
    "calc_frechet_distance",
    "trace_sqrtm_product_ns",
]
