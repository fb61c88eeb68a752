from .blur import gaussian_blur_nchw, gaussian_kernel_1d
from .fusion import (
    feather_blend,
    gather_tiles,
    repeat_to_batch,
    scatter_add_tiles,
    weighted_average,
)
from .groupnorm import (
    apply_group_norm,
    combine_group_stats,
    combine_group_stats_reference,
    group_norm,
    group_stats,
)
from .resize import resize_nchw, scale_size

__all__ = [
    "gaussian_blur_nchw", "gaussian_kernel_1d",
    "feather_blend", "gather_tiles", "repeat_to_batch", "scatter_add_tiles",
    "weighted_average",
    "apply_group_norm", "combine_group_stats", "combine_group_stats_reference",
    "group_norm", "group_stats",
    "resize_nchw", "scale_size",
]
