from .bbox import BBox, BlendMode, RegionBBox, RegionSpec
from .grid import batch_bboxes, clamp_overlap, grid_dims, paint_count, split_grid, splitable
from .guided_filter import get_retouch_mask
from .image import cheap_latent_preview, grayscale_u8, image_to_tensor, tensor_to_image
from .telemetry import device_memory_mb, device_peak_memory_mb, perfcount, profile_trace
from .weights import feather_mask, gaussian_weights

__all__ = [
    "BBox", "BlendMode", "RegionBBox", "RegionSpec",
    "batch_bboxes", "clamp_overlap", "grid_dims", "paint_count", "split_grid",
    "splitable", "get_retouch_mask", "feather_mask", "gaussian_weights",
    "cheap_latent_preview", "grayscale_u8", "image_to_tensor", "tensor_to_image",
    "device_memory_mb", "device_peak_memory_mb", "perfcount", "profile_trace",
]
