"""mdu_tpu — a TPU-native tiled-diffusion upscaling framework.

A standalone JAX/XLA/Pallas re-design of the capabilities of
pkuliyi2015/multidiffusion-upscaler-for-automatic1111: Tiled Diffusion
(MultiDiffusion / Mixture of Diffusers / DemoFusion), Tiled VAE with
cross-tile GroupNorm, regional prompt control, and tiled noise inversion —
built TPU-first: samplers are pure functions, tile schedulers are
denoiser combinators, fusion and attention are Pallas kernels, and tile
batches shard over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from .config import (
    DemoFusionConfig,
    Method,
    SamplerConfig,
    TiledDiffusionConfig,
    TiledVAEConfig,
    regions_from_json,
    regions_to_json,
)
from .utils import BBox, BlendMode, RegionSpec

def __getattr__(name):
    # lazy heavyweight exports: keep `import mdu_tpu` cheap
    if name == "DiffusionPipeline":
        from .pipeline import DiffusionPipeline

        return DiffusionPipeline
    if name == "load_pipeline":
        from .models.loader import load_pipeline

        return load_pipeline
    if name == "TextConditioner":
        from .text import TextConditioner

        return TextConditioner
    raise AttributeError(name)


__all__ = [
    "BBox", "BlendMode", "RegionSpec", "Method",
    "DiffusionPipeline", "load_pipeline", "TextConditioner",
    "TiledDiffusionConfig", "TiledVAEConfig", "DemoFusionConfig", "SamplerConfig",
    "regions_from_json", "regions_to_json",
    "__version__",
]
