"""Configuration dataclasses — the framework's public knobs.

Mirrors the reference plugin's Gradio widget state one-for-one (SURVEY.md §5;
defaults from ref scripts/tilediffusion.py:127-132, scripts/tilevae.py:79-99,
scripts/tileglobal.py:86-96) so a user of the reference finds every knob here
with the same name and default.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .utils.bbox import BlendMode, RegionSpec


class Method:
    """Tile-scheduler method names (ref tile_utils/utils.py:28-34)."""

    MULTI_DIFF = "MultiDiffusion"
    MIX_DIFF = "Mixture of Diffusers"
    DEMO_FU = "DemoFusion"


@dataclass
class TiledDiffusionConfig:
    """Tiled Diffusion knobs (ref scripts/tilediffusion.py:98-255 UI)."""

    enabled: bool = True
    method: str = Method.MULTI_DIFF
    # latent-space tile geometry; defaults ref tilediffusion.py:127-132
    tile_w: int = 96
    tile_h: int = 96
    overlap: int = 48            # txt2img default; img2img upscale uses 8
    tile_bs: int = 4
    # pre-upscale of the init image before img2img (GAN upscaler in the ref)
    upscaler: Optional[str] = None
    scale_factor: float = 2.0
    # regional prompt control
    draw_background: bool = True
    causal_layers: bool = False
    regions: List[RegionSpec] = field(default_factory=list)
    # noise inversion (img2img only)
    noise_inverse: bool = False
    noise_inverse_steps: int = 10
    noise_inverse_retouch: float = 1.0
    noise_inverse_renoise_strength: float = 1.0
    noise_inverse_renoise_kernel: int = 64
    # (the reference's control_tensor_cpu knob has no analogue here: hints
    # stay device-resident as uint8 canvases — 8x smaller than its fp32
    # CPU-offload target — see tiling/conds.py quantize_control_hints)
    # Bitwise topology invariance (beyond the reference, BASELINE.md north
    # star): pad every tile UNet batch to a uniform tile_bs so the compiled
    # program shape is identical on 1 device and on any mesh — outputs become
    # bitwise equal across device counts.  Costs up to tile_bs-1 padded tile
    # computations per step, so off by default.
    deterministic: bool = False
    # Roll the per-tile-batch loop into a lax.scan so the UNet is traced and
    # compiled ONCE regardless of tile count (at 8K the canvas has ~144 tiles
    # = 18 tile batches; unrolling that into the HLO would blow the compile
    # budget).  None = auto: scan when the batch count reaches
    # MDU_TILE_SCAN_THRESHOLD (default 8).  Ignored when deterministic=True
    # (the bitwise claim is proven for the unrolled program).
    tile_scan: Optional[bool] = None

    def validate(self) -> "TiledDiffusionConfig":
        from .utils.grid import clamp_overlap

        ov = clamp_overlap(self.tile_w, self.tile_h, self.overlap)
        return dataclasses.replace(self, overlap=ov)


@dataclass
class TiledVAEConfig:
    """Tiled VAE knobs (ref scripts/tilevae.py:659-758 UI)."""

    enabled: bool = True
    # pixel-space tile size for the encoder, latent-space for the decoder
    encoder_tile_size: int = 1536
    decoder_tile_size: int = 96
    fast_decoder: bool = True
    fast_encoder: bool = True
    color_fix: bool = False
    # how many tiles run through the lockstep-batched queue at once
    tile_batch: int = 4
    # fixed-HBM exact mode: tiles stay host-resident, segments stream through
    # the chip (the 8K path; see tiling/streaming_vae.py)
    streaming: bool = False
    # compress stream-host inter-segment spills (e.g. 'float8_e4m3fn'):
    # halves host<->device traffic per segment; slightly lossy.  None = off.
    spill_dtype: Optional[str] = None


@dataclass
class DemoFusionConfig:
    """DemoFusion knobs (ref scripts/tileglobal.py:55-124 UI)."""

    enabled: bool = True
    window_size: int = 128
    overlap: int = 64
    tile_bs: int = 4
    tile_bs_g: int = 4           # global dilated-view batch size
    scale_factor: int = 3
    cosine_scale_1: float = 3.0  # skip-residual schedule
    cosine_scale_2: float = 1.0  # local/global mix schedule
    cosine_scale_3: float = 1.0  # gaussian blur sigma schedule
    sigma: float = 0.6
    random_jitter: bool = True
    mixture: bool = False        # run half the global views unblurred
    gaussian_filter: bool = True
    keep_intermediate: bool = True
    denoise_strengths: Tuple[float, ...] = (0.45,)  # per-phase strengths
    # Run the window/global view batches as a lax.scan (ONE UNet body in the
    # HLO) instead of unrolling every batch inline.  Same math — the tail
    # batch is padded with a duplicated, zero-weighted window.  Unrolled
    # scale-3 SDXL programs fail TPU AOT compilation on 16 GiB chips (17.4G
    # needed, 31% HLO-temp fragmentation); scan keeps one body's footprint.
    # None = auto (tiling/demofusion.py::_resolve_df_scan): scan whenever a
    # phase inlines >= MDU_TILE_SCAN_THRESHOLD (default 8) window+global
    # batches, or when env MDU_DF_SCAN=1 forces it; unrolled otherwise.
    scan_windows: Optional[bool] = None


@dataclass
class SamplerConfig:
    name: str = "Euler"          # Euler | Euler a | DDIM | DPM++ 2M | DPM++ 2M Karras
    steps: int = 20
    cfg_scale: float = 7.0
    # Edit-model (instruct-pix2pix) image guidance: when set, denoising is
    # 3-way — den = du + image_cfg*(di - du) + cfg*(dc - di), with di the
    # uncond text + image 'concat' and du the uncond text + zeroed 'concat'
    # (ref abstractdiffusion.py:17-19, 278-310 batches [cond, uncond, uncond]
    # with the third leg's image conditioning zeroed by A1111's CFGDenoiser).
    # None = ordinary 2-way CFG.
    image_cfg_scale: Optional[float] = None
    eta: float = 0.0
    denoising_strength: float = 0.75   # img2img only
    schedule: str = "automatic"        # automatic | karras
    # Karras churn knobs (A1111 s_churn/s_tmin/s_tmax/s_noise; Euler & Heun)
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0
    # DeepCache step-level UNet feature caching (arXiv:2312.00858; no
    # reference analogue — a TPU-friendly opt-in acceleration).  Every
    # deepcache-th step runs the full UNet and refreshes the cache; the
    # steps between recompute only the shallowest `deepcache_branch`
    # levels.  1 = off (exact).  Regions always run the full model.
    deepcache: int = 1
    deepcache_branch: int = 1


def regions_to_json(regions: List[RegionSpec]) -> str:
    """Serialize region settings (ref region-config JSON, tilediffusion.py:533-571)."""
    payload = {
        f"Region {i + 1}": {
            "x": r.x, "y": r.y, "w": r.w, "h": r.h,
            "prompt": r.prompt, "neg_prompt": r.neg_prompt,
            "blend_mode": r.blend_mode.value,
            "feather_ratio": r.feather_ratio, "seed": r.seed,
        }
        for i, r in enumerate(regions)
    }
    return json.dumps(payload, indent=2)


def demofusion_from_png_info(info: dict) -> Tuple["DemoFusionConfig", "SamplerConfig"]:
    """Recover the full DemoFusion + sampler configuration from a generated
    PNG's metadata (tiling/demofusion.py writes it) — the DemoFusion
    analogue of the reference's reproduce-from-infotext flow
    (ref tileglobal.py:28-40, 172-191)."""
    b = info.get("DemoFusion") or {}
    cfg = DemoFusionConfig(
        scale_factor=int(b.get("Scale factor", 3)),
        window_size=int(b.get("Window size", 128)),
        overlap=int(b.get("Overlap", 64)),
        tile_bs=int(b.get("Tile batch size", 4)),
        tile_bs_g=int(b.get("Global batch size", 4)),
        cosine_scale_1=float(b.get("Cosine scale 1", 3.0)),
        cosine_scale_2=float(b.get("Cosine scale 2", 1.0)),
        cosine_scale_3=float(b.get("Cosine scale 3", 1.0)),
        sigma=float(b.get("Sigma", 0.6)),
        random_jitter=bool(b.get("Random jitter", True)),
        mixture=bool(b.get("Mixture", False)),
        gaussian_filter=bool(b.get("Gaussian filter", True)),
        keep_intermediate=bool(b.get("Keep intermediate", True)),
        denoise_strengths=tuple(float(s) for s in
                                b.get("Denoise strengths", (0.45,))),
    )
    sp = SamplerConfig(name=info.get("Sampler", "Euler"),
                       steps=int(info.get("Steps", 20)),
                       cfg_scale=float(info.get("CFG scale", 7.0)))
    return cfg, sp


def regions_from_png_info(info: dict) -> List[RegionSpec]:
    """Recover the region config — including *resolved* seeds — from a
    generated PNG's 'parameters' metadata dict (the reference's seed
    recovery, javascript/bboxHint.js:171-221 getSeedInfo).  ``info`` is the
    parsed JSON the CLI embeds (cli._save / pipeline._info)."""
    block = (info.get("Tiled Diffusion") or {}).get("Region control") or {}
    return regions_from_json(json.dumps(block))


def regions_from_json(text: str) -> List[RegionSpec]:
    payload = json.loads(text)
    out = []
    for _, d in sorted(payload.items()):
        out.append(RegionSpec(
            x=round(float(d["x"]), 4), y=round(float(d["y"]), 4),
            w=round(float(d["w"]), 4), h=round(float(d["h"]), 4),
            prompt=d.get("prompt", ""), neg_prompt=d.get("neg_prompt", ""),
            blend_mode=BlendMode(d.get("blend_mode", "Background")),
            feather_ratio=round(float(d.get("feather_ratio", 0.2)), 4),
            seed=int(d.get("seed", -1)),
        ))
    return out
