from .flash_attention import flash_attention
from .fused_blend import build_contributor_table, fused_tile_blend

__all__ = ["flash_attention", "build_contributor_table", "fused_tile_blend"]
