from .flash_attention import (flash_attention, flash_attention_t,
                              flash_attention_t_fm)
from .fused_blend import build_contributor_table, fused_tile_blend
from .group_norm import fused_group_norm

__all__ = ["flash_attention", "flash_attention_t", "flash_attention_t_fm",
           "build_contributor_table", "fused_tile_blend", "fused_group_norm"]
