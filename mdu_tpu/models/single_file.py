"""Single-file (CompVis/LDM-layout) checkpoint loading.

The reference runs inside A1111, whose users load one ``.safetensors`` file
with LDM naming (``model.diffusion_model.*``, ``first_stage_model.*``,
``cond_stage_model.*`` — the checkpoints tilevae.py:711 touches as
``p.sd_model.first_stage_model``).  This module maps those names onto the
diffusers-style keys our converters consume (models/loader.py), so
``load_single_file(path)`` builds the same pipeline ``load_pipeline`` does
from a diffusers folder.

Supported: SD1.x and SD2.x UNet+VAE+CLIP; SDXL UNet+VAE+dual text encoders.
OpenCLIP text towers (SD2 / SDXL encoder 2) store fused qkv ``in_proj``
weights, which are split here.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

# ------------------------------------------------------------- UNet names


def _ldm_resnet_sub(rest: str) -> str:
    table = {
        "in_layers.0": "norm1", "in_layers.2": "conv1",
        "emb_layers.1": "time_emb_proj",
        "out_layers.0": "norm2", "out_layers.3": "conv2",
        "skip_connection": "conv_shortcut",
    }
    for k, v in table.items():
        if rest.startswith(k):
            return v + rest[len(k):]
    return rest


def ldm_unet_key_to_diffusers(key: str, n_levels: int = 4,
                              layers_per_block: int = 2) -> Optional[str]:
    """'model.diffusion_model.x' -> diffusers UNet key (None = skip)."""
    if not key.startswith("model.diffusion_model."):
        return None
    k = key[len("model.diffusion_model."):]
    per = layers_per_block + 1

    m = re.match(r"time_embed\.(\d)\.(.*)", k)
    if m:
        return f"time_embedding.linear_{int(m.group(1)) // 2 + 1}.{m.group(2)}"
    m = re.match(r"label_emb\.0\.(\d)\.(.*)", k)           # SDXL add embedding
    if m:
        return f"add_embedding.linear_{int(m.group(1)) // 2 + 1}.{m.group(2)}"
    if k.startswith("input_blocks.0.0."):
        return "conv_in." + k[len("input_blocks.0.0."):]
    if k.startswith("out.0."):
        return "conv_norm_out." + k[len("out.0."):]
    if k.startswith("out.2."):
        return "conv_out." + k[len("out.2."):]

    m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.*)", k)
    if m:
        idx, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        level, j = (idx - 1) // per, (idx - 1) % per
        if j == layers_per_block:                    # the downsample slot
            if rest.startswith("op."):
                return f"down_blocks.{level}.downsamplers.0.conv." + rest[3:]
            return None
        if sub == 0:
            return f"down_blocks.{level}.resnets.{j}." + _ldm_resnet_sub(rest)
        return f"down_blocks.{level}.attentions.{j}." + rest

    m = re.match(r"middle_block\.(\d)\.(.*)", k)
    if m:
        sub, rest = int(m.group(1)), m.group(2)
        if sub == 0:
            return "mid_block.resnets.0." + _ldm_resnet_sub(rest)
        if sub == 1:
            return "mid_block.attentions.0." + rest
        return "mid_block.resnets.1." + _ldm_resnet_sub(rest)

    m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.*)", k)
    if m:
        idx, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        level, j = idx // per, idx % per
        if sub == 0:
            return f"up_blocks.{level}.resnets.{j}." + _ldm_resnet_sub(rest)
        # sub >= 1 is either an attention or the upsample conv
        if rest.startswith("conv."):
            return f"up_blocks.{level}.upsamplers.0." + rest
        return f"up_blocks.{level}.attentions.{j}." + rest
    return None


# -------------------------------------------------------------- VAE names


def ldm_vae_key_to_diffusers(key: str, n_levels: int = 4) -> Optional[str]:
    """'first_stage_model.x' -> diffusers VAE key."""
    if not key.startswith("first_stage_model."):
        return None
    k = key[len("first_stage_model."):]
    if k.startswith(("quant_conv.", "post_quant_conv.")):
        return k
    for coder in ("encoder", "decoder"):
        if not k.startswith(coder + "."):
            continue
        r = k[len(coder) + 1:]
        r = r.replace("nin_shortcut", "conv_shortcut")
        r = r.replace("norm_out", "conv_norm_out")
        m = re.match(r"down\.(\d+)\.block\.(\d+)\.(.*)", r)
        if m:
            return f"{coder}.down_blocks.{m.group(1)}.resnets.{m.group(2)}.{m.group(3)}"
        m = re.match(r"down\.(\d+)\.downsample\.conv\.(.*)", r)
        if m:
            return f"{coder}.down_blocks.{m.group(1)}.downsamplers.0.conv.{m.group(2)}"
        m = re.match(r"up\.(\d+)\.block\.(\d+)\.(.*)", r)
        if m:
            # LDM decoder indexes up blocks in REVERSE of diffusers
            lvl = n_levels - 1 - int(m.group(1))
            return f"{coder}.up_blocks.{lvl}.resnets.{m.group(2)}.{m.group(3)}"
        m = re.match(r"up\.(\d+)\.upsample\.conv\.(.*)", r)
        if m:
            lvl = n_levels - 1 - int(m.group(1))
            return f"{coder}.up_blocks.{lvl}.upsamplers.0.conv.{m.group(2)}"
        m = re.match(r"mid\.block_(\d)\.(.*)", r)
        if m:
            return f"{coder}.mid_block.resnets.{int(m.group(1)) - 1}.{m.group(2)}"
        m = re.match(r"mid\.attn_1\.(.*)", r)
        if m:
            attn = {"q": "to_q", "k": "to_k", "v": "to_v",
                    "proj_out": "to_out.0", "norm": "group_norm"}
            rest = m.group(1)
            for a, b in attn.items():
                if rest.startswith(a + "."):
                    return f"{coder}.mid_block.attentions.0.{b}." + rest[len(a) + 1:]
        return f"{coder}.{r}"
    return None


# ------------------------------------------------------------- CLIP names


def _split_in_proj(out: Dict[str, np.ndarray], prefix: str, t: np.ndarray,
                   leaf: str):
    d = t.shape[0] // 3
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[f"{prefix}self_attn.{name}.{leaf}"] = t[i * d:(i + 1) * d]


def openclip_text_to_hf(state: Dict[str, np.ndarray], prefix: str,
                        ) -> Dict[str, np.ndarray]:
    """OpenCLIP text tower ('<prefix>.transformer.resblocks...') -> HF-CLIP
    names (what translate_clip_name targets), splitting fused in_proj qkv."""
    out: Dict[str, np.ndarray] = {}
    for k, t in state.items():
        if not k.startswith(prefix):
            continue
        r = k[len(prefix):]
        if r.startswith("transformer.resblocks."):
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)", r)
            i, rest = m.group(1), m.group(2)
            p = f"text_model.encoder.layers.{i}."
            table = {"ln_1.": "layer_norm1.", "ln_2.": "layer_norm2.",
                     "mlp.c_fc.": "mlp.fc1.", "mlp.c_proj.": "mlp.fc2.",
                     "attn.out_proj.": "self_attn.out_proj."}
            hit = False
            for a, b in table.items():
                if rest.startswith(a):
                    out[p + b + rest[len(a):]] = t
                    hit = True
                    break
            if hit:
                continue
            m2 = re.match(r"attn\.in_proj_(weight|bias)", rest)
            if m2:
                _split_in_proj(out, p, np.asarray(t), m2.group(1))
            continue
        if r == "token_embedding.weight":
            out["text_model.embeddings.token_embedding.weight"] = t
        elif r == "positional_embedding":
            out["text_model.embeddings.position_embedding.weight"] = t
        elif r.startswith("ln_final."):
            out["text_model.final_layer_norm." + r[len("ln_final."):]] = t
        elif r == "text_projection":
            out["text_projection.weight"] = np.asarray(t).T
    return out


# ------------------------------------------------------- config detection


def detect_arch(state: Dict[str, np.ndarray]) -> str:
    """'sd1' | 'sd2' | 'sdxl' from checkpoint structure."""
    if "conditioner.embedders.1.model.ln_final.weight" in state or any(
            k.startswith("conditioner.embedders.") for k in state):
        return "sdxl"
    k = "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight"
    ctx = state[k].shape[1] if k in state else 768
    return "sd2" if ctx == 1024 else "sd1"


def load_single_file(path: str, dtype=None, schedule=None,
                     tokenizer_dir: Optional[str] = None):
    """Build (DiffusionPipeline, conditioner) from one LDM safetensors file
    (the A1111 checkpoint format the reference's users have).

    Single-file checkpoints carry no tokenizer; pass ``tokenizer_dir``
    (vocab.json + merges.txt) or place a ``tokenizer/`` folder next to the
    checkpoint — otherwise a hash tokenizer stands in (fine for smoke
    tests, wrong for real prompts)."""
    import jax
    import jax.numpy as jnp

    from ..pipeline import DiffusionPipeline
    from ..samplers.schedule import NoiseSchedule
    from ..text import TextConditioner
    from .clip import (CLIPTextModel, clip_l_config, open_clip_bigg_config,
                       open_clip_h_config)
    from .loader import (convert_params, load_safetensors, translate_clip_name,
                         translate_unet_name, translate_vae_name)
    from .unet import (UNet2DCondition, sd15_unet_config, sd21_unet_config,
                       sdxl_unet_config)
    from .vae import AutoencoderKL, VAEConfig

    dtype = dtype or jnp.float32
    state = load_safetensors(path)
    arch = detect_arch(state)
    ucfg = {"sd1": sd15_unet_config, "sd2": sd21_unet_config,
            "sdxl": sdxl_unet_config}[arch]()
    import dataclasses

    ic_key = "model.diffusion_model.input_blocks.0.0.weight"
    if ic_key in state and state[ic_key].shape[1] != ucfg.in_channels:
        ucfg = dataclasses.replace(ucfg, in_channels=state[ic_key].shape[1])

    # ---- UNet / VAE: LDM key names -> diffusers, then the normal converter
    u_state = {}
    for k, t in state.items():
        dk = ldm_unet_key_to_diffusers(k, len(ucfg.block_out_channels),
                                       ucfg.layers_per_block)
        if dk is not None:
            u_state[dk] = t
    v_state = {}
    for k, t in state.items():
        dk = ldm_vae_key_to_diffusers(k)
        if dk is not None:
            v_state[dk] = t

    from .unet import default_unet_layout

    unet = UNet2DCondition(ucfg, dtype=dtype, layout=default_unet_layout())
    # SDXL's VAE uses scaling_factor 0.13025 (vs 0.18215 for SD1/SD2); the
    # diffusers-folder path reads it from vae/config.json, so mirror it here.
    vcfg = VAEConfig(scaling_factor=0.13025) if arch == "sdxl" else VAEConfig()
    vae = AutoencoderKL(vcfg, dtype=dtype)

    def shapes(module, *args):
        return jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args))

    added = None
    if ucfg.addition_embed_type == "text_time":
        added = {"text_embeds": jnp.zeros((1, ucfg.addition_pooled_dim)),
                 "time_ids": jnp.ones((1, ucfg.num_time_ids))}
    u_shapes = shapes(unet, jnp.zeros((1, ucfg.in_channels, 8, 8)), jnp.zeros((1,)),
                      jnp.zeros((1, 77, ucfg.cross_attention_dim)), added)
    unet_params = convert_params(u_shapes, u_state, translate_unet_name)
    v_shapes = shapes(vae, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    vae_params = convert_params(v_shapes, v_state, translate_vae_name)

    # ---- text encoders
    def strip(prefix):
        return {k[len(prefix):]: t for k, t in state.items() if k.startswith(prefix)}

    if arch == "sd1":
        ccfg = clip_l_config()
        c_state = strip("cond_stage_model.transformer.")
    elif arch == "sd2":
        ccfg = open_clip_h_config()
        c_state = openclip_text_to_hf(state, "cond_stage_model.model.")
    else:
        ccfg = dataclasses.replace(clip_l_config(), clip_skip=2,
                                   ln_penultimate=False)
        c_state = strip("conditioner.embedders.0.transformer.")
    clip = CLIPTextModel(ccfg, dtype=dtype)
    c_shapes = shapes(clip, jnp.zeros((1, ccfg.max_length), jnp.int32))
    clip_params = convert_params(c_shapes, c_state, translate_clip_name,
                                 strict=(arch != "sd1"))

    if schedule is None:
        schedule = NoiseSchedule(prediction_type=(
            "v_prediction" if arch == "sd2" and _is_v_model(state) else "epsilon"))

    import os as _os
    import sys as _sys

    tok = tok2 = None
    td = tokenizer_dir or _os.path.join(_os.path.dirname(_os.path.abspath(path)),
                                        "tokenizer")
    if _os.path.exists(_os.path.join(td, "vocab.json")):
        from ..text.tokenizer import CLIPTokenizer

        tok = CLIPTokenizer.from_files(_os.path.join(td, "vocab.json"),
                                       _os.path.join(td, "merges.txt"))
        tok2 = CLIPTokenizer.from_files(_os.path.join(td, "vocab.json"),
                                        _os.path.join(td, "merges.txt"),
                                        pad_with_eot=False)
    else:
        print("[mdu_tpu] single-file load: no tokenizer files found "
              f"({td}); using a hash tokenizer — pass tokenizer_dir for "
              "real prompts", file=_sys.stderr)

    pipe = DiffusionPipeline(unet, unet_params, vae, vae_params, schedule)
    conditioner = TextConditioner(clip, clip_params, tok)

    if arch == "sdxl":
        from ..text.sdxl import SDXLConditioner

        ccfg2 = open_clip_bigg_config()
        c2 = openclip_text_to_hf(state, "conditioner.embedders.1.model.")
        clip2 = CLIPTextModel(ccfg2, dtype=dtype)
        c2_shapes = shapes(clip2, jnp.zeros((1, ccfg2.max_length), jnp.int32))
        clip2_params = convert_params(c2_shapes, c2, translate_clip_name)
        conditioner = SDXLConditioner(conditioner,
                                      TextConditioner(clip2, clip2_params, tok2))
    return pipe, conditioner


def _is_v_model(state) -> bool:
    """SD2.1-v detection heuristic: 768-v checkpoints carry no marker; default
    to epsilon unless the caller passes a schedule (A1111 reads a .yaml)."""
    return False
