"""Checkpoint loading: diffusers-layout safetensors -> framework params.

The reference gets weights for free from A1111's checkpoint machinery
(SURVEY.md L0).  Here every module family (UNet / VAE / CLIP / ControlNet)
uses torch parameter layouts (OIHW convs, [out,in] linears — models/layers.py),
so conversion is pure name translation with no transposes.

Layout on disk = the standard diffusers pipeline folder:
  unet/diffusion_pytorch_model.safetensors
  vae/diffusion_pytorch_model.safetensors
  text_encoder/model.safetensors
  tokenizer/vocab.json + merges.txt
"""
from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a flat name->ndarray state dict from a .safetensors file, or —
    for the legacy pickle ``.ckpt`` format A1111 users still carry — via
    torch.load(weights_only=True) (safe unpickling, no code execution)."""
    if path.endswith(".ckpt"):
        return _load_torch_ckpt(path)
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _load_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"{path}: legacy pickle .ckpt checkpoints need torch to load; "
            "convert to .safetensors instead") from e
    obj = torch.load(path, map_location="cpu", weights_only=True)
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, t in state.items():
        if hasattr(t, "numpy"):
            out[k] = t.float().numpy() if t.dtype == torch.bfloat16 else t.numpy()
    return out


def _sub_transformer(rest: str) -> str:
    """Our Transformer2D subtree name -> diffusers suffix."""
    m = re.match(r"block_(\d+)/(.*)", rest)
    if m:
        d, inner = m.group(1), m.group(2)
        inner = inner.replace("attn1/to_out", "attn1.to_out.0")
        inner = inner.replace("attn2/to_out", "attn2.to_out.0")
        inner = inner.replace("ff/proj", "ff.net.0.proj")
        inner = inner.replace("ff/out", "ff.net.2")
        inner = inner.replace("/", ".")
        return f"transformer_blocks.{d}.{inner}"
    return rest.replace("/", ".")


def translate_unet_name(name: str) -> str:
    """Our flat UNet param path (sep '/') -> diffusers key (sans .weight/.bias)."""
    parts = name.split("/")
    head = parts[0]

    m = re.match(r"time_embed_(\d)", head)
    if m:
        return f"time_embedding.linear_{m.group(1)}." + parts[-1]
    m = re.match(r"add_embed_(\d)", head)
    if m:
        return f"add_embedding.linear_{m.group(1)}." + parts[-1]
    if head in ("conv_in", "conv_out"):
        return f"{head}." + parts[-1]
    if head == "norm_out":
        return "conv_norm_out." + parts[-1]

    m = re.match(r"(down|up)_(\d+)_res_(\d+)", head)
    if m:
        return (f"{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(3)}."
                + ".".join(parts[1:]))
    m = re.match(r"(down|up)_(\d+)_attn_(\d+)", head)
    if m:
        return (f"{m.group(1)}_blocks.{m.group(2)}.attentions.{m.group(3)}."
                + _sub_transformer("/".join(parts[1:])))
    m = re.match(r"down_(\d+)_downsample", head)
    if m:
        return f"down_blocks.{m.group(1)}.downsamplers.0." + ".".join(parts[1:])
    m = re.match(r"up_(\d+)_upsample", head)
    if m:
        return f"up_blocks.{m.group(1)}.upsamplers.0." + ".".join(parts[1:])
    m = re.match(r"mid_res_(\d)", head)
    if m:
        return f"mid_block.resnets.{m.group(1)}." + ".".join(parts[1:])
    if head == "mid_attn":
        return "mid_block.attentions.0." + _sub_transformer("/".join(parts[1:]))
    raise KeyError(f"unmapped UNet param: {name}")


def translate_vae_name(name: str) -> str:
    parts = name.split("/")
    head = parts[0]
    if head in ("quant_conv", "post_quant_conv"):
        return f"{head}." + parts[-1]
    coder = head                     # 'encoder' | 'decoder'
    sub = parts[1]
    rest = parts[2:]

    def attn(rest):
        inner = "/".join(rest)
        inner = inner.replace("to_out", "to_out.0")
        return inner.replace("/", ".")

    if sub in ("conv_in", "conv_out"):
        return f"{coder}.{sub}." + rest[-1]
    if sub == "norm_out":
        return f"{coder}.conv_norm_out." + rest[-1]
    m = re.match(r"down_(\d+)_block_(\d+)", sub)
    if m:
        return (f"{coder}.down_blocks.{m.group(1)}.resnets.{m.group(2)}."
                + ".".join(rest))
    m = re.match(r"down_(\d+)_downsample", sub)
    if m:
        return f"{coder}.down_blocks.{m.group(1)}.downsamplers.0." + ".".join(rest)
    m = re.match(r"up_(\d+)_block_(\d+)", sub)
    if m:
        return (f"{coder}.up_blocks.{m.group(1)}.resnets.{m.group(2)}."
                + ".".join(rest))
    m = re.match(r"up_(\d+)_upsample", sub)
    if m:
        return f"{coder}.up_blocks.{m.group(1)}.upsamplers.0." + ".".join(rest)
    if sub == "mid":
        inner = parts[2]
        if inner == "block_1":
            return f"{coder}.mid_block.resnets.0." + ".".join(parts[3:])
        if inner == "block_2":
            return f"{coder}.mid_block.resnets.1." + ".".join(parts[3:])
        if inner == "attn_1":
            return f"{coder}.mid_block.attentions.0." + attn(parts[3:])
    raise KeyError(f"unmapped VAE param: {name}")


def translate_clip_name(name: str) -> str:
    parts = name.split("/")
    head = parts[0]
    if head == "token_embedding":
        return "text_model.embeddings.token_embedding.weight"
    if head == "position_embedding":
        return "text_model.embeddings.position_embedding.weight"
    if head == "ln_final":
        return "text_model.final_layer_norm." + parts[-1]
    if head == "text_projection":
        return "text_projection.weight"
    m = re.match(r"layer_(\d+)", head)
    if m:
        i = m.group(1)
        sub = parts[1]
        leaf = parts[-1]
        table = {"ln1": "layer_norm1", "ln2": "layer_norm2",
                 "q": "self_attn.q_proj", "k": "self_attn.k_proj",
                 "v": "self_attn.v_proj", "out": "self_attn.out_proj",
                 "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
        return f"text_model.encoder.layers.{i}.{table[sub]}.{leaf}"
    raise KeyError(f"unmapped CLIP param: {name}")


def translate_controlnet_name(name: str) -> str:
    parts = name.split("/")
    head = parts[0]
    if head == "cond_embedding":
        sub = parts[1]
        m = re.match(r"block_(\d+)", sub)
        if m:
            return f"controlnet_cond_embedding.blocks.{m.group(1)}." + parts[-1]
        return f"controlnet_cond_embedding.{sub}." + parts[-1]
    m = re.match(r"zero_(\d+)", head)
    if m:
        return f"controlnet_down_blocks.{m.group(1)}." + parts[-1]
    if head == "zero_mid":
        return "controlnet_mid_block." + parts[-1]
    return translate_unet_name(name)


# VAE checkpoints older than diffusers 0.17 use query/key/value/proj_attn
_VAE_ATTN_ALIASES = {
    "to_q": "query", "to_k": "key", "to_v": "value", "to_out.0": "proj_attn",
}


def convert_params(
    target_shapes: Any,
    state: Dict[str, np.ndarray],
    translate: Callable[[str], str],
    strict: bool = True,
) -> Any:
    """Fill a param tree (from jax.eval_shape) with translated state entries."""
    flat = traverse_util.flatten_dict(target_shapes["params"], sep="/")
    out = {}
    missing = []
    for name, leaf in flat.items():
        key = translate(name)
        t = state.get(key)
        if t is None:
            for ours, old in _VAE_ATTN_ALIASES.items():
                alt = key.replace(ours, old)
                if alt in state:
                    t = state[alt]
                    break
        if t is None:
            missing.append(key)
            continue
        t = np.asarray(t)
        if t.shape != leaf.shape:
            # old-layout VAE attention stores 1x1 convs [C,C,1,1] for linears
            if t.ndim == 4 and t.shape[2:] == (1, 1) and t.shape[:2] == leaf.shape:
                t = t[:, :, 0, 0]
            else:
                raise ValueError(f"{name}: shape {t.shape} != expected {leaf.shape}")
        out[name] = jnp.asarray(t.astype(np.float32)).astype(leaf.dtype)
    if missing and strict:
        raise KeyError(f"missing {len(missing)} params, first: {missing[:5]}")
    return {"params": traverse_util.unflatten_dict(out, sep="/")}


def _read_json(path: str) -> Optional[dict]:
    import json

    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    return None


def _unet_config_from_json(d: Optional[dict]):
    """diffusers unet/config.json -> UNetConfig (SD1.5 defaults if absent)."""
    import dataclasses

    from .unet import sd15_unet_config

    cfg = sd15_unet_config()
    if not d:
        return cfg
    bc = tuple(d.get("block_out_channels", cfg.block_out_channels))
    down = d.get("down_block_types", ["CrossAttnDownBlock2D"] * (len(bc) - 1) + ["DownBlock2D"])
    tl = d.get("transformer_layers_per_block", 1)
    if isinstance(tl, int):
        tl = [tl] * len(bc)
    layers = tuple(t if "CrossAttn" in b else 0 for t, b in zip(tl, down))
    head_dim = d.get("attention_head_dim", 8)
    if isinstance(head_dim, (list, tuple)):
        # list = per-block head COUNTS (SD2.x [5,10,20,20], SDXL [5,10,20]):
        # the fixed head dim is channels/heads, 320//5 = 64
        num_heads, hd = None, bc[0] // head_dim[0]
    else:
        # diffusers pre-SD2 used scalar attention_head_dim to mean NUM HEADS (8)
        num_heads, hd = (head_dim, None) if head_dim <= 16 else (None, head_dim)
    return dataclasses.replace(
        cfg,
        in_channels=d.get("in_channels", 4),
        out_channels=d.get("out_channels", 4),
        block_out_channels=bc,
        layers_per_block=d.get("layers_per_block", 2),
        cross_attention_dim=d.get("cross_attention_dim", 768),
        num_heads=num_heads, head_dim=hd,
        transformer_layers=layers,
        use_linear_projection=d.get("use_linear_projection", False),
        addition_embed_type=d.get("addition_embed_type"),
        addition_time_embed_dim=d.get("addition_time_embed_dim", 256),
        addition_pooled_dim=(
            d["projection_class_embeddings_input_dim"]
            - 6 * d.get("addition_time_embed_dim", 256)
            if "projection_class_embeddings_input_dim" in d else 1280),
        norm_num_groups=d.get("norm_num_groups", 32),
    )


def _vae_config_from_json(d: Optional[dict]):
    import dataclasses

    from .vae import VAEConfig

    cfg = VAEConfig()
    if not d:
        return cfg
    return dataclasses.replace(
        cfg,
        block_out_channels=tuple(d.get("block_out_channels", cfg.block_out_channels)),
        latent_channels=d.get("latent_channels", 4),
        layers_per_block=d.get("layers_per_block", 2),
        norm_num_groups=d.get("norm_num_groups", 32),
        scaling_factor=d.get("scaling_factor", 0.18215),
    )


def _clip_config_from_json(d: Optional[dict], clip_skip: int = 1,
                           ln_penultimate: bool = True):
    import dataclasses

    from .clip import clip_l_config

    cfg = clip_l_config()
    if not d:
        return dataclasses.replace(cfg, clip_skip=clip_skip,
                                   ln_penultimate=ln_penultimate)
    return dataclasses.replace(
        cfg,
        vocab_size=d.get("vocab_size", cfg.vocab_size),
        hidden_size=d.get("hidden_size", cfg.hidden_size),
        num_layers=d.get("num_hidden_layers", cfg.num_layers),
        num_heads=d.get("num_attention_heads", cfg.num_heads),
        max_length=d.get("max_position_embeddings", cfg.max_length),
        hidden_act=d.get("hidden_act", cfg.hidden_act),
        projection_dim=d.get("projection_dim") if "projection_dim" in d else cfg.projection_dim,
        clip_skip=clip_skip,
        ln_penultimate=ln_penultimate,
    )


def load_pipeline(model_dir: str, dtype=jnp.float32, schedule=None):
    """Build a DiffusionPipeline + TextConditioner from a diffusers folder.

    Each component's config.json is honored (block channels, attention
    sizes, norm groups, ...); missing configs fall back to SD-1.5 defaults.
    """
    import jax

    from ..pipeline import DiffusionPipeline
    from ..text import CLIPTokenizer, TextConditioner
    from .clip import CLIPTextModel
    from .unet import UNet2DCondition
    from .vae import AutoencoderKL

    ucfg = _unet_config_from_json(_read_json(os.path.join(model_dir, "unet", "config.json")))
    vcfg = _vae_config_from_json(_read_json(os.path.join(model_dir, "vae", "config.json")))
    is_sdxl = ucfg.addition_embed_type == "text_time" or os.path.exists(
        os.path.join(model_dir, "text_encoder_2"))
    # SDXL conditioners take the RAW penultimate hidden states (sgm/diffusers
    # hidden_states[-2], no final LayerNorm); A1111-style clip-skip (SD1/SD2)
    # LayerNorms them
    ccfg = _clip_config_from_json(
        _read_json(os.path.join(model_dir, "text_encoder", "config.json")),
        clip_skip=2 if is_sdxl else 1, ln_penultimate=not is_sdxl)
    from .unet import default_unet_layout

    unet = UNet2DCondition(ucfg, dtype=dtype, layout=default_unet_layout())
    vae = AutoencoderKL(vcfg, dtype=dtype)
    clip = CLIPTextModel(ccfg, dtype=dtype)

    def shapes(module, *args):
        return jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args))

    u_state = load_safetensors(
        os.path.join(model_dir, "unet", "diffusion_pytorch_model.safetensors"))
    added = None
    if ucfg.addition_embed_type == "text_time":
        added = {"text_embeds": jnp.zeros((1, ucfg.addition_pooled_dim)),
                 "time_ids": jnp.ones((1, ucfg.num_time_ids))}
    u_shapes = shapes(unet, jnp.zeros((1, ucfg.in_channels, 8, 8)), jnp.zeros((1,)),
                      jnp.zeros((1, 77, ucfg.cross_attention_dim)), added)
    unet_params = convert_params(u_shapes, u_state, translate_unet_name)

    v_state = load_safetensors(
        os.path.join(model_dir, "vae", "diffusion_pytorch_model.safetensors"))
    v_shapes = shapes(vae, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    vae_params = convert_params(v_shapes, v_state, translate_vae_name)

    c_state = load_safetensors(
        os.path.join(model_dir, "text_encoder", "model.safetensors"))
    c_shapes = shapes(clip, jnp.zeros((1, ccfg.max_length), jnp.int32))
    clip_params = convert_params(c_shapes, c_state, translate_clip_name)

    tok = CLIPTokenizer.from_files(
        os.path.join(model_dir, "tokenizer", "vocab.json"),
        os.path.join(model_dir, "tokenizer", "merges.txt"))

    if schedule is None:
        sd = _read_json(os.path.join(model_dir, "scheduler", "scheduler_config.json"))
        if sd:
            from ..samplers.schedule import NoiseSchedule

            schedule = NoiseSchedule(
                num_train_timesteps=sd.get("num_train_timesteps", 1000),
                beta_start=sd.get("beta_start", 0.00085),
                beta_end=sd.get("beta_end", 0.012),
                beta_schedule=sd.get("beta_schedule", "scaled_linear"),
                prediction_type=sd.get("prediction_type", "epsilon"))

    pipe = DiffusionPipeline(unet, unet_params, vae, vae_params, schedule)
    conditioner = TextConditioner(clip, clip_params, tok)

    te2_dir = os.path.join(model_dir, "text_encoder_2")
    if is_sdxl and os.path.exists(te2_dir):
        from ..text.sdxl import SDXLConditioner

        ccfg2 = _clip_config_from_json(
            _read_json(os.path.join(te2_dir, "config.json")), clip_skip=2,
            ln_penultimate=False)
        clip2 = CLIPTextModel(ccfg2, dtype=dtype)
        c2_state = load_safetensors(os.path.join(te2_dir, "model.safetensors"))
        c2_shapes = shapes(clip2, jnp.zeros((1, ccfg2.max_length), jnp.int32))
        clip2_params = convert_params(c2_shapes, c2_state, translate_clip_name)
        tok2 = CLIPTokenizer.from_files(
            os.path.join(model_dir, "tokenizer_2", "vocab.json"),
            os.path.join(model_dir, "tokenizer_2", "merges.txt"),
            pad_with_eot=False)                  # OpenCLIP pads with 0
        conditioner = SDXLConditioner(
            conditioner, TextConditioner(clip2, clip2_params, tok2))
    return pipe, conditioner


def load_controlnet(path: str, unet_cfg=None, dtype=jnp.float32,
                    conditioning_scale: float = 1.0):
    """Load a ControlNet checkpoint -> (ControlNet module, params).

    ``path`` is a diffusers-layout folder (config.json +
    diffusion_pytorch_model.safetensors) or a bare .safetensors file with
    diffusers keys.  When the folder carries a config.json its architecture
    wins; otherwise ``unet_cfg`` (the paired UNet's config) is used, SD-1.5
    if neither.  The reference reaches ControlNet through the A1111
    extension's hooks (ref tile_methods/abstractdiffusion.py:454-544);
    here the model is owned (models/controlnet.py) and this loader
    translates the public checkpoint layout onto it.
    """
    import jax

    from .controlnet import ControlNet
    from .unet import sd15_unet_config

    if os.path.isdir(path):
        cfg_json = _read_json(os.path.join(path, "config.json"))
        state = load_safetensors(
            os.path.join(path, "diffusion_pytorch_model.safetensors"))
        cfg = _unet_config_from_json(cfg_json) if cfg_json else (
            unet_cfg or sd15_unet_config())
    else:
        state = load_safetensors(path)
        cfg = unet_cfg or sd15_unet_config()
    cn = ControlNet(cfg, conditioning_scale=conditioning_scale, dtype=dtype)
    added = None
    if cfg.addition_embed_type == "text_time":
        added = {"text_embeds": jnp.zeros((1, cfg.addition_pooled_dim)),
                 "time_ids": jnp.ones((1, cfg.num_time_ids))}
    shapes = jax.eval_shape(lambda: cn.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.in_channels, 8, 8)),
        jnp.zeros((1,)), jnp.zeros((1, 77, cfg.cross_attention_dim)),
        jnp.zeros((1, 3, 64, 64)), added))
    params = convert_params(shapes, state, translate_controlnet_name)
    return cn, params


def load_guidance(path: str, unet_cfg, dtype=jnp.float32,
                  guidance_scale: float = 1.0):
    """Load StableSR-style structure-guidance encoder weights ->
    (StableSRGuidance module, params).

    ``path`` is a .safetensors keyed by this framework's flat flax paths
    (e.g. ``down_0_res_0/norm1/scale``) — the guidance encoder is owned
    (models/stablesr.py replaces the reference's StableSR extension
    hook-in, ref abstractdiffusion.py:547-588), so its checkpoint layout
    is ours.  ``scripts/export_params.py`` writes this layout.
    """
    import jax

    from .stablesr import StableSRGuidance

    state = load_safetensors(path)
    gm = StableSRGuidance(unet_cfg, guidance_scale=guidance_scale, dtype=dtype)
    shapes = jax.eval_shape(lambda: gm.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, unet_cfg.out_channels, 8, 8)), jnp.zeros((1,))))
    params = convert_params(shapes, state, lambda n: n)
    return gm, params
