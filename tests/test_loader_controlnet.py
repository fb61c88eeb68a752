"""Checkpoint-name translation + ControlNet residual plumbing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from mdu_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    ControlNet,
    UNet2DCondition,
    VAEConfig,
    clip_l_config,
    convert_params,
    random_params,
    sd15_unet_config,
    tiny_unet_config,
    translate_clip_name,
    translate_controlnet_name,
    translate_unet_name,
    translate_vae_name,
)


def _flat_names(module, *args):
    shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args))
    return list(traverse_util.flatten_dict(shapes["params"], sep="/").keys()), shapes


def test_unet_translation_produces_canonical_diffusers_keys():
    unet = UNet2DCondition(sd15_unet_config())
    names, _ = _flat_names(unet, jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)),
                           jnp.zeros((1, 77, 768)))
    keys = {translate_unet_name(n) for n in names}
    expected = [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "time_embedding.linear_2.bias",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias",
        "down_blocks.0.attentions.1.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.1.resnets.0.conv_shortcut.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.attentions.0.proj_in.weight",
        "mid_block.resnets.1.time_emb_proj.weight",
        "up_blocks.3.resnets.2.norm2.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]
    for k in expected:
        assert k in keys, f"missing {k}"
    assert len(keys) == len(names), "translation must be injective"


def test_vae_translation_produces_canonical_diffusers_keys():
    vae = AutoencoderKL(VAEConfig())
    names, _ = _flat_names(vae, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    keys = {translate_vae_name(n) for n in names}
    for k in [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.1.resnets.0.conv_shortcut.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.attentions.0.to_out.0.bias",
        "encoder.mid_block.resnets.1.conv2.weight",
        "encoder.conv_norm_out.weight",
        "decoder.up_blocks.3.resnets.2.conv1.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "quant_conv.weight",
        "post_quant_conv.bias",
    ]:
        assert k in keys, f"missing {k}"
    assert len(keys) == len(names)


def test_clip_translation():
    clip = CLIPTextModel(clip_l_config())
    names, _ = _flat_names(clip, jnp.zeros((1, 77), jnp.int32))
    keys = {translate_clip_name(n) for n in names}
    for k in [
        "text_model.embeddings.token_embedding.weight",
        "text_model.embeddings.position_embedding.weight",
        "text_model.encoder.layers.0.layer_norm1.weight",
        "text_model.encoder.layers.11.self_attn.q_proj.weight",
        "text_model.encoder.layers.11.mlp.fc2.bias",
        "text_model.final_layer_norm.bias",
    ]:
        assert k in keys, f"missing {k}"


def test_convert_params_roundtrip():
    """Synthesize a 'checkpoint' from translated names and load it back."""
    unet = UNet2DCondition(tiny_unet_config())
    names, shapes = _flat_names(unet, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                                jnp.zeros((1, 7, 16)))
    flat = traverse_util.flatten_dict(shapes["params"], sep="/")
    rng = np.random.default_rng(0)
    state = {translate_unet_name(n): rng.normal(size=flat[n].shape).astype(np.float32)
             for n in names}
    params = convert_params(shapes, state, translate_unet_name)
    got = traverse_util.flatten_dict(params["params"], sep="/")
    for n in names:
        np.testing.assert_array_equal(np.asarray(got[n]), state[translate_unet_name(n)])


def test_convert_params_strict_missing():
    unet = UNet2DCondition(tiny_unet_config())
    _, shapes = _flat_names(unet, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                            jnp.zeros((1, 7, 16)))
    with pytest.raises(KeyError):
        convert_params(shapes, {}, translate_unet_name)


def test_controlnet_zero_init_is_identity():
    """Freshly-initialized ControlNet residuals are all zero, so the UNet
    output with residuals equals the output without."""
    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    cn = ControlNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
    t = jnp.array([5.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, cfg.cross_attention_dim))
    hint = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 128, 128))

    up = random_params(unet, 0, x, t, ctx)
    cp = random_params(cn, 1, x, t, ctx, hint)
    res = jax.jit(cn.apply)(cp, x, t, ctx, hint)
    down, mid = res
    assert len(down) == 12                       # conv_in + 3*(2+1) + 2
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0    # zero convs start at zero
    base = jax.jit(unet.apply)(up, x, t, ctx)
    with_res = jax.jit(lambda p, x, t, c, r: unet.apply(p, x, t, c, residuals=r))(
        up, x, t, ctx, res)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_res), atol=1e-6)


def test_controlnet_translation_keys():
    cfg = tiny_unet_config()
    cn = ControlNet(cfg)
    x = jnp.zeros((1, 4, 16, 16))
    names, _ = _flat_names(cn, x, jnp.zeros((1,)), jnp.zeros((1, 7, 16)),
                           jnp.zeros((1, 3, 128, 128)))
    keys = {translate_controlnet_name(n) for n in names}
    for k in [
        "controlnet_cond_embedding.conv_in.weight",
        "controlnet_cond_embedding.blocks.0.weight",
        "controlnet_cond_embedding.conv_out.weight",
        "controlnet_down_blocks.0.weight",
        "controlnet_mid_block.bias",
        "time_embedding.linear_1.weight",
    ]:
        assert k in keys, f"missing {k}"


def test_load_pipeline_sdxl_folder(tmp_path):
    """A tiny SDXL-layout checkpoint folder loads into an SDXLConditioner +
    pipeline that generates end to end."""
    import dataclasses
    import json
    import os

    from safetensors.numpy import save_file

    from mdu_tpu.models.loader import (load_pipeline, translate_clip_name,
                                       translate_vae_name)
    from mdu_tpu.models import VAEConfig, CLIPTextConfig
    from mdu_tpu.models.unet import UNetConfig
    from mdu_tpu.text.sdxl import SDXLConditioner

    root = tmp_path / "sdxl"
    rng = np.random.default_rng(0)

    def dump(module, init_args, translate, sub, fname, cfg_json):
        shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *init_args))
        flat = traverse_util.flatten_dict(shapes["params"], sep="/")
        state = {translate(n): (rng.normal(size=l.shape) * 0.05).astype(np.float32)
                 for n, l in flat.items()}
        os.makedirs(root / sub, exist_ok=True)
        save_file(state, str(root / sub / fname))
        json.dump(cfg_json, open(root / sub / "config.json", "w"))

    ucfg = UNetConfig(block_out_channels=(8, 16, 16), cross_attention_dim=16,
                      num_heads=None, head_dim=8, transformer_layers=(0, 1, 2),
                      use_linear_projection=True, addition_embed_type="text_time",
                      addition_time_embed_dim=8, addition_pooled_dim=16,
                      norm_num_groups=4)
    unet = UNet2DCondition(ucfg)
    added = {"text_embeds": jnp.zeros((1, 16)), "time_ids": jnp.ones((1, 6))}
    dump(unet, (jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)),
                jnp.zeros((1, 77, 16)), added), translate_unet_name,
         "unet", "diffusion_pytorch_model.safetensors",
         {"block_out_channels": [8, 16, 16], "cross_attention_dim": 16,
          "attention_head_dim": [8, 8, 8], "norm_num_groups": 4,
          "transformer_layers_per_block": [0, 1, 2],
          "use_linear_projection": True, "addition_embed_type": "text_time",
          "addition_time_embed_dim": 8,
          "projection_class_embeddings_input_dim": 16 + 6 * 8,
          "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                                "CrossAttnDownBlock2D"]})
    vcfg = dataclasses.replace(VAEConfig(), block_out_channels=(8, 8, 16, 16),
                               norm_num_groups=4)
    vae = AutoencoderKL(vcfg)
    dump(vae, (jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0)),
         translate_vae_name, "vae", "diffusion_pytorch_model.safetensors",
         {"block_out_channels": [8, 8, 16, 16], "norm_num_groups": 4})

    for sub, hidden, proj in (("text_encoder", 8, None), ("text_encoder_2", 8, 16)):
        ccfg = CLIPTextConfig(vocab_size=100, hidden_size=hidden, num_layers=2,
                              num_heads=2, max_length=77, projection_dim=proj,
                              clip_skip=2)
        clip = CLIPTextModel(ccfg)
        cfg_json = {"vocab_size": 100, "hidden_size": hidden,
                    "num_hidden_layers": 2, "num_attention_heads": 2,
                    "max_position_embeddings": 77}
        if proj:
            cfg_json["projection_dim"] = proj
        dump(clip, (jnp.zeros((1, 77), jnp.int32),), translate_clip_name,
             sub, "model.safetensors", cfg_json)

    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "a</w>": 2, "cat</w>": 3}
    for tdir in ("tokenizer", "tokenizer_2"):
        os.makedirs(root / tdir, exist_ok=True)
        json.dump(vocab, open(root / tdir / "vocab.json", "w"))
        open(root / tdir / "merges.txt", "w").write("#v\n")

    pipe, conditioner = load_pipeline(str(root))
    assert isinstance(conditioner, SDXLConditioner)
    cond, uncond = conditioner.pair("a cat", "", 128, 128)
    assert cond["crossattn"].shape[-1] == 16     # 8 + 8
    assert cond["vector"].shape == (1, 16)
    from mdu_tpu.config import SamplerConfig
    res = pipe.txt2img(cond, uncond, 128, 128, SamplerConfig(steps=2), seed=1,
                       decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
