"""Single-file (LDM/CompVis) checkpoint loading — the A1111 checkpoint
format the reference's users bring (models/single_file.py)."""
import numpy as np
import pytest

from mdu_tpu.models.single_file import (
    detect_arch,
    ldm_unet_key_to_diffusers,
    ldm_vae_key_to_diffusers,
    openclip_text_to_hf,
)

P = "model.diffusion_model."
V = "first_stage_model."


@pytest.mark.parametrize("ldm,expected", [
    (P + "time_embed.0.weight", "time_embedding.linear_1.weight"),
    (P + "time_embed.2.bias", "time_embedding.linear_2.bias"),
    (P + "label_emb.0.0.weight", "add_embedding.linear_1.weight"),
    (P + "input_blocks.0.0.weight", "conv_in.weight"),
    (P + "input_blocks.1.0.in_layers.0.weight", "down_blocks.0.resnets.0.norm1.weight"),
    (P + "input_blocks.1.0.in_layers.2.weight", "down_blocks.0.resnets.0.conv1.weight"),
    (P + "input_blocks.2.0.emb_layers.1.bias", "down_blocks.0.resnets.1.time_emb_proj.bias"),
    (P + "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight",
     "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"),
    (P + "input_blocks.3.0.op.weight", "down_blocks.0.downsamplers.0.conv.weight"),
    (P + "input_blocks.4.0.skip_connection.weight", "down_blocks.1.resnets.0.conv_shortcut.weight"),
    (P + "input_blocks.4.0.out_layers.3.weight", "down_blocks.1.resnets.0.conv2.weight"),
    (P + "middle_block.0.in_layers.2.weight", "mid_block.resnets.0.conv1.weight"),
    (P + "middle_block.1.proj_in.weight", "mid_block.attentions.0.proj_in.weight"),
    (P + "middle_block.2.out_layers.0.weight", "mid_block.resnets.1.norm2.weight"),
    (P + "output_blocks.0.0.in_layers.2.weight", "up_blocks.0.resnets.0.conv1.weight"),
    (P + "output_blocks.2.1.conv.weight", "up_blocks.0.upsamplers.0.conv.weight"),
    (P + "output_blocks.3.1.transformer_blocks.0.ff.net.0.proj.weight",
     "up_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj.weight"),
    (P + "output_blocks.5.2.conv.weight", "up_blocks.1.upsamplers.0.conv.weight"),
    (P + "out.0.weight", "conv_norm_out.weight"),
    (P + "out.2.bias", "conv_out.bias"),
    ("first_stage_model.encoder.conv_in.weight", None),   # not a unet key
])
def test_ldm_unet_key_translation(ldm, expected):
    assert ldm_unet_key_to_diffusers(ldm) == expected


@pytest.mark.parametrize("ldm,expected", [
    (V + "encoder.conv_in.weight", "encoder.conv_in.weight"),
    (V + "encoder.down.0.block.0.norm1.weight", "encoder.down_blocks.0.resnets.0.norm1.weight"),
    (V + "encoder.down.0.block.1.nin_shortcut.weight",
     "encoder.down_blocks.0.resnets.1.conv_shortcut.weight"),
    (V + "encoder.down.1.downsample.conv.weight",
     "encoder.down_blocks.1.downsamplers.0.conv.weight"),
    (V + "encoder.mid.block_1.conv1.weight", "encoder.mid_block.resnets.0.conv1.weight"),
    (V + "encoder.mid.attn_1.q.weight", "encoder.mid_block.attentions.0.to_q.weight"),
    (V + "encoder.mid.attn_1.proj_out.bias", "encoder.mid_block.attentions.0.to_out.0.bias"),
    (V + "encoder.mid.attn_1.norm.weight", "encoder.mid_block.attentions.0.group_norm.weight"),
    (V + "encoder.norm_out.weight", "encoder.conv_norm_out.weight"),
    # decoder up blocks index in REVERSE in LDM
    (V + "decoder.up.3.block.0.conv1.weight", "decoder.up_blocks.0.resnets.0.conv1.weight"),
    (V + "decoder.up.0.block.2.conv2.weight", "decoder.up_blocks.3.resnets.2.conv2.weight"),
    (V + "decoder.up.1.upsample.conv.weight", "decoder.up_blocks.2.upsamplers.0.conv.weight"),
    (V + "quant_conv.weight", "quant_conv.weight"),
    (V + "post_quant_conv.bias", "post_quant_conv.bias"),
])
def test_ldm_vae_key_translation(ldm, expected):
    assert ldm_vae_key_to_diffusers(ldm) == expected


def test_openclip_in_proj_split():
    rng = np.random.default_rng(0)
    D = 8
    w = rng.normal(size=(3 * D, D)).astype(np.float32)
    b = rng.normal(size=(3 * D,)).astype(np.float32)
    state = {
        "m.transformer.resblocks.0.attn.in_proj_weight": w,
        "m.transformer.resblocks.0.attn.in_proj_bias": b,
        "m.transformer.resblocks.0.attn.out_proj.weight": rng.normal(size=(D, D)).astype(np.float32),
        "m.transformer.resblocks.0.ln_1.weight": np.ones(D, np.float32),
        "m.transformer.resblocks.0.mlp.c_fc.weight": rng.normal(size=(4 * D, D)).astype(np.float32),
        "m.token_embedding.weight": rng.normal(size=(100, D)).astype(np.float32),
        "m.positional_embedding": rng.normal(size=(16, D)).astype(np.float32),
        "m.ln_final.weight": np.ones(D, np.float32),
        "m.text_projection": rng.normal(size=(D, D)).astype(np.float32),
    }
    out = openclip_text_to_hf(state, "m.")
    np.testing.assert_array_equal(
        out["text_model.encoder.layers.0.self_attn.q_proj.weight"], w[:D])
    np.testing.assert_array_equal(
        out["text_model.encoder.layers.0.self_attn.v_proj.weight"], w[2 * D:])
    np.testing.assert_array_equal(
        out["text_model.encoder.layers.0.self_attn.k_proj.bias"], b[D:2 * D])
    assert "text_model.encoder.layers.0.layer_norm1.weight" in out
    assert "text_model.encoder.layers.0.mlp.fc1.weight" in out
    assert "text_model.embeddings.position_embedding.weight" in out
    # text_projection transposed to [out, in] torch-linear layout
    np.testing.assert_array_equal(out["text_projection.weight"],
                                  state["m.text_projection"].T)


def test_detect_arch():
    assert detect_arch({"conditioner.embedders.0.x": 1}) == "sdxl"
    k = "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn2.to_k.weight"
    assert detect_arch({k: np.zeros((320, 1024))}) == "sd2"
    assert detect_arch({k: np.zeros((320, 768))}) == "sd1"
    assert detect_arch({}) == "sd1"


def test_single_file_unet_state_roundtrip():
    """Invert our own framework->diffusers translation through the LDM map:
    every SD1.5 UNet param must be reachable from some LDM-named key."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from mdu_tpu.models import UNet2DCondition, sd15_unet_config, translate_unet_name

    unet = UNet2DCondition(sd15_unet_config())
    shapes = jax.eval_shape(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 768))))
    ours = {translate_unet_name(n)
            for n in traverse_util.flatten_dict(shapes["params"], sep="/")}

    # enumerate the full SD1.5 LDM key space and map it
    ldm_keys = []
    for leaf in ("weight", "bias"):
        ldm_keys += [f"{P}time_embed.0.{leaf}", f"{P}time_embed.2.{leaf}",
                     f"{P}input_blocks.0.0.{leaf}", f"{P}out.0.{leaf}",
                     f"{P}out.2.{leaf}"]
        for idx in range(1, 12):
            for rest in ("in_layers.0", "in_layers.2", "emb_layers.1",
                         "out_layers.0", "out_layers.3", "skip_connection"):
                ldm_keys.append(f"{P}input_blocks.{idx}.0.{rest}.{leaf}")
            ldm_keys.append(f"{P}input_blocks.{idx}.0.op.{leaf}")
            for rest in ("norm", "proj_in", "proj_out"):
                ldm_keys.append(f"{P}input_blocks.{idx}.1.{rest}.{leaf}")
        for idx in range(12):
            for rest in ("in_layers.0", "in_layers.2", "emb_layers.1",
                         "out_layers.0", "out_layers.3", "skip_connection"):
                ldm_keys.append(f"{P}output_blocks.{idx}.0.{rest}.{leaf}")
            for sub in (1, 2):
                ldm_keys.append(f"{P}output_blocks.{idx}.{sub}.conv.{leaf}")
                for rest in ("norm", "proj_in", "proj_out"):
                    ldm_keys.append(f"{P}output_blocks.{idx}.{sub}.{rest}.{leaf}")
        for sub in (0, 2):
            for rest in ("in_layers.0", "in_layers.2", "emb_layers.1",
                         "out_layers.0", "out_layers.3"):
                ldm_keys.append(f"{P}middle_block.{sub}.{rest}.{leaf}")
        for rest in ("norm", "proj_in", "proj_out"):
            ldm_keys.append(f"{P}middle_block.1.{rest}.{leaf}")

    mapped = {ldm_unet_key_to_diffusers(k) for k in ldm_keys} - {None}
    # every one of OUR non-attention-block params must be covered by the map
    missing = {o for o in ours
               if o not in mapped and "transformer_blocks" not in o}
    assert not missing, f"unreachable params: {sorted(missing)[:8]}"


def test_load_single_file_end_to_end(tmp_path, monkeypatch):
    """Synthesize a tiny LDM-named checkpoint and load it through
    load_single_file: every param must land (strict convert), and the
    pipeline must run one txt2img step."""
    import jax.numpy as jnp
    from flax import traverse_util

    from mdu_tpu.models import (tiny_clip_config, tiny_unet_config,
                                tiny_vae_config)
    from mdu_tpu.models.single_file import load_single_file

    from synth_ckpt import patch_tiny_configs, save_tiny_ldm_checkpoint

    ucfg, vcfg, ccfg = tiny_unet_config(), tiny_vae_config(), tiny_clip_config()
    patch_tiny_configs(monkeypatch, ucfg, vcfg, ccfg)

    ckpt = tmp_path / "tiny_sd.safetensors"
    up = save_tiny_ldm_checkpoint(ckpt, ucfg, vcfg, ccfg)

    pipe, conditioner = load_single_file(str(ckpt))
    # loaded params match the originals exactly
    got = traverse_util.flatten_dict(pipe.unet_params["params"], sep="/")
    want = traverse_util.flatten_dict(up["params"], sep="/")
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)

    from mdu_tpu.config import SamplerConfig
    cond = {"crossattn": jnp.zeros((1, 7, ucfg.cross_attention_dim))}
    res = pipe.txt2img(cond, None, 128, 128, SamplerConfig(steps=1), seed=0,
                       decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
