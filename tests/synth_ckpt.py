"""Synthesize a tiny LDM-named (A1111 single-file) checkpoint for tests.

Shared by test_single_file.py (loader round-trip) and test_cli.py (CLI
end-to-end): builds tiny UNet/VAE/CLIP params, renames every leaf into the
LDM key space (``model.diffusion_model.*``/``first_stage_model.*``/
``cond_stage_model.*``), and saves one .safetensors file — the checkpoint
format the reference's users bring (ref scripts/tilevae.py:711 touches it
as ``p.sd_model.first_stage_model``).
"""
import numpy as np

P = "model.diffusion_model."
V = "first_stage_model."


def _ldm_unet_keyspace(ucfg):
    keys = ([f"{P}time_embed.{i}.{l}" for i in (0, 2) for l in ("weight", "bias")]
            + [f"{P}input_blocks.0.0.{l}" for l in ("weight", "bias")]
            + [f"{P}out.{i}.{l}" for i in (0, 2) for l in ("weight", "bias")])

    def attn_keys(prefix, l):
        out = []
        for d in range(2):
            for a in ("attn1", "attn2"):
                for pr in ("to_q", "to_k", "to_v"):
                    out.append(f"{prefix}.transformer_blocks.{d}.{a}.{pr}.weight")
                out.append(f"{prefix}.transformer_blocks.{d}.{a}.to_out.0.{l}")
            for nm in ("norm1", "norm2", "norm3"):
                out.append(f"{prefix}.transformer_blocks.{d}.{nm}.{l}")
            for ff in ("ff.net.0.proj", "ff.net.2"):
                out.append(f"{prefix}.transformer_blocks.{d}.{ff}.{l}")
        return out

    for idx in range(1, 3 * len(ucfg.block_out_channels) + 1):
        for l in ("weight", "bias"):
            for rest in ("in_layers.0", "in_layers.2", "emb_layers.1",
                         "out_layers.0", "out_layers.3", "skip_connection", "op"):
                keys.append(f"{P}input_blocks.{idx}.0.{rest}.{l}")
            for rest in ("norm", "proj_in", "proj_out"):
                keys.append(f"{P}input_blocks.{idx}.1.{rest}.{l}")
            keys += attn_keys(f"{P}input_blocks.{idx}.1", l)
    for idx in range(3 * len(ucfg.block_out_channels) + 4):
        for l in ("weight", "bias"):
            for rest in ("in_layers.0", "in_layers.2", "emb_layers.1",
                         "out_layers.0", "out_layers.3", "skip_connection"):
                keys.append(f"{P}output_blocks.{idx}.0.{rest}.{l}")
            for sub in (1, 2):
                keys.append(f"{P}output_blocks.{idx}.{sub}.conv.{l}")
                for rest in ("norm", "proj_in", "proj_out"):
                    keys.append(f"{P}output_blocks.{idx}.{sub}.{rest}.{l}")
                keys += attn_keys(f"{P}output_blocks.{idx}.{sub}", l)
    for sub in (0, 1, 2):
        for l in ("weight", "bias"):
            for rest in ("in_layers.0", "in_layers.2", "emb_layers.1",
                         "out_layers.0", "out_layers.3", "norm", "proj_in",
                         "proj_out"):
                keys.append(f"{P}middle_block.{sub}.{rest}.{l}")
            keys += attn_keys(f"{P}middle_block.{sub}", l)
    return keys


def _ldm_vae_keyspace(vcfg):
    n_lv = len(vcfg.block_out_channels)
    keys = []
    for coder, blocks in (("encoder", "down"), ("decoder", "up")):
        for l in ("weight", "bias"):
            keys += [f"{V}{coder}.conv_in.{l}", f"{V}{coder}.conv_out.{l}",
                     f"{V}{coder}.norm_out.{l}"]
            for i in range(n_lv):
                for j in range(4):
                    for rest in ("norm1", "conv1", "norm2", "conv2", "nin_shortcut"):
                        keys.append(f"{V}{coder}.{blocks}.{i}.block.{j}.{rest}.{l}")
                keys.append(f"{V}{coder}.{blocks}.{i}.downsample.conv.{l}")
                keys.append(f"{V}{coder}.{blocks}.{i}.upsample.conv.{l}")
            for b in ("block_1", "block_2"):
                for rest in ("norm1", "conv1", "norm2", "conv2"):
                    keys.append(f"{V}{coder}.mid.{b}.{rest}.{l}")
            for rest in ("q", "k", "v", "proj_out", "norm"):
                keys.append(f"{V}{coder}.mid.attn_1.{rest}.{l}")
    keys += [f"{V}quant_conv.{l}" for l in ("weight", "bias")]
    keys += [f"{V}post_quant_conv.{l}" for l in ("weight", "bias")]
    return keys


def build_tiny_ldm_state(ucfg, vcfg, ccfg):
    """(state_dict, unet_params, vae_params, clip_params) with LDM names."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from mdu_tpu.models import (AutoencoderKL, CLIPTextModel, UNet2DCondition,
                                random_params, translate_clip_name,
                                translate_unet_name, translate_vae_name)
    from mdu_tpu.models.single_file import (ldm_unet_key_to_diffusers,
                                            ldm_vae_key_to_diffusers)

    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    clip = CLIPTextModel(ccfg)
    up = random_params(unet, 0, jnp.zeros((1, ucfg.in_channels, 16, 16)),
                       jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    cp = random_params(clip, 2, jnp.zeros((1, ccfg.max_length), jnp.int32))

    rev_unet = {}
    for k in _ldm_unet_keyspace(ucfg):
        dk = ldm_unet_key_to_diffusers(k, len(ucfg.block_out_channels),
                                       ucfg.layers_per_block)
        if dk is not None and dk not in rev_unet:
            rev_unet[dk] = k
    rev_vae = {}
    for k in _ldm_vae_keyspace(vcfg):
        dk = ldm_vae_key_to_diffusers(k, len(vcfg.block_out_channels))
        if dk is not None and dk not in rev_vae:
            rev_vae[dk] = k

    state = {}
    for name, leaf in traverse_util.flatten_dict(up["params"], sep="/").items():
        state[rev_unet[translate_unet_name(name)]] = np.asarray(leaf)
    for name, leaf in traverse_util.flatten_dict(vp["params"], sep="/").items():
        state[rev_vae[translate_vae_name(name)]] = np.asarray(leaf)
    for name, leaf in traverse_util.flatten_dict(cp["params"], sep="/").items():
        state["cond_stage_model.transformer." + translate_clip_name(name)] = \
            np.asarray(leaf)
    # LDM VAE attention qkv live as 1x1 convs
    for k in list(state):
        if "attn_1" in k and k.endswith(("q.weight", "k.weight", "v.weight",
                                         "proj_out.weight")):
            state[k] = state[k][:, :, None, None]
    return state, up, vp, cp


def save_tiny_ldm_checkpoint(path, ucfg, vcfg, ccfg):
    """Write the synthesized checkpoint; returns the unet params for checks."""
    from safetensors.numpy import save_file

    state, up, vp, cp = build_tiny_ldm_state(ucfg, vcfg, ccfg)
    save_file(state, str(path))
    return up


def save_tiny_controlnet(path, ucfg, seed=7):
    """Synthesize a diffusers-keyed ControlNet .safetensors for ``ucfg``.

    The gating (zero-conv) entries get small NONZERO values so the control
    branch visibly perturbs the UNet output — a fresh zero-init ControlNet
    is an exact identity (test_loader_controlnet) and would make the CLI
    path look like a no-op."""
    import jax.numpy as jnp
    from flax import traverse_util
    from safetensors.numpy import save_file

    from mdu_tpu.models import (ControlNet, random_params,
                                translate_controlnet_name)

    cn = ControlNet(ucfg)
    cp = random_params(cn, seed, jnp.zeros((1, ucfg.in_channels, 16, 16)),
                       jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)),
                       jnp.zeros((1, 3, 128, 128)))
    rng = np.random.default_rng(seed)
    state = {}
    for name, leaf in traverse_util.flatten_dict(cp["params"], sep="/").items():
        k = translate_controlnet_name(name)
        v = np.asarray(leaf)
        if k.startswith(("controlnet_down_blocks", "controlnet_mid_block")) \
                or "cond_embedding.conv_out" in k:
            v = rng.normal(0.0, 0.05, size=v.shape).astype(np.float32)
        state[k] = v
    save_file(state, str(path))


def save_tiny_guidance(path, ucfg, seed=9):
    """Synthesize StableSR-style guidance weights in the mdu_tpu flat
    layout (models/loader.py::load_guidance), zero convs perturbed so the
    guidance actually steers."""
    import jax.numpy as jnp
    from flax import traverse_util
    from safetensors.numpy import save_file

    from mdu_tpu.models import StableSRGuidance, random_params

    gm = StableSRGuidance(ucfg)
    gp = random_params(gm, seed, jnp.zeros((1, ucfg.out_channels, 16, 16)),
                       jnp.zeros((1,)))
    rng = np.random.default_rng(seed)
    state = {}
    for name, leaf in traverse_util.flatten_dict(gp["params"], sep="/").items():
        v = np.asarray(leaf)
        if name.split("/")[0].startswith("zero"):
            v = rng.normal(0.0, 0.05, size=v.shape).astype(np.float32)
        state[name] = v
    save_file(state, str(path))


def patch_tiny_configs(monkeypatch, ucfg, vcfg, ccfg):
    """Point the arch-detection config factories at the tiny configs so
    load_single_file builds tiny models for the synthesized checkpoint."""
    import mdu_tpu.models.clip as clip_mod
    import mdu_tpu.models.unet as unet_mod
    import mdu_tpu.models.vae as vae_mod

    monkeypatch.setattr(unet_mod, "sd15_unet_config", lambda: ucfg)
    monkeypatch.setattr(vae_mod, "VAEConfig", lambda **kw: vcfg)
    monkeypatch.setattr(clip_mod, "clip_l_config", lambda: ccfg)
