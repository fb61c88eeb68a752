"""Regression tests for the round-1 advisor findings (ADVICE.md) and
cache-soundness fixes (VERDICT.md item 8)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mdu_tpu.config import SamplerConfig
from mdu_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    random_params,
    tiny_clip_config,
    tiny_unet_config,
    tiny_vae_config,
)
from mdu_tpu.models.loader import _unet_config_from_json
from mdu_tpu.pipeline import DiffusionPipeline, cond_fingerprint
from mdu_tpu.text import TextConditioner
from mdu_tpu.text.tokenizer import HashTokenizer


# ---------------------------------------------------------------- loader


def test_loader_list_attention_head_dim_means_per_block_heads():
    """diffusers SD2/SDXL configs store attention_head_dim as a list of
    per-block head COUNTS (head dim 64), not head dims (ADVICE high)."""
    d = {"block_out_channels": [320, 640, 1280],
         "attention_head_dim": [5, 10, 20],
         "cross_attention_dim": 2048}
    cfg = _unet_config_from_json(d)
    assert cfg.head_dim == 64 and cfg.num_heads is None
    assert cfg.heads_for(320) == 5
    assert cfg.heads_for(640) == 10
    assert cfg.heads_for(1280) == 20


def test_loader_scalar_attention_head_dim_sd15():
    cfg = _unet_config_from_json({"attention_head_dim": 8})
    assert cfg.num_heads == 8 and cfg.head_dim is None
    assert cfg.heads_for(320) == 8


# ------------------------------------------------------------------ clip


def test_clip_ln_penultimate_flag_changes_skip_output():
    """SDXL (ln_penultimate=False) takes raw hidden_states[-2]; A1111-style
    clip-skip LayerNorms them (ADVICE medium)."""
    base = dataclasses.replace(tiny_clip_config(), clip_skip=2)
    raw = dataclasses.replace(base, ln_penultimate=False)
    ids = jnp.array([[5, 7, 999] + [0] * 13])
    m_ln, m_raw = CLIPTextModel(base), CLIPTextModel(raw)
    params = random_params(m_ln, 0, ids)
    h_ln, p_ln = jax.jit(m_ln.apply)(params, ids)
    h_raw, p_raw = jax.jit(m_raw.apply)(params, ids)
    assert np.abs(np.asarray(h_ln) - np.asarray(h_raw)).max() > 1e-6
    # pooled comes from ln_final(last) in both cases
    np.testing.assert_allclose(np.asarray(p_ln), np.asarray(p_raw), atol=1e-6)


# ---------------------------------------------------------------- chunks


def test_exact_chunk_multiple_prompt_has_no_empty_trailing_chunk():
    cfg = tiny_clip_config()        # max_length 16 -> chunk 14
    model = CLIPTextModel(cfg)
    params = random_params(model, 0, jnp.zeros((1, cfg.max_length), jnp.int32))
    tc = TextConditioner(model, params, HashTokenizer(cfg.vocab_size, cfg.max_length))
    exact = " ".join(f"w{i}" for i in range(tc.chunk))
    chunks = tc._weighted_ids(exact)
    assert len(chunks) == 1, "exact multiple must not gain an empty chunk"
    over = " ".join(f"w{i}" for i in range(tc.chunk + 1))
    assert len(tc._weighted_ids(over)) == 2
    assert len(tc._weighted_ids("")) == 1   # empty prompt still one chunk


# ------------------------------------------------------------- jit cache


def _tiny_pipe():
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    return DiffusionPipeline(unet, up, vae, vp)


def _cond(key, dim=16, L=7):
    return {"crossattn": jax.random.normal(jax.random.PRNGKey(key), (1, L, dim)) * 0.1}


def test_churn_params_distinguish_cache_entries():
    """s_tmin/s_tmax/s_noise are baked into compiled programs, so they must
    be part of the jit cache key (ADVICE low)."""
    pipe = _tiny_pipe()
    sp1 = SamplerConfig(steps=2, name="Euler", s_churn=0.5, s_noise=1.0)
    sp2 = dataclasses.replace(sp1, s_noise=0.5)
    a = pipe.txt2img(_cond(0), None, 128, 128, sp1, seed=1, decode=False)
    n1 = len(pipe._jit_cache)
    b = pipe.txt2img(_cond(0), None, 128, 128, sp2, seed=1, decode=False)
    assert len(pipe._jit_cache) == n1 + 1, "different s_noise must recompile"
    assert np.abs(np.asarray(a.latents) - np.asarray(b.latents)).max() > 1e-6


def test_step_callback_swap_reuses_executable_and_fires_new_callback():
    """Callbacks are dereferenced through the pipeline at call time, so a
    new callback object reuses the compiled program AND gets invoked
    (VERDICT weak 5: id()-keyed executables could serve a dead callback)."""
    pipe = _tiny_pipe()
    sp = SamplerConfig(steps=2, name="Euler")
    seen_a, seen_b = [], []
    pipe.txt2img(_cond(0), None, 128, 128, sp, seed=1, decode=False,
                 step_callback=lambda i, x: seen_a.append(i))
    n = len(pipe._jit_cache)
    pipe.txt2img(_cond(0), None, 128, 128, sp, seed=1, decode=False,
                 step_callback=lambda i, x: seen_b.append(i))
    assert len(pipe._jit_cache) == n, "swapping the callback must not recompile"
    assert seen_a == [0, 1] and seen_b == [0, 1]


def test_cond_fingerprint_distinguishes_same_sum():
    """sha1 content hash replaces the collision-prone leaf-sum key."""
    a = {"crossattn": jnp.asarray([[1.0, 2.0]])}
    b = {"crossattn": jnp.asarray([[2.0, 1.0]])}   # same sum, different content
    assert cond_fingerprint(a) != cond_fingerprint(b)
    assert cond_fingerprint(a) == cond_fingerprint(
        {"crossattn": jnp.asarray([[1.0, 2.0]])})


def test_noise_inverse_cache_invalidated_by_params_swap():
    from mdu_tpu.pipeline import NoiseInverseCache
    x0 = np.zeros((1, 4, 8, 8), np.float32)
    params_a, params_b = {"w": 1}, {"w": 1}
    c = NoiseInverseCache(x0, x0, steps=5, retouch=1.0, prompt_key="k",
                          params=params_a)
    assert c.matches(jnp.asarray(x0), 5, 1.0, "k", params_a)
    assert not c.matches(jnp.asarray(x0), 5, 1.0, "k", params_b)


# ------------------------------------------------- noise-inversion sigma0


def test_img2img_noise_inverse_uses_full_schedule_sigma0(monkeypatch):
    """At denoising_strength < 1 the reference derives inverse_noise from
    the FULL schedule's sigma_max (abstractdiffusion.py:651), not the
    truncated schedule's first sigma (ADVICE medium)."""
    from mdu_tpu.config import TiledDiffusionConfig

    pipe = _tiny_pipe()
    sp = SamplerConfig(steps=4, name="Euler", denoising_strength=0.5)
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8,
                              noise_inverse=True, noise_inverse_steps=2,
                              noise_inverse_renoise_strength=0.0)
    captured = {}
    orig = DiffusionPipeline._noise_inverse_combined_noise

    def spy(self, x_img, init_latent, noise, td, plan, inv_cond, sigma0):
        captured["sigma0"] = float(sigma0)
        return orig(self, x_img, init_latent, noise, td, plan, inv_cond, sigma0)

    monkeypatch.setattr(DiffusionPipeline, "_noise_inverse_combined_noise", spy)
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    pipe.img2img(img, _cond(0), None, sampler=sp, seed=1,
                 tiled_diffusion=td, decode=False)
    steps, t_enc = pipe.schedule.img2img_steps(sp.steps, sp.denoising_strength)
    full = pipe.schedule.sampling_sigmas(steps, sp.schedule)
    assert abs(captured["sigma0"] - float(full[0])) < 1e-6
    # sanity: the truncated schedule's first sigma is different
    assert float(full[steps - t_enc - 1]) != float(full[0])
