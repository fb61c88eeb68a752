"""Prompt syntax + conditioning tests (A1111 grammar semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.models import CLIPTextModel, random_params, tiny_clip_config
from mdu_tpu.text import (
    CLIPTokenizer,
    HashTokenizer,
    TextConditioner,
    parse_prompt_attention,
    parse_prompt_schedule,
    split_composable,
)


def test_attention_basic():
    assert parse_prompt_attention("a cat") == [("a cat", 1.0)]
    assert parse_prompt_attention("a (cat)") == [("a ", 1.0), ("cat", 1.1)]
    got = parse_prompt_attention("a ((cat))")
    assert got[-1][1] == pytest.approx(1.1 * 1.1)
    assert parse_prompt_attention("a [cat]")[-1][1] == pytest.approx(1 / 1.1)
    assert parse_prompt_attention("a (cat:1.5)")[-1] == ("cat", 1.5)


def test_attention_escapes_and_unbalanced():
    assert parse_prompt_attention(r"a \(cat\)") == [("a (cat)", 1.0)]
    # unbalanced paren still applies weight to the tail
    assert parse_prompt_attention("a (cat")[-1][1] == pytest.approx(1.1)


def test_attention_break():
    frags = parse_prompt_attention("a BREAK b")
    assert ("BREAK", -1.0) in frags


def test_schedule_switch():
    sched = parse_prompt_schedule("a [cat:dog:5] walks", 10)
    assert sched == [(5, "a cat walks"), (10, "a dog walks")]
    sched2 = parse_prompt_schedule("a [cat:dog:0.5] walks", 10)
    assert sched2 == [(5, "a cat walks"), (10, "a dog walks")]


def test_schedule_add_and_remove():
    assert parse_prompt_schedule("a [dog:5]", 10) == [(5, "a "), (10, "a dog")]
    assert parse_prompt_schedule("a [cat::5]", 10) == [(5, "a cat"), (10, "a ")]
    assert parse_prompt_schedule("plain", 10) == [(10, "plain")]


def test_composable_split():
    parts = split_composable("a cat AND a dog:0.5")
    assert parts[0].text == "a cat" and parts[0].weight == 1.0
    assert parts[1].text == "a dog" and parts[1].weight == 0.5


def test_clip_bpe_tokenizer_roundtrip():
    # tiny synthetic vocab exercising the merge loop
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, ch in enumerate("abcdefgh"):
        vocab[ch] = 2 + i
        vocab[ch + "</w>"] = 20 + i
    vocab["ab"] = 40
    vocab["ab</w>"] = 41
    vocab["abc</w>"] = 42
    merges = [("a", "b"), ("ab", "c</w>"), ("a", "b</w>")]
    tok = CLIPTokenizer(vocab, merges, max_length=10)
    ids = tok.tokenize("abc ab")
    assert ids == [42, 41]
    full = tok("abc")
    assert full[0] == 0 and full[1] == 42 and full[2] == 1 and len(full) == 10
    assert full[3:] == [1] * 7      # eot padding


def test_conditioner_weighted_encode():
    cfg = tiny_clip_config()
    model = CLIPTextModel(cfg)
    ids = jnp.zeros((1, cfg.max_length), jnp.int32)
    params = random_params(model, 0, ids)
    tc = TextConditioner(model, params, HashTokenizer(cfg.vocab_size, cfg.max_length))

    plain, _ = tc.encode(["a cat"])
    emph, _ = tc.encode(["a (cat:1.8)"])
    assert plain.shape == emph.shape == (1, cfg.max_length, cfg.hidden_size)
    assert np.isfinite(np.asarray(emph)).all()
    assert np.abs(np.asarray(plain) - np.asarray(emph)).max() > 1e-6


def test_conditioner_chunking_long_prompt():
    cfg = tiny_clip_config()   # max_length 16 -> chunk 14
    model = CLIPTextModel(cfg)
    params = random_params(model, 0, jnp.zeros((1, cfg.max_length), jnp.int32))
    tc = TextConditioner(model, params)
    long_prompt = " ".join(f"word{i}" for i in range(40))
    z, _ = tc.encode([long_prompt])
    assert z.shape[1] % cfg.max_length == 0 and z.shape[1] > cfg.max_length


def test_conditioner_scheduled_cond():
    cfg = tiny_clip_config()
    model = CLIPTextModel(cfg)
    params = random_params(model, 0, jnp.zeros((1, cfg.max_length), jnp.int32))
    tc = TextConditioner(model, params)
    c = tc.cond("a [cat:dog:2] photo", steps=4)
    assert isinstance(c, dict) and "__bank__" in c
    from mdu_tpu.pipeline import DiffusionPipeline
    cond_fn = DiffusionPipeline._as_cond_fn(c)
    c0 = cond_fn(jnp.asarray(0))["crossattn"]
    c3 = cond_fn(jnp.asarray(3))["crossattn"]
    assert np.abs(np.asarray(c0) - np.asarray(c3)).max() > 1e-6
    # unscheduled -> plain pytree
    c2 = tc.cond("a cat", steps=4)
    assert "__bank__" not in c2


def test_scheduled_cond_through_pipeline():
    from mdu_tpu.config import SamplerConfig, TiledDiffusionConfig
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition,
                                tiny_unet_config, tiny_vae_config)
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 16, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)

    ccfg = tiny_clip_config()
    cmodel = CLIPTextModel(ccfg)
    cparams = random_params(cmodel, 2, jnp.zeros((1, ccfg.max_length), jnp.int32))
    tc = TextConditioner(cmodel, cparams)

    cond = tc.cond("a [cat:dog:2] painting", steps=4)
    uncond = tc.cond("blurry", steps=4)
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8, tile_bs=2)
    res = pipe.txt2img(cond, uncond, 256, 128, SamplerConfig(steps=4), seed=1,
                       tiled_diffusion=td, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_and_composable_cond_through_pipeline():
    from mdu_tpu.config import SamplerConfig, TiledDiffusionConfig
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition,
                                tiny_unet_config, tiny_vae_config)
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 16, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)

    ccfg = tiny_clip_config()
    cmodel = CLIPTextModel(ccfg)
    cparams = random_params(cmodel, 2, jnp.zeros((1, ccfg.max_length), jnp.int32))
    tc = TextConditioner(cmodel, cparams)

    cond = tc.cond("a cat AND a dog:0.5")
    assert "__and__" in cond and cond["__weights__"] == (1.0, 0.5)
    uncond = tc.cond("blurry")
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8, tile_bs=2)
    res = pipe.txt2img(cond, uncond, 128, 128, SamplerConfig(steps=2), seed=1,
                       tiled_diffusion=td, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
    # AND result differs from the first branch alone
    res2 = pipe.txt2img(tc.cond("a cat"), uncond, 128, 128, SamplerConfig(steps=2),
                        seed=1, tiled_diffusion=td, decode=False)
    assert np.abs(np.asarray(res.latents) - np.asarray(res2.latents)).max() > 1e-5


def test_extract_networks():
    from mdu_tpu.text.prompt import extract_networks

    clean, nets = extract_networks("a cat <lora:catstyle:0.8> in a hat <hypernet:h1>")
    assert clean == "a cat in a hat"
    assert nets == [("lora", "catstyle", 0.8), ("hypernet", "h1", 1.0)]
    clean2, nets2 = extract_networks("no tags here")
    assert clean2 == "no tags here" and nets2 == []


def test_alternating_words():
    from mdu_tpu.text.prompt import has_alternation, prompt_at_step_with_alternation

    assert has_alternation("a [cat|dog] photo")
    assert not has_alternation("a [cat:dog:5] photo")
    assert prompt_at_step_with_alternation("a [cat|dog] photo", 0, 10) == "a cat photo"
    assert prompt_at_step_with_alternation("a [cat|dog] photo", 1, 10) == "a dog photo"
    assert prompt_at_step_with_alternation("[x|y|z]", 5, 10) == "z"


def test_alternating_cond_bank():
    cfg = tiny_clip_config()
    model = CLIPTextModel(cfg)
    params = random_params(model, 0, jnp.zeros((1, cfg.max_length), jnp.int32))
    tc = TextConditioner(model, params)
    c = tc.cond("a [cat|dog] photo", steps=4)
    assert "__bank__" in c
    assert c["__bank__"]["crossattn"].shape[0] == 2   # two unique prompts
    np.testing.assert_array_equal(np.asarray(c["__index__"]), [0, 1, 0, 1])


def test_scheduled_bank_inside_and():
    cfg = tiny_clip_config()
    model = CLIPTextModel(cfg)
    params = random_params(model, 0, jnp.zeros((1, cfg.max_length), jnp.int32))
    tc = TextConditioner(model, params)
    c = tc.cond("a [cat:dog:2] photo AND a photo", steps=4)
    assert "__and__" in c and len(c["__and__"]) == 2
    assert "__bank__" in c["__and__"][0]          # scheduled branch is a bank
    assert "crossattn" in c["__and__"][1]         # static branch stays plain

    from mdu_tpu.pipeline import DiffusionPipeline
    fn = DiffusionPipeline._as_cond_fn(c)
    early, late = fn(0), fn(3)
    assert not np.allclose(np.asarray(early["__and__"][0]["crossattn"]),
                           np.asarray(late["__and__"][0]["crossattn"]))
    np.testing.assert_array_equal(np.asarray(early["__and__"][1]["crossattn"]),
                                  np.asarray(late["__and__"][1]["crossattn"]))


def test_single_entry_schedule_encodes_resolved_text():
    """[a:b:N] with N >= steps never switches -> must encode exactly like the
    resolved prompt, not the raw bracketed text (regression: the raw text
    leaked through the len(sched)==1 fallthrough)."""
    cfg = tiny_clip_config()
    model = CLIPTextModel(cfg)
    params = random_params(model, 0, jnp.zeros((1, cfg.max_length), jnp.int32))
    tc = TextConditioner(model, params)
    c_sched = tc.cond("a [cat:dog:8] photo", steps=4)
    c_plain = tc.cond("a cat photo", steps=4)
    np.testing.assert_array_equal(np.asarray(c_sched["crossattn"]),
                                  np.asarray(c_plain["crossattn"]))
