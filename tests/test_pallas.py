"""Pallas kernel correctness (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.ops.attention import sdpa
from mdu_tpu.ops.pallas import flash_attention


@pytest.mark.parametrize("Lq,Lk,D", [
    (128, 128, 64),
    (200, 200, 40),     # unaligned L and D (SD1.5 head dim)
    (256, 77, 64),      # cross-attention shape
    (513, 513, 128),
])
def test_flash_matches_sdpa(rng, Lq, Lk, D):
    B, H = 1, 2
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_scale_override(rng):
    q = jnp.asarray(rng.normal(size=(1, 1, 128, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 128, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 128, 32)).astype(np.float32))
    want = np.asarray(sdpa(q, k, v, scale=0.05))
    got = np.asarray(flash_attention(q, k, v, scale=0.05, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_bf16(rng):
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.bfloat16)
    want = np.asarray(sdpa(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
