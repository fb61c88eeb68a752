"""Denoiser wrappers: raw model output -> k-diffusion 'denoised' space + CFG.

Replaces A1111's CompVisDenoiser / CompVisVDenoiser / CFGDenoiser stack that
the reference hijacks into (ref multidiffusion.py:15-29,
mixtureofdiffusers.py:18-27).  Here they are explicit pure-function
combinators:

  raw model:  eps_or_v = model_fn(x, t, cond)
  wrapper:    denoised = x - sigma * eps                (epsilon parameterization)
              denoised = c_skip * x + c_out * v         (v parameterization)
  CFG:        den_u + scale * (den_c - den_u)           batched in one call

Because CFG is linear in the model output, fusing tiles before or after CFG
is identical — which is why one tiled combinator serves both the reference's
below-CFG (MoD) and above-CFG (MultiDiffusion) hook depths (SURVEY.md §7).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax.numpy as jnp

from .schedule import NoiseSchedule

# model_fn(x, t, cond) -> raw prediction; cond is an arbitrary pytree
ModelFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]
# denoised_fn(x, sigma) -> denoised estimate
DenoisedFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def scalings(sigma: jnp.ndarray, prediction_type: str):
    """k-diffusion c_skip/c_out/c_in for the discrete schedule."""
    s = sigma.astype(jnp.float32)
    c_in = 1.0 / jnp.sqrt(s * s + 1.0)
    if prediction_type == "v_prediction":
        c_skip = 1.0 / (s * s + 1.0)
        c_out = -s * c_in
    else:
        c_skip = jnp.ones_like(s)
        c_out = -s
    return c_skip, c_out, c_in


def denoised_from_model(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
) -> Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]:
    """Wrap a raw model into sigma-space: (x, sigma, cond) -> denoised."""

    def denoise(x, sigma, cond):
        c_skip, c_out, c_in = scalings(sigma, schedule.prediction_type)
        t = schedule.t_for_sigma(sigma)
        B = x.shape[0]
        t_b = jnp.broadcast_to(jnp.atleast_1d(t), (B,))
        raw = model_fn(x * _append_dims(c_in, x.ndim), t_b, cond)
        return x * _append_dims(c_skip, x.ndim) + raw * _append_dims(c_out, x.ndim)

    return denoise


def denoised_from_model_cached(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
    cache_branch: int = 1,
) -> Callable[..., tuple]:
    """Stateful variant for step-level feature caching (DeepCache,
    arXiv:2312.00858): ``denoise(x, sigma, cond, cache, is_cached) ->
    (denoised, cache)``.  ``is_cached`` selects via `lax.cond` between the
    full UNet (which rewrites the cache) and the shallow cached pass — two
    static subgraphs, one executed per step, XLA-friendly."""
    import jax

    def denoise(x, sigma, cond, cache, is_cached):
        c_skip, c_out, c_in = scalings(sigma, schedule.prediction_type)
        t = schedule.t_for_sigma(sigma)
        B = x.shape[0]
        t_b = jnp.broadcast_to(jnp.atleast_1d(t), (B,))
        xin = x * _append_dims(c_in, x.ndim)

        def full(xin, t_b, cond, cache):
            raw, f = model_fn(xin, t_b, cond, cache_mode="write",
                              cache_branch=cache_branch)
            return raw, f.astype(cache.dtype)

        def cached(xin, t_b, cond, cache):
            raw = model_fn(xin, t_b, cond, cache=cache, cache_mode="read",
                           cache_branch=cache_branch)
            return raw, cache

        raw, cache = jax.lax.cond(is_cached, cached, full, xin, t_b, cond, cache)
        den = x * _append_dims(c_skip, x.ndim) + raw * _append_dims(c_out, x.ndim)
        return den, cache

    return denoise


def cfg_combine(den_uncond: jnp.ndarray, den_cond: jnp.ndarray, scale) -> jnp.ndarray:
    return den_uncond + scale * (den_cond - den_uncond)


@dataclass
class GuidedDenoiser:
    """Classifier-free-guided denoiser in sigma space.

    ``denoise_with_cond(x, sigma, cond)`` evaluates one cond; ``__call__``
    batches [uncond; cond] into a single model call (2x batch, like A1111's
    CFGDenoiser) and combines.
    """

    model_fn: ModelFn
    schedule: NoiseSchedule
    cond: Any
    uncond: Any
    cfg_scale: float = 7.0

    def __post_init__(self):
        self._denoise = denoised_from_model(self.model_fn, self.schedule)

    def denoise_with_cond(self, x, sigma, cond):
        return self._denoise(x, sigma, cond)

    def __call__(self, x, sigma):
        if self.uncond is None or self.cfg_scale == 1.0:
            return self._denoise(x, sigma, self.cond)
        both = jnp.concatenate([x, x], axis=0)
        cond2 = _concat_cond(self.uncond, self.cond)
        s2 = jnp.broadcast_to(jnp.atleast_1d(sigma), (x.shape[0],))
        den = self._denoise(both, jnp.concatenate([s2, s2]), cond2)
        den_u, den_c = jnp.split(den, 2, axis=0)
        return cfg_combine(den_u, den_c, self.cfg_scale)


def _append_dims(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    x = jnp.atleast_1d(x)
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def _concat_cond(a: Any, b: Any) -> Any:
    """Concatenate two cond pytrees along the batch axis."""
    import jax

    return jax.tree.map(lambda u, c: jnp.concatenate([u, c], axis=0), a, b)
