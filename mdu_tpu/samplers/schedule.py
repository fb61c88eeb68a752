"""Noise schedules and sigma tables (SD / k-diffusion conventions).

The reference inherits these from A1111/k-diffusion (SURVEY.md L0); here
they are owned.  Conventions match k-diffusion's discrete VE wrapping of the
DDPM schedule so that samplers and the noise-inversion math
(ref abstractdiffusion.py:683-742) behave identically:

  sigma_t = sqrt((1 - abar_t) / abar_t),   t = interp(log sigma) into the table
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NoiseSchedule:
    """DDPM training schedule + derived k-diffusion sigma table."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"     # SD default
    prediction_type: str = "epsilon"          # epsilon | v_prediction

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return _alphas_cumprod(self.num_train_timesteps, self.beta_start,
                               self.beta_end, self.beta_schedule)

    @property
    def sigmas(self) -> np.ndarray:
        """Full per-timestep sigma table [T], ascending with t."""
        ac = self.alphas_cumprod
        return np.sqrt((1.0 - ac) / ac)

    # -- sigma <-> t ---------------------------------------------------------

    def t_for_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """Fractional timestep for a sigma (k-diffusion log-linear interp)."""
        log_table = jnp.asarray(np.log(self.sigmas), dtype=jnp.float32)
        log_s = jnp.log(jnp.maximum(sigma.astype(jnp.float32), 1e-10))
        idx = jnp.interp(log_s, log_table, jnp.arange(len(log_table), dtype=jnp.float32))
        return idx

    # -- inference sigma sequences ------------------------------------------

    def sampling_sigmas(self, steps: int, schedule: str = "automatic") -> np.ndarray:
        """[steps+1] descending sigmas ending at 0.

        'automatic' follows k-diffusion get_sigmas for discrete schedules:
        evenly spaced (fractional) timesteps from T-1 down to 0, log-interp
        into the sigma table.  'karras' is the Karras et al. rho=7 ramp.
        """
        table = self.sigmas
        if schedule == "karras":
            return sigmas_karras(steps, float(table[-1]), float(table[0]))
        t = np.linspace(len(table) - 1, 0, steps)
        log_t = np.interp(t, np.arange(len(table)), np.log(table))
        sig = np.exp(log_t)
        return np.append(sig, 0.0).astype(np.float32)

    def img2img_steps(self, steps: int, strength: float) -> Tuple[int, int]:
        """(total_steps, t_enc): A1111 setup_img2img_steps semantics —
        run the last ``t_enc + 1`` sigmas of a ``steps``-long schedule."""
        t_enc = int(min(strength, 0.999) * steps)
        return steps, t_enc


@lru_cache(maxsize=8)
def _alphas_cumprod(T: int, b0: float, b1: float, kind: str) -> np.ndarray:
    if kind == "scaled_linear":
        betas = np.linspace(b0**0.5, b1**0.5, T, dtype=np.float64) ** 2
    elif kind == "linear":
        betas = np.linspace(b0, b1, T, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta schedule {kind}")
    return np.cumprod(1.0 - betas).astype(np.float32)


def sigmas_karras(n: int, sigma_max: float, sigma_min: float, rho: float = 7.0) -> np.ndarray:
    """Karras et al. (2022) noise schedule, descending, with trailing 0."""
    ramp = np.linspace(0, 1, n)
    min_inv = sigma_min ** (1 / rho)
    max_inv = sigma_max ** (1 / rho)
    sig = (max_inv + ramp * (min_inv - max_inv)) ** rho
    return np.append(sig, 0.0).astype(np.float32)


def ddim_timesteps(num_train_timesteps: int, steps: int) -> np.ndarray:
    """Uniform DDIM timestep subset (leading spacing), descending."""
    step_ratio = num_train_timesteps // steps
    ts = (np.arange(steps) * step_ratio).round()[::-1].astype(np.int32)
    return ts
