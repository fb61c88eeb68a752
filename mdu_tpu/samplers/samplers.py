"""Samplers as pure `lax.scan` loops over a sigma sequence.

Own replacements for the k-diffusion/CompVis samplers A1111 provides to the
reference (SURVEY.md L0).  Each sampler takes a ``denoised_fn(x, sigma,
step) -> denoised`` (built by samplers/denoiser.py, possibly wrapped by a
tiled-diffusion combinator) and a descending sigma array ending in 0.

Implemented: Euler, Euler a (ancestral), Heun, DPM++ 2M, DDIM (deterministic
probability-flow update in VE coordinates; eta adds ancestral noise).
MultiDiffusion/DemoFusion exclude UniPC in the reference
(multidiffusion.py:13, demofusion.py:18); UniPC is intentionally absent.
All samplers accept ``step_callback(step_index, x)`` — invoked host-side via
`jax.debug.callback` after every step (the analogue of A1111's progress bar +
store_latent previews the reference relies on, SURVEY.md §5).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

DenoisedStepFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
StepCallback = Callable[[int, jnp.ndarray], None]


def _notify(cb: Optional[StepCallback], i, x):
    if cb is not None:
        jax.debug.callback(cb, i, x)


def _dcall(fn, x, s, i, aux):
    """Invoke a possibly-stateful denoised_fn.

    ``aux`` threads opaque per-run state (the DeepCache feature caches,
    samplers/denoiser.py::denoised_from_model_cached) through the sampler
    scan: stateless fns (aux None — an empty pytree, which lax.scan carries
    for free) keep the plain 3-arg contract."""
    if aux is None:
        return fn(x, s, i), None
    return fn(x, s, i, aux)


def _to_sigma_pairs(sigmas: jnp.ndarray):
    return sigmas[:-1], sigmas[1:]


def _churn(x, s, i, key, n_steps, s_churn, s_tmin, s_tmax, s_noise):
    """Karras sigma churn: bump sigma and add matched noise (k-diffusion
    sample_euler/heun gamma logic)."""
    gamma = jnp.where(
        jnp.logical_and(s >= s_tmin, s <= s_tmax),
        jnp.minimum(s_churn / jnp.maximum(n_steps - 1, 1), 2**0.5 - 1), 0.0)
    s_hat = s * (1.0 + gamma)
    sub = jax.random.fold_in(key, i)
    eps = jax.random.normal(sub, x.shape, x.dtype) * s_noise
    x = x + eps * jnp.sqrt(jnp.maximum(s_hat**2 - s**2, 0.0))
    return x, s_hat


def sample_euler(denoised_fn: DenoisedStepFn, x: jnp.ndarray, sigmas: jnp.ndarray,
                 key: Optional[jax.Array] = None,
                 s_churn: float = 0.0, s_tmin: float = 0.0,
                 s_tmax: float = float("inf"), s_noise: float = 1.0,
                 step_callback: Optional[StepCallback] = None,
                 aux=None) -> jnp.ndarray:
    sig, sig_next = _to_sigma_pairs(sigmas)
    n = sig.shape[0]
    use_churn = s_churn > 0 and key is not None

    def body(carry, inp):
        x, aux = carry
        i, s, sn = inp
        if use_churn:
            x, s = _churn(x, s, i, key, n, s_churn, s_tmin, s_tmax, s_noise)
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        d = (x - den) / s
        x = x + d * (sn - s)
        _notify(step_callback, i, x)
        return (x, aux), None

    steps = jnp.arange(n)
    (x, _), _ = jax.lax.scan(body, (x, aux), (steps, sig, sig_next))
    return x


def sample_euler_ancestral(denoised_fn: DenoisedStepFn, x: jnp.ndarray,
                           sigmas: jnp.ndarray, key: jax.Array,
                           eta: float = 1.0,
                           step_callback: Optional[StepCallback] = None,
                           aux=None) -> jnp.ndarray:
    sig, sig_next = _to_sigma_pairs(sigmas)

    def body(carry, inp):
        x, k, aux = carry
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        up = jnp.minimum(sn, eta * jnp.sqrt(jnp.maximum(sn**2 * (s**2 - sn**2) / s**2, 0.0)))
        down = jnp.sqrt(jnp.maximum(sn**2 - up**2, 0.0))
        d = (x - den) / s
        x = x + d * (down - s)
        k, sub = jax.random.split(k)
        x = x + jax.random.normal(sub, x.shape, x.dtype) * up
        _notify(step_callback, i, x)
        return (x, k, aux), None

    steps = jnp.arange(sig.shape[0])
    (x, _, _), _ = jax.lax.scan(body, (x, key, aux), (steps, sig, sig_next))
    return x


def sample_heun(denoised_fn: DenoisedStepFn, x: jnp.ndarray, sigmas: jnp.ndarray,
                key: Optional[jax.Array] = None,
                s_churn: float = 0.0, s_tmin: float = 0.0,
                s_tmax: float = float("inf"), s_noise: float = 1.0,
                step_callback: Optional[StepCallback] = None,
                aux=None) -> jnp.ndarray:
    sig, sig_next = _to_sigma_pairs(sigmas)
    n = sig.shape[0]
    use_churn = s_churn > 0 and key is not None

    def body(carry, inp):
        x, aux = carry
        i, s, sn = inp
        if use_churn:
            x, s = _churn(x, s, i, key, n, s_churn, s_tmin, s_tmax, s_noise)
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        d = (x - den) / s
        x_euler = x + d * (sn - s)

        def heun_correct(aux):
            den2, aux = _dcall(denoised_fn, x_euler, sn, i, aux)
            return x + 0.5 * (d + (x_euler - den2) / sn) * (sn - s), aux

        x, aux = jax.lax.cond(sn > 0, heun_correct,
                              lambda aux: (x_euler, aux), aux)
        _notify(step_callback, i, x)
        return (x, aux), None

    steps = jnp.arange(sig.shape[0])
    (x, aux), _ = jax.lax.scan(body, (x, aux), (steps, sig, sig_next))
    return x


def sample_dpmpp_2m(denoised_fn: DenoisedStepFn, x: jnp.ndarray, sigmas: jnp.ndarray,
                    key: Optional[jax.Array] = None,
                    step_callback: Optional[StepCallback] = None,
                    aux=None) -> jnp.ndarray:
    """DPM-Solver++(2M), k-diffusion formulation."""
    sig, sig_next = _to_sigma_pairs(sigmas)

    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def body(carry, inp):
        x, old_den, have_old, aux = carry
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        t, tn = t_of(s), t_of(sn)
        h = tn - t
        ratio = sn / s

        def first(_):
            return ratio * x - jnp.expm1(-h) * den

        def second(_):
            h_last = t - t_of_prev
            r = h_last / h
            den_d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old_den
            return ratio * x - jnp.expm1(-h) * den_d

        # previous sigma for h_last: reconstruct from step index
        t_of_prev = t_of(jnp.where(i > 0, sig[jnp.maximum(i - 1, 0)], s))
        x_new = jax.lax.cond(
            jnp.logical_and(have_old, sn > 0), second,
            lambda _: jax.lax.cond(sn > 0, first, lambda __: den, None), None)
        _notify(step_callback, i, x_new)
        return (x_new, den, jnp.bool_(True), aux), None

    steps = jnp.arange(sig.shape[0])
    init = (x, jnp.zeros_like(x), jnp.bool_(False), aux)
    (x, _, _, _), _ = jax.lax.scan(body, init, (steps, sig, sig_next))
    return x


def sample_ddim(denoised_fn: DenoisedStepFn, x: jnp.ndarray, sigmas: jnp.ndarray,
                key: Optional[jax.Array] = None, eta: float = 0.0,
                step_callback: Optional[StepCallback] = None,
                aux=None) -> jnp.ndarray:
    """DDIM in VE coordinates: x' = den + sigma_next * eps_hat (deterministic
    part); eta>0 mixes in ancestral noise like the classic eta-DDIM."""
    if eta > 0.0 and key is not None:
        return sample_euler_ancestral(denoised_fn, x, sigmas, key, eta,
                                      step_callback=step_callback, aux=aux)
    sig, sig_next = _to_sigma_pairs(sigmas)

    def body(carry, inp):
        x, aux = carry
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        eps = (x - den) / s
        x = den + sn * eps
        _notify(step_callback, i, x)
        return (x, aux), None

    steps = jnp.arange(sig.shape[0])
    (x, _), _ = jax.lax.scan(body, (x, aux), (steps, sig, sig_next))
    return x


def sample_lms(denoised_fn: DenoisedStepFn, x: jnp.ndarray, sigmas: jnp.ndarray,
               key: Optional[jax.Array] = None, order: int = 4,
               step_callback: Optional[StepCallback] = None,
               aux=None) -> jnp.ndarray:
    """Linear multistep (k-diffusion LMS, order 4).

    Per step the derivative history is combined with Adams-Bashforth-style
    coefficients c_j = ∫ L_j(t) dt over [sigma_i, sigma_{i+1}], where L_j are
    Lagrange basis polynomials over the last `order` sigmas.  The integrals
    are evaluated in-graph (trapezoid, 64 points), so sigma schedules may be
    traced values.
    """
    sig, sig_next = _to_sigma_pairs(sigmas)
    n = sig.shape[0]
    M = 64

    def coeff(i, j, cur_order):
        # nodes sigma_{i-k}, k = 0..cur_order-1
        t = jnp.linspace(sig[jnp.maximum(i, 0)],
                         jnp.where(i + 1 < n, sig_next[i], sig_next[i]), M)
        prod = jnp.ones_like(t)
        for k in range(order):
            node_k = sig[jnp.clip(i - k, 0, n - 1)]
            node_j = sig[jnp.clip(i - j, 0, n - 1)]
            term = (t - node_k) / (node_j - node_k + 1e-20)
            use = jnp.logical_and(k != j, k < cur_order)
            prod = prod * jnp.where(use, term, 1.0)
        return jnp.trapezoid(prod, t)

    def body(carry, inp):
        x, hist, aux = carry          # hist [order, ...], most recent first
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        d = (x - den) / s
        hist = jnp.roll(hist, 1, axis=0).at[0].set(d)
        cur_order = jnp.minimum(i + 1, order)
        upd = jnp.zeros_like(x)
        for j in range(order):
            c = jnp.where(j < cur_order, coeff(i, j, cur_order), 0.0)
            upd = upd + c * hist[j]
        x = x + upd
        _notify(step_callback, i, x)
        return (x, hist, aux), None

    steps = jnp.arange(n)
    hist0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x, _, _), _ = jax.lax.scan(body, (x, hist0, aux), (steps, sig, sig_next))
    return x


def sample_dpmpp_2s_ancestral(denoised_fn: DenoisedStepFn, x: jnp.ndarray,
                              sigmas: jnp.ndarray, key: jax.Array,
                              eta: float = 1.0,
                              step_callback: Optional[StepCallback] = None,
                              aux=None) -> jnp.ndarray:
    """DPM-Solver++(2S) ancestral (k-diffusion formulation): one midpoint
    model evaluation per step plus ancestral noise injection."""
    sig, sig_next = _to_sigma_pairs(sigmas)

    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def body(carry, inp):
        x, k, aux = carry
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        up = jnp.minimum(sn, eta * jnp.sqrt(jnp.maximum(sn**2 * (s**2 - sn**2) / s**2, 0.0)))
        down = jnp.sqrt(jnp.maximum(sn**2 - up**2, 0.0))

        t, tn = t_of(s), t_of(jnp.maximum(down, 1e-10))
        h = tn - t
        s_mid = t + 0.5 * h
        sig_mid = jnp.exp(-s_mid)
        x2 = (sig_mid / s) * x - jnp.expm1(-0.5 * h) * den
        den2, aux = _dcall(denoised_fn, x2, sig_mid, i, aux)
        x_second = (jnp.maximum(down, 1e-10) / s) * x - jnp.expm1(-h) * den2

        x = jnp.where(down > 0, x_second, den)
        k, sub = jax.random.split(k)
        x = x + jax.random.normal(sub, x.shape, x.dtype) * up
        _notify(step_callback, i, x)
        return (x, k, aux), None

    steps = jnp.arange(sig.shape[0])
    (x, _, _), _ = jax.lax.scan(body, (x, key, aux), (steps, sig, sig_next))
    return x


def _ancestral_step(s, sn, eta=1.0):
    """k-diffusion get_ancestral_step: split sigma_next into a deterministic
    sigma_down and an injected-noise sigma_up."""
    up = jnp.minimum(sn, eta * jnp.sqrt(jnp.maximum(sn**2 * (s**2 - sn**2) / s**2, 0.0)))
    down = jnp.sqrt(jnp.maximum(sn**2 - up**2, 0.0))
    return down, up


def sample_dpm2(denoised_fn: DenoisedStepFn, x: jnp.ndarray, sigmas: jnp.ndarray,
                key: Optional[jax.Array] = None,
                s_churn: float = 0.0, s_tmin: float = 0.0,
                s_tmax: float = float("inf"), s_noise: float = 1.0,
                step_callback: Optional[StepCallback] = None,
                aux=None) -> jnp.ndarray:
    """DPM-Solver-2 (k-diffusion sample_dpm_2): midpoint step at the
    geometric-mean sigma; two model evaluations per step."""
    sig, sig_next = _to_sigma_pairs(sigmas)
    n = sig.shape[0]
    use_churn = s_churn > 0 and key is not None

    def body(carry, inp):
        x, aux = carry
        i, s, sn = inp
        if use_churn:
            x, s = _churn(x, s, i, key, n, s_churn, s_tmin, s_tmax, s_noise)
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        d = (x - den) / s

        def midpoint(aux):
            s_mid = jnp.exp(0.5 * (jnp.log(s) + jnp.log(jnp.maximum(sn, 1e-10))))
            x_2 = x + d * (s_mid - s)
            den_2, aux = _dcall(denoised_fn, x_2, s_mid, i, aux)
            d_2 = (x_2 - den_2) / s_mid
            return x + d_2 * (sn - s), aux

        x, aux = jax.lax.cond(sn > 0, midpoint,
                              lambda aux: (x + d * (sn - s), aux), aux)
        _notify(step_callback, i, x)
        return (x, aux), None

    steps = jnp.arange(n)
    (x, _), _ = jax.lax.scan(body, (x, aux), (steps, sig, sig_next))
    return x


def sample_dpm2_ancestral(denoised_fn: DenoisedStepFn, x: jnp.ndarray,
                          sigmas: jnp.ndarray, key: jax.Array, eta: float = 1.0,
                          step_callback: Optional[StepCallback] = None,
                          aux=None) -> jnp.ndarray:
    """DPM-Solver-2 ancestral (k-diffusion sample_dpm_2_ancestral)."""
    sig, sig_next = _to_sigma_pairs(sigmas)

    def body(carry, inp):
        x, k, aux = carry
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        down, up = _ancestral_step(s, sn, eta)
        d = (x - den) / s

        def midpoint(aux):
            s_mid = jnp.exp(0.5 * (jnp.log(s) + jnp.log(jnp.maximum(down, 1e-10))))
            x_2 = x + d * (s_mid - s)
            den_2, aux = _dcall(denoised_fn, x_2, s_mid, i, aux)
            d_2 = (x_2 - den_2) / s_mid
            return x + d_2 * (down - s), aux

        x, aux = jax.lax.cond(down > 0, midpoint,
                              lambda aux: (x + d * (down - s), aux), aux)
        k, sub = jax.random.split(k)
        x = x + jax.random.normal(sub, x.shape, x.dtype) * up
        _notify(step_callback, i, x)
        return (x, k, aux), None

    steps = jnp.arange(sig.shape[0])
    (x, _, _), _ = jax.lax.scan(body, (x, key, aux), (steps, sig, sig_next))
    return x


def sample_dpmpp_sde(denoised_fn: DenoisedStepFn, x: jnp.ndarray,
                     sigmas: jnp.ndarray, key: jax.Array, eta: float = 1.0,
                     s_noise: float = 1.0, r: float = 0.5,
                     step_callback: Optional[StepCallback] = None,
                     aux=None) -> jnp.ndarray:
    """DPM-Solver++ SDE (k-diffusion sample_dpmpp_sde formulation): two model
    evaluations per step with ancestral noise at the midpoint and endpoint.
    Uses per-step fold_in gaussian noise rather than k-diffusion's Brownian
    tree sampler (A1111 also exposes the plain-noise variant)."""
    sig, sig_next = _to_sigma_pairs(sigmas)

    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def body(carry, inp):
        x, k, aux = carry
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)

        def last(_k, aux):
            d = (x - den) / s
            return x + d * (sn - s), aux

        def sde_step(k, aux):
            t, t_next = t_of(s), t_of(sn)
            h = t_next - t
            s_mid = jnp.exp(-(t + h * r))
            fac = 1.0 / (2.0 * r)

            k, k1, k2 = jax.random.split(k, 3)
            # step 1: to the (ancestrally split) midpoint
            sd1, su1 = _ancestral_step(s, s_mid, eta)
            t_mid_d = t_of(sd1)
            x_2 = (sd1 / s) * x - jnp.expm1(t - t_mid_d) * den
            x_2 = x_2 + jax.random.normal(k1, x.shape, x.dtype) * s_noise * su1
            den_2, aux = _dcall(denoised_fn, x_2, s_mid, i, aux)
            # step 2: to the (ancestrally split) endpoint
            sd2, su2 = _ancestral_step(s, sn, eta)
            t_next_d = t_of(sd2)
            den_d = (1.0 - fac) * den + fac * den_2
            x_out = (sd2 / s) * x - jnp.expm1(t - t_next_d) * den_d
            return (x_out + jax.random.normal(k2, x.shape, x.dtype)
                    * s_noise * su2), aux

        k, sub = jax.random.split(k)
        x, aux = jax.lax.cond(sn > 0, sde_step, last, sub, aux)
        _notify(step_callback, i, x)
        return (x, k, aux), None

    steps = jnp.arange(sig.shape[0])
    (x, _, _), _ = jax.lax.scan(body, (x, key, aux), (steps, sig, sig_next))
    return x


def sample_plms(denoised_fn: DenoisedStepFn, x: jnp.ndarray, sigmas: jnp.ndarray,
                key: Optional[jax.Array] = None, order: int = 4,
                step_callback: Optional[StepCallback] = None,
                aux=None) -> jnp.ndarray:
    """PLMS (CompVis pseudo linear multistep): Adams-Bashforth over eps
    predictions on the uniform-timestep grid, primed with one midpoint-style
    second evaluation on the first step (p_sample_plms semantics, expressed
    in VE coordinates: den = x - sigma*eps, x' = den + sigma_next*eps')."""
    sig, sig_next = _to_sigma_pairs(sigmas)

    def body(carry, inp):
        x, hist, count, aux = carry       # hist [3, ...] newest first
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)
        eps = (x - den) / s

        def primed(aux):
            # first step: DDIM to sn, re-evaluate, average (2nd-order start)
            x1 = (x - s * eps) + sn * eps
            den2, aux = _dcall(denoised_fn, x1, jnp.maximum(sn, 1e-10), i, aux)
            eps2 = (x1 - den2) / jnp.maximum(sn, 1e-10)
            return (eps + eps2) / 2.0, aux

        def ab(aux):
            e1, e2, e3 = hist[0], hist[1], hist[2]
            ab2 = (3 * eps - e1) / 2
            ab3 = (23 * eps - 16 * e1 + 5 * e2) / 12
            ab4 = (55 * eps - 59 * e1 + 37 * e2 - 9 * e3) / 24
            return jax.lax.switch(jnp.clip(count, 1, 3) - 1,
                                  [lambda: ab2, lambda: ab3, lambda: ab4]), aux

        eps_prime, aux = jax.lax.cond(count == 0, primed, ab, aux)
        x = (x - s * eps) + sn * eps_prime
        hist = jnp.roll(hist, 1, axis=0).at[0].set(eps)
        _notify(step_callback, i, x)
        return (x, hist, count + 1, aux), None

    steps = jnp.arange(sig.shape[0])
    hist0 = jnp.zeros((3,) + x.shape, x.dtype)
    (x, _, _, _), _ = jax.lax.scan(body, (x, hist0, jnp.int32(0), aux),
                                   (steps, sig, sig_next))
    return x


def _dpm_eps(denoised_fn, x, t, i):
    """eps in DPM-Solver t-coordinates (t = -log sigma, sigma = e^-t)."""
    s = jnp.exp(-t)
    return (x - denoised_fn(x, s, i)) / s


def _dpm1(denoised_fn, x, t, t_next, i, eps=None):
    h = t_next - t
    if eps is None:
        eps = _dpm_eps(denoised_fn, x, t, i)
    return x - jnp.exp(-t_next) * jnp.expm1(h) * eps


def _dpm2(denoised_fn, x, t, t_next, i, r1=0.5, eps=None, eps_r1=None):
    h = t_next - t
    if eps is None:
        eps = _dpm_eps(denoised_fn, x, t, i)
    s1 = t + r1 * h
    if eps_r1 is None:
        u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = _dpm_eps(denoised_fn, u1, s1, i)
    return (x - jnp.exp(-t_next) * jnp.expm1(h) * eps
            - jnp.exp(-t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps))


def _dpm3(denoised_fn, x, t, t_next, i, r1=1 / 3, r2=2 / 3,
          eps=None, eps_r1=None):
    h = t_next - t
    if eps is None:
        eps = _dpm_eps(denoised_fn, x, t, i)
    s1, s2 = t + r1 * h, t + r2 * h
    if eps_r1 is None:
        u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = _dpm_eps(denoised_fn, u1, s1, i)
    u2 = (x - jnp.exp(-s2) * jnp.expm1(r2 * h) * eps
          - jnp.exp(-s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1)
          * (eps_r1 - eps))
    eps_r2 = _dpm_eps(denoised_fn, u2, s2, i)
    return (x - jnp.exp(-t_next) * jnp.expm1(h) * eps
            - jnp.exp(-t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps))


def sample_dpm_fast(denoised_fn: DenoisedStepFn, x: jnp.ndarray,
                    sigmas: jnp.ndarray,
                    key: Optional[jax.Array] = None,
                    step_callback: Optional[StepCallback] = None,
                    aux=None) -> jnp.ndarray:
    """DPM-Solver-Fast (Lu et al. 2022; k-diffusion sample_dpm_fast):
    fixed uniform grid in t = -log sigma from sigma_max to the smallest
    nonzero sigma, solved with order-3 segments and an order-(2,1 | n%3)
    tail.  The leading order-3 segments share one step size, so they run as
    a single `lax.scan` (the UNet is traced once, not per segment).  A final
    exact jump to sigma=0 (x = denoised) matches this module's convention of
    ending at sigmas[-1]=0 (k-diffusion stops at sigma_min)."""
    if aux is not None:
        raise ValueError("DeepCache (stateful denoised_fn) is not supported"
                         " by this sampler: its schedule is segmented host-side")
    import numpy as _np

    sig_np = _np.asarray(sigmas)
    n = len(sig_np) - 1                       # model budget (NFE groups)
    t_start = -_np.log(sig_np[0])
    t_end = -_np.log(sig_np[-2])              # smallest nonzero sigma
    m = n // 3 + 1
    ts = _np.linspace(t_start, t_end, m + 1)
    orders = ([3] * (m - 2) + [2, 1]) if n % 3 == 0 else [3] * (m - 1) + [n % 3]
    n3 = sum(1 for o in orders if o == 3)     # leading order-3 segments

    def body(carry, seg_t):
        x, i = carry
        t, t_next = seg_t
        x = _dpm3(denoised_fn, x, t, t_next, i)
        _notify(step_callback, i, x)
        return (x, i + 3), None

    if n3 > 0:
        seg = jnp.stack([jnp.asarray(ts[:n3]), jnp.asarray(ts[1:n3 + 1])], axis=1)
        (x, i), _ = jax.lax.scan(body, (x, jnp.int32(0)), seg)
    else:
        i = jnp.int32(0)
    for j in range(n3, m):                    # at most 2 tail segments
        t, t_next = jnp.asarray(ts[j]), jnp.asarray(ts[j + 1])
        o = orders[j]
        fn = {1: _dpm1, 2: _dpm2, 3: _dpm3}[o]
        x = fn(denoised_fn, x, t, t_next, i)
        i = i + o
    # jump to sigma = 0
    s_last = jnp.asarray(sig_np[-2])
    x = denoised_fn(x, s_last, i)
    _notify(step_callback, i, x)
    return x


def sample_dpm_adaptive(denoised_fn: DenoisedStepFn, x: jnp.ndarray,
                        sigmas: jnp.ndarray, key: Optional[jax.Array] = None,
                        order: int = 3, rtol: float = 0.05, atol: float = 0.0078,
                        h_init: float = 0.05, pcoeff: float = 0.0,
                        icoeff: float = 1.0, dcoeff: float = 0.0,
                        accept_safety: float = 0.81, max_iters: int = 128,
                        step_callback: Optional[StepCallback] = None,
                    aux=None) -> jnp.ndarray:
    """DPM-Solver-12/23 adaptive (k-diffusion dpm_solver_adaptive) as a
    `lax.while_loop`: embedded (order-1,2 | 2,3) pairs give a local error
    estimate driving a PID step-size controller (k-diffusion
    PIDStepSizeController with the atan limiter).  `sigmas` supplies only the
    endpoints; `max_iters` bounds the traced loop (jit-safe).  Ends with the
    exact jump to sigma=0 like sample_dpm_fast."""
    if aux is not None:
        raise ValueError("DeepCache (stateful denoised_fn) is not supported"
                         " by this sampler: its schedule is segmented host-side")
    import numpy as _np

    sig_np = _np.asarray(sigmas)
    t_start = float(-_np.log(sig_np[0]))
    t_end = float(-_np.log(sig_np[-2]))
    b1 = (pcoeff + icoeff + dcoeff) / order
    b2 = -(pcoeff + 2 * dcoeff) / order
    b3 = dcoeff / order

    def solve_pair(x, s, t, i):
        eps = _dpm_eps(denoised_fn, x, s, i)
        h = t - s
        r1 = 1.0 / 3.0 if order == 3 else 0.5
        s1 = s + r1 * h
        u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = _dpm_eps(denoised_fn, u1, s1, i)
        if order == 3:
            x_low = _dpm2(denoised_fn, x, s, t, i, r1=r1, eps=eps, eps_r1=eps_r1)
            x_high = _dpm3(denoised_fn, x, s, t, i, eps=eps, eps_r1=eps_r1)
        else:
            x_low = _dpm1(denoised_fn, x, s, t, i, eps=eps)
            x_high = _dpm2(denoised_fn, x, s, t, i, r1=r1, eps=eps, eps_r1=eps_r1)
        return x_low, x_high

    def cond(carry):
        x, x_prev, s, h, errs, i, iters = carry
        return jnp.logical_and(s < t_end - 1e-5, iters < max_iters)

    def body(carry):
        x, x_prev, s, h, errs, i, iters = carry
        t = jnp.minimum(t_end, s + h)
        x_low, x_high = solve_pair(x, s, t, i)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
        err = (jnp.linalg.norm(((x_low - x_high) / delta).reshape(-1))
               / (x.size ** 0.5))
        inv_err = 1.0 / (err + 1e-8)
        e0 = inv_err
        e1 = jnp.where(errs[1] > 0, errs[1], inv_err)
        e2 = jnp.where(errs[2] > 0, errs[2], inv_err)
        factor = e0 ** b1 * e1 ** b2 * e2 ** b3
        factor = 1 + jnp.arctan(factor - 1)          # k-diffusion limiter
        accept = factor >= accept_safety
        x_new = jnp.where(accept, x_high, x)
        x_prev_new = jnp.where(accept, x_low, x_prev)
        s_new = jnp.where(accept, t, s)
        errs_new = jnp.where(accept, jnp.stack([e0, e0, e1]),
                             errs.at[0].set(e0))
        _notify(step_callback, i, x_new)
        return (x_new, x_prev_new, s_new, h * factor, errs_new,
                i + (3 if order == 3 else 2), iters + 1)

    errs0 = jnp.zeros((3,))
    carry = (x, x, jnp.asarray(t_start), jnp.asarray(h_init), errs0,
             jnp.int32(0), jnp.int32(0))
    x, _, _, _, _, i, _ = jax.lax.while_loop(cond, body, carry)
    return denoised_fn(x, jnp.asarray(sig_np[-2]), i)


def sample_dpmpp_2m_sde(denoised_fn: DenoisedStepFn, x: jnp.ndarray,
                        sigmas: jnp.ndarray, key: jax.Array, eta: float = 1.0,
                        s_noise: float = 1.0,
                        step_callback: Optional[StepCallback] = None,
                        aux=None) -> jnp.ndarray:
    """DPM-Solver++(2M) SDE, midpoint solver type (k-diffusion
    sample_dpmpp_2m_sde): multistep data-prediction update with an
    exponentially-decayed noise mix.  Per-step fold_in gaussian noise stands
    in for the Brownian-tree sampler (as in sample_dpmpp_sde here)."""
    sig, sig_next = _to_sigma_pairs(sigmas)

    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def body(carry, inp):
        x, old_den, h_last, have_old, k, aux = carry
        i, s, sn = inp
        den, aux = _dcall(denoised_fn, x, s, i, aux)

        def last(_):
            return den, h_last

        def step(_):
            t, t_next = t_of(s), t_of(sn)
            h = t_next - t
            eta_h = eta * h
            x_new = (sn / s) * jnp.exp(-eta_h) * x - jnp.expm1(-h - eta_h) * den
            r = h_last / h
            mid = 0.5 * (-jnp.expm1(-h - eta_h)) * (1.0 / r) * (den - old_den)
            x_new = jnp.where(have_old, x_new + mid, x_new)
            if eta > 0:
                sub = jax.random.fold_in(k, i)
                noise = jax.random.normal(sub, x.shape, x.dtype)
                x_new = x_new + noise * sn * jnp.sqrt(-jnp.expm1(-2 * eta_h)) * s_noise
            return x_new, h

        x_new, h_new = jax.lax.cond(sn > 0, step, last, None)
        _notify(step_callback, i, x_new)
        return (x_new, den, h_new, jnp.bool_(True), k, aux), None

    steps = jnp.arange(sig.shape[0])
    init = (x, jnp.zeros_like(x), jnp.asarray(1.0), jnp.bool_(False), key, aux)
    (x, _, _, _, _, _), _ = jax.lax.scan(body, init, (steps, sig, sig_next))
    return x


def sample_restart(denoised_fn: DenoisedStepFn, x: jnp.ndarray, sigmas: jnp.ndarray,
                   key: jax.Array, s_noise: float = 1.0,
                   restart_info: Optional[Tuple[float, float, int, int]] = None,
                   step_callback: Optional[StepCallback] = None,
                    aux=None) -> jnp.ndarray:
    """Restart sampling (Xu et al. 2023; A1111 sd_samplers_extra 'Restart'):
    Heun through the main schedule, then K restart cycles that re-noise from
    sigma_min_r up to sigma_max_r and descend again over an exp-spaced
    segment — trading extra NFEs for lower discretization error.

    ``restart_info`` = (sigma_min_r, sigma_max_r, n_seg_steps, k_restarts);
    the default mirrors A1111's {0.1: [10, 2]} heuristic."""
    if aux is not None:
        raise ValueError("DeepCache (stateful denoised_fn) is not supported"
                         " by this sampler: its schedule is segmented host-side")
    import numpy as _np

    # all schedule math is host-side numpy: `sigmas` must be CONCRETE
    # (STATIC_SIGMA_SAMPLERS — the pipeline bakes it into the program), and
    # under jit even ops on concrete closure arrays would be staged to tracers
    sig_np = _np.asarray(sigmas)
    s_min_r, s_max_r, n_seg, k_restarts = restart_info or (0.1, 2.0, 10, 2)
    lo = max(float(s_min_r), float(sig_np[-2]))
    cut = int(_np.searchsorted(-sig_np, -lo, side="right"))  # first idx < lo
    cut = max(2, min(cut, len(sig_np) - 1))
    upper = jnp.asarray(sig_np[:cut])
    lower = jnp.concatenate([upper[-1:], jnp.asarray(sig_np[cut:])])

    x = sample_heun(denoised_fn, x, upper, step_callback=step_callback)

    # restart segment: exp-spaced sigmas from s_max_r down to the floor
    seg = jnp.exp(jnp.linspace(jnp.log(s_max_r), jnp.log(float(sig_np[cut - 1])),
                               n_seg))
    for r in range(k_restarts):
        sub = jax.random.fold_in(key, 1000 + r)
        bump = jnp.sqrt(jnp.maximum(seg[0] ** 2 - seg[-1] ** 2, 0.0))
        x = x + jax.random.normal(sub, x.shape, x.dtype) * s_noise * bump
        x = sample_heun(denoised_fn, x, seg, step_callback=step_callback)

    # finish the tail of the main schedule (down to 0)
    return sample_heun(denoised_fn, x, lower, step_callback=step_callback)


SAMPLERS = {
    "Euler": sample_euler,
    "Euler a": sample_euler_ancestral,
    "Heun": sample_heun,
    "DPM2": sample_dpm2,
    "DPM2 a": sample_dpm2_ancestral,
    "DPM++ 2M": sample_dpmpp_2m,
    "DPM++ 2S a": sample_dpmpp_2s_ancestral,
    "DPM++ SDE": sample_dpmpp_sde,
    "DPM++ 2M SDE": sample_dpmpp_2m_sde,
    "DPM fast": sample_dpm_fast,
    "DPM adaptive": sample_dpm_adaptive,
    "DDIM": sample_ddim,
    "LMS": sample_lms,
    "PLMS": sample_plms,
    "Restart": sample_restart,
}

# samplers whose updates need fresh noise each step
STOCHASTIC_SAMPLERS = {"Euler a", "DPM++ 2S a", "DPM2 a", "DPM++ SDE",
                       "DPM++ 2M SDE", "Restart"}

# samplers that split/derive their schedule host-side and therefore need
# CONCRETE sigma values (the pipeline bakes sigmas into the traced program
# and keys its jit cache on them instead of passing sigmas as an argument)
STATIC_SIGMA_SAMPLERS = {"Restart", "DPM fast", "DPM adaptive"}


def get_sampler(name: str):
    base = name.replace(" Karras", "")
    if base not in SAMPLERS:
        raise ValueError(f"unknown sampler '{name}'; available: {list(SAMPLERS)}")
    return SAMPLERS[base]
