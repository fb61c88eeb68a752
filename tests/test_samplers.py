"""Sampler and schedule tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.samplers import (
    GuidedDenoiser,
    NoiseSchedule,
    denoised_from_model,
    sample_ddim,
    sample_dpmpp_2m,
    sample_euler,
    sample_euler_ancestral,
    sample_heun,
    sigmas_karras,
)


def test_sd_sigma_table_endpoints():
    s = NoiseSchedule().sigmas
    # canonical SD-1.5 discrete sigma range
    assert abs(s[0] - 0.0292) < 1e-3
    assert abs(s[-1] - 14.61) < 0.02
    assert np.all(np.diff(s) > 0)


def test_sampling_sigmas_descend_to_zero():
    sch = NoiseSchedule()
    for kind in ("automatic", "karras"):
        sig = sch.sampling_sigmas(20, kind)
        assert len(sig) == 21
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0)
    k = sigmas_karras(10, 14.6, 0.03)
    assert k[0] == pytest.approx(14.6) and k[-1] == 0.0


def test_t_for_sigma_roundtrip():
    sch = NoiseSchedule()
    table = sch.sigmas
    t = sch.t_for_sigma(jnp.asarray(table[[3, 100, 500, 999]]))
    np.testing.assert_allclose(np.asarray(t), [3, 100, 500, 999], atol=1e-2)


def test_img2img_steps():
    sch = NoiseSchedule()
    assert sch.img2img_steps(20, 0.75) == (20, 15)
    assert sch.img2img_steps(20, 1.0) == (20, 19)


@pytest.mark.parametrize("sampler", [
    sample_euler, sample_heun, sample_dpmpp_2m, sample_ddim,
])
def test_perfect_denoiser_recovers_x0(sampler):
    """With an oracle denoiser every sampler must land exactly on x0."""
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 8, 8)).astype(np.float32))
    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(8))
    noisy = x0 + jax.random.normal(jax.random.PRNGKey(1), x0.shape) * sig[0]
    out = sampler(lambda x, s, i: x0, noisy, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ancestral_perfect_denoiser():
    x0 = jnp.zeros((1, 4, 8, 8))
    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(8))
    noisy = jax.random.normal(jax.random.PRNGKey(1), x0.shape) * sig[0]
    out = sample_euler_ancestral(lambda x, s, i: x0, noisy, sig, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)


def test_scalings_epsilon_parameterization():
    """denoised = x - sigma*eps for the epsilon parameterization."""
    sch = NoiseSchedule()
    eps_val = 0.5

    def model_fn(x, t, cond):
        return jnp.full_like(x, eps_val)

    den_fn = denoised_from_model(model_fn, sch)
    x = jnp.ones((2, 4, 4, 4))
    sigma = jnp.asarray(2.0)
    den = den_fn(x, sigma, None)
    np.testing.assert_allclose(np.asarray(den), 1.0 - 2.0 * eps_val, rtol=1e-6)


def test_cfg_combine_batched():
    sch = NoiseSchedule()

    def model_fn(x, t, cond):
        # cond is a per-sample scalar broadcast into the prediction
        return jnp.zeros_like(x) + cond.reshape(-1, 1, 1, 1)

    g = GuidedDenoiser(model_fn, sch, cond=jnp.asarray([1.0]),
                       uncond=jnp.asarray([0.0]), cfg_scale=3.0)
    x = jnp.zeros((1, 4, 4, 4))
    sigma = jnp.asarray(1.0)
    den = g(x, sigma)
    # den = x - sigma * (eps_u + 3(eps_c - eps_u)) = -1 * (0 + 3*1) = -3
    np.testing.assert_allclose(np.asarray(den), -3.0, rtol=1e-5)


def test_v_prediction_scalings():
    import dataclasses
    sch = dataclasses.replace(NoiseSchedule(), prediction_type="v_prediction")

    def model_fn(x, t, cond):
        return jnp.zeros_like(x)           # v = 0 -> denoised = c_skip * x

    den_fn = denoised_from_model(model_fn, sch)
    x = jnp.ones((1, 4, 4, 4))
    sigma = jnp.asarray(2.0)
    den = den_fn(x, sigma, None)
    np.testing.assert_allclose(np.asarray(den), 1.0 / 5.0, rtol=1e-5)


@pytest.mark.parametrize("sampler", [
    sample_euler, sample_ddim, sample_dpmpp_2m, sample_heun,
])
def test_linear_denoiser_converges_to_analytic(sampler):
    """For den = a*x the probability-flow ODE has the closed form
    x(sigma) = x(sigma0) * (sigma/sigma0)^(1-a); samplers must converge to it
    as steps grow (integrated over [sigma_max, sigma_min], dropping the 0
    endpoint where the analytic solution is only an asymptotic limit)."""
    a = 0.3
    sch = NoiseSchedule()

    def err(steps):
        sig = np.asarray(sch.sampling_sigmas(steps))[:-1]
        out = sampler(lambda x, s, i: a * x, jnp.full((1, 2, 2, 2), 5.0),
                      jnp.asarray(sig))
        analytic = 5.0 * (sig[-1] / sig[0]) ** (1 - a)
        return abs(float(np.asarray(out).reshape(-1)[0]) - analytic) / analytic

    e100, e400 = err(100), err(400)
    assert e400 < e100, f"no convergence: {e100} -> {e400}"
    assert e400 < 0.08, f"error too large at 400 steps: {e400}"


def test_lms_perfect_denoiser():
    from mdu_tpu.samplers import sample_lms

    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 8, 8)).astype(np.float32))
    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(8))
    noisy = x0 + jax.random.normal(jax.random.PRNGKey(1), x0.shape) * sig[0]
    out = sample_lms(lambda x, s, i: x0, noisy, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-2, rtol=1e-2)


def test_lms_converges_to_analytic():
    from mdu_tpu.samplers import sample_lms

    a = 0.3
    sch = NoiseSchedule()

    def err(steps):
        sig = np.asarray(sch.sampling_sigmas(steps))[:-1]
        out = sample_lms(lambda x, s, i: a * x, jnp.full((1, 2, 2, 2), 5.0),
                         jnp.asarray(sig))
        analytic = 5.0 * (sig[-1] / sig[0]) ** (1 - a)
        return abs(float(np.asarray(out).reshape(-1)[0]) - analytic) / analytic

    e50, e200 = err(50), err(200)
    assert e200 < e50 and e200 < 0.05, (e50, e200)


def test_dpmpp_2s_a_perfect_denoiser():
    from mdu_tpu.samplers import sample_dpmpp_2s_ancestral

    x0 = jnp.zeros((1, 4, 8, 8))
    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(8))
    noisy = jax.random.normal(jax.random.PRNGKey(1), x0.shape) * sig[0]
    out = sample_dpmpp_2s_ancestral(lambda x, s, i: x0, noisy, sig,
                                    jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)


def test_dpmpp_2s_a_deterministic_converges():
    """With eta=0 (no noise) it is a plain 2nd-order ODE solver."""
    from mdu_tpu.samplers import sample_dpmpp_2s_ancestral

    a = 0.3
    sch = NoiseSchedule()

    def err(steps):
        sig = np.asarray(sch.sampling_sigmas(steps))[:-1]
        out = sample_dpmpp_2s_ancestral(
            lambda x, s, i: a * x, jnp.full((1, 2, 2, 2), 5.0),
            jnp.asarray(sig), jax.random.PRNGKey(0), eta=0.0)
        analytic = 5.0 * (sig[-1] / sig[0]) ** (1 - a)
        return abs(float(np.asarray(out).reshape(-1)[0]) - analytic) / analytic

    e50, e200 = err(50), err(200)
    assert e200 < e50 and e200 < 0.05, (e50, e200)


def test_euler_churn():
    """s_churn adds noise then renoises consistently: a perfect denoiser
    still lands on x0; churn changes intermediate trajectories."""
    x0 = jnp.zeros((1, 4, 8, 8))
    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(8))
    noisy = jax.random.normal(jax.random.PRNGKey(1), x0.shape) * sig[0]
    out = sample_euler(lambda x, s, i: x0, noisy, sig, jax.random.PRNGKey(2),
                       s_churn=0.5)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)

    def lin(x, s, i):
        return 0.3 * x

    a = sample_euler(lin, noisy, sig, jax.random.PRNGKey(2))
    b = sample_euler(lin, noisy, sig, jax.random.PRNGKey(2), s_churn=0.5)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_ddim_eta_path():
    """eta > 0 routes DDIM through the ancestral update with a key."""
    x0 = jnp.zeros((1, 4, 8, 8))
    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(8))
    noisy = jax.random.normal(jax.random.PRNGKey(1), x0.shape) * sig[0]
    det = sample_ddim(lambda x, s, i: x0, noisy, sig)
    sto = sample_ddim(lambda x, s, i: x0, noisy, sig, jax.random.PRNGKey(2), eta=1.0)
    np.testing.assert_allclose(np.asarray(det), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sto), 0.0, atol=1e-4)


@pytest.mark.parametrize("sampler_name", ["DPM2", "DPM2 a", "DPM++ SDE", "PLMS", "Restart"])
def test_new_samplers_perfect_denoiser(sampler_name):
    """Oracle denoiser: deterministic DPM2 lands exactly on x0; the
    ancestral/SDE variants contract to x0 (noise scale -> 0 with sigma)."""
    from mdu_tpu.samplers import SAMPLERS

    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 8, 8)).astype(np.float32))
    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(12))
    noisy = x0 + jax.random.normal(jax.random.PRNGKey(1), x0.shape) * sig[0]
    fn = SAMPLERS[sampler_name]
    if sampler_name in ("DPM2", "PLMS"):
        out = fn(lambda x, s, i: x0, noisy, sig)
    else:
        out = fn(lambda x, s, i: x0, noisy, sig, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-2)


@pytest.mark.parametrize("sampler_name", ["DPM fast", "DPM adaptive", "DPM++ 2M SDE"])
def test_kdiff_family_perfect_denoiser(sampler_name):
    from mdu_tpu.samplers import SAMPLERS

    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 8, 8)).astype(np.float32))
    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(12))
    noisy = x0 + jax.random.normal(jax.random.PRNGKey(1), x0.shape) * sig[0]
    fn = SAMPLERS[sampler_name]
    if sampler_name == "DPM++ 2M SDE":
        out = fn(lambda x, s, i: x0, noisy, sig, jax.random.PRNGKey(2))
    else:
        out = fn(lambda x, s, i: x0, noisy, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-2)


@pytest.mark.parametrize("sampler_name", ["DPM fast", "DPM++ 2M SDE"])
def test_kdiff_family_converges_to_analytic(sampler_name):
    """Linear denoiser den = a*x: x(sigma) = x0 * (sigma/sigma0)^(1-a).
    DPM++ 2M SDE runs with eta=0 (pure ODE mode)."""
    from mdu_tpu.samplers import SAMPLERS

    a = 0.3
    sch = NoiseSchedule()
    fn = SAMPLERS[sampler_name]

    def err(steps):
        sigs = np.asarray(sch.sampling_sigmas(steps))[:-1]   # drop the 0
        if sampler_name == "DPM++ 2M SDE":
            out = fn(lambda x, s, i: a * x, jnp.full((1, 2, 2, 2), 5.0),
                     jnp.asarray(sigs), jax.random.PRNGKey(0), eta=0.0)
            analytic = 5.0 * (sigs[-1] / sigs[0]) ** (1 - a)
        else:
            # DPM fast integrates to sigmas[-2] then jumps x -> den = a*x
            sig_in = jnp.asarray(np.concatenate([sigs, [0.0]]))
            out = fn(lambda x, s, i: a * x, jnp.full((1, 2, 2, 2), 5.0), sig_in)
            analytic = a * 5.0 * (sigs[-1] / sigs[0]) ** (1 - a)
        return abs(float(np.asarray(out).reshape(-1)[0]) - analytic) / abs(analytic)

    e60, e240 = err(60), err(240)
    assert e240 < e60 and e240 < 0.08, (e60, e240)


def test_dpm_adaptive_linear_ode():
    """Adaptive solver on the linear ODE: accurate and fewer NFE than the
    max_iters bound (the controller accepts steps)."""
    from mdu_tpu.samplers import sample_dpm_adaptive

    a = 0.3
    sig = np.asarray(NoiseSchedule().sampling_sigmas(50))
    out = sample_dpm_adaptive(lambda x, s, i: a * x,
                              jnp.full((1, 2, 2, 2), 5.0),
                              jnp.asarray(sig), rtol=0.01, atol=1e-4)
    analytic = a * 5.0 * (sig[-2] / sig[0]) ** (1 - a)   # incl. final jump
    got = float(np.asarray(out).reshape(-1)[0])
    assert abs(got - analytic) / abs(analytic) < 0.05, (got, analytic)


def test_dpmpp_sde_linear_ode_convergence():
    """dx/dsigma = x/sigma has exact solution x(sn) = x(s) * sn/s; the
    denoiser for that ODE is den = 0.  DPM++ SDE with eta=0 must follow the
    exact exponential trajectory."""
    from mdu_tpu.samplers import sample_dpmpp_sde

    sig = jnp.asarray(NoiseSchedule().sampling_sigmas(6))
    x = jnp.full((1, 1, 2, 2), 3.0)
    out = sample_dpmpp_sde(lambda x, s, i: jnp.zeros_like(x), x, sig,
                           jax.random.PRNGKey(0), eta=0.0)
    # at sigma -> 0, x -> 0 along the exact trajectory
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_dpm2_second_order_accuracy():
    """DPM2 (log-space midpoint) must clearly beat first-order Euler on a
    nonlinear probability-flow ODE, measured against a scipy RK45 ground
    truth.  The trajectory stops at sigma_min (sigmas[:-1]) — the last drop
    to sigma=0 is a projection, not a smooth ODE segment."""
    from scipy.integrate import solve_ivp

    from mdu_tpu.samplers import sample_dpm2

    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(8,)) * 5.0
    sig = np.asarray(NoiseSchedule().sampling_sigmas(40))[:-1]

    sol = solve_ivp(lambda s, x: (x - 0.9 * np.tanh(x)) / s,
                    (float(sig[0]), float(sig[-1])), x0, rtol=1e-10, atol=1e-12)
    truth = sol.y[:, -1]

    xj = jnp.asarray(x0.reshape(1, 1, 2, 4).astype(np.float32))

    def den(x, s, i):
        return jnp.tanh(x) * 0.9

    sg = jnp.asarray(sig)
    err_dpm2 = np.abs(np.asarray(sample_dpm2(den, xj, sg)).reshape(-1) - truth).max()
    err_euler = np.abs(np.asarray(sample_euler(den, xj, sg)).reshape(-1) - truth).max()
    assert err_dpm2 < 0.7 * err_euler, (err_dpm2, err_euler)


def test_noise_inversion_forces_euler():
    """ref tilediffusion.py:431-435: noise inversion only supports Euler."""
    import dataclasses as dc

    from mdu_tpu.config import SamplerConfig, TiledDiffusionConfig
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition, random_params,
                                tiny_unet_config, tiny_vae_config)
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)
    cond = {"crossattn": jnp.zeros((1, 7, 16))}
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8,
                              noise_inverse=True, noise_inverse_steps=2,
                              noise_inverse_renoise_strength=0.0)
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    sp = SamplerConfig(steps=3, name="DPM++ 2M", denoising_strength=0.6)
    res = pipe.img2img(img, cond, None, sampler=sp, seed=1,
                       tiled_diffusion=td, decode=False)
    assert res.info["Sampler"] == "Euler"
