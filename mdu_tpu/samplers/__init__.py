from .denoiser import (
    DenoisedFn,
    GuidedDenoiser,
    ModelFn,
    cfg_combine,
    denoised_from_model,
    scalings,
)
from .samplers import (
    SAMPLERS,
    STATIC_SIGMA_SAMPLERS,
    STOCHASTIC_SAMPLERS,
    get_sampler,
    sample_ddim,
    sample_dpmpp_2m,
    sample_euler,
    sample_euler_ancestral,
    sample_heun,
    sample_dpmpp_2s_ancestral,
    sample_dpm2,
    sample_dpm2_ancestral,
    sample_dpmpp_sde,
    sample_plms,
    sample_restart,
    sample_lms,
    sample_dpm_fast,
    sample_dpm_adaptive,
    sample_dpmpp_2m_sde,
)
from .schedule import NoiseSchedule, ddim_timesteps, sigmas_karras

__all__ = [
    "DenoisedFn", "GuidedDenoiser", "ModelFn", "cfg_combine",
    "denoised_from_model", "scalings",
    "SAMPLERS", "STATIC_SIGMA_SAMPLERS", "STOCHASTIC_SAMPLERS",
    "get_sampler", "sample_ddim",
    "sample_dpmpp_2m", "sample_euler", "sample_euler_ancestral", "sample_heun",
    "sample_lms", "sample_dpmpp_2s_ancestral",
    "sample_dpm2", "sample_dpm2_ancestral", "sample_dpmpp_sde",
    "sample_plms", "sample_restart",
    "sample_dpm_fast", "sample_dpm_adaptive", "sample_dpmpp_2m_sde",
    "NoiseSchedule", "ddim_timesteps", "sigmas_karras",
]
