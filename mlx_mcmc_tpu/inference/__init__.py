"""Inference layer: compiled engine, functional API, and the MCMC facade."""

from mlx_mcmc_tpu.inference.api import (
    MCMCResult,
    clear_runner_cache,
    sample,
    sample_posterior_predictive,
)
from mlx_mcmc_tpu.inference.engine import build_sampler, make_kernel
from mlx_mcmc_tpu.inference.mcmc import MCMC
from mlx_mcmc_tpu.inference.tempered import (
    TemperedResult,
    geometric_ladder,
    sample_tempered,
)
from mlx_mcmc_tpu.inference.vi import ADVIResult, fit_advi
from mlx_mcmc_tpu.inference.ensemble import sample_ensemble
from mlx_mcmc_tpu.inference.smc import SMCResult, sample_smc

__all__ = [
    "MCMC",
    "MCMCResult",
    "sample",
    "sample_posterior_predictive",
    "clear_runner_cache",
    "build_sampler",
    "make_kernel",
    "TemperedResult",
    "geometric_ladder",
    "sample_tempered",
    "ADVIResult",
    "fit_advi",
    "sample_ensemble",
    "SMCResult",
    "sample_smc",
]
