"""Sampler kernels: functional init/step cores + reference-compatible wrappers."""

from mlx_mcmc_tpu.kernels.base import TransitionInfo, Tunables, identity_tunables
from mlx_mcmc_tpu.kernels.metropolis import MetropolisState, make_metropolis_kernel
from mlx_mcmc_tpu.kernels.hmc import HMCState, make_hmc_kernel
from mlx_mcmc_tpu.kernels.mala import MALAState, make_mala_kernel
from mlx_mcmc_tpu.kernels.nuts import make_nuts_kernel
from mlx_mcmc_tpu.kernels.chees import ChEESInfo, make_chees_kernel
from mlx_mcmc_tpu.kernels.legacy import hmc, metropolis_hastings, nuts

__all__ = [
    "TransitionInfo",
    "Tunables",
    "identity_tunables",
    "MetropolisState",
    "HMCState",
    "MALAState",
    "ChEESInfo",
    "make_metropolis_kernel",
    "make_hmc_kernel",
    "make_mala_kernel",
    "make_nuts_kernel",
    "make_chees_kernel",
    "metropolis_hastings",
    "hmc",
    "nuts",
]
