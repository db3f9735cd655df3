"""Convergence diagnostics: split R-hat, FFT-based effective sample size.

The reference has no diagnostics module — R-hat/ESS are roadmap items
(README.md:163, TECHNICAL_OVERVIEW.md:293-296). Implemented here as
first-class: host numpy versions for post-processing plus traced jnp
versions usable inside compiled/sharded programs.
"""

from mlx_mcmc_tpu.diagnostics.stats import (
    effective_sample_size,
    potential_scale_reduction,
    summary_stats,
)
from mlx_mcmc_tpu.diagnostics.device import device_ess, device_rhat
from mlx_mcmc_tpu.diagnostics.model_comparison import (
    compare,
    pointwise_log_likelihood,
    psis_loo,
    waic,
)

__all__ = [
    "effective_sample_size",
    "potential_scale_reduction",
    "summary_stats",
    "device_ess",
    "device_rhat",
    "compare",
    "pointwise_log_likelihood",
    "psis_loo",
    "waic",
]
