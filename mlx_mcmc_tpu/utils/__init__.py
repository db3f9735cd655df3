"""Utilities: typed configs, profiling helpers, structured run reports."""

from mlx_mcmc_tpu.utils.config import (
    AdaptationConfig,
    MeshConfig,
    SamplerConfig,
)
from mlx_mcmc_tpu.utils.profiling import gradient_evals, trace_to

__all__ = [
    "SamplerConfig",
    "AdaptationConfig",
    "MeshConfig",
    "trace_to",
    "gradient_evals",
]
