"""Core array ops: pytree ravel/unravel, streaming moments, numerics helpers."""

from mlx_mcmc_tpu.ops.ravel import ravel_params, make_flat_logprob
from mlx_mcmc_tpu.ops.math import (
    WelfordState,
    welford_init,
    welford_update,
    welford_batch_update,
    welford_finalize,
    safe_where_log_prob,
)

__all__ = [
    "ravel_params",
    "make_flat_logprob",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_batch_update",
    "welford_finalize",
    "safe_where_log_prob",
]
