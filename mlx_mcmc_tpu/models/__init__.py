"""Benchmark/model zoo: GLMs and hierarchical models used by the examples,
tests, and the benchmark harness (BASELINE.md configs: 100-param/10K-obs and
1000-param/100K-obs GLMs, hierarchical regression)."""

from mlx_mcmc_tpu.models.glm import (
    make_linear_regression,
    make_logistic_regression,
)
from mlx_mcmc_tpu.models.hierarchical import (
    eight_schools,
    make_hierarchical_normal,
)
from mlx_mcmc_tpu.models.poisson import make_poisson_event_rates

__all__ = [
    "make_logistic_regression",
    "make_linear_regression",
    "make_hierarchical_normal",
    "make_poisson_event_rates",
    "eight_schools",
]
