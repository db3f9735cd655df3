"""Distribution layer: stateless, traced, broadcastable value objects.

Mirrors the reference's export surface (mlx_mcmc/distributions/__init__.py:3-9)
and extends it with unconstraining transforms.
"""

from mlx_mcmc_tpu.distributions.base import Distribution
from mlx_mcmc_tpu.distributions.normal import Normal
from mlx_mcmc_tpu.distributions.halfnormal import HalfNormal
from mlx_mcmc_tpu.distributions.beta import Beta
from mlx_mcmc_tpu.distributions.gamma import Gamma
from mlx_mcmc_tpu.distributions.exponential import Exponential
from mlx_mcmc_tpu.distributions.categorical import Categorical
from mlx_mcmc_tpu.distributions.extras import (
    Bernoulli,
    Binomial,
    Cauchy,
    Dirichlet,
    Laplace,
    LogNormal,
    MultivariateNormal,
    NegativeBinomial,
    Poisson,
    StudentT,
    Uniform,
)
from mlx_mcmc_tpu.distributions.transforms import (
    Exp,
    Identity,
    Sigmoid,
    Softplus,
    StickBreaking,
    Transform,
    make_transformed_logprob,
)

__all__ = [
    "Distribution",
    "Normal",
    "HalfNormal",
    "Beta",
    "Gamma",
    "Exponential",
    "Categorical",
    "Bernoulli",
    "Binomial",
    "NegativeBinomial",
    "Laplace",
    "Cauchy",
    "Uniform",
    "LogNormal",
    "StudentT",
    "Poisson",
    "Dirichlet",
    "MultivariateNormal",
    "Transform",
    "Identity",
    "Exp",
    "Softplus",
    "Sigmoid",
    "StickBreaking",
    "make_transformed_logprob",
]
