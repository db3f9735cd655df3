"""Exponential distribution with rate parameter.

Reference parity: mlx_mcmc/distributions/exponential.py:7-131 (``log_prob``
:48-71 with ``-inf`` below 0, inverse-CDF ``sample`` :73-91, moments :93-131).
Sampling here uses ``jax.random.exponential`` (native exponential variates)
instead of the reference's ``-log(1-u)/rate`` uniform transform.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mlx_mcmc_tpu.distributions.base import Distribution
from mlx_mcmc_tpu.ops.math import safe_where_log_prob


class Exponential(Distribution):
    """Exponential distribution with rate ``rate`` (support ``[0, inf)``)."""

    def __init__(self, rate):
        self.rate = rate

    @property
    def batch_shape(self):
        return jnp.shape(self.rate)

    def log_prob(self, value):
        value = jnp.asarray(value)

        def _lp(x):
            return jnp.log(self.rate) - self.rate * x

        return safe_where_log_prob(value >= 0.0, value, 1.0, _lp)

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        e = jax.random.exponential(key, out_shape, dtype=jnp.result_type(float))
        return e / self.rate

    def mean(self):
        return 1.0 / jnp.asarray(self.rate, jnp.result_type(float))

    def variance(self):
        return 1.0 / jnp.square(jnp.asarray(self.rate, jnp.result_type(float)))

    def mode(self):
        return jnp.zeros(self.batch_shape)

    def median(self):
        return math.log(2.0) / jnp.asarray(self.rate, jnp.result_type(float))

    def __repr__(self):  # pragma: no cover
        return f"Exponential(rate={self.rate})"
