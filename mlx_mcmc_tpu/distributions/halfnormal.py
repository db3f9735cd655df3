"""Half-normal distribution: |X| for X ~ Normal(0, scale).

Reference parity: mlx_mcmc/distributions/halfnormal.py:7-83 (``log_prob``
:34-63 with ``-inf`` below 0, ``sample`` :65-83 as ``abs(normal)``).
Support masking here uses the NaN-safe double-where pattern so gradients at
the boundary are finite (the reference's plain where at halfnormal.py:63 gives
NaN grads, which would poison a compiled HMC chain).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mlx_mcmc_tpu.distributions.base import Distribution
from mlx_mcmc_tpu.ops.math import safe_where_log_prob

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_LOG_2 = math.log(2.0)


class HalfNormal(Distribution):
    """Half-normal distribution with scale ``scale`` (support ``[0, inf)``)."""

    def __init__(self, scale):
        self.scale = scale

    @property
    def batch_shape(self):
        return jnp.shape(self.scale)

    def log_prob(self, value):
        value = jnp.asarray(value)

        def _lp(x):
            z = x / self.scale
            return _LOG_2 - 0.5 * z * z - jnp.log(self.scale) - _HALF_LOG_2PI

        return safe_where_log_prob(value >= 0, value, 1.0, _lp)

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        eps = jax.random.normal(key, out_shape, dtype=jnp.result_type(float))
        return jnp.abs(eps) * self.scale

    def mean(self):
        return self.scale * math.sqrt(2.0 / math.pi)

    def variance(self):
        return jnp.square(self.scale) * (1.0 - 2.0 / math.pi)

    def mode(self):
        return jnp.zeros(self.batch_shape)

    def __repr__(self):  # pragma: no cover
        return f"HalfNormal(scale={self.scale})"
