"""Normal (Gaussian) distribution.

Reference parity: mlx_mcmc/distributions/normal.py:7-77 (``log_prob`` at
:33-56, ``sample`` at :58-77). Here both paths are traced jnp ops that
broadcast over batched/traced ``loc``/``scale``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mlx_mcmc_tpu.distributions.base import Distribution

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


class Normal(Distribution):
    """Normal distribution with location ``loc`` and scale ``scale``."""

    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - _HALF_LOG_2PI

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        eps = jax.random.normal(key, out_shape, dtype=jnp.result_type(float))
        return self.loc + self.scale * eps

    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    def variance(self):
        return jnp.broadcast_to(jnp.square(self.scale), self.batch_shape)

    def mode(self):
        return self.mean()

    def entropy(self):
        return _HALF_LOG_2PI + 0.5 + jnp.log(self.scale)

    def __repr__(self):  # pragma: no cover
        return f"Normal(loc={self.loc}, scale={self.scale})"
