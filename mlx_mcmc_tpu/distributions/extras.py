"""Distributions beyond the reference's six — rounding out the library for
real model-building (regression, robust errors, simplex/count data).

All follow the same contract as the core six: traced ``log_prob``/``sample``,
broadcastable parameters, NaN-safe support masking, on-device special
functions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from mlx_mcmc_tpu.distributions.base import Distribution
from mlx_mcmc_tpu.distributions.normal import _HALF_LOG_2PI
from mlx_mcmc_tpu.ops.math import safe_where_log_prob


class Bernoulli(Distribution):
    """Bernoulli over {0, 1}, parameterized by ``probs`` XOR ``logits``."""

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of `probs` or `logits`.")
        if logits is not None:
            self.logits = jnp.asarray(logits, jnp.result_type(float))
        else:
            p = jnp.asarray(probs, jnp.result_type(float))
            self.logits = jnp.log(p) - jnp.log1p(-p)

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    @property
    def batch_shape(self):
        return jnp.shape(self.logits)

    def log_prob(self, value):
        value = jnp.asarray(value)
        # value*logit - softplus(logit), valid for value in {0,1}
        lp = value * self.logits - jax.nn.softplus(self.logits)
        valid = (value == 0) | (value == 1)
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        return jax.random.bernoulli(key, self.probs, out_shape).astype(
            jnp.result_type(float)
        )

    def mean(self):
        return self.probs

    def variance(self):
        p = self.probs
        return p * (1.0 - p)


class Uniform(Distribution):
    """Continuous uniform on [low, high)."""

    def __init__(self, low=0.0, high=1.0):
        self.low = low
        self.high = high

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.low), jnp.shape(self.high))

    def log_prob(self, value):
        value = jnp.asarray(value)
        in_support = (value >= self.low) & (value <= self.high)
        lp = -jnp.log(jnp.asarray(self.high - self.low, jnp.result_type(float)))
        return jnp.where(in_support, lp, -jnp.inf)

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        u = jax.random.uniform(key, out_shape, jnp.result_type(float))
        return self.low + (self.high - self.low) * u

    def mean(self):
        return 0.5 * (jnp.asarray(self.low) + self.high)

    def variance(self):
        return jnp.square(jnp.asarray(self.high) - self.low) / 12.0


class LogNormal(Distribution):
    """exp(N(loc, scale)); support (0, inf)."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def log_prob(self, value):
        value = jnp.asarray(value)

        def _lp(x):
            lx = jnp.log(x)
            z = (lx - self.loc) / self.scale
            return -0.5 * z * z - lx - jnp.log(self.scale) - _HALF_LOG_2PI

        return safe_where_log_prob(value > 0.0, value, 1.0, _lp)

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        eps = jax.random.normal(key, out_shape, jnp.result_type(float))
        return jnp.exp(self.loc + self.scale * eps)

    def mean(self):
        return jnp.exp(jnp.asarray(self.loc) + 0.5 * jnp.square(self.scale))

    def variance(self):
        s2 = jnp.square(self.scale)
        return (jnp.exp(s2) - 1.0) * jnp.exp(2.0 * jnp.asarray(self.loc) + s2)

    def median(self):
        return jnp.exp(jnp.asarray(self.loc))


class StudentT(Distribution):
    """Student's t with ``df`` degrees of freedom, location/scale."""

    def __init__(self, df, loc=0.0, scale=1.0):
        self.df = df
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.df), jnp.shape(self.loc), jnp.shape(self.scale)
        )

    def log_prob(self, value):
        df = jnp.asarray(self.df, jnp.result_type(float))
        z = (jnp.asarray(value) - self.loc) / self.scale
        return (
            gammaln(0.5 * (df + 1.0))
            - gammaln(0.5 * df)
            - 0.5 * jnp.log(df * math.pi)
            - jnp.log(self.scale)
            - 0.5 * (df + 1.0) * jnp.log1p(z * z / df)
        )

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        t = jax.random.t(key, jnp.asarray(self.df, jnp.result_type(float)), out_shape)
        return self.loc + self.scale * t

    def mean(self):
        df = jnp.asarray(self.df, jnp.result_type(float))
        return jnp.where(df > 1.0, jnp.broadcast_to(self.loc, self.batch_shape), jnp.nan)

    def variance(self):
        df = jnp.asarray(self.df, jnp.result_type(float))
        v = jnp.square(self.scale) * df / (df - 2.0)
        return jnp.where(df > 2.0, v, jnp.where(df > 1.0, jnp.inf, jnp.nan))


class Poisson(Distribution):
    """Poisson with rate ``rate``; support {0, 1, 2, ...}."""

    def __init__(self, rate):
        self.rate = rate

    @property
    def batch_shape(self):
        return jnp.shape(self.rate)

    def log_prob(self, value):
        value = jnp.asarray(value)
        safe = jnp.where(value >= 0, value, 0.0)
        lp = safe * jnp.log(self.rate) - self.rate - gammaln(safe + 1.0)
        valid = (value >= 0) & (value == jnp.floor(value))
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        return jax.random.poisson(key, self.rate, out_shape).astype(
            jnp.result_type(float)
        )

    def mean(self):
        return jnp.asarray(self.rate, jnp.result_type(float))

    def variance(self):
        return jnp.asarray(self.rate, jnp.result_type(float))


class Dirichlet(Distribution):
    """Dirichlet over the simplex; ``concentration`` has the category axis last."""

    def __init__(self, concentration):
        self.concentration = jnp.asarray(concentration, jnp.result_type(float))

    @property
    def batch_shape(self):
        return self.concentration.shape[:-1]

    def log_prob(self, value):
        value = jnp.asarray(value)
        a = self.concentration
        in_support = jnp.all(value > 0.0, axis=-1) & (
            jnp.abs(jnp.sum(value, axis=-1) - 1.0) < 1e-4
        )
        safe = jnp.where(value > 0.0, value, 0.5)
        lp = (
            jnp.sum((a - 1.0) * jnp.log(safe), axis=-1)
            - jnp.sum(gammaln(a), axis=-1)
            + gammaln(jnp.sum(a, axis=-1))
        )
        return jnp.where(in_support, lp, -jnp.inf)

    def sample(self, key, shape=()):
        if isinstance(shape, int):
            shape = (shape,)
        out_shape = tuple(shape) + self.concentration.shape
        return jax.random.dirichlet(key, self.concentration, out_shape[:-1])

    def mean(self):
        a = self.concentration
        return a / jnp.sum(a, axis=-1, keepdims=True)


class MultivariateNormal(Distribution):
    """Multivariate normal with dense covariance (given as Cholesky factor or
    covariance matrix)."""

    def __init__(self, loc, covariance_matrix=None, scale_tril=None):
        if (covariance_matrix is None) == (scale_tril is None):
            raise ValueError(
                "Provide exactly one of `covariance_matrix` or `scale_tril`."
            )
        self.loc = jnp.asarray(loc, jnp.result_type(float))
        if scale_tril is None:
            scale_tril = jnp.linalg.cholesky(
                jnp.asarray(covariance_matrix, jnp.result_type(float))
            )
        self.scale_tril = jnp.asarray(scale_tril, jnp.result_type(float))

    @property
    def dim(self):
        return self.loc.shape[-1]

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            self.loc.shape[:-1], self.scale_tril.shape[:-2]
        )

    def log_prob(self, value):
        diff = jnp.asarray(value) - self.loc
        # Solve L z = diff
        z = jax.scipy.linalg.solve_triangular(
            self.scale_tril, diff[..., None], lower=True
        )[..., 0]
        log_det = jnp.sum(jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), -1)
        return -0.5 * jnp.sum(z * z, -1) - log_det - self.dim * _HALF_LOG_2PI

    def sample(self, key, shape=()):
        if isinstance(shape, int):
            shape = (shape,)
        out_shape = tuple(shape) + self.batch_shape + (self.dim,)
        eps = jax.random.normal(key, out_shape, self.loc.dtype)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def mean(self):
        return self.loc

    def covariance(self):
        return self.scale_tril @ jnp.swapaxes(self.scale_tril, -1, -2)


class Laplace(Distribution):
    """Laplace (double exponential) with location/scale."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def log_prob(self, value):
        z = jnp.abs(jnp.asarray(value) - self.loc) / self.scale
        return -z - jnp.log(2.0 * jnp.asarray(self.scale, jnp.result_type(float)))

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        return self.loc + self.scale * jax.random.laplace(
            key, out_shape, jnp.result_type(float)
        )

    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    def variance(self):
        return 2.0 * jnp.square(jnp.asarray(self.scale, jnp.result_type(float)))


class Cauchy(Distribution):
    """Cauchy with location/scale (undefined mean/variance)."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def log_prob(self, value):
        z = (jnp.asarray(value) - self.loc) / self.scale
        return (
            -jnp.log1p(z * z)
            - jnp.log(jnp.asarray(self.scale, jnp.result_type(float)))
            - math.log(math.pi)
        )

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        return self.loc + self.scale * jax.random.cauchy(
            key, out_shape, jnp.result_type(float)
        )

    def median(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)


class Binomial(Distribution):
    """Binomial(total_count, probs): support {0..n}."""

    def __init__(self, total_count, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of `probs` or `logits`.")
        self.total_count = total_count
        if logits is not None:
            self.logits = jnp.asarray(logits, jnp.result_type(float))
        else:
            p = jnp.asarray(probs, jnp.result_type(float))
            self.logits = jnp.log(p) - jnp.log1p(-p)

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.total_count), jnp.shape(self.logits)
        )

    def log_prob(self, value):
        value = jnp.asarray(value)
        n = jnp.asarray(self.total_count, jnp.result_type(float))
        k = jnp.where((value >= 0) & (value <= n), value, 0.0)
        log_binom = gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)
        lp = log_binom + k * self.logits - n * jax.nn.softplus(self.logits)
        valid = (value >= 0) & (value <= n) & (value == jnp.floor(value))
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key, shape=()):
        out_shape = self._sample_shape(shape)
        return jax.random.binomial(
            key,
            jnp.asarray(self.total_count, jnp.result_type(float)),
            self.probs,
            shape=out_shape,
        )

    def mean(self):
        return jnp.asarray(self.total_count, jnp.result_type(float)) * self.probs

    def variance(self):
        p = self.probs
        return jnp.asarray(self.total_count, jnp.result_type(float)) * p * (1 - p)


class NegativeBinomial(Distribution):
    """Negative binomial: number of failures before ``total_count`` successes
    with success probability ``probs`` (mean = n(1-p)/p)."""

    def __init__(self, total_count, probs):
        self.total_count = total_count
        self.probs = probs

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.total_count), jnp.shape(self.probs)
        )

    def log_prob(self, value):
        value = jnp.asarray(value)
        n = jnp.asarray(self.total_count, jnp.result_type(float))
        p = jnp.asarray(self.probs, jnp.result_type(float))
        k = jnp.where(value >= 0, value, 0.0)
        lp = (
            gammaln(k + n)
            - gammaln(n)
            - gammaln(k + 1.0)
            + n * jnp.log(p)
            + k * jnp.log1p(-p)
        )
        valid = (value >= 0) & (value == jnp.floor(value))
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key, shape=()):
        # Gamma-Poisson mixture: lambda ~ Gamma(n, p/(1-p)), k ~ Poisson(lambda).
        out_shape = self._sample_shape(shape)
        key_g, key_p = jax.random.split(key)
        n = jnp.asarray(self.total_count, jnp.result_type(float))
        p = jnp.asarray(self.probs, jnp.result_type(float))
        lam = jax.random.gamma(key_g, n, out_shape) * (1.0 - p) / p
        return jax.random.poisson(key_p, lam).astype(jnp.result_type(float))

    def mean(self):
        n = jnp.asarray(self.total_count, jnp.result_type(float))
        p = jnp.asarray(self.probs, jnp.result_type(float))
        return n * (1 - p) / p

    def variance(self):
        n = jnp.asarray(self.total_count, jnp.result_type(float))
        p = jnp.asarray(self.probs, jnp.result_type(float))
        return n * (1 - p) / (p * p)
