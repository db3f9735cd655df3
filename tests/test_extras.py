"""Tests for the extended distribution set (beyond the reference's six)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from mlx_mcmc_tpu import (
    Bernoulli,
    Dirichlet,
    LogNormal,
    MultivariateNormal,
    Poisson,
    StudentT,
    Uniform,
)

N = 10_000


def key(i=0):
    return jax.random.PRNGKey(i)


class TestAnalytic:
    def test_bernoulli(self):
        d = Bernoulli(probs=0.3)
        assert np.isclose(float(d.log_prob(1.0)), math.log(0.3), atol=1e-6)
        assert np.isclose(float(d.log_prob(0.0)), math.log(0.7), atol=1e-6)
        assert float(d.log_prob(0.5)) == -np.inf

    def test_bernoulli_xor_args(self):
        with pytest.raises(ValueError):
            Bernoulli()
        with pytest.raises(ValueError):
            Bernoulli(probs=0.2, logits=0.0)

    def test_uniform(self):
        d = Uniform(2.0, 5.0)
        assert np.isclose(float(d.log_prob(3.0)), -math.log(3.0), atol=1e-6)
        assert float(d.log_prob(5.5)) == -np.inf
        assert float(d.log_prob(1.9)) == -np.inf

    @pytest.mark.parametrize("x", [0.2, 1.0, 4.2])
    def test_lognormal_matches_scipy(self, x):
        lp = LogNormal(0.5, 0.8).log_prob(x)
        ref = sps.lognorm(s=0.8, scale=math.exp(0.5)).logpdf(x)
        assert np.isclose(float(lp), ref, atol=1e-5)

    @pytest.mark.parametrize("x", [-2.0, 0.0, 3.0])
    def test_studentt_matches_scipy(self, x):
        lp = StudentT(4.0, 1.0, 2.0).log_prob(x)
        ref = sps.t(df=4, loc=1.0, scale=2.0).logpdf(x)
        assert np.isclose(float(lp), ref, atol=1e-5)

    @pytest.mark.parametrize("k", [0, 3, 10])
    def test_poisson_matches_scipy(self, k):
        lp = Poisson(3.5).log_prob(k)
        assert np.isclose(float(lp), sps.poisson(3.5).logpmf(k), atol=1e-5)

    def test_poisson_invalid(self):
        assert float(Poisson(2.0).log_prob(-1)) == -np.inf
        assert float(Poisson(2.0).log_prob(1.5)) == -np.inf

    def test_dirichlet_matches_scipy(self):
        a = np.array([2.0, 3.0, 4.0])
        x = np.array([0.2, 0.3, 0.5])
        lp = Dirichlet(a).log_prob(x)
        assert np.isclose(float(lp), sps.dirichlet(a).logpdf(x), atol=1e-4)
        assert float(Dirichlet(a).log_prob(np.array([0.5, 0.6, -0.1]))) == -np.inf

    def test_mvn_matches_scipy(self):
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        loc = np.array([1.0, -1.0])
        x = np.array([0.3, 0.2])
        lp = MultivariateNormal(loc, covariance_matrix=cov).log_prob(x)
        assert np.isclose(
            float(lp), sps.multivariate_normal(loc, cov).logpdf(x), atol=1e-5
        )

    def test_mvn_xor_args(self):
        with pytest.raises(ValueError):
            MultivariateNormal(np.zeros(2))


class TestSampling:
    @pytest.mark.parametrize(
        "dist,mean,var",
        [
            (Bernoulli(probs=0.3), 0.3, 0.21),
            (Uniform(1.0, 3.0), 2.0, 4.0 / 12),
            (LogNormal(0.0, 0.5), math.exp(0.125), None),
            (StudentT(5.0), 0.0, 5.0 / 3.0),
            (Poisson(4.0), 4.0, 4.0),
        ],
    )
    def test_moments(self, dist, mean, var):
        xs = np.asarray(dist.sample(key(3), (N,)))
        tol = 4 * math.sqrt((var if var else 1.0) / N) + 0.02
        assert abs(xs.mean() - mean) < tol
        if var is not None:
            assert np.isclose(xs.var(), var, rtol=0.2)

    def test_dirichlet_simplex(self):
        xs = np.asarray(Dirichlet([2.0, 3.0, 4.0]).sample(key(0), (N,)))
        assert xs.shape == (N, 3)
        np.testing.assert_allclose(xs.sum(axis=1), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            xs.mean(axis=0), np.array([2, 3, 4]) / 9.0, atol=0.01
        )

    def test_mvn_covariance(self):
        cov = np.array([[2.0, 0.8], [0.8, 1.0]])
        xs = np.asarray(
            MultivariateNormal(np.zeros(2), covariance_matrix=cov).sample(
                key(1), (N,)
            )
        )
        np.testing.assert_allclose(np.cov(xs.T), cov, atol=0.1)


class TestNewBatch2:
    """Laplace / Cauchy / Binomial / NegativeBinomial."""

    @pytest.mark.parametrize("x", [-2.0, 0.5, 3.0])
    def test_laplace_matches_scipy(self, x):
        from mlx_mcmc_tpu import Laplace

        lp = Laplace(0.5, 1.5).log_prob(x)
        assert np.isclose(float(lp), sps.laplace(0.5, 1.5).logpdf(x), atol=1e-5)

    @pytest.mark.parametrize("x", [-3.0, 0.0, 2.0])
    def test_cauchy_matches_scipy(self, x):
        from mlx_mcmc_tpu import Cauchy

        lp = Cauchy(1.0, 2.0).log_prob(x)
        assert np.isclose(float(lp), sps.cauchy(1.0, 2.0).logpdf(x), atol=1e-5)

    @pytest.mark.parametrize("k", [0, 3, 10])
    def test_binomial_matches_scipy(self, k):
        from mlx_mcmc_tpu import Binomial

        lp = Binomial(10, probs=0.3).log_prob(k)
        assert np.isclose(float(lp), sps.binom(10, 0.3).logpmf(k), atol=1e-5)

    def test_binomial_invalid(self):
        from mlx_mcmc_tpu import Binomial

        d = Binomial(5, probs=0.5)
        assert float(d.log_prob(6)) == -np.inf
        assert float(d.log_prob(-1)) == -np.inf
        assert float(d.log_prob(2.5)) == -np.inf
        with pytest.raises(ValueError):
            Binomial(5)

    @pytest.mark.parametrize("k", [0, 2, 7])
    def test_negbinomial_matches_scipy(self, k):
        from mlx_mcmc_tpu import NegativeBinomial

        lp = NegativeBinomial(4.0, 0.4).log_prob(k)
        assert np.isclose(float(lp), sps.nbinom(4, 0.4).logpmf(k), atol=1e-5)

    def test_sampling_moments(self):
        from mlx_mcmc_tpu import Binomial, Laplace, NegativeBinomial

        for dist in [Laplace(1.0, 2.0), Binomial(20, probs=0.3),
                     NegativeBinomial(5.0, 0.5)]:
            xs = np.asarray(dist.sample(key(11), (N,)))
            mean = float(dist.mean())
            var = float(dist.variance())
            assert abs(xs.mean() - mean) < 4 * math.sqrt(var / N) + 0.02
            assert np.isclose(xs.var(), var, rtol=0.2)

    def test_cauchy_sampling_median(self):
        from mlx_mcmc_tpu import Cauchy

        xs = np.asarray(Cauchy(2.0, 1.0).sample(key(12), (N,)))
        assert abs(np.median(xs) - 2.0) < 0.1
