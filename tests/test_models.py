"""Model zoo tests: GLM posterior recovery (linear case is analytic),
hierarchical model mixing."""

import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import sample
from mlx_mcmc_tpu.models import (
    eight_schools,
    make_hierarchical_normal,
    make_linear_regression,
    make_logistic_regression,
)


class TestGLM:
    def test_linear_regression_matches_analytic_posterior(self):
        # Gaussian prior + Gaussian likelihood => exact posterior:
        # cov = (X'X/s^2 + I/p^2)^-1, mean = cov X'y/s^2.
        spec = make_linear_regression(num_features=10, num_obs=500, seed=0)
        X = np.asarray(spec.X, np.float64)
        y = np.asarray(spec.y, np.float64)
        prec = X.T @ X + np.eye(10)
        cov = np.linalg.inv(prec)
        mean = cov @ (X.T @ y)

        res = sample(
            spec.log_prob,
            spec.initial_params,
            num_samples=2000,
            num_warmup=500,
            num_chains=4,
            kernel="nuts",
            seed=0,
        )
        draws = np.asarray(res.samples["beta"]).reshape(-1, 10)
        np.testing.assert_allclose(draws.mean(axis=0), mean, atol=0.05)
        np.testing.assert_allclose(
            draws.std(axis=0), np.sqrt(np.diag(cov)), rtol=0.25
        )

    def test_logistic_regression_recovers_signs(self):
        spec = make_logistic_regression(num_features=5, num_obs=4000, seed=1)
        res = sample(
            spec.log_prob,
            spec.initial_params,
            num_samples=1000,
            num_warmup=500,
            num_chains=2,
            kernel="nuts",
            seed=0,
        )
        post_mean = np.asarray(res.samples["beta"]).reshape(-1, 5).mean(axis=0)
        true = np.asarray(spec.true_beta)
        # enough data that large coefficients are sign-identified
        strong = np.abs(true) > 0.5
        assert np.all(np.sign(post_mean[strong]) == np.sign(true[strong]))

    def test_bfloat16_design_matrix(self):
        spec = make_logistic_regression(
            num_features=8, num_obs=512, seed=0, data_dtype=jnp.bfloat16
        )
        assert spec.X.dtype == jnp.bfloat16
        val = spec.log_prob(spec.initial_params)
        assert np.isfinite(float(val))


class TestHierarchical:
    def test_recovers_global_mean(self):
        spec = make_hierarchical_normal(num_groups=20, obs_per_group=50, seed=0)
        res = sample(
            spec.log_prob,
            spec.initial_params,
            num_samples=1000,
            num_warmup=1000,
            num_chains=2,
            kernel="nuts",
            seed=0,
        )
        mu = np.asarray(res.samples["mu"]).ravel()
        assert abs(mu.mean() - spec.truth["mu"]) < 0.3
        assert res.divergences < 0.01 * mu.size

    def test_eight_schools_runs_clean(self):
        spec = eight_schools()
        res = sample(
            spec.log_prob,
            spec.initial_params,
            num_samples=1000,
            num_warmup=1000,
            num_chains=4,
            kernel="nuts",
            seed=0,
        )
        mu = np.asarray(res.samples["mu"]).ravel()
        # Known posterior: mu around ~8 with wide spread.
        assert 2.0 < mu.mean() < 14.0
        d = res.diagnostics()
        assert d["mu"]["r_hat"] < 1.05
