"""ADVI tests: exact-Gaussian recovery, ELBO ascent, transformed models,
and the 'advi' chain-initialization strategy feeding MCMC.

The reference has no VI at all (SURVEY.md §2); these tests cover the new
capability with the same analytic-check style as the distribution tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import HalfNormal, Normal, fit_advi, sample
from mlx_mcmc_tpu.inference.vi import advi_initialize, fit_advi_flat
from mlx_mcmc_tpu.ops.ravel import make_flat_logprob


class TestADVIExactGaussian:
    """On a Gaussian target the mean-field family contains the truth:
    ADVI must recover loc/scale to optimization tolerance."""

    def test_recovers_mean_and_scale(self):
        loc = jnp.asarray([1.5, -2.0])
        scale = jnp.asarray([0.5, 3.0])

        def log_prob(params):
            return jnp.sum(Normal(loc, scale).log_prob(params["x"]))

        res = fit_advi(
            log_prob, {"x": jnp.zeros(2)}, num_steps=1500, seed=0,
            learning_rate=0.05,
        )
        np.testing.assert_allclose(np.asarray(res.mu), np.asarray(loc), atol=0.15)
        np.testing.assert_allclose(
            np.exp(np.asarray(res.log_sigma)), np.asarray(scale), rtol=0.15
        )

    def test_elbo_ascends_to_zero_kl(self):
        # ELBO of q=p is exactly the log normalizer contribution = 0 KL;
        # for a standard normal target with Normal(0,1) density the optimal
        # ELBO equals 0 relative entropy -> elbo -> E_q[logp - logq] -> 0.
        def log_prob(params):
            return jnp.sum(Normal(0.0, 1.0).log_prob(params["x"]))

        res = fit_advi(log_prob, {"x": jnp.zeros(3)}, num_steps=1200, seed=1)
        early = float(jnp.mean(res.elbo_trace[:20]))
        assert res.elbo > early  # ascent
        assert abs(res.elbo) < 0.05  # KL(q||p) ~ 0 at the optimum

    def test_sample_posterior_moments(self):
        def log_prob(params):
            return jnp.sum(Normal(2.0, 0.7).log_prob(params["x"]))

        res = fit_advi(log_prob, {"x": 0.0}, num_steps=1500, seed=2)
        draws = res.sample_posterior(seed=3, num_samples=8000)["x"]
        assert abs(float(jnp.mean(draws)) - 2.0) < 0.1
        assert abs(float(jnp.std(draws)) - 0.7) < 0.1

    def test_summary_keys(self):
        def log_prob(params):
            return jnp.sum(Normal(0.0, 1.0).log_prob(params["x"]))

        res = fit_advi(log_prob, {"x": jnp.zeros(2)}, num_steps=200, seed=0)
        s = res.summary(num_samples=500)
        assert set(s) == {"x[0]", "x[1]"}
        for v in s.values():
            assert {"mean", "std", "median", "2.5%", "97.5%"} <= set(v)


class TestADVITransformedAndData:
    def test_halfnormal_scale_with_log_transform(self):
        rng = np.random.default_rng(0)
        data_np = rng.normal(5.0, 2.0, size=200).astype(np.float32)

        def log_prob(params, data):
            lp = Normal(0.0, 10.0).log_prob(params["mu"])
            lp += HalfNormal(5.0).log_prob(params["sigma"])
            return lp + jnp.sum(
                Normal(params["mu"], params["sigma"]).log_prob(data)
            )

        res = fit_advi(
            log_prob,
            {"mu": 0.0, "sigma": 1.0},
            num_steps=2000,
            seed=0,
            data=jnp.asarray(data_np),
            transforms={"sigma": "log"},
        )
        draws = res.sample_posterior(seed=1, num_samples=4000)
        assert float(jnp.min(draws["sigma"])) > 0.0  # constrained space
        assert abs(float(jnp.mean(draws["mu"])) - data_np.mean()) < 0.15
        assert abs(float(jnp.mean(draws["sigma"])) - data_np.std()) < 0.3

    def test_nonfinite_draws_do_not_poison_fit(self):
        # Unconstrained sampling of a positive-support model: some MC draws
        # land at sigma<=0 -> -inf logp -> grads must be zeroed, not NaN.
        def log_prob(params):
            return HalfNormal(1.0).log_prob(params["s"])

        flat_lp, z0, _ = make_flat_logprob(log_prob, {"s": 1.0})
        mu, log_sigma, elbo = fit_advi_flat(
            flat_lp, z0, jax.random.PRNGKey(0), num_steps=300
        )
        assert bool(jnp.isfinite(mu).all())
        assert bool(jnp.isfinite(log_sigma).all())


class TestADVIInitStrategy:
    def test_advi_initialize_shapes_and_support(self):
        def log_prob(params):
            return jnp.sum(Normal(3.0, 0.5).log_prob(params["x"]))

        flat_lp, z0, _ = make_flat_logprob(log_prob, {"x": jnp.zeros(4)})
        z0_batch = jnp.broadcast_to(z0, (8, 4))
        starts, inv_mass = advi_initialize(
            flat_lp, z0_batch, jax.random.PRNGKey(0), num_steps=600
        )
        assert starts.shape == (8, 4)
        assert inv_mass.shape == (4,)
        # starts concentrated near the target mean, metric near target var
        assert abs(float(jnp.mean(starts)) - 3.0) < 0.5
        np.testing.assert_allclose(np.asarray(inv_mass), 0.25, rtol=0.6)

    def test_sample_with_advi_init_recovers_posterior(self):
        rng = np.random.default_rng(42)
        data_np = rng.normal(5.0, 2.0, size=100).astype(np.float32)

        def log_prob(params):
            lp = Normal(0.0, 10.0).log_prob(params["mu"])
            lp += HalfNormal(5.0).log_prob(params["sigma"])
            return lp + jnp.sum(
                Normal(params["mu"], params["sigma"]).log_prob(
                    jnp.asarray(data_np)
                )
            )

        res = sample(
            log_prob,
            {"mu": 0.0, "sigma": 1.0},
            num_samples=400,
            num_warmup=400,
            num_chains=4,
            kernel="nuts",
            seed=0,
            max_tree_depth=6,
            transforms={"sigma": "log"},
            init_strategy="advi",
        )
        mu_draws = np.asarray(res.samples["mu"]).ravel()
        sigma_draws = np.asarray(res.samples["sigma"]).ravel()
        assert abs(mu_draws.mean() - data_np.mean()) < 0.2
        assert abs(sigma_draws.mean() - data_np.std()) < 0.4
        assert (sigma_draws > 0).all()


class TestFullRankADVI:
    def test_recovers_correlation_meanfield_cannot(self):
        rho = 0.9
        cov = np.array([[1.0, rho], [rho, 1.0]])
        prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

        def log_prob(params):
            x = params["x"]
            return -0.5 * x @ prec @ x

        mf = fit_advi(
            log_prob, {"x": jnp.zeros(2)}, num_steps=1500, seed=0
        )
        fr = fit_advi(
            log_prob, {"x": jnp.zeros(2)}, num_steps=2500, seed=0,
            method="fullrank",
        )
        mf_draws = np.asarray(mf.sample_posterior(seed=1, num_samples=6000)["x"])
        fr_draws = np.asarray(fr.sample_posterior(seed=1, num_samples=6000)["x"])
        # mean-field provably shrinks: marginal std ~ sqrt(1-rho^2) = 0.44
        assert mf_draws.std(axis=0).max() < 0.7
        # full-rank contains the truth: std ~ 1, corr ~ rho
        np.testing.assert_allclose(fr_draws.std(axis=0), 1.0, rtol=0.15)
        assert np.corrcoef(fr_draws.T)[0, 1] > 0.75
        # and its ELBO is strictly better (less KL to the target)
        assert fr.elbo > mf.elbo + 0.1

    def test_fullrank_transformed_and_validation(self):
        def log_prob(params):
            return HalfNormal(2.0).log_prob(params["s"])

        res = fit_advi(
            log_prob, {"s": 1.0}, num_steps=800, seed=0,
            method="fullrank", transforms={"s": "log"},
        )
        draws = np.asarray(res.sample_posterior(seed=1, num_samples=2000)["s"])
        assert (draws > 0).all()
        with pytest.raises(ValueError):
            fit_advi(log_prob, {"s": 1.0}, method="bogus")
