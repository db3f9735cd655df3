"""Ensemble (affine-invariant stretch move) sampler tests: Gaussian-target
moment recovery, affine invariance in practice (correlated target without
any tuning), transforms, thinning, and reproducibility."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import HalfNormal, Normal, sample_ensemble


def _gauss_model(loc, scale):
    def log_prob(params):
        return jnp.sum(Normal(loc, scale).log_prob(params["x"]))

    return log_prob


class TestEnsembleBasics:
    def test_recovers_gaussian_moments(self):
        res = sample_ensemble(
            _gauss_model(2.0, 1.5),
            {"x": jnp.zeros(3)},
            num_walkers=64,
            num_samples=800,
            num_warmup=500,
            seed=0,
        )
        draws = np.asarray(res.samples["x"]).reshape(-1, 3)
        np.testing.assert_allclose(draws.mean(axis=0), 2.0, atol=0.15)
        np.testing.assert_allclose(draws.std(axis=0), 1.5, rtol=0.12)

    def test_correlated_target_untuned(self):
        # Strongly correlated 2-D Gaussian: affine invariance means no
        # tuning is needed — acceptance stays healthy and both marginal
        # scales are recovered.
        cov = np.array([[1.0, 0.97], [0.97, 1.0]])
        prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

        def log_prob(params):
            x = params["x"]
            return -0.5 * x @ prec @ x

        res = sample_ensemble(
            log_prob,
            {"x": jnp.zeros(2)},
            num_walkers=64,
            num_samples=1500,
            num_warmup=800,
            seed=1,
        )
        draws = np.asarray(res.samples["x"]).reshape(-1, 2)
        assert 0.2 < res.acceptance_rate < 0.8
        np.testing.assert_allclose(draws.std(axis=0), 1.0, rtol=0.15)
        corr = np.corrcoef(draws.T)[0, 1]
        assert corr > 0.9

    def test_reproducible_under_fixed_seed(self):
        kw = dict(num_walkers=16, num_samples=50, num_warmup=20, seed=7)
        r1 = sample_ensemble(_gauss_model(0.0, 1.0), {"x": 0.0}, **kw)
        r2 = sample_ensemble(_gauss_model(0.0, 1.0), {"x": 0.0}, **kw)
        np.testing.assert_array_equal(
            np.asarray(r1.samples["x"]), np.asarray(r2.samples["x"])
        )

    def test_shapes_and_result_surface(self):
        res = sample_ensemble(
            _gauss_model(0.0, 1.0),
            {"x": jnp.zeros(2)},
            num_walkers=32,
            num_samples=40,
            num_warmup=10,
            seed=0,
        )
        assert res.samples["x"].shape == (32, 40, 2)
        assert res.info.accept_prob.shape == (32, 40)
        s = res.summary()
        assert {"x[0]", "x[1]"} == set(s)
        d = res.diagnostics()
        assert "x" in d and d["x"]["n_eff"] > 0

    def test_thinning(self):
        res = sample_ensemble(
            _gauss_model(0.0, 1.0),
            {"x": 0.0},
            num_walkers=16,
            num_samples=30,
            num_warmup=10,
            thin=3,
            seed=0,
        )
        assert res.samples["x"].shape == (16, 30)

    def test_validation(self):
        with pytest.raises(ValueError):
            sample_ensemble(_gauss_model(0, 1), {"x": 0.0}, num_walkers=5)
        with pytest.raises(ValueError):
            sample_ensemble(_gauss_model(0, 1), {"x": 0.0}, a=0.9)


class TestEnsembleTransformed:
    def test_positive_support_with_log_transform(self):
        rng = np.random.default_rng(3)
        data = jnp.asarray(rng.normal(0.0, 2.0, size=300).astype(np.float32))

        def log_prob(params):
            lp = HalfNormal(5.0).log_prob(params["sigma"])
            return lp + jnp.sum(Normal(0.0, params["sigma"]).log_prob(data))

        res = sample_ensemble(
            log_prob,
            {"sigma": 1.0},
            num_walkers=32,
            num_samples=800,
            num_warmup=500,
            seed=0,
            transforms={"sigma": "log"},
        )
        draws = np.asarray(res.samples["sigma"]).ravel()
        assert (draws > 0).all()
        assert abs(draws.mean() - 2.0) < 0.25


class TestEnsembleFacade:
    def test_mcmc_facade_method_ensemble(self):
        from mlx_mcmc_tpu import MCMC

        mcmc = MCMC(_gauss_model(1.0, 2.0))
        samples = mcmc.run(
            {"x": 0.0},
            num_samples=400,
            num_warmup=300,
            method="ensemble",
            num_chains=32,
            verbose=False,
        )
        draws = samples["x"]
        assert draws.shape == (32 * 400,)
        assert abs(draws.mean() - 1.0) < 0.25
        assert abs(draws.std() - 2.0) < 0.35
        s = mcmc.summary()
        assert {"mean", "std", "median", "2.5%", "97.5%"} <= set(s["x"])
