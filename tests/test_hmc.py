"""HMC kernel tests — strategy ported from reference tests/test_hmc.py:
known-posterior moment recovery, acceptance bands, fixed-key
bit-reproducibility, adaptation behavior, constraint handling, and
end-to-end (mu, sigma) recovery from synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import HalfNormal, Normal, hmc, sample


def _standard_normal_2d(params):
    return Normal(0.0, 1.0).log_prob(params["a"]) + Normal(0.0, 1.0).log_prob(
        params["b"]
    )


class TestHMC:
    def test_recovers_standard_normal(self):
        res = sample(
            _standard_normal_2d,
            {"a": 0.0, "b": 0.0},
            num_samples=2000,
            num_warmup=500,
            num_chains=4,
            kernel="hmc",
            seed=0,
        )
        for name in ("a", "b"):
            xs = np.asarray(res.samples[name]).ravel()
            assert abs(xs.mean()) < 0.1
            assert abs(xs.std() - 1.0) < 0.1

    def test_acceptance_rate_high(self):
        res = sample(
            _standard_normal_2d,
            {"a": 0.0, "b": 0.0},
            num_samples=1000,
            num_warmup=500,
            kernel="hmc",
            seed=1,
        )
        # Dual averaging targets 0.8.
        assert 0.6 < res.acceptance_rate <= 1.0

    def test_bit_reproducible_fixed_key(self):
        kwargs = dict(num_samples=100, num_warmup=100, kernel="hmc", seed=42)
        a = sample(_standard_normal_2d, {"a": 0.0, "b": 0.0}, **kwargs)
        b = sample(_standard_normal_2d, {"a": 0.0, "b": 0.0}, **kwargs)
        np.testing.assert_array_equal(
            np.asarray(a.samples["a"]), np.asarray(b.samples["a"])
        )

    def test_step_size_adaptation_improves_acceptance(self):
        # Deliberately bad initial step size; adaptation must fix it.
        res = sample(
            _standard_normal_2d,
            {"a": 0.0, "b": 0.0},
            num_samples=500,
            num_warmup=500,
            kernel="hmc",
            seed=2,
            step_size=5.0,
        )
        assert res.acceptance_rate > 0.5
        assert float(res.tunables.step_size) < 5.0

    def test_no_adaptation_keeps_step_size(self):
        res = sample(
            _standard_normal_2d,
            {"a": 0.0, "b": 0.0},
            num_samples=100,
            num_warmup=100,
            kernel="hmc",
            seed=2,
            step_size=0.3,
            adapt_step_size=False,
            adapt_mass_matrix=False,
        )
        assert float(res.tunables.step_size) == np.float32(0.3)
        np.testing.assert_allclose(
            np.asarray(res.tunables.inv_mass_diag), np.ones(2)
        )

    def test_halfnormal_constraint_stays_positive(self):
        def log_prob(params):
            return HalfNormal(2.0).log_prob(params["s"])

        res = sample(
            log_prob,
            {"s": 1.0},
            num_samples=2000,
            num_warmup=500,
            kernel="hmc",
            seed=0,
        )
        assert (np.asarray(res.samples["s"]) > 0).all()

    def test_recover_mu_sigma_from_data(self):
        # End-to-end recovery (reference test_hmc.py:179-220: true 3.0, 1.5).
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.normal(3.0, 1.5, 50).astype(np.float32))

        def log_prob(params):
            mu, sigma = params["mu"], params["sigma"]
            lp = Normal(0.0, 10.0).log_prob(mu) + HalfNormal(5.0).log_prob(sigma)
            return lp + jnp.sum(Normal(mu, sigma).log_prob(data))

        res = sample(
            log_prob,
            {"mu": 0.0, "sigma": 1.0},
            num_samples=2000,
            num_warmup=1000,
            num_chains=2,
            kernel="hmc",
            seed=0,
        )
        mu = np.asarray(res.samples["mu"]).ravel()
        sigma = np.asarray(res.samples["sigma"]).ravel()
        assert abs(mu.mean() - float(data.mean())) < 0.25
        assert abs(sigma.mean() - float(data.std())) < 0.3

    def test_legacy_signature(self):
        samples, accept = hmc(
            _standard_normal_2d,
            {"a": 0.0, "b": 0.0},
            num_samples=200,
            num_warmup=200,
            key=7,
        )
        assert samples["a"].shape == (200,)
        assert 0.0 < accept <= 1.0

    def test_energy_and_info_finite(self):
        res = sample(
            _standard_normal_2d,
            {"a": 0.0, "b": 0.0},
            num_samples=100,
            num_warmup=100,
            kernel="hmc",
            seed=5,
        )
        assert np.isfinite(np.asarray(res.info.energy)).all()
        assert np.isfinite(np.asarray(res.info.log_prob)).all()
        assert res.divergences == 0
