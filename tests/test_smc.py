"""Tempered SMC tests: moment recovery, evidence (log Z) against analytic
values, multimodal mass allocation, transforms, and determinism."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import HalfNormal, Normal, sample_smc

_LOG_2PI = float(np.log(2.0 * np.pi))


class TestSMCGaussian:
    def test_moments_and_unit_evidence(self):
        # Normalized target: log Z must be ~0 and moments must match.
        def log_prob(params):
            return jnp.sum(Normal(2.0, 1.5).log_prob(params["x"]))

        res = sample_smc(
            log_prob, {"x": jnp.zeros(2)}, num_particles=2048, seed=0,
            q0_scale=3.0,
        )
        pts = np.asarray(res.particles["x"])
        np.testing.assert_allclose(pts.mean(axis=0), 2.0, atol=0.15)
        np.testing.assert_allclose(pts.std(axis=0), 1.5, rtol=0.15)
        assert abs(res.log_evidence) < 0.25
        assert 1 <= res.num_stages < 100
        assert res.final_accept_rate > 0.05

    def test_evidence_of_unnormalized_target(self):
        # log p = -0.5 x^2 / s^2 (unnormalized): Z = sqrt(2 pi s^2).
        s = 2.0

        def log_prob(params):
            return -0.5 * jnp.sum(params["x"] ** 2) / s**2

        res = sample_smc(
            log_prob, {"x": 0.0}, num_particles=4096, seed=1, q0_scale=4.0
        )
        true_log_z = 0.5 * (_LOG_2PI + 2 * np.log(s))
        assert abs(res.log_evidence - true_log_z) < 0.2

    def test_deterministic_under_seed(self):
        def log_prob(params):
            return jnp.sum(Normal(0.0, 1.0).log_prob(params["x"]))

        kw = dict(num_particles=512, seed=5)
        r1 = sample_smc(log_prob, {"x": jnp.zeros(2)}, **kw)
        r2 = sample_smc(log_prob, {"x": jnp.zeros(2)}, **kw)
        np.testing.assert_array_equal(
            np.asarray(r1.particles["x"]), np.asarray(r2.particles["x"])
        )
        assert r1.log_evidence == r2.log_evidence

    def test_validation(self):
        def log_prob(params):
            return Normal(0.0, 1.0).log_prob(params["x"])

        with pytest.raises(ValueError):
            sample_smc(log_prob, {"x": 0.0}, ess_target=1.5)


class TestSMCMultimodal:
    def test_bimodal_mass_allocation(self):
        # 0.3 N(-4, .5) + 0.7 N(4, .5): far-separated modes; SMC populates
        # both in proportion to their mass (single-chain HMC/NUTS cannot).
        def log_prob(params):
            x = params["x"]
            la = jnp.log(0.3) + Normal(-4.0, 0.5).log_prob(x)
            lb = jnp.log(0.7) + Normal(4.0, 0.5).log_prob(x)
            return jnp.logaddexp(la, lb)

        res = sample_smc(
            log_prob, {"x": 0.0}, num_particles=4096, seed=0, q0_scale=6.0
        )
        pts = np.asarray(res.particles["x"])
        frac_right = (pts > 0).mean()
        assert abs(frac_right - 0.7) < 0.1
        assert abs(res.log_evidence) < 0.3  # normalized mixture -> Z ~ 1


class TestSMCTransformed:
    def test_positive_support(self):
        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.normal(0.0, 2.0, size=100).astype(np.float32))

        def log_prob(params):
            lp = HalfNormal(5.0).log_prob(params["sigma"])
            return lp + jnp.sum(Normal(0.0, params["sigma"]).log_prob(y))

        res = sample_smc(
            log_prob,
            {"sigma": 1.0},
            num_particles=2048,
            seed=0,
            transforms={"sigma": "log"},
        )
        pts = np.asarray(res.particles["sigma"])
        assert (pts > 0).all()
        assert abs(pts.mean() - 2.0) < 0.25

    def test_data_argument(self):
        y = jnp.asarray(np.full(50, 3.0, np.float32))

        def log_prob(params, data):
            return jnp.sum(Normal(params["mu"], 1.0).log_prob(data)) + Normal(
                0.0, 10.0
            ).log_prob(params["mu"])

        res = sample_smc(
            log_prob, {"mu": 0.0}, num_particles=1024, seed=0, data=y,
            q0_scale=3.0,
        )
        assert abs(float(np.mean(np.asarray(res.particles["mu"]))) - 3.0) < 0.1
