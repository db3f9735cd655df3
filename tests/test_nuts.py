"""NUTS kernel tests — strategy ported from reference tests/test_nuts.py
(moment recovery, reproducibility, adaptation, constraints, max_tree_depth
bounds, end-to-end recovery) plus iterative-NUTS-specific checks: tree-depth
statistics, divergence detection on pathological targets, and a stationarity
(invariance) test that the recursive reference could not run at scale."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import HalfNormal, Normal, nuts, sample


def _std_normal(params):
    return jnp.sum(Normal(0.0, 1.0).log_prob(params["x"]))


class TestNUTS:
    def test_recovers_standard_normal_5d(self):
        res = sample(
            _std_normal,
            {"x": jnp.zeros(5)},
            num_samples=2000,
            num_warmup=500,
            num_chains=4,
            kernel="nuts",
            seed=0,
        )
        xs = np.asarray(res.samples["x"]).reshape(-1, 5)
        assert np.all(np.abs(xs.mean(axis=0)) < 0.1)
        assert np.all(np.abs(xs.std(axis=0) - 1.0) < 0.1)

    def test_correlated_gaussian(self):
        # 2-d correlated target: NUTS must handle curvature directions.
        prec = jnp.asarray([[2.0, -1.2], [-1.2, 2.0]])

        def log_prob(params):
            x = params["x"]
            return -0.5 * x @ prec @ x

        cov = np.linalg.inv(np.asarray(prec))
        res = sample(
            log_prob,
            {"x": jnp.zeros(2)},
            num_samples=3000,
            num_warmup=1000,
            num_chains=4,
            kernel="nuts",
            seed=0,
        )
        xs = np.asarray(res.samples["x"]).reshape(-1, 2)
        emp_cov = np.cov(xs.T)
        np.testing.assert_allclose(emp_cov, cov, atol=0.12)

    def test_bit_reproducible_fixed_key(self):
        kwargs = dict(num_samples=100, num_warmup=100, kernel="nuts", seed=11)
        a = sample(_std_normal, {"x": jnp.zeros(3)}, **kwargs)
        b = sample(_std_normal, {"x": jnp.zeros(3)}, **kwargs)
        np.testing.assert_array_equal(
            np.asarray(a.samples["x"]), np.asarray(b.samples["x"])
        )

    def test_static_schedule_bit_identical(self):
        """static_schedule=True changes only the execution schedule (fixed
        2^depth-1 masked iterations for collective uniformity); every draw
        and every diagnostic must be bit-identical to the dynamic loop."""
        kwargs = dict(
            num_samples=150, num_warmup=150, num_chains=2, kernel="nuts",
            seed=11, max_tree_depth=5,
        )
        dyn = sample(_std_normal, {"x": jnp.zeros(3)}, **kwargs)
        sta = sample(
            _std_normal, {"x": jnp.zeros(3)}, static_schedule=True, **kwargs
        )
        np.testing.assert_array_equal(
            np.asarray(dyn.samples["x"]), np.asarray(sta.samples["x"])
        )
        np.testing.assert_array_equal(
            np.asarray(dyn.info.num_integration_steps),
            np.asarray(sta.info.num_integration_steps),
        )
        np.testing.assert_array_equal(
            np.asarray(dyn.info.is_divergent), np.asarray(sta.info.is_divergent)
        )
        assert float(dyn.tunables.step_size) == float(sta.tunables.step_size)

    def test_max_tree_depth_bounds_steps(self):
        for depth in (3, 6):
            res = sample(
                _std_normal,
                {"x": jnp.zeros(2)},
                num_samples=200,
                num_warmup=200,
                kernel="nuts",
                seed=0,
                max_tree_depth=depth,
            )
            depths = np.asarray(res.info.tree_depth)
            steps = np.asarray(res.info.num_integration_steps)
            assert depths.max() <= depth
            assert steps.max() <= 2**depth

    def test_step_size_adapts_toward_target(self):
        res = sample(
            _std_normal,
            {"x": jnp.zeros(10)},
            num_samples=1000,
            num_warmup=1000,
            kernel="nuts",
            seed=3,
            target_accept=0.8,
        )
        accept = np.asarray(res.info.accept_prob).mean()
        assert 0.6 < accept < 0.95

    def test_halfnormal_constraint(self):
        def log_prob(params):
            return HalfNormal(2.0).log_prob(params["s"])

        res = sample(
            log_prob,
            {"s": 1.0},
            num_samples=2000,
            num_warmup=500,
            kernel="nuts",
            seed=0,
        )
        assert (np.asarray(res.samples["s"]) > 0).all()

    def test_divergences_on_pathological_target(self):
        # Neal's funnel without reparameterization at large fixed step size
        # should produce divergences — detection must fire.
        def funnel(params):
            v, x = params["v"], params["x"]
            return Normal(0.0, 3.0).log_prob(v) + jnp.sum(
                Normal(0.0, jnp.exp(0.5 * v)).log_prob(x)
            )

        res = sample(
            funnel,
            {"v": 0.0, "x": jnp.zeros(5)},
            num_samples=500,
            num_warmup=0,
            kernel="nuts",
            seed=0,
            step_size=1.5,
            adapt_step_size=False,
            adapt_mass_matrix=False,
        )
        assert res.divergences > 0

    def test_recover_mu_sigma_from_data(self):
        # Reference test_nuts.py:188-227 (true 5.0, 2.0, n=50).
        rng = np.random.default_rng(1)
        data = jnp.asarray(rng.normal(5.0, 2.0, 50).astype(np.float32))

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
            kernel="nuts",
            seed=0,
        )
        mu = np.asarray(res.samples["mu"]).ravel()
        sigma = np.asarray(res.samples["sigma"]).ravel()
        assert abs(mu.mean() - float(data.mean())) < 0.25
        assert abs(sigma.mean() - float(data.std())) < 0.35

    def test_legacy_signature(self):
        samples, accept = nuts(
            _std_normal,
            {"x": jnp.zeros(2)},
            num_samples=200,
            num_warmup=200,
            key=5,
        )
        assert samples["x"].shape == (200, 2)
        assert 0.0 < accept <= 1.0

    def test_stationarity_invariance(self):
        # Chains initialized from the exact target stay in the target after
        # NUTS transitions (detailed-balance smoke test; infeasible for the
        # reference's host-loop sampler at this chain count).
        num_chains = 256
        key = jax.random.PRNGKey(0)
        init = jax.random.normal(key, (num_chains, 3))

        res = sample(
            _std_normal,
            {"x": init},
            num_samples=20,
            num_warmup=0,
            num_chains=num_chains,
            kernel="nuts",
            seed=1,
            step_size=0.8,
            adapt_step_size=False,
            adapt_mass_matrix=False,
            batched_initial=True,
        )
        final = np.asarray(res.samples["x"])[:, -1, :]  # (chains, 3)
        # Mean ~ N(0, 1/sqrt(C)) per dim; std ~ 1.
        assert np.all(np.abs(final.mean(axis=0)) < 4.0 / np.sqrt(num_chains))
        assert np.all(np.abs(final.std(axis=0) - 1.0) < 0.15)
