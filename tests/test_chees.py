"""ChEES-HMC kernel tests: uniform per-draw cost, trajectory adaptation,
posterior recovery (incl. a correlated target where trajectory length
matters), and layout invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import Normal, sample
from mlx_mcmc_tpu.kernels.chees import halton_sequence


def _std_normal(params):
    return jnp.sum(Normal(0.0, 1.0).log_prob(params["x"]))


class TestHalton:
    def test_values_in_unit_interval_and_low_discrepancy(self):
        us = np.array([float(halton_sequence(jnp.asarray(t))) for t in range(16)])
        assert ((us > 0) & (us < 1)).all()
        # base-2 radical inverse of 1..16: first entries 0.5, 0.25, 0.75...
        np.testing.assert_allclose(us[:4], [0.5, 0.25, 0.75, 0.125])


class TestChEES:
    def test_recovers_standard_normal(self):
        res = sample(
            _std_normal,
            {"x": jnp.zeros(5)},
            num_samples=2000,
            num_warmup=1000,
            num_chains=8,
            kernel="chees",
            seed=0,
        )
        xs = np.asarray(res.samples["x"]).reshape(-1, 5)
        assert np.all(np.abs(xs.mean(axis=0)) < 0.1)
        assert np.all(np.abs(xs.std(axis=0) - 1.0) < 0.1)
        d = res.diagnostics()
        assert d["x"]["r_hat"] < 1.05

    def test_uniform_cost_across_chains(self):
        # The defining property: every chain in a draw runs the SAME number
        # of leapfrog steps (unlike vmapped NUTS trees).
        res = sample(
            _std_normal,
            {"x": jnp.zeros(3)},
            num_samples=50,
            num_warmup=100,
            num_chains=8,
            kernel="chees",
            seed=1,
        )
        steps = np.asarray(res.info.num_integration_steps)  # (chains, draws)
        assert (steps == steps[0:1, :]).all()
        # jittered: not all draws use the same count
        assert len(np.unique(steps[0])) > 3

    def test_trajectory_adapts_up_for_correlated_target(self):
        # Strongly correlated 2-d Gaussian: optimal trajectories are much
        # longer than one step; the ChEES criterion must discover that.
        prec = jnp.asarray([[1.0, -0.97], [-0.97, 1.0]]) / (1 - 0.97**2)

        def log_prob(params):
            x = params["x"]
            return -0.5 * x @ prec @ x

        res = sample(
            log_prob,
            {"x": jnp.zeros(2)},
            num_samples=1500,
            num_warmup=1500,
            num_chains=16,
            kernel="chees",
            seed=0,
        )
        eps = float(res.tunables.step_size)
        tau = float(res.tunables.trajectory_length)
        assert tau > 2 * eps  # grew beyond the 1-step init
        xs = np.asarray(res.samples["x"]).reshape(-1, 2)
        cov = np.cov(xs.T)
        true_cov = np.linalg.inv(np.asarray(prec))
        np.testing.assert_allclose(cov, true_cov, atol=0.2 * true_cov[0, 0])

    def test_reproducible_fixed_seed(self):
        kwargs = dict(num_samples=100, num_warmup=100, num_chains=4,
                      kernel="chees", seed=9)
        a = sample(_std_normal, {"x": jnp.zeros(2)}, **kwargs)
        b = sample(_std_normal, {"x": jnp.zeros(2)}, **kwargs)
        np.testing.assert_array_equal(
            np.asarray(a.samples["x"]), np.asarray(b.samples["x"])
        )

    def test_sampling_extras_stripped(self):
        res = sample(
            _std_normal, {"x": jnp.zeros(4)}, num_samples=50, num_warmup=50,
            num_chains=2, kernel="chees", seed=0,
        )
        # memory guard: endpoint extras not stored per draw
        assert res.info.proposal_position.shape[-1] == 0
        assert res.info.end_velocity.shape[-1] == 0

    def test_facade_method(self):
        from mlx_mcmc_tpu import MCMC

        mcmc = MCMC(_std_normal)
        samples = mcmc.run(
            {"x": jnp.zeros(2)}, num_samples=200, num_warmup=200,
            method="chees", verbose=False,
        )
        assert samples["x"].shape == (200, 2)

    def test_sharded_chees(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from mlx_mcmc_tpu.parallel import sample_sharded

        res = sample_sharded(
            _std_normal,
            {"x": jnp.zeros(3)},
            num_samples=500,
            num_warmup=500,
            num_chains=8,
            kernel="chees",
            seed=0,
        )
        xs = np.asarray(res.samples["x"]).reshape(-1, 3)
        assert np.all(np.abs(xs.mean(axis=0)) < 0.15)
