"""Metropolis kernel tests (the reference has no dedicated Metropolis tests —
SURVEY.md §4 gap; posterior-recovery patterns follow tests/test_hmc.py)."""

import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import Normal, metropolis_hastings, sample


def _gaussian_model(mu0=2.0, sigma0=1.5):
    def log_prob(params):
        return Normal(mu0, sigma0).log_prob(params["x"])

    return log_prob


class TestMetropolis:
    def test_recovers_gaussian_moments(self):
        res = sample(
            _gaussian_model(),
            {"x": 0.0},
            num_samples=4000,
            num_warmup=500,
            num_chains=4,
            kernel="metropolis",
            seed=0,
            step_size=1.0,
        )
        xs = np.asarray(res.samples["x"]).ravel()
        assert abs(xs.mean() - 2.0) < 0.15
        assert abs(xs.std() - 1.5) < 0.2

    def test_acceptance_rate_band(self):
        res = sample(
            _gaussian_model(),
            {"x": 0.0},
            num_samples=2000,
            num_warmup=500,
            num_chains=2,
            kernel="metropolis",
            seed=1,
        )
        # Adaptation targets 0.234.
        assert 0.1 < res.acceptance_rate < 0.45

    def test_reproducible_under_fixed_seed(self):
        kwargs = dict(num_samples=200, num_warmup=50, kernel="metropolis", seed=3)
        a = sample(_gaussian_model(), {"x": 0.0}, **kwargs)
        b = sample(_gaussian_model(), {"x": 0.0}, **kwargs)
        np.testing.assert_array_equal(
            np.asarray(a.samples["x"]), np.asarray(b.samples["x"])
        )

    def test_legacy_signature(self):
        # Reference contract: (samples dict, accept_rate), no warmup.
        samples, accept = metropolis_hastings(
            _gaussian_model(),
            {"x": 0.0},
            num_samples=500,
            proposal_scale=1.0,
            random_seed=0,
        )
        assert set(samples.keys()) == {"x"}
        assert samples["x"].shape == (500,)
        assert 0.0 < accept < 1.0

    def test_vector_parameters(self):
        def log_prob(params):
            return jnp.sum(Normal(0.0, 1.0).log_prob(params["v"]))

        res = sample(
            log_prob,
            {"v": jnp.zeros(5)},
            num_samples=3000,
            num_warmup=500,
            num_chains=2,
            kernel="metropolis",
            seed=0,
        )
        v = np.asarray(res.samples["v"])
        assert v.shape == (2, 3000, 5)
        assert np.all(np.abs(v.mean(axis=(0, 1))) < 0.25)

    def test_invalid_start_recovers(self):
        # Start far outside high-probability region; -inf/NaN guards must not
        # wedge the chain.
        def log_prob(params):
            x = params["x"]
            return jnp.where(x > 0, Normal(1.0, 1.0).log_prob(x), -jnp.inf)

        res = sample(
            log_prob,
            {"x": -5.0},
            num_samples=2000,
            num_warmup=500,
            kernel="metropolis",
            seed=0,
            step_size=1.0,
        )
        xs = np.asarray(res.samples["x"]).ravel()
        assert (xs[-500:] > 0).all()


class TestThinning:
    def test_thinned_shapes_and_decorrelation(self):
        kwargs = dict(num_warmup=200, num_chains=2, kernel="metropolis",
                      seed=0, step_size=0.6)
        dense = sample(_gaussian_model(), {"x": 0.0}, num_samples=2000, **kwargs)
        thinned = sample(_gaussian_model(), {"x": 0.0}, num_samples=400,
                         thin=5, **kwargs)
        assert thinned.samples["x"].shape == (2, 400)
        from mlx_mcmc_tpu.diagnostics import effective_sample_size

        ess_dense = float(effective_sample_size(np.asarray(dense.samples["x"])))
        ess_thin = float(effective_sample_size(np.asarray(thinned.samples["x"])))
        # Per stored draw, thinned chains are less autocorrelated.
        assert ess_thin / 800 > ess_dense / 4000

    def test_thin_posterior_unbiased(self):
        res = sample(
            _gaussian_model(), {"x": 0.0}, num_samples=1500, num_warmup=300,
            num_chains=4, kernel="nuts", seed=1, thin=3,
        )
        xs = np.asarray(res.samples["x"]).ravel()
        assert abs(xs.mean() - 2.0) < 0.12
        assert abs(xs.std() - 1.5) < 0.15

    def test_thin_aggregates_divergences_and_steps(self):
        """Thinning changes what is STORED, not the dynamics (per-step RNG is
        fold_in(chain_key, global_t)), so a thin=5 run over the same step
        range must report exactly the divergence count and total integration
        steps of the dense run — divergences inside a thinned block must not
        be silently dropped."""

        def funnel(params):
            # Neal's funnel: pathological geometry -> divergences at a fixed
            # overlarge step size.
            y, x = params["y"], params["x"]
            return Normal(0.0, 3.0).log_prob(y) + jnp.sum(
                Normal(0.0, jnp.exp(0.5 * y)).log_prob(x)
            )

        init = {"y": 0.0, "x": jnp.zeros(4)}
        kwargs = dict(
            num_warmup=0, num_chains=4, kernel="nuts", seed=3,
            step_size=2.0, adapt_step_size=False, adapt_mass_matrix=False,
            max_tree_depth=6,
        )
        dense = sample(funnel, init, num_samples=300, **kwargs)
        thinned = sample(funnel, init, num_samples=60, thin=5, **kwargs)
        assert dense.divergences > 0  # the target must actually diverge
        # Thinned is_divergent flags each stored draw whose 5-step block
        # contained any divergence: exactly the blockwise-OR of dense flags.
        dense_flags = np.asarray(dense.info.is_divergent)  # (chains, 300)
        block_any = dense_flags.reshape(dense_flags.shape[0], 60, 5).any(-1)
        assert thinned.divergences == int(block_any.sum())
        assert np.array_equal(np.asarray(thinned.info.is_divergent), block_any)
        assert int(np.sum(np.asarray(thinned.info.num_integration_steps))) == int(
            np.sum(np.asarray(dense.info.num_integration_steps))
        )
