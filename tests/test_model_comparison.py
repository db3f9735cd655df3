"""WAIC / PSIS-LOO tests: estimator agreement on a well-specified model,
effective-parameter sanity, Pareto-k health, and model ranking."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import HalfNormal, Normal, sample
from mlx_mcmc_tpu.diagnostics import (
    compare,
    pointwise_log_likelihood,
    psis_loo,
    waic,
)

N_OBS = 80


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(2.0, 1.0, size=N_OBS).astype(np.float32))

    def log_prob(params):
        lp = Normal(0.0, 10.0).log_prob(params["mu"])
        lp += HalfNormal(5.0).log_prob(params["sigma"])
        return lp + jnp.sum(Normal(params["mu"], params["sigma"]).log_prob(y))

    res = sample(
        log_prob,
        {"mu": 0.0, "sigma": 1.0},
        num_samples=500,
        num_warmup=400,
        num_chains=4,
        kernel="nuts",
        seed=0,
        max_tree_depth=6,
        transforms={"sigma": "log"},
    )

    def log_lik(params):
        return Normal(params["mu"], params["sigma"]).log_prob(y)

    ll = pointwise_log_likelihood(log_lik, res.samples)
    return y, res, ll


class TestPointwise:
    def test_shape(self, fitted):
        _, res, ll = fitted
        assert ll.shape == (4, 500, N_OBS)
        assert np.isfinite(ll).all()


class TestWAICAndLOO:
    def test_waic_loo_agree_when_well_specified(self, fitted):
        _, _, ll = fitted
        w = waic(ll)
        l = psis_loo(ll)
        # WAIC and PSIS-LOO estimate the same elpd; on a healthy 2-param
        # model with 2000 draws they agree to well within one SE.
        assert abs(w["elpd_waic"] - l["elpd_loo"]) < 0.5 * w["se"] + 1.0
        assert w["waic"] == pytest.approx(-2 * w["elpd_waic"])

    def test_effective_parameters_near_two(self, fitted):
        _, _, ll = fitted
        # the model has exactly 2 parameters; p_waic/p_loo should be ~2
        assert 1.0 < waic(ll)["p_waic"] < 4.0
        assert 1.0 < psis_loo(ll)["p_loo"] < 4.0

    def test_pareto_k_healthy(self, fitted):
        _, _, ll = fitted
        ks = psis_loo(ll)["pareto_k"]
        assert ks.shape == (N_OBS,)
        # well-specified model, no high-leverage points: k < 0.7 everywhere
        assert (ks < 0.7).mean() > 0.95

    def test_elpd_magnitude_sane(self, fitted):
        y, _, ll = fitted
        # elpd per obs for a N(2,1) predictive evaluated at N(2,1) data is
        # about -E[log N] ~ -1.42; allow a broad band
        per_obs = waic(ll)["elpd_waic"] / N_OBS
        assert -2.0 < per_obs < -1.0


class TestCompare:
    def test_ranks_true_model_first(self, fitted):
        y, res, ll_true = fitted

        # deliberately mis-specified: likelihood centered at a fixed wrong
        # mean, same posterior draws for sigma
        def log_lik_bad(params):
            return Normal(params["mu"] - 3.0, params["sigma"]).log_prob(y)

        ll_bad = pointwise_log_likelihood(log_lik_bad, res.samples)
        for method in ("loo", "waic"):
            table = compare({"true": ll_true, "shifted": ll_bad}, method=method)
            assert table["true"]["rank"] == 0
            assert table["shifted"]["rank"] == 1
            assert table["true"]["elpd_diff"] == 0.0
            # the gap is many SEs wide
            assert (
                table["shifted"]["elpd_diff"]
                > 3 * table["shifted"]["diff_se"]
            )
