"""Posterior predictive sampling tests."""

import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import Normal, sample, sample_posterior_predictive


def test_posterior_predictive_shapes_and_moments():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(4.0, 1.0, size=100).astype(np.float32))

    def log_prob(params):
        return Normal(0.0, 10.0).log_prob(params["mu"]) + jnp.sum(
            Normal(params["mu"], 1.0).log_prob(y)
        )

    res = sample(
        log_prob, {"mu": 0.0}, num_samples=300, num_warmup=300,
        num_chains=4, kernel="nuts", seed=0, max_tree_depth=6,
    )
    pp = sample_posterior_predictive(
        lambda key, p: Normal(p["mu"], 1.0).sample(key, (20,)),
        res.samples,
        seed=1,
    )
    assert pp.shape == (4, 300, 20)
    draws = np.asarray(pp).ravel()
    # predictive mean ~ posterior mean of mu ~ data mean; predictive std ~ 1
    assert abs(draws.mean() - float(y.mean())) < 0.15
    assert abs(draws.std() - 1.0) < 0.1


def test_posterior_predictive_deterministic_and_data_arg():
    samples = {"mu": jnp.ones((2, 5))}

    def pred(key, p, data):
        return Normal(p["mu"], data["s"]).sample(key, (3,))

    d = {"s": jnp.asarray(0.5)}
    a = sample_posterior_predictive(pred, samples, seed=0, data=d)
    b = sample_posterior_predictive(pred, samples, seed=0, data=d)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 5, 3)
