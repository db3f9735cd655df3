"""Compiled-runner cache: repeated ``sample()`` calls must reuse the traced
program (host retracing measured ~6 s/call at the flagship shape) without
changing a single bit of the results.

Reference note: the reference re-runs its full Python sampling loop every
call (mlx_mcmc/inference/mcmc.py:60-101), so it has no analogue — this is a
compiled-framework concern.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import sample
from mlx_mcmc_tpu.distributions import Normal
from mlx_mcmc_tpu.inference import api


def _model(params):
    return jnp.sum(Normal(1.0, 2.0).log_prob(params["x"]))


def _run(seed=0, **kw):
    defaults = dict(
        num_samples=50, num_warmup=50, num_chains=4, kernel="hmc", seed=seed
    )
    defaults.update(kw)
    return sample(_model, {"x": jnp.zeros((3,))}, **defaults)


@pytest.fixture(autouse=True)
def _fresh_cache():
    api.clear_runner_cache()
    yield
    api.clear_runner_cache()


def test_cache_hit_same_config():
    _run(seed=0)
    assert len(api._RUNNER_CACHE) == 1
    _run(seed=1)  # seed is a runtime arg: no new entry
    assert len(api._RUNNER_CACHE) == 1


def test_cached_run_bitwise_equals_fresh_build():
    r1 = _run(seed=3)
    r2 = _run(seed=3)  # cache hit
    api.clear_runner_cache()
    r3 = _run(seed=3)  # fresh build
    np.testing.assert_array_equal(
        np.asarray(r1.samples["x"]), np.asarray(r2.samples["x"])
    )
    np.testing.assert_array_equal(
        np.asarray(r1.samples["x"]), np.asarray(r3.samples["x"])
    )


def test_different_settings_get_distinct_entries():
    _run()
    _run(kernel="nuts", max_tree_depth=4)
    _run(num_warmup=60)
    assert len(api._RUNNER_CACHE) == 3


def test_value_changes_do_not_invalidate():
    r_zero = sample(
        _model, {"x": jnp.zeros((3,))},
        num_samples=40, num_warmup=40, num_chains=2, kernel="hmc", seed=0,
    )
    assert len(api._RUNNER_CACHE) == 1
    r_ones = sample(
        _model, {"x": jnp.ones((3,))},
        num_samples=40, num_warmup=40, num_chains=2, kernel="hmc", seed=0,
    )
    assert len(api._RUNNER_CACHE) == 1  # same structure: reused
    # different starting values must actually flow through
    assert not np.array_equal(
        np.asarray(r_zero.samples["x"][:, 0]),
        np.asarray(r_ones.samples["x"][:, 0]),
    )


def test_unhashable_kwarg_bypasses_cache():
    _run(init_inv_mass_diag=jnp.ones((3,)))
    assert len(api._RUNNER_CACHE) == 0


def test_new_chain_count_reuses_entry():
    r4 = _run(seed=5)
    r8 = _run(seed=5, num_chains=8)  # shape change: jit retraces internally
    assert len(api._RUNNER_CACHE) == 1
    assert r4.samples["x"].shape[0] == 4
    assert r8.samples["x"].shape[0] == 8


def test_transforms_cached_and_exact():
    def model(params):
        return jnp.sum(Normal(0.0, 1.0).log_prob(jnp.log(params["s"])))

    def run():
        return sample(
            model, {"s": jnp.ones(())}, transforms={"s": "log"},
            num_samples=40, num_warmup=40, num_chains=2, seed=2,
        )

    r1 = run()
    r2 = run()
    assert len(api._RUNNER_CACHE) == 1
    np.testing.assert_array_equal(
        np.asarray(r1.samples["s"]), np.asarray(r2.samples["s"])
    )
    assert np.all(np.asarray(r1.samples["s"]) > 0)  # constrained output


def test_distinct_model_objects_miss():
    def m1(params):
        return jnp.sum(Normal(0.0, 1.0).log_prob(params["x"]))

    def m2(params):
        return jnp.sum(Normal(0.0, 1.0).log_prob(params["x"]))

    sample(m1, {"x": jnp.zeros((2,))}, num_samples=30, num_warmup=30,
           num_chains=2, seed=0)
    sample(m2, {"x": jnp.zeros((2,))}, num_samples=30, num_warmup=30,
           num_chains=2, seed=0)
    assert len(api._RUNNER_CACHE) == 2


def test_sharded_cache_hit_and_bitwise_equal():
    from mlx_mcmc_tpu.parallel import sharded as sh
    from mlx_mcmc_tpu.parallel.sharded import sample_sharded

    sh.clear_sharded_runner_cache()
    kw = dict(num_samples=40, num_warmup=40, num_chains=8, kernel="hmc",
              seed=7)
    r1 = sample_sharded(_model, {"x": jnp.zeros((3,))}, **kw)
    assert len(sh._SHARDED_CACHE) == 1
    r2 = sample_sharded(_model, {"x": jnp.zeros((3,))}, **kw)
    assert len(sh._SHARDED_CACHE) == 1
    sh.clear_sharded_runner_cache()
    r3 = sample_sharded(_model, {"x": jnp.zeros((3,))}, **kw)
    np.testing.assert_array_equal(
        np.asarray(r1.samples["x"]), np.asarray(r2.samples["x"])
    )
    np.testing.assert_array_equal(
        np.asarray(r1.samples["x"]), np.asarray(r3.samples["x"])
    )
    sh.clear_sharded_runner_cache()


def test_data_is_runtime_arg():
    def model(params, data):
        return jnp.sum(Normal(params["mu"], 1.0).log_prob(data["y"]))

    y1 = jnp.asarray(np.random.default_rng(0).normal(2.0, 1.0, 64), jnp.float32)
    y2 = jnp.asarray(np.random.default_rng(1).normal(-3.0, 1.0, 64), jnp.float32)
    kw = dict(num_samples=80, num_warmup=80, num_chains=2, seed=0)
    r1 = sample(model, {"mu": jnp.zeros(())}, data={"y": y1}, **kw)
    r2 = sample(model, {"mu": jnp.zeros(())}, data={"y": y2}, **kw)
    assert len(api._RUNNER_CACHE) == 1
    assert float(np.mean(np.asarray(r1.samples["mu"]))) > 1.0
    assert float(np.mean(np.asarray(r2.samples["mu"]))) < -2.0
