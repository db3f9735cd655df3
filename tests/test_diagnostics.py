"""R-hat / ESS diagnostics tests against analytically known cases."""

import numpy as np
import pytest

from mlx_mcmc_tpu.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
    summary_stats,
)


def _ar1(rho, shape, rng):
    out = np.empty(shape)
    out[..., 0] = rng.normal(size=shape[:-1])
    innov_scale = np.sqrt(1 - rho**2)
    for t in range(1, shape[-1]):
        out[..., t] = rho * out[..., t - 1] + innov_scale * rng.normal(
            size=shape[:-1]
        )
    return out


class TestRhat:
    def test_iid_chains_near_one(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 2000))
        assert abs(potential_scale_reduction(x) - 1.0) < 0.01

    def test_shifted_chains_large(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 1000)) + np.arange(4)[:, None] * 5.0
        assert potential_scale_reduction(x) > 2.0

    def test_split_detects_trend(self):
        # A strong within-chain trend is invisible to unsplit R-hat.
        x = np.linspace(0, 1, 1000)[None, :] + np.zeros((4, 1))
        x = x + np.random.default_rng(2).normal(scale=0.01, size=x.shape)
        assert potential_scale_reduction(x, split=True) > 1.5

    def test_vectorized_params(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(4, 500, 7))
        r = potential_scale_reduction(x)
        assert r.shape == (7,)
        assert np.all(np.abs(r - 1.0) < 0.05)


class TestESS:
    def test_iid_ess_near_n(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 2000))
        ess = effective_sample_size(x)
        assert 0.75 * 8000 < ess < 1.3 * 8000

    def test_ar1_matches_theory(self):
        rho = 0.9
        rng = np.random.default_rng(1)
        x = _ar1(rho, (8, 20000), rng)
        ess = effective_sample_size(x)
        expected = 8 * 20000 * (1 - rho) / (1 + rho)  # tau = (1+rho)/(1-rho)
        assert 0.6 * expected < ess < 1.6 * expected

    def test_anticorrelated_capped(self):
        rng = np.random.default_rng(2)
        x = _ar1(-0.5, (2, 5000), rng)
        ess = effective_sample_size(x)
        # super-efficient chains allowed but capped
        assert ess > 2 * 5000

    def test_vectorized_params(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 1000, 3))
        ess = effective_sample_size(x)
        assert ess.shape == (3,)


class TestSummary:
    def test_keys_match_reference_format(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 500))
        s = summary_stats(x, credible_interval=0.95)
        # Reference facade key format (mlx_mcmc/inference/mcmc.py:213-227).
        assert list(s.keys())[:5] == ["mean", "std", "median", "2.5%", "97.5%"]
        assert "n_eff" in s and "r_hat" in s

    def test_nondefault_interval_keys(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 500))
        s = summary_stats(x, credible_interval=0.9)
        assert "5.0%" in s and "95.0%" in s


class TestNativeEngine:
    """Native _fastdiag vs numpy reference (skipped if extension unbuilt)."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from mlx_mcmc_tpu.diagnostics import stats

        if stats._fastdiag is None:
            pytest.skip("_fastdiag extension not built")

    def test_ess_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = _ar1(0.8, (4, 3000), rng)[..., None] * np.array([1.0, 2.0, 0.5])
        a = effective_sample_size(x, use_native=True)
        b = effective_sample_size(x, use_native=False)
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_rhat_matches_numpy(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 1000, 5)) + np.arange(5) * 0.1
        a = potential_scale_reduction(x, use_native=True)
        b = potential_scale_reduction(x, use_native=False)
        np.testing.assert_allclose(a, b, rtol=1e-8)

    def test_iid_scalar_param(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 5000))
        a = effective_sample_size(x, use_native=True)
        assert 0.75 * 10000 < float(a) < 1.3 * 10000

    def test_large_batch_faster_than_numpy(self):
        import time

        rng = np.random.default_rng(3)
        x = _ar1(0.5, (8, 2000), rng)[..., None] + rng.normal(
            size=(8, 2000, 200)
        ) * 0.01
        t0 = time.time()
        a = effective_sample_size(x, use_native=True)
        t_native = time.time() - t0
        t0 = time.time()
        b = effective_sample_size(x, use_native=False)
        t_numpy = time.time() - t0
        np.testing.assert_allclose(a, b, rtol=1e-5)
        # informational speed check; assert only that native is not absurd
        assert t_native < max(4 * t_numpy, 5.0)


class TestDeviceDiagnostics:
    """Traced jnp rhat/ess must match the numpy reference, locally and when
    pooled with collectives across a sharded chain axis."""

    def test_matches_numpy_local(self):
        import jax.numpy as jnp
        from mlx_mcmc_tpu.diagnostics import device_ess, device_rhat

        rng = np.random.default_rng(0)
        x = _ar1(0.7, (4, 1000), rng)[..., None] * np.array([1.0, 2.0])
        a_r = np.asarray(device_rhat(jnp.asarray(x)))
        b_r = potential_scale_reduction(x, use_native=False)
        np.testing.assert_allclose(a_r, b_r, rtol=1e-4)
        a_e = np.asarray(device_ess(jnp.asarray(x)))
        b_e = effective_sample_size(x, use_native=False)
        np.testing.assert_allclose(a_e, b_e, rtol=1e-3)

    def test_sharded_matches_gathered(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        from mlx_mcmc_tpu.diagnostics import device_ess, device_rhat
        from mlx_mcmc_tpu.parallel import chain_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        rng = np.random.default_rng(1)
        x = np.asarray(_ar1(0.5, (8, 500), rng)[..., None], np.float32)

        mesh = chain_mesh()
        f = jax.shard_map(
            lambda xs: (
                device_rhat(xs, axis_name="chains")[None],
                device_ess(xs, axis_name="chains")[None],
            ),
            mesh=mesh,
            in_specs=P("chains"),
            out_specs=(P("chains"), P("chains")),
        )
        r_sh, e_sh = jax.jit(f)(jnp.asarray(x))
        r_ref = potential_scale_reduction(x.astype(np.float64), use_native=False)
        e_ref = effective_sample_size(x.astype(np.float64), use_native=False)
        np.testing.assert_allclose(np.asarray(r_sh)[0], r_ref, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(e_sh)[0], e_ref, rtol=5e-3)

    def test_sample_sharded_device_diagnostics(self):
        import jax
        import jax.numpy as jnp
        from mlx_mcmc_tpu import Normal
        from mlx_mcmc_tpu.parallel import sample_sharded

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        res = sample_sharded(
            lambda p: jnp.sum(Normal(0.0, 1.0).log_prob(p["x"])),
            {"x": jnp.zeros(3)},
            num_samples=500,
            num_warmup=300,
            num_chains=8,
            kernel="nuts",
            seed=0,
            device_diagnostics=True,
        )
        assert set(res.device_stats) == {"r_hat", "n_eff"}
        rhat = np.asarray(res.device_stats["r_hat"])
        ess = np.asarray(res.device_stats["n_eff"])
        assert rhat.shape == (3,) and ess.shape == (3,)
        assert np.all(rhat < 1.05)
        assert np.all(ess > 200)
