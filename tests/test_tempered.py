"""Parallel-tempering tests: bimodal mode recovery (the capability PT
exists for), swap-move correctness (invariance on a unimodal target, symmetric
pair decisions), ladder validation, determinism, and kernel coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import Normal, sample, sample_tempered
from mlx_mcmc_tpu.inference.tempered import _swap_sources, geometric_ladder


def _bimodal(params):
    # Equal mixture of N(-4, 1) and N(4, 1): HMC/NUTS cannot cross between
    # modes (the density barrier at 0 is ~e^-8 deep); PT must.
    x = params["x"]
    la = Normal(-4.0, 1.0).log_prob(x)
    lb = Normal(4.0, 1.0).log_prob(x)
    return jnp.sum(
        jax.scipy.special.logsumexp(jnp.stack([la, lb]), axis=0) - jnp.log(2.0)
    )


def _std_normal(params):
    return jnp.sum(Normal(0.0, 1.0).log_prob(params["x"]))


class TestLadder:
    def test_geometric_ladder(self):
        b = np.asarray(geometric_ladder(5, beta_min=0.0625))
        np.testing.assert_allclose(b, [1.0, 0.5, 0.25, 0.125, 0.0625], rtol=1e-6)

    def test_bad_ladders_rejected(self):
        for bad in ([0.5, 0.25], [1.0, 0.5, 0.7], [1.0, 0.5, -0.1]):
            with pytest.raises(ValueError, match="betas"):
                sample_tempered(
                    _std_normal, {"x": 0.0}, betas=bad, num_samples=10,
                    num_warmup=10,
                )

    def test_chees_rejected(self):
        with pytest.raises(ValueError, match="chees"):
            sample_tempered(
                _std_normal, {"x": 0.0}, kernel="chees", num_samples=10,
                num_warmup=10,
            )


class TestSwapMove:
    def test_pair_decisions_symmetric(self):
        # Both members of a pair must compute the same src assignment.
        key = jax.random.PRNGKey(3)
        betas = geometric_ladder(6, 0.1)
        lp = jnp.asarray([-1.0, -5.0, -2.0, -9.0, -3.0, -0.5])
        for parity in (0, 1):
            src, _ = _swap_sources(key, betas, lp, jnp.asarray(parity))
            src = np.asarray(src)
            # src must be an involution: swapping i->j implies j->i.
            np.testing.assert_array_equal(src[src], np.arange(6))

    def test_swaps_preserve_unimodal_posterior(self):
        # PT on a target where it is unnecessary must still be exact.
        res = sample_tempered(
            _std_normal,
            {"x": jnp.zeros(3)},
            num_samples=3000,
            num_warmup=1000,
            num_chains=4,
            num_replicas=4,
            kernel="hmc",
            seed=0,
        )
        xs = np.asarray(res.samples["x"]).reshape(-1, 3)
        assert np.all(np.abs(xs.mean(axis=0)) < 0.1)
        assert np.all(np.abs(xs.std(axis=0) - 1.0) < 0.1)
        # Neighboring tempered densities overlap heavily here: swaps frequent.
        assert (res.swap_acceptance > 0.5).all()


def _hard_bimodal(params):
    # Modes at +-6 with scale 0.5: a ~72-nat barrier no untempered gradient
    # chain can cross, even with an adapted (wide) mass matrix.
    x = params["x"]
    la = Normal(-6.0, 0.5).log_prob(x)
    lb = Normal(6.0, 0.5).log_prob(x)
    return jnp.sum(
        jax.scipy.special.logsumexp(jnp.stack([la, lb]), axis=0) - jnp.log(2.0)
    )


class TestBimodal:
    def test_plain_hmc_stuck_pt_mixes(self):
        # Control: chains started in the left mode stay there under HMC.
        plain = sample(
            _hard_bimodal,
            {"x": -6.0 * jnp.ones(1)},
            num_samples=1500,
            num_warmup=500,
            num_chains=4,
            kernel="hmc",
            seed=1,
        )
        xs_plain = np.asarray(plain.samples["x"]).ravel()
        assert (xs_plain > 0).mean() < 0.02  # never crosses

        pt = sample_tempered(
            _hard_bimodal,
            {"x": -6.0 * jnp.ones(1)},
            num_samples=1500,
            num_warmup=1000,
            num_chains=4,
            num_replicas=10,
            beta_min=0.005,
            kernel="hmc",
            seed=1,
        )
        xs = np.asarray(pt.samples["x"]).ravel()
        right = (xs > 0).mean()
        assert 0.3 < right < 0.7  # both modes, near-equal weights
        assert abs(np.abs(xs).mean() - 6.0) < 0.3
        assert pt.divergences == 0

    def test_mala_and_nuts_kernels(self):
        for kernel in ("mala", "nuts"):
            pt = sample_tempered(
                _bimodal,
                {"x": -4.0 * jnp.ones(1)},
                num_samples=1200,
                num_warmup=800,
                num_chains=2,
                num_replicas=8,
                beta_min=0.02,
                kernel=kernel,
                seed=2,
                **({"max_tree_depth": 6} if kernel == "nuts" else {}),
            )
            xs = np.asarray(pt.samples["x"]).ravel()
            assert 0.2 < (xs > 0).mean() < 0.8, kernel

    def test_metropolis_kernel_runs(self):
        pt = sample_tempered(
            _std_normal,
            {"x": jnp.zeros(2)},
            num_samples=300,
            num_warmup=300,
            num_chains=2,
            num_replicas=4,
            kernel="metropolis",
            seed=3,
        )
        xs = np.asarray(pt.samples["x"])
        assert np.isfinite(xs).all()
        assert abs(xs.mean()) < 0.3


class TestAPI:
    def test_fixed_seed_reproducible(self):
        kw = dict(
            num_samples=150, num_warmup=100, num_chains=2, num_replicas=4,
            kernel="hmc", seed=5,
        )
        a = sample_tempered(_bimodal, {"x": jnp.zeros(1)}, **kw)
        b = sample_tempered(_bimodal, {"x": jnp.zeros(1)}, **kw)
        np.testing.assert_array_equal(
            np.asarray(a.samples["x"]), np.asarray(b.samples["x"])
        )

    def test_result_fields(self):
        res = sample_tempered(
            _std_normal, {"x": jnp.zeros(2)}, num_samples=100, num_warmup=100,
            num_chains=2, num_replicas=4, kernel="hmc", seed=6,
        )
        assert res.betas.shape == (4,) and res.betas[0] == 1.0
        assert res.swap_acceptance.shape == (3,)
        assert res.replica_step_sizes.shape == (4,)
        assert (res.swap_acceptance >= 0).all() and (res.swap_acceptance <= 1).all()
        # (no monotone step-size claim: mass adaptation absorbs the 1/beta
        # variance scale, so rung step sizes can legitimately stay flat)
        assert np.isfinite(res.replica_step_sizes).all()
        assert (res.replica_step_sizes > 0).all()
        assert res.samples["x"].shape == (2, 100, 2)
        d = res.diagnostics()
        assert d["x"]["r_hat"] < 1.1

    def test_transforms_path(self):
        from mlx_mcmc_tpu import HalfNormal

        def log_prob(params):
            return jnp.sum(HalfNormal(2.0).log_prob(params["s"]))

        res = sample_tempered(
            log_prob, {"s": jnp.ones(2)}, num_samples=800, num_warmup=500,
            num_chains=2, num_replicas=4, kernel="hmc", seed=7,
            transforms={"s": "log"},
        )
        ss = np.asarray(res.samples["s"])
        assert (ss > 0).all()
        assert abs(ss.mean() - 1.5958) < 0.2
