"""Sufficient-statistic collapse of the hierarchical-normal likelihood
(ops/suffstats.py): the analytic value+grad must equal autodiff through the
full-data model, and sampling through it must recover the same posterior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu.models import (
    make_hierarchical_normal,
    make_poisson_event_rates,
)
from mlx_mcmc_tpu.ops.ravel import make_flat_logprob
from mlx_mcmc_tpu.ops.suffstats import (
    hier_suffstat_log_prob,
    make_hier_normal_model,
    make_hier_normal_vag,
    make_poisson_rates_model,
    prepare_hier_normal_data,
    prepare_poisson_rates_data,
)


@pytest.fixture(scope="module")
def spec():
    return make_hierarchical_normal(num_groups=12, obs_per_group=20, seed=3)


class TestSuffstatVag:
    def test_matches_autodiff_through_full_data(self, spec):
        data = prepare_hier_normal_data(spec.y)
        vag = make_hier_normal_vag()

        flat_lp, z0, _ = make_flat_logprob(
            lambda p: spec.log_prob(p), spec.initial_params
        )
        oracle = jax.vmap(jax.value_and_grad(flat_lp))

        rng = np.random.default_rng(0)
        Z = jnp.asarray(
            rng.normal(scale=0.7, size=(16, z0.shape[0])).astype(np.float32)
        )
        ll, g = jax.vmap(lambda z: vag(z, data))(Z)
        ll_ref, g_ref = oracle(Z)
        # identical math up to float reassociation; the centered quadratic
        # keeps every term O(posterior scale), so tolerances are tight even
        # though the full-data sum has 240 terms
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-3
        )

    def test_value_twin_matches(self, spec):
        data = prepare_hier_normal_data(spec.y)
        vag = make_hier_normal_vag()
        flat_lp, z0, unravel = make_flat_logprob(
            lambda p, d: hier_suffstat_log_prob(p, d),
            spec.initial_params,
            data_aware=True,
        )
        z = z0 + 0.3
        ll, _ = vag(z, data)
        np.testing.assert_allclose(
            float(ll), float(flat_lp(z, data)), rtol=1e-5
        )

    def test_unbatched_call_consistent(self, spec):
        data = prepare_hier_normal_data(spec.y)
        vag = make_hier_normal_vag()
        rng = np.random.default_rng(1)
        z = jnp.asarray(rng.normal(size=12 + 2).astype(np.float32) * 0.5)
        ll1, g1 = vag(z, data)
        ll2, g2 = jax.vmap(lambda zz: vag(zz, data))(z[None])
        np.testing.assert_allclose(float(ll1), float(ll2[0]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2[0]), rtol=1e-6
        )

    def test_vmap_rule_rejects_batched_data(self, spec):
        # The custom_vmap rule only supports the engine's pattern (batched z,
        # replicated data); batched data must fail loudly, not silently
        # compute shard-0 values (ADVICE r4).
        data = prepare_hier_normal_data(spec.y)
        vag = make_hier_normal_vag()
        rng = np.random.default_rng(2)
        Z = jnp.asarray(rng.normal(size=(4, 14)).astype(np.float32))
        batched_data = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (4,) + jnp.shape(x)), data
        )
        with pytest.raises(NotImplementedError, match="replicated data"):
            jax.vmap(vag)(Z, batched_data)

    def test_model_factory_halves_agree(self, spec):
        # make_hier_normal_model binds log_prob and vag to the same scales;
        # with non-default scales the two halves must still agree.
        data = prepare_hier_normal_data(spec.y)
        log_prob, vag = make_hier_normal_model(
            prior_mu_scale=2.0, prior_log_tau_scale=0.5
        )
        flat_lp, z0, _ = make_flat_logprob(
            log_prob, spec.initial_params, data_aware=True
        )
        z = z0 + 0.25
        ll, _ = vag(z, data)
        np.testing.assert_allclose(float(ll), float(flat_lp(z, data)), rtol=1e-5)

    def test_sampling_through_suffstats_matches_full_data(self, spec):
        from mlx_mcmc_tpu import sample

        data = prepare_hier_normal_data(spec.y)
        res = sample(
            hier_suffstat_log_prob,
            spec.initial_params,
            data=data,
            value_and_grad_fn=make_hier_normal_vag(),
            num_warmup=300,
            num_samples=300,
            num_chains=8,
            kernel="nuts",
            max_tree_depth=6,
            seed=0,
        )
        full = sample(
            lambda p: spec.log_prob(p),
            spec.initial_params,
            num_warmup=300,
            num_samples=300,
            num_chains=8,
            kernel="nuts",
            max_tree_depth=6,
            seed=1,
        )
        assert res.divergences == 0
        mu_a = float(np.mean(np.asarray(res.samples["mu"])))
        mu_b = float(np.mean(np.asarray(full.samples["mu"])))
        assert abs(mu_a - mu_b) < 0.1
        tau_a = float(np.mean(np.exp(np.asarray(res.samples["log_tau"]))))
        tau_b = float(np.mean(np.exp(np.asarray(full.samples["log_tau"]))))
        assert abs(tau_a - tau_b) < 0.1


class TestPoissonSuffstats:
    """Exact Poisson event-rate collapse (ops/suffstats.py
    make_poisson_rates_model) vs autodiff through the full-data model
    (models/poisson.py, the reference's examples/04 scenario at scale)."""

    @pytest.fixture(scope="class")
    def pspec(self):
        return make_poisson_event_rates(
            num_groups=12, obs_per_group=20, seed=7
        )

    def test_matches_autodiff_through_full_data(self, pspec):
        data = prepare_poisson_rates_data(pspec.y)
        _, vag = make_poisson_rates_model()
        flat_lp, z0, _ = make_flat_logprob(
            lambda p: pspec.log_prob(p), pspec.initial_params
        )
        oracle = jax.vmap(jax.value_and_grad(flat_lp))
        rng = np.random.default_rng(0)
        Z = jnp.asarray(
            rng.normal(scale=0.4, size=(16, z0.shape[0])).astype(np.float32)
        )
        ll, g = jax.vmap(lambda z: vag(z, data))(Z)
        ll_ref, g_ref = oracle(Z)
        np.testing.assert_allclose(
            np.asarray(ll), np.asarray(ll_ref), rtol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-3
        )

    def test_value_twin_matches(self, pspec):
        data = prepare_poisson_rates_data(pspec.y)
        log_prob, vag = make_poisson_rates_model()
        flat_lp, z0, _ = make_flat_logprob(
            log_prob, pspec.initial_params, data_aware=True
        )
        z = z0 + 0.2
        ll, _ = vag(z, data)
        np.testing.assert_allclose(
            float(ll), float(flat_lp(z, data)), rtol=1e-5
        )

    def test_sampling_recovers_truth(self, pspec):
        from mlx_mcmc_tpu import sample

        data = prepare_poisson_rates_data(pspec.y)
        log_prob, vag = make_poisson_rates_model()
        res = sample(
            log_prob,
            pspec.initial_params,
            data=data,
            value_and_grad_fn=vag,
            num_warmup=300,
            num_samples=300,
            num_chains=8,
            kernel="nuts",
            max_tree_depth=6,
            seed=0,
        )
        # exp-link curvature: a sub-1% divergence rate at target_accept=0.65
        # is expected (the posterior is unaffected; tighten with
        # target_accept=0.9 in production runs).
        assert res.divergences <= 0.01 * 8 * 300
        mu_hat = float(np.mean(np.asarray(res.samples["mu"])))
        assert abs(mu_hat - pspec.truth["mu"]) < 0.4

    def test_covariate_model_grad_finite_and_samples(self):
        # The covariate variant has no collapse; check the full-data
        # log_prob is autodiff-clean and NUTS recovers beta.
        from mlx_mcmc_tpu import sample

        spec = make_poisson_event_rates(
            num_groups=16, obs_per_group=25, covariate_dim=2, seed=3
        )
        flat_lp, z0, _ = make_flat_logprob(spec.log_prob, spec.initial_params)
        val, grad = jax.value_and_grad(flat_lp)(z0)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(grad)))
        res = sample(
            spec.log_prob,
            spec.initial_params,
            num_warmup=300,
            num_samples=300,
            num_chains=8,
            kernel="nuts",
            max_tree_depth=6,
            seed=0,
        )
        beta_hat = np.mean(np.asarray(res.samples["beta"]), axis=(0, 1))
        np.testing.assert_allclose(
            beta_hat, np.asarray(spec.truth["beta"]), atol=0.25
        )
