"""Fused hierarchical-Poisson-regression kernel tests (interpret mode on
CPU; the compiled path is exercised by benchmarks/poisson_roofline.py on
real TPU hardware). Oracle: autodiff through the full-data model
(models/poisson.py, covariate_dim>0 — the non-collapsible Large-model row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu.models import make_poisson_event_rates
from mlx_mcmc_tpu.ops.pallas.poisson import (
    ROWS_PER_GROUP,
    _poisson_padded_call,
    make_fused_poisson_model,
    make_fused_poisson_vag,
    prepare_fused_poisson_data,
)
from mlx_mcmc_tpu.ops.ravel import make_flat_logprob


@pytest.fixture(scope="module")
def pspec():
    return make_poisson_event_rates(
        num_groups=12, obs_per_group=20, covariate_dim=2, seed=3
    )


@pytest.fixture(scope="module")
def pdata(pspec):
    return prepare_fused_poisson_data(pspec.y, pspec.X)


class TestFusedPoissonVag:
    def test_fallback_matches_autodiff(self, pspec, pdata):
        vag = make_fused_poisson_vag(use_pallas=False)
        flat_lp, z0, _ = make_flat_logprob(
            lambda p: pspec.log_prob(p), pspec.initial_params
        )
        oracle = jax.vmap(jax.value_and_grad(flat_lp))
        rng = np.random.default_rng(0)
        Z = jnp.asarray(
            rng.normal(scale=0.3, size=(8, z0.shape[0])).astype(np.float32)
        )
        ll, g = jax.vmap(lambda z: vag(z, pdata))(Z)
        ll_ref, g_ref = oracle(Z)
        np.testing.assert_allclose(
            np.asarray(ll), np.asarray(ll_ref), rtol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-3
        )

    def test_kernel_body_matches_fallback(self, pspec, pdata):
        # Execute the actual Pallas body in interpret mode on the padded
        # augmented operands and compare against dense jnp math.
        from mlx_mcmc_tpu.ops.pallas.poisson import (
            _GROUPS_PER_TILE,
            _assemble_ba,
            _round_up,
        )

        rng = np.random.default_rng(1)
        G, K = 12, 2
        C = 4
        n_pad, a_pad = pdata["Xa"].shape
        g_pad = n_pad // ROWS_PER_GROUP
        g_per = _GROUPS_PER_TILE
        k_pad = _round_up(K, 8)
        n_tiles = g_pad // g_per
        theta = rng.normal(scale=0.5, size=(C, G)).astype(np.float32)
        beta = rng.normal(scale=0.3, size=(C, K)).astype(np.float32)
        c_pad = 128
        theta_t = jnp.zeros((g_pad, c_pad), jnp.float32).at[:G, :C].set(
            jnp.asarray(theta).T
        )
        beta_t = jnp.zeros((k_pad, c_pad), jnp.float32).at[:K, :C].set(
            jnp.asarray(beta).T
        )
        Ba = _assemble_ba(theta_t, beta_t, k_pad, g_per, a_pad, c_pad)
        ll_tiles, Ga = _poisson_padded_call(
            pdata["Xa"], pdata["ym"], Ba, True
        )
        # oracle: dense jnp math over the same padded operands
        Xf = np.asarray(pdata["Xa"], np.float32)
        y = np.asarray(pdata["ym"][:, 0])
        m = np.asarray(pdata["ym"][:, 1])
        shat = np.asarray(pdata["ym"][:, 2])
        lamhat = np.asarray(pdata["ym"][:, 3])
        th_rows = np.repeat(
            np.concatenate(
                [theta, np.zeros((C, g_pad - G), np.float32)], axis=1
            ),
            ROWS_PER_GROUP, axis=1,
        )
        s = th_rows + beta @ Xf[:, :K].T
        lam = m[None, :] * np.exp(s)
        r = y[None, :] - lam
        ll_ref = np.sum(y[None, :] * s - lam, axis=-1)
        gt_ref = r.reshape(C, g_pad, ROWS_PER_GROUP).sum(axis=-1)
        gb_ref = r @ Xf[:, :K]
        # the kernel accumulates centered partials per tile; un-center by
        # adding back the hoisted constant the prep folds into c0
        center_const = float(np.sum(y * shat - m * lamhat))
        ll_total = np.asarray(ll_tiles[:, :C]).sum(axis=0) + center_const
        np.testing.assert_allclose(ll_total, ll_ref, rtol=2e-5, atol=1e-3)
        Ga = np.asarray(Ga).reshape(n_tiles, a_pad, c_pad)
        gb = Ga[:, :K, :C].sum(axis=0).T
        gt = Ga[:, k_pad:, :].reshape(g_pad, c_pad)[:G, :C].T
        # gradient matmul runs in bf16 on the MXU (deliberate — see
        # _poisson_kernel): tolerances follow bf16 operand rounding
        np.testing.assert_allclose(gt, gt_ref[:, :G], rtol=2e-2, atol=0.5)
        np.testing.assert_allclose(gb, gb_ref, rtol=2e-2, atol=0.5)

    def test_model_factory_halves_agree(self, pspec, pdata):
        log_prob, vag = make_fused_poisson_model(
            prior_mu_scale=2.0, prior_log_tau_scale=0.5, use_pallas=False
        )
        flat_lp, z0, _ = make_flat_logprob(
            log_prob, pspec.initial_params, data_aware=True
        )
        z = z0 + 0.2
        ll, _ = vag(z, pdata)
        np.testing.assert_allclose(
            float(ll), float(flat_lp(z, pdata)), rtol=1e-5
        )

    def test_batched_data_rejected(self, pdata):
        vag = make_fused_poisson_vag(use_pallas=False)
        Z = jnp.zeros((4, 2 + 2 + 12))
        bd = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (4,) + jnp.shape(x)), pdata
        )
        with pytest.raises(NotImplementedError, match="replicated data"):
            jax.vmap(vag)(Z, bd)

    def test_sampling_recovers_beta(self, pspec, pdata):
        from mlx_mcmc_tpu import sample

        log_prob, vag = make_fused_poisson_model(use_pallas=False)
        res = sample(
            log_prob,
            pspec.initial_params,
            data=pdata,
            value_and_grad_fn=vag,
            num_warmup=300,
            num_samples=300,
            num_chains=8,
            kernel="nuts",
            max_tree_depth=6,
            target_accept=0.9,
            seed=0,
        )
        beta_hat = np.mean(np.asarray(res.samples["beta"]), axis=(0, 1))
        np.testing.assert_allclose(
            beta_hat, np.asarray(pspec.truth["beta"]), atol=0.25
        )
