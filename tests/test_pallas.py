"""Fused GLM kernel tests (interpret mode on CPU; the compiled path is
exercised by bench.py on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu.ops.pallas.glm import (
    _reference_value_and_grad,
    fused_logistic_value_and_grad,
    make_fused_logistic_vag,
)


@pytest.fixture(scope="module")
def problem():
    key = jax.random.PRNGKey(0)
    kx, ky, kz = jax.random.split(key, 3)
    n, d, c = 300, 17, 5  # deliberately unaligned shapes
    X = jax.random.normal(kx, (n, d), jnp.float32)
    y = jax.random.bernoulli(ky, 0.4, (n,)).astype(jnp.float32)
    Z = 0.3 * jax.random.normal(kz, (c, d), jnp.float32)
    return X, y, Z


class TestFusedKernel:
    def test_matches_xla_value_and_grad(self, problem):
        X, y, Z = problem
        ll_ref, g_ref = _reference_value_and_grad(X, y, Z)
        ll, g = fused_logistic_value_and_grad(X, y, Z, tile_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-5
        )

    def test_padding_constant_correction(self, problem):
        # n not a multiple of tile_n: zero-row padding must not shift ll.
        X, y, Z = problem
        ll_a, _ = fused_logistic_value_and_grad(X, y, Z, tile_n=256, interpret=True)
        ll_b, _ = fused_logistic_value_and_grad(X, y, Z, tile_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(ll_a), np.asarray(ll_b), rtol=1e-5)

    def test_single_row_batch(self, problem):
        X, y, Z = problem
        ll, g = fused_logistic_value_and_grad(X, y, Z[:1], tile_n=128, interpret=True)
        assert ll.shape == (1,) and g.shape == (1, X.shape[1])


class TestVagWrapper:
    def test_scalar_and_vmap_paths_agree(self, problem):
        X, y, Z = problem
        vag = make_fused_logistic_vag(X, y, prior_scale=2.0, use_pallas=False)
        ll_s, g_s = vag(Z[0])
        ll_b, g_b = jax.vmap(vag)(Z)
        np.testing.assert_allclose(float(ll_s), float(ll_b[0]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_b[0]), rtol=1e-5, atol=1e-6
        )

    def test_matches_model_logprob(self, problem):
        # The fused posterior must equal the model's log_prob + grad.
        X, y, Z = problem
        from mlx_mcmc_tpu.distributions import Normal

        def log_prob(z):
            s = X @ z
            return jnp.sum(y * s - jax.nn.softplus(s)) + jnp.sum(
                Normal(0.0, 2.0).log_prob(z)
            )

        vag = make_fused_logistic_vag(X, y, prior_scale=2.0, use_pallas=False)
        ll, g = vag(Z[0])
        ll_ref, g_ref = jax.value_and_grad(log_prob)(Z[0])
        np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4)

    def test_sampler_integration(self, problem):
        # End to end: NUTS with the fused vag (reference path) recovers the
        # same posterior as plain XLA autodiff.
        X, y, Z = problem
        from mlx_mcmc_tpu import sample
        from mlx_mcmc_tpu.distributions import Normal

        def log_prob(params):
            z = params["beta"]
            s = X @ z
            return jnp.sum(y * s - jax.nn.softplus(s)) + jnp.sum(
                Normal(0.0, 1.0).log_prob(z)
            )

        vag = make_fused_logistic_vag(X, y, prior_scale=1.0, use_pallas=False)
        kwargs = dict(num_samples=300, num_warmup=300, num_chains=2, seed=0)
        res_fused = sample(
            log_prob,
            {"beta": jnp.zeros(X.shape[1])},
            kernel="nuts",
            value_and_grad_fn=vag,
            **kwargs,
        )
        res_plain = sample(
            log_prob, {"beta": jnp.zeros(X.shape[1])}, kernel="nuts", **kwargs
        )
        a = np.asarray(res_fused.samples["beta"]).reshape(-1, X.shape[1])
        b = np.asarray(res_plain.samples["beta"]).reshape(-1, X.shape[1])
        # identical up to float reassociation inside the fused contraction
        np.testing.assert_allclose(a.mean(axis=0), b.mean(axis=0), atol=0.08)


class TestDataAwarePath:
    def test_data_arg_matches_closure(self, problem):
        X, y, Z = problem
        from mlx_mcmc_tpu.ops.pallas.glm import prepare_fused_logistic_data

        vag_c = make_fused_logistic_vag(X, y, prior_scale=1.5, use_pallas=False)
        vag_d = make_fused_logistic_vag(
            prior_scale=1.5, use_pallas=False, data_aware=True
        )
        data = prepare_fused_logistic_data(X, y, tile_n=128)
        ll_c, g_c = vag_c(Z[0])
        ll_d, g_d = vag_d(Z[0], data)
        np.testing.assert_allclose(float(ll_c), float(ll_d), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d), rtol=1e-4)
        # batched rule
        ll_b, g_b = jax.vmap(lambda z: vag_d(z, data))(Z)
        np.testing.assert_allclose(float(ll_b[0]), float(ll_d), rtol=1e-5)

    def test_sample_with_data_argument(self, problem):
        X, y, Z = problem
        from mlx_mcmc_tpu import sample
        from mlx_mcmc_tpu.distributions import Normal

        def log_prob(params, data):
            s = data["X"] @ params["beta"]
            return jnp.sum(data["y"] * s - jax.nn.softplus(s)) + jnp.sum(
                Normal(0.0, 1.0).log_prob(params["beta"])
            )

        res = sample(
            log_prob,
            {"beta": jnp.zeros(X.shape[1])},
            data={"X": X, "y": y},
            num_samples=200,
            num_warmup=200,
            num_chains=2,
            kernel="nuts",
            seed=0,
        )
        draws = np.asarray(res.samples["beta"])
        assert draws.shape == (2, 200, X.shape[1])
        assert np.isfinite(draws).all()


class TestInt8Path:
    def test_int8_quantized_matches_dequantized_reference(self, problem):
        X, y, Z = problem
        from mlx_mcmc_tpu.ops.pallas.glm import prepare_fused_logistic_data

        data = prepare_fused_logistic_data(X, y, tile_n=128, quantize="int8")
        assert data["Xp"].dtype == jnp.int8
        vag = make_fused_logistic_vag(
            prior_scale=1.0, use_pallas=False, data_aware=True
        )
        ll_q, g_q = vag(Z[0], data)

        # Ground truth: exact f32 computation on the dequantized matrix.
        Xdq = data["Xp"][: X.shape[0], : X.shape[1]].astype(jnp.float32) * data[
            "col_scale"
        ]
        ll_ref, g_ref = _reference_value_and_grad(Xdq, y, Z[:1])
        prior = -0.5 * jnp.sum(Z[0] ** 2) - 0.5 * X.shape[1] * jnp.log(
            2 * jnp.pi
        )
        np.testing.assert_allclose(
            float(ll_q), float(ll_ref[0] + prior), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_q), np.asarray(g_ref[0] - Z[0]), rtol=1e-4, atol=1e-5
        )

    def test_int8_close_to_f32_model(self, problem):
        # Quantization is a model-level rounding: posterior quantities move
        # by O(1/127) relative, not more.
        X, y, Z = problem
        from mlx_mcmc_tpu.ops.pallas.glm import prepare_fused_logistic_data

        d8 = prepare_fused_logistic_data(X, y, tile_n=128, quantize="int8")
        d32 = prepare_fused_logistic_data(X, y, tile_n=128)
        vag = make_fused_logistic_vag(
            prior_scale=1.0, use_pallas=False, data_aware=True
        )
        ll8, g8 = vag(Z[0], d8)
        ll32, g32 = vag(Z[0], d32)
        assert abs(float(ll8) - float(ll32)) / abs(float(ll32)) < 0.02
        denom = np.linalg.norm(np.asarray(g32))
        assert np.linalg.norm(np.asarray(g8) - np.asarray(g32)) / denom < 0.05

    def test_unknown_quantize_mode(self, problem):
        X, y, _ = problem
        from mlx_mcmc_tpu.ops.pallas.glm import prepare_fused_logistic_data

        with pytest.raises(ValueError, match="quantize"):
            prepare_fused_logistic_data(X, y, quantize="fp4")


class TestLinearKernel:
    def test_matches_analytic_value_and_grad(self):
        from mlx_mcmc_tpu.ops.pallas.glm import (
            make_fused_linear_vag,
            prepare_fused_linear_data,
        )
        from mlx_mcmc_tpu.distributions import Normal

        key = jax.random.PRNGKey(3)
        kx, ky, kz = jax.random.split(key, 3)
        n, d = 257, 19
        X = jax.random.normal(kx, (n, d), jnp.float32)
        beta_true = jax.random.normal(kz, (d,))
        y = X @ beta_true + 0.5 * jax.random.normal(ky, (n,))
        z = 0.2 * jax.random.normal(kz, (d,))

        def log_prob(z):
            return jnp.sum(Normal(X @ z, 0.5).log_prob(y)) + jnp.sum(
                Normal(0.0, 2.0).log_prob(z)
            )

        vag = make_fused_linear_vag(prior_scale=2.0, use_pallas=False)
        data = prepare_fused_linear_data(X, y, noise_scale=0.5, tile_n=128)
        ll, g = vag(z, data)
        ll_ref, g_ref = jax.value_and_grad(log_prob)(z)
        np.testing.assert_allclose(float(ll), float(ll_ref), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3)

    def test_sampler_recovers_analytic_posterior(self):
        from mlx_mcmc_tpu.ops.pallas.glm import (
            make_fused_linear_vag,
            prepare_fused_linear_data,
        )
        from mlx_mcmc_tpu import sample
        from mlx_mcmc_tpu.distributions import Normal

        key = jax.random.PRNGKey(4)
        kx, ky, kz = jax.random.split(key, 3)
        n, d = 400, 8
        X = jax.random.normal(kx, (n, d), jnp.float32)
        beta_true = jax.random.normal(kz, (d,))
        y = X @ beta_true + jax.random.normal(ky, (n,))

        vag = make_fused_linear_vag(prior_scale=1.0, use_pallas=False)
        data = prepare_fused_linear_data(X, y, tile_n=128)

        def log_prob(params, data):
            dd = data["dim"].shape[0]
            mu = data["Xp"][:, :dd] @ params["beta"]
            r = data["yp"][:, 0] - mu
            return (-0.5 * jnp.sum(r * r) + data["ll_norm"]
                    + jnp.sum(Normal(0.0, 1.0).log_prob(params["beta"])))

        res = sample(log_prob, {"beta": jnp.zeros(d)}, data=data,
                     value_and_grad_fn=vag, num_samples=1500, num_warmup=500,
                     num_chains=2, kernel="nuts", seed=0)
        draws = np.asarray(res.samples["beta"]).reshape(-1, d)
        Xn, yn = np.asarray(X, np.float64), np.asarray(y, np.float64)
        cov = np.linalg.inv(Xn.T @ Xn + np.eye(d))
        mean = cov @ (Xn.T @ yn)
        np.testing.assert_allclose(draws.mean(axis=0), mean, atol=0.06)

    def test_quantize_rejected(self):
        from mlx_mcmc_tpu.ops.pallas.glm import prepare_fused_linear_data

        with pytest.raises(ValueError, match="bf16"):
            prepare_fused_linear_data(
                jnp.zeros((8, 4)), jnp.zeros(8), quantize="int8"
            )


    def test_linear_kernel_interpret_matches_reference(self):
        # Execute the actual Pallas body (interpret mode) vs plain jnp.
        from mlx_mcmc_tpu.ops.pallas.glm import fused_linear_value_and_grad

        key = jax.random.PRNGKey(7)
        kx, ky, kz = jax.random.split(key, 3)
        n, d, c = 300, 17, 5
        X = jax.random.normal(kx, (n, d), jnp.float32)
        y = X @ jax.random.normal(kz, (d,)) + jax.random.normal(ky, (n,))
        Z = 0.3 * jax.random.normal(kz, (c, d))
        ll, g = fused_linear_value_and_grad(X, y, Z, tile_n=128, interpret=True)
        s = Z @ X.T
        r = y[None] - s
        ll_ref = -0.5 * jnp.sum(r * r, axis=-1)
        g_ref = r @ X
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-4
        )

    def test_tile_mismatch_raises(self):
        # prepare with tile 128, then force a call at tile 1024: must raise,
        # not silently drop rows (regression test for the review finding).
        from mlx_mcmc_tpu.ops.pallas.glm import (
            _fused_padded_call,
            prepare_fused_linear_data,
        )

        data = prepare_fused_linear_data(
            jnp.zeros((257, 8)), jnp.zeros(257), tile_n=128
        )
        assert data["tile"].shape[0] == 128
        with pytest.raises(ValueError, match="tile"):
            _fused_padded_call(
                data["Xp"], data["yp"], jnp.zeros((128, 128)), 1024, True
            )
