"""Transform tests: bijectivity, Jacobians vs autodiff, and transformed
sampling recovering known posteriors without boundary rejections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import Gamma, HalfNormal, Normal, sample
from mlx_mcmc_tpu.distributions.transforms import (
    Exp,
    Sigmoid,
    Softplus,
    StickBreaking,
    get_transform,
    make_transformed_logprob,
)


@pytest.mark.parametrize("tf", [Exp(), Softplus(), Sigmoid()])
class TestScalarTransforms:
    def test_bijective(self, tf):
        x = jnp.linspace(-3, 3, 11)
        np.testing.assert_allclose(
            np.asarray(tf.inverse(tf.forward(x))), np.asarray(x), rtol=1e-5,
            atol=1e-5,
        )

    def test_jacobian_matches_autodiff(self, tf):
        for x0 in [-1.5, 0.0, 2.0]:
            expected = float(
                jnp.log(jnp.abs(jax.grad(lambda x: tf.forward(x))(x0)))
            )
            got = float(tf.log_det_jacobian(jnp.asarray(x0)))
            assert np.isclose(got, expected, atol=1e-5)


class TestStickBreaking:
    def test_maps_to_simplex(self):
        tf = StickBreaking()
        x = jnp.asarray([0.3, -1.2, 2.0])
        y = tf.forward(x)
        assert y.shape == (4,)
        assert np.isclose(float(y.sum()), 1.0, atol=1e-6)
        assert (np.asarray(y) > 0).all()

    def test_bijective(self):
        tf = StickBreaking()
        x = jnp.asarray([0.5, -0.7, 1.1])
        np.testing.assert_allclose(
            np.asarray(tf.inverse(tf.forward(x))), np.asarray(x), rtol=1e-4,
            atol=1e-5,
        )

    def test_jacobian_matches_autodiff(self):
        tf = StickBreaking()
        x = jnp.asarray([0.2, -0.4])
        # Jacobian of the first K-1 outputs wrt x (last output is determined).
        J = jax.jacfwd(lambda x: tf.forward(x)[:-1])(x)
        expected = float(jnp.linalg.slogdet(J)[1])
        assert np.isclose(float(tf.log_det_jacobian(x)), expected, atol=1e-5)


class TestTransformedSampling:
    def test_halfnormal_via_log_transform(self):
        # sigma sampled in log space: no rejections at the boundary.
        def log_prob(params):
            return HalfNormal(2.0).log_prob(params["sigma"])

        res = sample(
            log_prob,
            {"sigma": 1.0},
            num_samples=4000,
            num_warmup=500,
            num_chains=2,
            kernel="nuts",
            seed=0,
            transforms={"sigma": "log"},
        )
        s = np.asarray(res.samples["sigma"]).ravel()
        assert (s > 0).all()
        assert abs(s.mean() - 2.0 * np.sqrt(2 / np.pi)) < 0.1

    def test_gamma_posterior_via_transform(self):
        # Gamma(3, 2) target sampled unconstrained; matches moments.
        def log_prob(params):
            return Gamma(3.0, 2.0).log_prob(params["x"])

        res = sample(
            log_prob,
            {"x": 1.0},
            num_samples=4000,
            num_warmup=500,
            num_chains=2,
            kernel="nuts",
            seed=1,
            transforms={"x": "log"},
        )
        xs = np.asarray(res.samples["x"]).ravel()
        assert abs(xs.mean() - 1.5) < 0.1
        assert np.isclose(xs.var(), 0.75, rtol=0.2)

    def test_transformed_logprob_density_correct(self):
        # Pushforward check: with y = exp(x), density of x must equal
        # p(exp(x)) * exp(x).
        def log_prob(params):
            return Gamma(2.0, 1.0).log_prob(params["y"])

        u_lp, to_c, to_u = make_transformed_logprob(log_prob, {"y": "log"})
        x0 = 0.3
        got = float(u_lp({"y": jnp.asarray(x0)}))
        expected = float(
            Gamma(2.0, 1.0).log_prob(jnp.exp(jnp.asarray(x0))) + x0
        )
        assert np.isclose(got, expected, atol=1e-5)
        # round trip
        back = to_u(to_c({"y": jnp.asarray(x0)}))
        assert np.isclose(float(back["y"]), x0, atol=1e-5)

    def test_get_transform_names(self):
        assert isinstance(get_transform("log"), Exp)
        assert isinstance(get_transform("logit"), Sigmoid)
        with pytest.raises(KeyError):
            get_transform("nope")
