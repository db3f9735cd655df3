"""Warmup adaptation unit tests: dual averaging, schedule, mass matrix."""

import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import Normal, sample
from mlx_mcmc_tpu.kernels.adaptation import (
    build_schedule,
    da_init,
    da_update,
)


class TestDualAveraging:
    def test_converges_to_balanced_step(self):
        # Synthetic feedback: accept_prob = sigmoid around log_step, target 0.8.
        state = da_init(1.0)
        for _ in range(200):
            accept = 1.0 / (1.0 + np.exp(float(state.log_step)))  # decreasing in eps
            state = da_update(state, jnp.asarray(accept), 0.8)
        final_accept = 1.0 / (1.0 + np.exp(float(state.log_step_avg)))
        assert abs(final_accept - 0.8) < 0.05

    def test_low_acceptance_shrinks_step(self):
        state = da_init(1.0)
        for _ in range(50):
            state = da_update(state, jnp.asarray(0.0), 0.8)
        assert float(state.log_step) < 0.0

    def test_high_acceptance_grows_step(self):
        state = da_init(0.1)
        for _ in range(50):
            state = da_update(state, jnp.asarray(1.0), 0.8)
        assert float(state.log_step) > np.log(0.1)


class TestSchedule:
    def test_standard_1000_warmup(self):
        s = build_schedule(1000)
        # Stan default: fast 75, slow 25+50+100+...(doubling)..., fast 50.
        assert not s.in_slow_window[:75].any()
        assert not s.in_slow_window[-50:].any()
        assert s.in_slow_window[75:950].all()
        ends = np.flatnonzero(s.window_end)
        assert ends[0] == 75 + 25 - 1
        assert ends[-1] == 949
        # windows double in width
        widths = np.diff(np.concatenate([[74], ends]))
        assert list(widths[:3]) == [25, 50, 100]

    def test_short_warmup_disables_mass_adaptation(self):
        s = build_schedule(15)
        assert not s.in_slow_window.any()
        assert not s.window_end.any()

    def test_explicit_disable(self):
        s = build_schedule(1000, adapt_mass_matrix=False)
        assert not s.in_slow_window.any()

    def test_zero_warmup(self):
        s = build_schedule(0)
        assert s.in_slow_window.shape == (0,)


class TestMassMatrixAdaptation:
    def test_learns_anisotropic_scales(self):
        # Target with wildly different scales per dim; adapted inverse mass
        # should approximate the marginal variances.
        scales = jnp.asarray([0.1, 1.0, 10.0])

        def log_prob(params):
            return jnp.sum(Normal(0.0, scales).log_prob(params["x"]))

        res = sample(
            log_prob,
            {"x": jnp.zeros(3)},
            num_samples=500,
            num_warmup=1000,
            num_chains=4,
            kernel="nuts",
            seed=0,
        )
        inv_mass = np.asarray(res.tunables.inv_mass_diag)
        ratio = inv_mass / np.asarray(scales) ** 2
        # within a factor ~3 of the true variances across 4 orders of magnitude
        assert np.all(ratio > 0.3) and np.all(ratio < 3.0)

        xs = np.asarray(res.samples["x"]).reshape(-1, 3)
        np.testing.assert_allclose(
            xs.std(axis=0), np.asarray(scales), rtol=0.2
        )


class TestAutoStepSize:
    def test_auto_init_converges(self):
        # Badly scaled target: auto init + adaptation must land a good step.
        scales = jnp.asarray([0.01, 0.01, 0.01])

        def log_prob(params):
            return jnp.sum(Normal(0.0, scales).log_prob(params["x"]))

        res = sample(
            log_prob,
            {"x": jnp.zeros(3)},
            num_samples=500,
            num_warmup=500,
            num_chains=2,
            kernel="nuts",
            seed=0,
            step_size="auto",
            adapt_mass_matrix=False,  # isolate the step-size path
        )
        accept = float(np.asarray(res.info.accept_prob).mean())
        assert 0.5 < accept < 0.95
        # with identity mass the step must have found the 0.01 scale,
        # far below the nominal 1.0 probe start
        assert float(res.tunables.step_size) < 0.1

    def test_auto_is_the_default_for_gradient_kernels(self):
        # No step_size argument at all: the default must behave like 'auto'
        # (Stan-style probe), not a blind 0.1 — on a 0.01-scale target the
        # adapted step must land well below 0.1 with healthy acceptance.
        scales = jnp.asarray([0.01, 0.01, 0.01])

        def log_prob(params):
            return jnp.sum(Normal(0.0, scales).log_prob(params["x"]))

        res = sample(
            log_prob,
            {"x": jnp.zeros(3)},
            num_samples=300,
            num_warmup=500,
            num_chains=2,
            kernel="nuts",
            seed=0,
            adapt_mass_matrix=False,
        )
        accept = float(np.asarray(res.info.accept_prob).mean())
        assert 0.5 < accept < 0.98
        assert float(res.tunables.step_size) < 0.1

    def test_auto_falls_back_for_metropolis_and_fixed_step(self):
        # 'auto' is the universal default, so metropolis (no gradient probe)
        # and adapt_step_size=False must silently resolve to the 0.1 constant.
        from mlx_mcmc_tpu.inference.engine import resolve_step_size

        assert resolve_step_size("auto", "metropolis", True) == 0.1
        assert resolve_step_size("auto", "nuts", False) == 0.1
        assert resolve_step_size("auto", "nuts", True) == "auto"
        assert resolve_step_size(0.3, "metropolis", True) == 0.3
        import pytest

        with pytest.raises(ValueError, match="auto"):
            resolve_step_size("bogus", "nuts", True)

        res = sample(
            lambda p: Normal(0.0, 1.0).log_prob(p["x"]),
            {"x": 0.0},
            num_samples=50,
            num_warmup=50,
            kernel="metropolis",
            seed=0,
        )
        assert np.isfinite(np.asarray(res.samples["x"])).all()
