"""MCMC facade tests: reference API parity (run/summary/print_summary) plus
the multi-chain extensions. Covers the gaps SURVEY.md §4 notes in the
reference suite (summary key format untested there)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import MCMC, HalfNormal, Normal


def _model(data):
    def log_prob(params):
        mu, sigma = params["mu"], params["sigma"]
        lp = Normal(0.0, 10.0).log_prob(mu) + HalfNormal(5.0).log_prob(sigma)
        return lp + jnp.sum(Normal(mu, sigma).log_prob(data))

    return log_prob


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    return jnp.asarray(rng.normal(5.0, 2.0, 100).astype(np.float32))


class TestFacade:
    def test_run_returns_numpy_dict(self, data):
        mcmc = MCMC(_model(data))
        samples = mcmc.run(
            {"mu": 0.0, "sigma": 1.0},
            num_samples=500,
            num_warmup=500,
            method="nuts",
            verbose=False,
        )
        assert isinstance(samples["mu"], np.ndarray)
        assert samples["mu"].shape == (500,)
        assert mcmc.acceptance_rate is not None
        assert abs(samples["mu"].mean() - float(data.mean())) < 0.3

    def test_metropolis_warmup_restart(self, data):
        # Facade-managed warmup + seed+1 restart (reference mcmc.py:145-178).
        mcmc = MCMC(_model(data))
        samples = mcmc.run(
            {"mu": 0.0, "sigma": 1.0},
            num_samples=1000,
            num_warmup=1000,
            method="metropolis",
            proposal_scale=0.3,
            verbose=False,
        )
        assert samples["mu"].shape == (1000,)
        # After warmup the chain starts near the mode, not at 0.
        assert abs(samples["mu"][:50].mean() - float(data.mean())) < 1.0

    def test_summary_key_format(self, data):
        mcmc = MCMC(_model(data))
        mcmc.run({"mu": 0.0, "sigma": 1.0}, num_samples=300, num_warmup=300,
                 method="hmc", verbose=False)
        s = mcmc.summary()
        assert set(s.keys()) == {"mu", "sigma"}
        assert list(s["mu"].keys())[:5] == ["mean", "std", "median", "2.5%", "97.5%"]
        s90 = mcmc.summary(credible_interval=0.9)
        assert "5.0%" in s90["mu"]

    def test_print_summary_runs(self, data, capsys):
        mcmc = MCMC(_model(data))
        mcmc.run({"mu": 0.0, "sigma": 1.0}, num_samples=200, num_warmup=200,
                 method="nuts", verbose=False)
        mcmc.print_summary()
        out = capsys.readouterr().out
        assert "Posterior Summary" in out
        assert "mu" in out and "sigma" in out

    def test_unknown_method_raises(self, data):
        with pytest.raises(ValueError, match="Unknown sampling method"):
            MCMC(_model(data)).run({"mu": 0.0}, method="gibbs")

    def test_summary_before_run_raises(self, data):
        with pytest.raises(ValueError, match="Must run sampling first"):
            MCMC(_model(data)).summary()

    def test_verbose_false_prints_nothing(self, data, capsys):
        mcmc = MCMC(_model(data))
        mcmc.run({"mu": 0.0, "sigma": 1.0}, num_samples=100, num_warmup=100,
                 method="nuts", verbose=False)
        assert capsys.readouterr().out == ""

    def test_multichain_shapes_and_diagnostics(self, data):
        mcmc = MCMC(_model(data))
        samples = mcmc.run(
            {"mu": 0.0, "sigma": 1.0},
            num_samples=400,
            num_warmup=400,
            method="nuts",
            num_chains=4,
            verbose=False,
        )
        # flat view for parity; full view on the result object
        assert samples["mu"].shape == (1600,)
        assert mcmc.result.samples["mu"].shape == (4, 400)
        diag = mcmc.diagnostics()
        assert diag["mu"]["r_hat"] < 1.05
        assert diag["mu"]["n_eff"] > 100

    def test_stats_pytree(self, data):
        mcmc = MCMC(_model(data))
        mcmc.run({"mu": 0.0, "sigma": 1.0}, num_samples=100, num_warmup=100,
                 method="nuts", num_chains=2, verbose=False)
        stats = mcmc.stats
        assert np.asarray(stats.tree_depth).shape == (2, 100)
        assert np.asarray(stats.accept_prob).min() >= 0.0


class TestProgress:
    def test_progress_callback_fires(self, data):
        import jax
        from mlx_mcmc_tpu import sample as _sample

        events = []

        def cb(phase, t, accept, eps):
            events.append((str(phase), int(t), float(accept)))

        _sample(
            _model(data),
            {"mu": 0.0, "sigma": 1.0},
            num_samples=50,
            num_warmup=50,
            num_chains=2,
            kernel="nuts",
            seed=0,
            progress_every=10,
            progress_callback=cb,
        )
        jax.effects_barrier()
        phases = {e[0] for e in events}
        assert "warmup" in phases and "sample" in phases
        assert len(events) == 10  # 5 per phase


class TestChainMethod:
    def test_sharded_through_facade(self, data):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mcmc = MCMC(_model(data))
        samples = mcmc.run(
            {"mu": 0.0, "sigma": 1.0},
            num_samples=300,
            num_warmup=300,
            method="nuts",
            num_chains=8,
            chain_method="sharded",
            verbose=False,
        )
        assert samples["mu"].shape == (2400,)
        assert abs(samples["mu"].mean() - float(data.mean())) < 0.3

    def test_sharded_metropolis_supported(self, data):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        samples = MCMC(_model(data)).run(
            {"mu": 0.0, "sigma": 1.0},
            num_samples=300,
            num_warmup=300,
            method="metropolis",
            num_chains=8,
            chain_method="sharded",
            verbose=False,
        )
        assert samples["mu"].shape == (2400,)
        assert abs(samples["mu"].mean() - float(data.mean())) < 0.5

    def test_sharded_ensemble_rejected(self, data):
        with pytest.raises(ValueError, match="ensemble"):
            MCMC(_model(data)).run(
                {"mu": 0.0}, method="ensemble", chain_method="sharded",
                verbose=False,
            )

    def test_unknown_chain_method(self, data):
        with pytest.raises(ValueError, match="chain_method"):
            MCMC(_model(data)).run(
                {"mu": 0.0}, chain_method="pmap", verbose=False,
            )


class TestMapInit:
    def test_map_init_starts_near_mode(self, data):
        from mlx_mcmc_tpu import sample as _sample

        # Start absurdly far away; MAP init must land warmup near the mode
        # and the (short) run must still recover the posterior.
        res = _sample(
            _model(data),
            {"mu": -200.0, "sigma": 50.0},
            num_samples=300,
            num_warmup=300,
            num_chains=4,
            kernel="nuts",
            seed=0,
            init_strategy="map",
        )
        mu = np.asarray(res.samples["mu"]).ravel()
        assert abs(mu.mean() - float(np.asarray(data).mean())) < 0.3

    def test_unknown_strategy_raises(self, data):
        from mlx_mcmc_tpu import sample as _sample

        with pytest.raises(ValueError, match="init_strategy"):
            _sample(_model(data), {"mu": 0.0, "sigma": 1.0},
                    num_samples=10, num_warmup=10, init_strategy="magic")
