"""Checkpoint/resume and config-system tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import Normal, sample
from mlx_mcmc_tpu.io import load_checkpoint, resume, save_checkpoint
from mlx_mcmc_tpu.utils import AdaptationConfig, SamplerConfig


def _model(params):
    return jnp.sum(Normal(2.0, 1.0).log_prob(params["x"]))


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        res = sample(
            _model, {"x": jnp.zeros(3)}, num_samples=200, num_warmup=200,
            num_chains=4, kernel="nuts", seed=0,
        )
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, res)
        ckpt = load_checkpoint(path)
        assert ckpt["kernel"] == "nuts"
        assert ckpt["num_chains"] == 4
        assert ckpt["positions"]["x"].shape == (4, 3)
        np.testing.assert_allclose(
            ckpt["inv_mass_diag"], np.asarray(res.tunables.inv_mass_diag)
        )

    def test_resume_continues_sampling(self, tmp_path):
        res = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=300, num_warmup=300,
            num_chains=2, kernel="nuts", seed=0,
        )
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, res)
        res2 = resume(_model, path, num_samples=2000)
        xs = np.asarray(res2.samples["x"]).reshape(-1, 2)
        # Resumed run keeps the adapted tunables and stays in the target.
        assert float(res2.tunables.step_size) == float(res.tunables.step_size)
        assert np.all(np.abs(xs.mean(axis=0) - 2.0) < 0.15)

    def test_resume_from_dict(self):
        res = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=100, num_warmup=100,
            num_chains=2, kernel="hmc", seed=0,
        )
        from mlx_mcmc_tpu.io.checkpoint import _result_state

        res2 = resume(_model, _result_state(res), num_samples=100)
        assert res2.samples["x"].shape == (2, 100, 2)


class TestExactSamplingResume:
    """VERDICT r3 #4 / SURVEY.md §5.4 "resume ... mid-sampling": a sampling-
    phase checkpoint of an int-seeded run must continue bit-identically —
    ``sample(N)`` == ``sample(N/2)`` -> save -> ``resume(N/2)``, draw for
    draw, the post-warmup twin of TestMidWarmupResume."""

    @pytest.mark.parametrize("kernel", ["nuts", "hmc", "chees", "metropolis"])
    def test_split_equals_uninterrupted(self, kernel, tmp_path):
        kw = dict(num_chains=4, kernel=kernel, seed=13, num_warmup=60)
        if kernel == "nuts":
            kw["max_tree_depth"] = 5
        full = sample(_model, {"x": jnp.zeros(3)}, num_samples=40, **kw)
        half = sample(_model, {"x": jnp.zeros(3)}, num_samples=20, **kw)
        path = str(tmp_path / f"sampling_{kernel}.npz")
        save_checkpoint(path, half)
        rest = resume(_model, path, num_samples=20)
        glued = np.concatenate(
            [np.asarray(half.samples["x"]), np.asarray(rest.samples["x"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["x"]), glued)
        # diagnostics continue identically too
        np.testing.assert_array_equal(
            np.asarray(full.info.accept_prob)[:, 20:],
            np.asarray(rest.info.accept_prob),
        )

    def test_chained_resumes(self):
        kw = dict(num_chains=2, kernel="hmc", seed=3, num_warmup=50)
        full = sample(_model, {"x": jnp.zeros(2)}, num_samples=30, **kw)
        a = sample(_model, {"x": jnp.zeros(2)}, num_samples=10, **kw)
        b = resume(_model, a, num_samples=10)  # live result, no disk
        c = resume(_model, b, num_samples=10)
        glued = np.concatenate(
            [np.asarray(r.samples["x"]) for r in (a, b, c)], axis=1
        )
        np.testing.assert_array_equal(np.asarray(full.samples["x"]), glued)

    def test_resume_with_thin(self, tmp_path):
        kw = dict(num_chains=2, kernel="hmc", seed=5, num_warmup=40, thin=3)
        full = sample(_model, {"x": jnp.zeros(2)}, num_samples=20, **kw)
        half = sample(_model, {"x": jnp.zeros(2)}, num_samples=10, **kw)
        rest = resume(_model, half, num_samples=10)
        glued = np.concatenate(
            [np.asarray(half.samples["x"]), np.asarray(rest.samples["x"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["x"]), glued)

    def test_resume_with_data_and_transforms(self, tmp_path):
        rng = np.random.default_rng(2)
        data = {"y": jnp.asarray(rng.normal(1.0, 0.5, 32).astype(np.float32))}

        def lp(params, data):
            return (
                Normal(0.0, 5.0).log_prob(params["mu"])
                + Normal(0.0, 1.0).log_prob(jnp.log(params["sigma"]))
                + jnp.sum(
                    Normal(params["mu"], params["sigma"]).log_prob(data["y"])
                )
            )

        kw = dict(
            num_chains=2, kernel="nuts", seed=8, num_warmup=50,
            max_tree_depth=5, data=data, transforms={"sigma": "log"},
        )
        init = {"mu": 0.0, "sigma": 1.0}
        full = sample(lp, init, num_samples=24, **kw)
        half = sample(lp, init, num_samples=12, **kw)
        path = str(tmp_path / "tr.npz")
        save_checkpoint(path, half)
        rest = resume(
            lp, path, num_samples=12, data=data, transforms={"sigma": "log"}
        )
        glued = np.concatenate(
            [np.asarray(half.samples["sigma"]), np.asarray(rest.samples["sigma"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["sigma"]), glued)
        # transforms mismatch is rejected, not silently wrong
        with pytest.raises(ValueError, match="transforms"):
            resume(lp, path, num_samples=4, data=data)
        # data mismatch is rejected
        bad = {"y": jnp.zeros(16, jnp.float32)}
        with pytest.raises(ValueError, match="fingerprint"):
            resume(
                lp, path, num_samples=4, data=bad,
                transforms={"sigma": "log"},
            )

    def test_contradicting_kwargs_rejected(self):
        half = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=10, num_chains=2,
            kernel="nuts", seed=0, num_warmup=30, max_tree_depth=5,
        )
        with pytest.raises(ValueError, match="max_tree_depth"):
            resume(_model, half, num_samples=10, max_tree_depth=7)

    def test_explicit_seed_on_exact_checkpoint_warns(self):
        # ADVICE r4: resume() silently ignored a user-supplied seed for
        # bit-exact checkpoints; the caller must be told the checkpoint's
        # stream wins.
        half = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=10, num_chains=2,
            kernel="hmc", seed=0, num_warmup=20,
        )
        with pytest.warns(UserWarning, match="`seed` is ignored"):
            res = resume(_model, half, num_samples=10, seed=99)
        assert res.samples["x"].shape == (2, 10, 2)

    def test_warmup_checkpoint_routed_to_resume_warmup(self):
        from mlx_mcmc_tpu.io import run_warmup

        ckpt = run_warmup(
            _model, {"x": jnp.zeros(2)}, num_warmup=40, stop=20,
            num_chains=2, seed=0,
        )
        with pytest.raises(ValueError, match="resume_warmup"):
            resume(_model, ckpt, num_samples=10)

    def test_key_seed_has_no_payload(self):
        import jax

        res = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=10, num_chains=2,
            kernel="hmc", seed=jax.random.PRNGKey(0), num_warmup=20,
        )
        assert res.resume_payload is None
        # resume() on such a result falls back to the legacy statistical
        # continuation instead of crashing (documented behavior).
        res2 = resume(_model, res, num_samples=10)
        assert res2.samples["x"].shape == (2, 10, 2)

    def test_missing_callable_kwarg_rejected(self):
        # A run whose kernel_kwargs carried a callable (e.g. a fused
        # value_and_grad_fn) cannot resume bit-exactly without it being
        # re-passed; resume must refuse rather than silently rebuild the
        # program with autodiff (different accumulation order).
        import jax

        def my_vag(z):
            lp = jnp.sum(-0.5 * (z - 2.0) ** 2)
            return lp, -(z - 2.0)

        half = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=10, num_chains=2,
            kernel="hmc", seed=0, num_warmup=20, value_and_grad_fn=my_vag,
        )
        with pytest.raises(ValueError, match="value_and_grad_fn"):
            resume(_model, half, num_samples=10)
        # re-passing the callable works
        res = resume(_model, half, num_samples=10, value_and_grad_fn=my_vag)
        assert res.samples["x"].shape == (2, 10, 2)

    def test_repeated_resume_hits_runner_cache(self):
        from mlx_mcmc_tpu.inference.api import _RUNNER_CACHE

        half = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=10, num_chains=2,
            kernel="hmc", seed=6, num_warmup=20,
        )
        a = resume(_model, half, num_samples=10)
        n = len(_RUNNER_CACHE)
        b = resume(_model, a, num_samples=10)
        assert len(_RUNNER_CACHE) == n  # second resume reused the runner
        assert b.samples["x"].shape == (2, 10, 2)

    def test_orbax_exact_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        kw = dict(num_chains=2, kernel="nuts", seed=21, num_warmup=40,
                  max_tree_depth=5)
        full = sample(_model, {"x": jnp.zeros(2)}, num_samples=20, **kw)
        half = sample(_model, {"x": jnp.zeros(2)}, num_samples=10, **kw)
        path = str(tmp_path / "orbax_exact")
        save_checkpoint(path, half, backend="orbax")
        ckpt = load_checkpoint(path)
        assert ckpt["phase"] == "sampling"
        rest = resume(_model, ckpt, num_samples=10)
        glued = np.concatenate(
            [np.asarray(half.samples["x"]), np.asarray(rest.samples["x"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["x"]), glued)


class TestMidWarmupResume:
    """SURVEY.md §5.4: resume mid-warmup. The layout-invariant RNG
    (``fold_in(chain_key, global_step)``) plus the static warmup schedule make
    exact resume possible: interrupted-at-step-k must equal uninterrupted,
    bit for bit — both the remaining warmup and the sampling phase."""

    @pytest.mark.parametrize("kernel", ["nuts", "hmc", "chees"])
    def test_interrupted_equals_uninterrupted(self, kernel, tmp_path):
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup

        kwargs = dict(num_chains=4, kernel=kernel, seed=7)
        full = sample(
            _model, {"x": jnp.zeros(3)}, num_warmup=80, num_samples=40, **kwargs
        )
        ckpt = run_warmup(
            _model, {"x": jnp.zeros(3)}, num_warmup=80, stop=33, **kwargs
        )
        # Round-trip through disk.
        path = str(tmp_path / f"warmup_{kernel}.npz")
        save_checkpoint(path, ckpt)
        res = resume_warmup(_model, load_checkpoint(path), num_samples=40)
        np.testing.assert_array_equal(
            np.asarray(res.samples["x"]), np.asarray(full.samples["x"])
        )
        np.testing.assert_array_equal(
            np.asarray(res.info.is_divergent), np.asarray(full.info.is_divergent)
        )
        assert float(res.tunables.step_size) == float(full.tunables.step_size)

    def test_chained_segments(self):
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup

        kwargs = dict(num_chains=2, kernel="nuts", seed=3)
        full = sample(
            _model, {"x": jnp.zeros(2)}, num_warmup=60, num_samples=20, **kwargs
        )
        ckpt = run_warmup(
            _model, {"x": jnp.zeros(2)}, num_warmup=60, stop=10, **kwargs
        )
        ckpt = resume_warmup(_model, ckpt, stop=45)  # second segment
        assert ckpt["warmup_step"] == 45
        res = resume_warmup(_model, ckpt, num_samples=20)
        np.testing.assert_array_equal(
            np.asarray(res.samples["x"]), np.asarray(full.samples["x"])
        )

    def test_warmup_checkpoint_carries_adaptation(self):
        from mlx_mcmc_tpu.io import run_warmup

        # Stan schedule for 200 warmup: slow windows end at steps 99 and 149,
        # so a checkpoint at 120 has a refreshed (non-identity) mass matrix.
        ckpt = run_warmup(
            _model, {"x": jnp.zeros(2)}, num_warmup=200, stop=120,
            num_chains=2, kernel="nuts", seed=0,
        )
        assert ckpt["phase"] == "warmup"
        # AdaptationState: 5 dual-averaging scalars + 3 Welford leaves +
        # inv_mass_diag.
        assert len(ckpt["adapt_leaves"]) == 9
        # Past the first slow window the Welford-adapted mass matrix should
        # have moved off its identity init.
        assert not np.allclose(ckpt["adapt_leaves"][-1], 1.0)

    def test_bad_phase_rejected(self):
        from mlx_mcmc_tpu.io import resume_warmup

        res = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=20, num_warmup=20,
            num_chains=2, seed=0,
        )
        from mlx_mcmc_tpu.io.checkpoint import _result_state

        with pytest.raises(ValueError, match="mid-warmup"):
            resume_warmup(_model, _result_state(res), num_samples=10)

    def test_invalid_stop_rejected(self):
        from mlx_mcmc_tpu.io import run_warmup

        with pytest.raises(ValueError, match="stop"):
            run_warmup(
                _model, {"x": jnp.zeros(2)}, num_warmup=50, stop=60,
                num_chains=2,
            )

    def test_key_seed_rejected_early(self):
        # sample() accepts PRNG-key seeds, but a warmup checkpoint must
        # record a plain int to rebuild the key stream — fail BEFORE the
        # warmup segment runs, not after.
        import jax

        from mlx_mcmc_tpu.io import run_warmup

        with pytest.raises(TypeError, match="int seed"):
            run_warmup(
                _model, {"x": jnp.zeros(2)}, num_warmup=50, stop=10,
                num_chains=2, seed=jax.random.PRNGKey(0),
            )

    def test_resume_rejects_contradicting_kwargs(self):
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup

        ckpt = run_warmup(
            _model, {"x": jnp.zeros(2)}, num_warmup=60, stop=20,
            num_chains=2, kernel="nuts", seed=0, max_tree_depth=6,
        )
        # Same value: fine (and also implied when omitted).
        resume_warmup(_model, ckpt, stop=30, max_tree_depth=6)
        with pytest.raises(ValueError, match="max_tree_depth"):
            resume_warmup(_model, ckpt, stop=30, max_tree_depth=8)

    def test_resume_reapplies_stored_kwargs(self):
        """Omitting a kwarg on resume must reproduce the original run
        (the checkpoint re-applies it), not silently fall back to the
        default."""
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup

        kwargs = dict(num_chains=2, kernel="nuts", seed=5, max_tree_depth=4)
        full = sample(
            _model, {"x": jnp.zeros(2)}, num_warmup=60, num_samples=20,
            **kwargs,
        )
        ckpt = run_warmup(
            _model, {"x": jnp.zeros(2)}, num_warmup=60, stop=25, **kwargs
        )
        res = resume_warmup(_model, ckpt, num_samples=20)  # no kwargs
        np.testing.assert_array_equal(
            np.asarray(res.samples["x"]), np.asarray(full.samples["x"])
        )

    def test_resume_rejects_mismatched_data(self):
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup

        def model_with_data(params, data=None):
            return jnp.sum(Normal(data["mu"], 1.0).log_prob(params["x"]))

        data = {"mu": jnp.ones(3)}
        ckpt = run_warmup(
            model_with_data, {"x": jnp.zeros(3)}, num_warmup=60, stop=20,
            num_chains=2, data=data,
        )
        resume_warmup(model_with_data, ckpt, stop=30, data=data)  # ok
        with pytest.raises(ValueError, match="data"):
            resume_warmup(
                model_with_data, ckpt, stop=30, data={"mu": jnp.ones(4)}
            )


class TestShardedMidWarmup:
    """SURVEY.md §5.4 on the path where preemption-resume matters: sharded
    runs. run_warmup/resume_warmup with ``mesh=`` drive the same engine
    segments under shard_map, so interrupted == uninterrupted bit-for-bit on
    the same mesh; a different mesh layout is rejected (cross-shard
    statistics round differently per layout)."""

    @pytest.fixture(scope="class")
    def eight_devices(self):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        return jax.devices()

    @pytest.mark.parametrize("kernel", ["nuts", "hmc"])
    def test_sharded_interrupted_equals_uninterrupted(
        self, eight_devices, kernel, tmp_path
    ):
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup
        from mlx_mcmc_tpu.parallel import chain_mesh, sample_sharded

        mesh = chain_mesh()
        kwargs = dict(num_chains=8, kernel=kernel, seed=11)
        full = sample_sharded(
            _model, {"x": jnp.zeros(3)}, num_warmup=80, num_samples=30,
            mesh=mesh, **kwargs,
        )
        ckpt = run_warmup(
            _model, {"x": jnp.zeros(3)}, num_warmup=80, stop=33, mesh=mesh,
            **kwargs,
        )
        assert ckpt["mesh_axes"] == {
            "axis": "chains", "axis_size": 8,
            "data_axis": None, "data_axis_size": None,
        }
        path = str(tmp_path / f"sharded_{kernel}.npz")
        save_checkpoint(path, ckpt)
        res = resume_warmup(
            _model, load_checkpoint(path), num_samples=30, mesh=mesh
        )
        np.testing.assert_array_equal(
            np.asarray(res.samples["x"]), np.asarray(full.samples["x"])
        )
        assert float(res.tunables.step_size) == float(full.tunables.step_size)

    def test_sharded_data_axis_segments(self, eight_devices):
        """Mid-warmup resume composes with observation sharding: segments on
        a 2-D (chains, data) mesh equal the uninterrupted data-sharded run."""
        import jax

        from mlx_mcmc_tpu.io import resume_warmup, run_warmup
        from mlx_mcmc_tpu.models import make_logistic_regression
        from mlx_mcmc_tpu.parallel import data_chain_mesh, sample_sharded

        def local_loglik(params, data):
            s = jnp.dot(data["X"], params["beta"],
                        preferred_element_type=jnp.float32)
            return jnp.sum(data["y"] * s - jax.nn.softplus(s))

        def log_prior(params):
            return jnp.sum(Normal(0.0, 1.0).log_prob(params["beta"]))

        spec = make_logistic_regression(num_features=4, num_obs=64, seed=0)
        data = {"X": spec.X, "y": spec.y}
        mesh = data_chain_mesh(2, 4)
        shard_kw = dict(
            data=data, data_axis="data", log_prior_fn=log_prior, mesh=mesh,
        )
        full = sample_sharded(
            local_loglik, spec.initial_params, num_warmup=40, num_samples=10,
            num_chains=4, kernel="hmc", seed=2, num_leapfrog_steps=3,
            **shard_kw,
        )
        ckpt = run_warmup(
            local_loglik, spec.initial_params, num_warmup=40, stop=15,
            num_chains=4, kernel="hmc", seed=2, num_leapfrog_steps=3,
            **shard_kw,
        )
        assert ckpt["mesh_axes"]["data_axis_size"] == 4
        # kernel/seed/num_chains come from the checkpoint on resume.
        ckpt = resume_warmup(local_loglik, ckpt, stop=30, **shard_kw)
        res = resume_warmup(local_loglik, ckpt, num_samples=10, **shard_kw)
        np.testing.assert_array_equal(
            np.asarray(res.samples["beta"]), np.asarray(full.samples["beta"])
        )

    def test_mesh_layout_mismatch_rejected(self, eight_devices):
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup
        from mlx_mcmc_tpu.parallel import chain_mesh

        ckpt = run_warmup(
            _model, {"x": jnp.zeros(2)}, num_warmup=40, stop=10,
            num_chains=8, kernel="hmc", seed=0, mesh=chain_mesh(),
        )
        # sharded checkpoint, vmap resume: rejected
        with pytest.raises(ValueError, match="mesh layout"):
            resume_warmup(_model, ckpt, stop=20)
        # different chain-axis size: rejected
        with pytest.raises(ValueError, match="mesh layout"):
            resume_warmup(_model, ckpt, stop=20, mesh=chain_mesh(num_devices=4))
        # vmap checkpoint, sharded resume: rejected
        vmap_ckpt = run_warmup(
            _model, {"x": jnp.zeros(2)}, num_warmup=40, stop=10,
            num_chains=8, kernel="hmc", seed=0,
        )
        with pytest.raises(ValueError, match="mesh layout"):
            resume_warmup(_model, vmap_ckpt, stop=20, mesh=chain_mesh())


class TestConfig:
    def test_sampler_config_roundtrip(self):
        cfg = SamplerConfig(
            kernel="hmc",
            num_samples=150,
            num_warmup=100,
            num_chains=2,
            num_leapfrog_steps=5,
            adaptation=AdaptationConfig(target_accept=0.9),
        )
        res = sample(_model, {"x": jnp.zeros(2)}, config=cfg)
        assert res.samples["x"].shape == (2, 150, 2)
        assert res.kernel == "hmc"

    def test_config_drops_irrelevant_kernel_fields(self):
        kw = SamplerConfig(kernel="nuts").to_kwargs()
        assert "num_leapfrog_steps" not in kw
        assert "max_leapfrog_steps" not in kw
        assert kw["max_tree_depth"] == 10
        kw = SamplerConfig(kernel="hmc").to_kwargs()
        assert "max_tree_depth" not in kw
        assert "max_leapfrog_steps" not in kw

    def test_config_chees_trajectory_cap(self):
        kw = SamplerConfig(kernel="chees", max_leapfrog_steps=64).to_kwargs()
        assert kw["max_leapfrog_steps"] == 64
        assert "max_tree_depth" not in kw
        cfg = SamplerConfig(
            kernel="chees", num_samples=60, num_warmup=80, num_chains=2,
            max_leapfrog_steps=32,
        )
        res = sample(_model, {"x": jnp.zeros(2)}, config=cfg)
        assert res.samples["x"].shape == (2, 60, 2)

    @pytest.mark.parametrize("kernel", ["metropolis", "mala"])
    def test_config_gradient_free_kernels(self, kernel):
        cfg = SamplerConfig(
            kernel=kernel, num_samples=50, num_warmup=50, num_chains=2
        )
        kw = cfg.to_kwargs()
        for k in ("num_leapfrog_steps", "max_tree_depth", "max_leapfrog_steps"):
            assert k not in kw
        res = sample(_model, {"x": jnp.zeros(2)}, config=cfg)
        assert res.samples["x"].shape == (2, 50, 2)


class TestOrbaxBackend:
    # chees/mala are the regression cases: the old kernel_id index only knew
    # metropolis/hmc/nuts and raised ValueError at save time for any other.
    @pytest.mark.parametrize("kernel", ["nuts", "chees", "mala"])
    def test_orbax_roundtrip(self, tmp_path, kernel):
        pytest.importorskip("orbax.checkpoint")
        res = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=100, num_warmup=100,
            num_chains=2, kernel=kernel, seed=0,
        )
        path = str(tmp_path / "ckpt_orbax")
        save_checkpoint(path, res, backend="orbax")
        ckpt = load_checkpoint(path)
        assert ckpt["kernel"] == kernel
        np.testing.assert_allclose(
            ckpt["inv_mass_diag"], np.asarray(res.tunables.inv_mass_diag),
            rtol=1e-6,
        )
        res2 = resume(_model, ckpt, num_samples=50)
        assert res2.samples["x"].shape == (2, 50, 2)

    def test_orbax_warmup_dict_roundtrip(self, tmp_path):
        # VERDICT r3 #7: mid-warmup checkpoints through the orbax backend
        # (async-capable, multi-host-aware) — previously npz-only.
        pytest.importorskip("orbax.checkpoint")
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup

        kwargs = dict(num_chains=4, kernel="nuts", seed=7)
        full = sample(
            _model, {"x": jnp.zeros(3)}, num_warmup=80, num_samples=40,
            **kwargs,
        )
        ckpt = run_warmup(
            _model, {"x": jnp.zeros(3)}, num_warmup=80, stop=33, **kwargs
        )
        path = str(tmp_path / "warmup_orbax")
        save_checkpoint(path, ckpt, backend="orbax")
        assert (tmp_path / "warmup_orbax").is_dir()  # orbax directory tree
        loaded = load_checkpoint(path)
        assert loaded["phase"] == "warmup"
        assert loaded["warmup_step"] == 33
        res = resume_warmup(_model, loaded, num_samples=40)
        np.testing.assert_array_equal(
            np.asarray(res.samples["x"]), np.asarray(full.samples["x"])
        )

    def test_orbax_sharded_warmup_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from mlx_mcmc_tpu.io import resume_warmup, run_warmup
        from mlx_mcmc_tpu.parallel import chain_mesh, sample_sharded

        mesh = chain_mesh()
        kwargs = dict(num_chains=16, kernel="nuts", seed=5)
        full = sample_sharded(
            _model, {"x": jnp.zeros(2)}, num_warmup=60, num_samples=30,
            mesh=mesh, **kwargs,
        )
        ckpt = run_warmup(
            _model, {"x": jnp.zeros(2)}, num_warmup=60, stop=25, mesh=mesh,
            **kwargs,
        )
        path = str(tmp_path / "warmup_orbax_sharded")
        save_checkpoint(path, ckpt, backend="orbax")
        loaded = load_checkpoint(path)
        assert loaded["mesh_axes"] is not None  # layout guard survives orbax
        res = resume_warmup(
            _model, loaded, num_samples=30, mesh=mesh
        )
        np.testing.assert_array_equal(
            np.asarray(res.samples["x"]), np.asarray(full.samples["x"])
        )
