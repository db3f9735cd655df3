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
        assert kw["max_tree_depth"] == 10
        kw = SamplerConfig(kernel="hmc").to_kwargs()
        assert "max_tree_depth" not in kw


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        res = sample(
            _model, {"x": jnp.zeros(2)}, num_samples=100, num_warmup=100,
            num_chains=2, kernel="nuts", seed=0,
        )
        path = str(tmp_path / "ckpt_orbax")
        save_checkpoint(path, res, backend="orbax")
        ckpt = load_checkpoint(path)
        assert ckpt["kernel"] == "nuts"
        np.testing.assert_allclose(
            ckpt["inv_mass_diag"], np.asarray(res.tunables.inv_mass_diag),
            rtol=1e-6,
        )
        res2 = resume(_model, ckpt, num_samples=50)
        assert res2.samples["x"].shape == (2, 50, 2)
