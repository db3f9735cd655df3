"""Sharded twins of the chunked-storage and bit-exact post-warmup resume
tests (VERDICT r4 #1): the pod-preemption and HBM-bounded-draws scenarios
(SURVEY.md §5.4/§7) are *sharded*-run scenarios, so ``sample_sharded`` must
compose with ``draw_chunk`` and ``io.resume(..., mesh=...)`` exactly like
``sample`` does — bit-identical to the uninterrupted sharded run on the
8-device virtual CPU mesh, including the tiled per-shard Welford state and
the mesh-layout guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import Normal
from mlx_mcmc_tpu.io import load_checkpoint, resume, save_checkpoint
from mlx_mcmc_tpu.parallel import chain_mesh, data_chain_mesh, sample_sharded


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


def _model(params, data):
    return (
        Normal(0.0, 10.0).log_prob(params["mu"])
        + jnp.sum(Normal(0.0, 2.0).log_prob(params["w"]))
        + jnp.sum(
            Normal(params["mu"] + params["w"].sum(), 1.0).log_prob(data["y"])
        )
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return {"y": jnp.asarray(rng.normal(1.5, 1.0, 48).astype(np.float32))}


INIT = {"mu": 0.0, "w": jnp.zeros(3)}


class TestShardedDrawChunk:
    @pytest.mark.parametrize("kernel", ["nuts", "hmc"])
    def test_bit_identical_to_unchunked(self, eight_devices, kernel, data):
        kw = dict(
            num_warmup=60, num_chains=8, kernel=kernel, seed=11, data=data
        )
        if kernel == "nuts":
            kw["max_tree_depth"] = 5
        full = sample_sharded(_model, INIT, num_samples=50, **kw)
        chunked = sample_sharded(
            _model, INIT, num_samples=50, draw_chunk=20, **kw
        )
        for name in full.samples:
            np.testing.assert_array_equal(
                np.asarray(full.samples[name]),
                np.asarray(chunked.samples[name]),
            )
        np.testing.assert_array_equal(
            np.asarray(full.info.accept_prob),
            np.asarray(chunked.info.accept_prob),
        )
        # host-resident store
        assert isinstance(chunked.samples["w"], np.ndarray)
        assert chunked.samples["w"].shape == (8, 50, 3)

    def test_remainder_chunk_and_store_dtype(self, eight_devices, data):
        kw = dict(
            num_warmup=40, num_chains=8, kernel="hmc", seed=0, data=data,
            store_dtype="bfloat16",
        )
        full = sample_sharded(_model, INIT, num_samples=31, **kw)
        chunked = sample_sharded(
            _model, INIT, num_samples=31, draw_chunk=10, **kw
        )
        assert full.samples["mu"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(full.samples["mu"].astype(jnp.float32)),
            np.asarray(chunked.samples["mu"].astype(np.float32)),
        )

    def test_device_diagnostics_incompatible(self, eight_devices, data):
        with pytest.raises(ValueError, match="device_diagnostics"):
            sample_sharded(
                _model, INIT, num_samples=20, draw_chunk=10, num_warmup=10,
                num_chains=8, data=data, device_diagnostics=True,
            )

    def test_data_sharded_chunked(self, eight_devices):
        # Chunked storage composes with observation sharding on a 2-D mesh.
        rng = np.random.default_rng(3)
        d = {"y": jnp.asarray(rng.normal(2.0, 1.0, 64).astype(np.float32))}

        def local_ll(p, dd):
            return jnp.sum(Normal(p["mu"], 1.0).log_prob(dd["y"]))

        def prior(p):
            return Normal(0.0, 10.0).log_prob(p["mu"])

        kw = dict(
            num_warmup=40, num_chains=4, kernel="hmc", seed=2,
            mesh=data_chain_mesh(2, 4), data=d, data_axis="data",
            log_prior_fn=prior,
        )
        full = sample_sharded(local_ll, {"mu": 0.0}, num_samples=30, **kw)
        chunked = sample_sharded(
            local_ll, {"mu": 0.0}, num_samples=30, draw_chunk=12, **kw
        )
        np.testing.assert_array_equal(
            np.asarray(full.samples["mu"]), np.asarray(chunked.samples["mu"])
        )


class TestShardedExactResume:
    @pytest.mark.parametrize("kernel", ["nuts", "hmc", "chees"])
    def test_split_equals_uninterrupted(
        self, eight_devices, kernel, data, tmp_path
    ):
        kw = dict(num_chains=8, kernel=kernel, seed=13, num_warmup=60,
                  data=data)
        if kernel == "nuts":
            kw["max_tree_depth"] = 5
        full = sample_sharded(_model, INIT, num_samples=40, **kw)
        half = sample_sharded(_model, INIT, num_samples=20, **kw)
        assert half.resume_payload is not None
        assert half.resume_payload["mesh_axes"]["axis_size"] == 8
        path = str(tmp_path / f"sh_{kernel}.npz")
        save_checkpoint(path, half)
        rest = resume(_model, path, num_samples=20, data=data, mesh=chain_mesh())
        glued = np.concatenate(
            [np.asarray(half.samples["w"]), np.asarray(rest.samples["w"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["w"]), glued)
        np.testing.assert_array_equal(
            np.asarray(full.info.accept_prob)[:, 20:],
            np.asarray(rest.info.accept_prob),
        )

    def test_live_result_resume_and_chaining(self, eight_devices, data):
        kw = dict(num_chains=8, kernel="hmc", seed=3, num_warmup=50, data=data)
        full = sample_sharded(_model, INIT, num_samples=30, **kw)
        a = sample_sharded(_model, INIT, num_samples=10, **kw)
        b = resume(_model, a, num_samples=10, data=data, mesh=chain_mesh())
        c = resume(_model, b, num_samples=10, data=data, mesh=chain_mesh())
        glued = np.concatenate(
            [np.asarray(r.samples["mu"]) for r in (a, b, c)], axis=1
        )
        np.testing.assert_array_equal(np.asarray(full.samples["mu"]), glued)

    def test_mesh_layout_mismatch_rejected(self, eight_devices, data):
        half = sample_sharded(
            _model, INIT, num_samples=10, num_chains=8, kernel="hmc",
            seed=0, num_warmup=20, data=data,
        )
        with pytest.raises(ValueError, match="mesh layout"):
            resume(
                _model, half, num_samples=10, data=data,
                mesh=chain_mesh(num_devices=4),
            )
        # and a vmap resume of a sharded checkpoint is refused too
        with pytest.raises(ValueError, match="mesh layout"):
            resume(_model, half, num_samples=10, data=data)

    def test_vmap_checkpoint_cannot_resume_sharded(self, eight_devices, data):
        from mlx_mcmc_tpu import sample

        half = sample(
            _model, INIT, num_samples=10, num_chains=8, kernel="hmc",
            seed=0, num_warmup=20, data=data,
        )
        with pytest.raises(ValueError, match="mesh layout"):
            resume(
                _model, half, num_samples=10, data=data, mesh=chain_mesh()
            )

    def test_data_sharded_resume(self, eight_devices):
        rng = np.random.default_rng(5)
        d = {"y": jnp.asarray(rng.normal(2.0, 1.0, 64).astype(np.float32))}

        def local_ll(p, dd):
            return jnp.sum(Normal(p["mu"], 1.0).log_prob(dd["y"]))

        def prior(p):
            return Normal(0.0, 10.0).log_prob(p["mu"])

        kw = dict(
            num_warmup=40, num_chains=4, kernel="hmc", seed=7,
            mesh=data_chain_mesh(2, 4), data=d, data_axis="data",
            log_prior_fn=prior,
        )
        full = sample_sharded(local_ll, {"mu": 0.0}, num_samples=24, **kw)
        half = sample_sharded(local_ll, {"mu": 0.0}, num_samples=12, **kw)
        # log_prior_fn must be re-passed
        with pytest.raises(ValueError, match="log_prior_fn"):
            resume(
                local_ll, half, num_samples=12, data=d,
                mesh=data_chain_mesh(2, 4), data_axis="data",
            )
        rest = resume(
            local_ll, half, num_samples=12, data=d,
            mesh=data_chain_mesh(2, 4), data_axis="data",
            log_prior_fn=prior,
        )
        glued = np.concatenate(
            [np.asarray(half.samples["mu"]), np.asarray(rest.samples["mu"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["mu"]), glued)

    def test_resume_after_chunked_sharded_run(self, eight_devices, data):
        kw = dict(num_warmup=40, num_chains=8, kernel="hmc", seed=4,
                  data=data)
        full = sample_sharded(_model, INIT, num_samples=40, **kw)
        half = sample_sharded(
            _model, INIT, num_samples=20, draw_chunk=8, **kw
        )
        rest = resume(
            _model, half, num_samples=20, data=data, mesh=chain_mesh()
        )
        glued = np.concatenate(
            [np.asarray(half.samples["mu"]), np.asarray(rest.samples["mu"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["mu"]), glued)

    def test_orbax_sharded_exact_roundtrip(self, eight_devices, data,
                                           tmp_path):
        pytest.importorskip("orbax.checkpoint")
        kw = dict(num_chains=8, kernel="nuts", seed=21, num_warmup=40,
                  max_tree_depth=5, data=data)
        full = sample_sharded(_model, INIT, num_samples=20, **kw)
        half = sample_sharded(_model, INIT, num_samples=10, **kw)
        path = str(tmp_path / "orbax_sharded_exact")
        save_checkpoint(path, half, backend="orbax")
        ckpt = load_checkpoint(path)
        assert ckpt["phase"] == "sampling"
        assert ckpt["mesh_axes"]["axis_size"] == 8
        rest = resume(
            _model, ckpt, num_samples=10, data=data, mesh=chain_mesh()
        )
        glued = np.concatenate(
            [np.asarray(half.samples["w"]), np.asarray(rest.samples["w"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["w"]), glued)
