"""Chunked draw storage (``sample(draw_chunk=...)``) and down-cast draw
stores (``store_dtype=``).

SURVEY.md §7 "thin summaries via psum; full draws only on demand": the
(chains, draws, D) draw store is the HBM ceiling at wide chain counts.
``draw_chunk`` scans the sampling phase in chunks and fetches each chunk to
host RAM before the next runs; because the engine keys every step by its
*global* index (``num_warmup + (sample_start + j) * thin``,
inference/engine.py ``sample_start``), the chunked draws must equal the
unchunked run bit for bit — not approximately. ``store_dtype='bfloat16'``
halves the store instead, casting only the stored positions (the chain state
stays f32).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_mcmc_tpu import Normal, sample


def _model(params, data):
    return (
        Normal(0.0, 10.0).log_prob(params["mu"])
        + jnp.sum(Normal(0.0, 2.0).log_prob(params["w"]))
        + jnp.sum(Normal(params["mu"] + params["w"].sum(), 1.0).log_prob(data["y"]))
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return {"y": jnp.asarray(rng.normal(1.5, 1.0, 48).astype(np.float32))}


INIT = {"mu": 0.0, "w": jnp.zeros(3)}


class TestDrawChunk:
    @pytest.mark.parametrize("kernel", ["nuts", "hmc", "metropolis", "chees"])
    def test_bit_identical_to_unchunked(self, kernel, data):
        kw = dict(
            num_warmup=60, num_chains=4, kernel=kernel, seed=11, data=data
        )
        if kernel == "nuts":
            kw["max_tree_depth"] = 5
        full = sample(_model, INIT, num_samples=50, **kw)
        chunked = sample(_model, INIT, num_samples=50, draw_chunk=20, **kw)
        for name in full.samples:
            np.testing.assert_array_equal(
                np.asarray(full.samples[name]), np.asarray(chunked.samples[name])
            )
        np.testing.assert_array_equal(
            np.asarray(full.info.accept_prob),
            np.asarray(chunked.info.accept_prob),
        )
        np.testing.assert_array_equal(
            np.asarray(full.info.is_divergent),
            np.asarray(chunked.info.is_divergent),
        )
        # host-resident store
        assert isinstance(chunked.samples["w"], np.ndarray)
        assert chunked.samples["w"].shape == (4, 50, 3)

    def test_remainder_chunk(self, data):
        kw = dict(num_warmup=40, num_chains=2, kernel="hmc", seed=0, data=data)
        full = sample(_model, INIT, num_samples=31, **kw)
        chunked = sample(_model, INIT, num_samples=31, draw_chunk=10, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.samples["mu"]), np.asarray(chunked.samples["mu"])
        )

    def test_with_thin(self, data):
        kw = dict(
            num_warmup=40, num_chains=2, kernel="hmc", seed=5, data=data, thin=3
        )
        full = sample(_model, INIT, num_samples=20, **kw)
        chunked = sample(_model, INIT, num_samples=20, draw_chunk=8, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.samples["mu"]), np.asarray(chunked.samples["mu"])
        )
        # thinned blocks aggregate divergence flags identically
        np.testing.assert_array_equal(
            np.asarray(full.info.is_divergent),
            np.asarray(chunked.info.is_divergent),
        )

    def test_chunk_larger_than_samples_is_unchunked(self, data):
        kw = dict(num_warmup=30, num_chains=2, kernel="hmc", seed=1, data=data)
        res = sample(_model, INIT, num_samples=10, draw_chunk=64, **kw)
        assert res.samples["mu"].shape == (2, 10)

    def test_invalid_chunk_rejected(self, data):
        with pytest.raises(ValueError, match="draw_chunk"):
            sample(
                _model, INIT, num_samples=10, draw_chunk=0, num_warmup=10,
                data=data,
            )

    def test_chunked_runner_cache_reused(self, data):
        from mlx_mcmc_tpu.inference.api import _RUNNER_CACHE

        kw = dict(
            num_warmup=30, num_chains=2, kernel="hmc", seed=2, data=data
        )
        sample(_model, INIT, num_samples=24, draw_chunk=10, **kw)
        n = len(_RUNNER_CACHE)
        sample(_model, INIT, num_samples=24, draw_chunk=10, seed=9,
               num_warmup=30, num_chains=2, kernel="hmc", data=data)
        assert len(_RUNNER_CACHE) == n  # second call hit the cached entry

    def test_transforms_compose_with_chunks(self, data):
        def lp(params, data):
            return (
                Normal(0.0, 10.0).log_prob(params["mu"])
                + Normal(0.0, 1.0).log_prob(jnp.log(params["sigma"]))
                + jnp.sum(
                    Normal(params["mu"], params["sigma"]).log_prob(data["y"])
                )
            )

        kw = dict(
            num_warmup=50, num_chains=2, kernel="nuts", seed=4, data=data,
            transforms={"sigma": "log"}, max_tree_depth=5,
        )
        init = {"mu": 0.0, "sigma": 1.0}
        full = sample(lp, init, num_samples=30, **kw)
        chunked = sample(lp, init, num_samples=30, draw_chunk=12, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.samples["sigma"]), np.asarray(chunked.samples["sigma"])
        )
        assert np.all(np.asarray(chunked.samples["sigma"]) > 0)


class TestChunkedResumeComposition:
    def test_resume_after_chunked_run(self, data):
        from mlx_mcmc_tpu.io import resume

        kw = dict(num_warmup=40, num_chains=2, kernel="hmc", seed=4,
                  data=data)
        full = sample(_model, INIT, num_samples=40, **kw)
        half = sample(_model, INIT, num_samples=20, draw_chunk=8, **kw)
        rest = resume(_model, half, num_samples=20, data=data)
        glued = np.concatenate(
            [np.asarray(half.samples["mu"]), np.asarray(rest.samples["mu"])],
            axis=1,
        )
        np.testing.assert_array_equal(np.asarray(full.samples["mu"]), glued)


class TestStoreDtype:
    def test_bf16_store_rounds_only_storage(self, data):
        kw = dict(
            num_warmup=60, num_chains=4, kernel="nuts", seed=7,
            max_tree_depth=5, data=data,
        )
        f32 = sample(_model, INIT, num_samples=50, **kw)
        bf16 = sample(_model, INIT, num_samples=50, store_dtype="bfloat16", **kw)
        a = np.asarray(f32.samples["mu"])
        b = np.asarray(bf16.samples["mu"].astype(jnp.float32))
        assert bf16.samples["mu"].dtype == jnp.bfloat16
        # identical chains, draws only rounded at storage: bf16 relative
        # rounding is 2^-8
        assert np.max(np.abs(a - b)) <= np.max(np.abs(a)) * 2.0**-7
        # the chain itself advanced in f32: diagnostics match exactly
        np.testing.assert_array_equal(
            np.asarray(f32.info.num_integration_steps),
            np.asarray(bf16.info.num_integration_steps),
        )

    def test_bf16_store_composes_with_chunks(self, data):
        kw = dict(
            num_warmup=40, num_chains=2, kernel="hmc", seed=3, data=data,
            store_dtype="bfloat16",
        )
        full = sample(_model, INIT, num_samples=30, **kw)
        chunked = sample(_model, INIT, num_samples=30, draw_chunk=11, **kw)
        np.testing.assert_array_equal(
            np.asarray(full.samples["mu"].astype(jnp.float32)),
            np.asarray(chunked.samples["mu"].astype(np.float32)),
        )
