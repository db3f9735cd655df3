"""Scaling-efficiency harness tests (BASELINE.md >=90% linear-scaling target:
this rehearses the measurement itself on the virtual CPU mesh)."""

import sys

import jax
import pytest

sys.path.insert(0, "benchmarks")


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


def test_measure_scaling_reports_efficiency(eight_devices):
    from scaling import measure_scaling

    rows = measure_scaling(
        [1, 2],
        chains_per_shard=2,
        num_warmup=30,
        num_samples=30,
        kernel="hmc",
    )
    assert [r["shards"] for r in rows] == [1, 2]
    assert rows[0]["efficiency"] == 1.0
    for r in rows:
        assert r["num_chains"] == 2 * r["shards"]
        assert r["min_ess"] > 0
        assert r["ess_per_sec"] > 0
        assert r["wall_seconds"] > 0


def test_measure_scaling_rejects_oversubscription(eight_devices):
    from scaling import measure_scaling

    with pytest.raises(ValueError, match="exceeds"):
        measure_scaling([16], num_warmup=2, num_samples=2)
