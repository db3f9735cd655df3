"""Example 10: observation-sharded likelihood on a 2-D mesh (beyond the
reference — its README names a 100-param/10K-obs workload it cannot shard,
README.md:105-113).

The dataset shards over a 'data' mesh axis; every gradient and energy
evaluation psums the shard-local log-likelihood contributions, so datasets
larger than one chip's HBM sample exactly like replicated ones. The model
contract: ``log_prob(params, data)`` returns the shard-LOCAL likelihood sum,
and the prior moves to ``log_prior_fn`` so it is counted once.

On a CPU host, set XLA_FLAGS=--xla_force_host_platform_device_count=8 for a
virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import Normal
from mlx_mcmc_tpu.models import make_logistic_regression
from mlx_mcmc_tpu.parallel import data_chain_mesh, sample_sharded


def main():
    print("=" * 70)
    print("Example 10: observation-sharded logistic regression (HMC)")
    print("=" * 70)
    n_dev = len(jax.devices())
    chains_ax = max(n_dev // 2, 1)
    data_ax = n_dev // chains_ax
    mesh = data_chain_mesh(chains_ax, data_ax)
    print(f"  mesh: {chains_ax} chain-shards x {data_ax} data-shards")

    spec = make_logistic_regression(num_features=16, num_obs=4096, seed=0)

    def local_loglik(params, data):
        s = jnp.dot(data["X"], params["beta"], preferred_element_type=jnp.float32)
        return jnp.sum(data["y"] * s - jax.nn.softplus(s))

    def log_prior(params):
        return jnp.sum(Normal(0.0, 1.0).log_prob(params["beta"]))

    result = sample_sharded(
        local_loglik,
        spec.initial_params,
        mesh=mesh,
        data={"X": spec.X, "y": spec.y},   # leading axes shard over 'data'
        data_axis="data",
        log_prior_fn=log_prior,
        num_samples=500,
        num_warmup=500,
        num_chains=2 * chains_ax,
        kernel="hmc",                      # static schedule: psum count equal
        seed=0,                            # on every device (NUTS is rejected)
    )

    beta = np.asarray(result.samples["beta"]).reshape(-1, 16)
    err = np.abs(beta.mean(axis=0) - np.asarray(spec.true_beta))
    print(f"  posterior mean |error| vs truth: max {err.max():.3f}, "
          f"mean {err.mean():.3f}")
    print(f"  acceptance rate: {result.acceptance_rate:.3f}")
    print("  OK: data-sharded posterior recovered the coefficients")


if __name__ == "__main__":
    main()
