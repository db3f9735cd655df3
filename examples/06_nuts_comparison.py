"""Example 06: NUTS vs HMC efficiency comparison.

Port of reference examples/06_nuts_comparison.py (same scenario: seed 42,
mu=5.0, sigma=2.0, n=100; 1000 warmup + 2000 draws). Reports wall time,
gradient-evaluation counts (exact, from the sampler's own counters — the
reference estimates them with a hardcoded ~4 grads/iter, examples/06:170-171)
and ESS per gradient.
"""

import time

import numpy as np
import jax.numpy as jnp

from mlx_mcmc_tpu import HalfNormal, Normal, sample
from mlx_mcmc_tpu.diagnostics import effective_sample_size


def main():
    print("=" * 70)
    print("Example 06: NUTS vs HMC")
    print("=" * 70)

    np.random.seed(42)
    data = jnp.asarray(np.random.normal(5.0, 2.0, 100).astype(np.float32))

    def log_prob(params):
        mu, sigma = params["mu"], params["sigma"]
        return (
            Normal(0, 10).log_prob(mu)
            + HalfNormal(5).log_prob(sigma)
            + jnp.sum(Normal(mu, sigma).log_prob(data))
        )

    for kernel, kwargs in [
        ("hmc", dict(num_leapfrog_steps=10)),
        ("nuts", dict(max_tree_depth=10)),
    ]:
        t0 = time.time()
        res = sample(
            log_prob,
            {"mu": 0.0, "sigma": 1.0},
            num_samples=2000,
            num_warmup=1000,
            num_chains=4,
            kernel=kernel,
            seed=0,
            **kwargs,
        )
        wall = time.time() - t0
        grads = int(np.asarray(res.info.num_integration_steps).sum())
        ess_mu = float(effective_sample_size(np.asarray(res.samples["mu"])))
        print(f"\n{kernel.upper():6s} wall={wall:6.2f}s  accept={res.acceptance_rate:.2%}  "
              f"grad evals={grads}  ESS(mu)={ess_mu:.0f}  "
              f"ESS/grad={ess_mu / max(grads, 1):.4f}")
        if kernel == "nuts":
            depths = np.asarray(res.info.tree_depth)
            print(f"       mean tree depth={depths.mean():.2f}  "
                  f"max={depths.max()}")

    print("\n✅ Example 06 complete.")


if __name__ == "__main__":
    main()
