"""Example 02: Metropolis-Hastings vs HMC on the same model.

Port of reference examples/02_hmc_comparison.py (same scenario: seed 42,
mu=5.0, sigma=2.0, n=100). Compares acceptance rates and effective sample
sizes — the reference's measured numbers for this comparison are
PROGRESS.md:76-84 (MH 68% accept / HMC ~100%; ESS 208 vs 264 per 5000).
"""

import numpy as np
import jax.numpy as jnp

from mlx_mcmc_tpu import MCMC, HalfNormal, Normal
from mlx_mcmc_tpu.diagnostics import effective_sample_size


def main():
    print("=" * 70)
    print("Example 02: Metropolis-Hastings vs HMC")
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

    results = {}
    for method, kwargs in [
        ("metropolis", dict(proposal_scale=0.15)),
        ("hmc", dict(step_size=0.1, num_leapfrog_steps=10)),
    ]:
        mcmc = MCMC(log_prob)
        mcmc.run(
            {"mu": 0.0, "sigma": 1.0},
            num_samples=5000,
            num_warmup=1000,
            method=method,
            verbose=False,
            **kwargs,
        )
        ess = {
            k: float(effective_sample_size(v))
            for k, v in mcmc.result.to_numpy().items()
        }
        results[method] = (mcmc.acceptance_rate, ess)
        print(f"\n{method.upper():12s} accept={mcmc.acceptance_rate:6.2%} "
              f"ESS(mu)={ess['mu']:7.0f}  ESS(sigma)={ess['sigma']:7.0f}")
        mcmc.print_summary()

    mh_ess = results["metropolis"][1]["mu"]
    hmc_ess = results["hmc"][1]["mu"]
    print(f"\nHMC ESS gain over MH (mu): {hmc_ess / mh_ess:.1f}x")
    print("\n✅ Example 02 complete.")


if __name__ == "__main__":
    main()
