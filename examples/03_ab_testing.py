"""Example 03: Bayesian A/B testing with Beta-Bernoulli conversions.

Port of reference examples/03_ab_testing.py (same scenario: seed 42,
n=1000 per arm, true p_A=0.12, p_B=0.15; Beta(1,1) priors and the
Beta(k+1, n-k+1) conjugate-likelihood formulation).
"""

import numpy as np
import jax.numpy as jnp

from mlx_mcmc_tpu import MCMC, Beta
from examples._plotting import maybe_plot_trace


def main():
    print("=" * 70)
    print("Example 03: Bayesian A/B Testing")
    print("=" * 70)

    np.random.seed(42)
    n_A = n_B = 1000
    true_p_A, true_p_B = 0.12, 0.15
    conv_A = int(np.random.binomial(n_A, true_p_A))
    conv_B = int(np.random.binomial(n_B, true_p_B))
    print(f"  A: {conv_A}/{n_A} conversions;  B: {conv_B}/{n_B} conversions")

    def log_prob(params):
        p_A, p_B = params["p_A"], params["p_B"]
        lp = Beta(1, 1).log_prob(p_A) + Beta(1, 1).log_prob(p_B)
        lp += Beta(conv_A + 1, n_A - conv_A + 1).log_prob(p_A)
        lp += Beta(conv_B + 1, n_B - conv_B + 1).log_prob(p_B)
        return lp

    mcmc = MCMC(log_prob)
    samples = mcmc.run(
        {"p_A": 0.1, "p_B": 0.1},
        num_samples=5000,
        num_warmup=1000,
        method="metropolis",
        proposal_scale=0.02,
        num_chains=4,
        verbose=False,
    )
    mcmc.print_summary()

    diff = samples["p_B"] - samples["p_A"]
    p_b_better = float((diff > 0).mean())
    print(f"\n  P(B > A) = {p_b_better:.3f}")
    print(f"  Expected lift: {diff.mean():.4f} "
          f"[{np.percentile(diff, 2.5):.4f}, {np.percentile(diff, 97.5):.4f}]")

    assert abs(samples["p_A"].mean() - conv_A / n_A) < 0.02
    assert abs(samples["p_B"].mean() - conv_B / n_B) < 0.02
    maybe_plot_trace(samples, {"p_A": true_p_A, "p_B": true_p_B}, "03_ab_testing")
    print("\n✅ Example 03 complete: posterior conversion rates recovered.")


if __name__ == "__main__":
    main()
