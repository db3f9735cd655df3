"""Example 04: event-rate estimation with Gamma prior / Exponential likelihood.

Port of reference examples/04_event_rates.py (same scenario: seed 42,
true rate 3.0, n=50 waiting times, Gamma(2,1) prior). The likelihood is one
vectorized Exponential log_prob over all waiting times (the reference loops
per observation, examples/04:51-53); the Gamma-conjugate analytic posterior
Gamma(2 + n, 1 + sum(t)) provides an exact check.
"""

import numpy as np
import jax.numpy as jnp

from mlx_mcmc_tpu import MCMC, Exponential, Gamma
from examples._plotting import maybe_plot_trace


def main():
    print("=" * 70)
    print("Example 04: Event Rate Estimation (Gamma/Exponential)")
    print("=" * 70)

    np.random.seed(42)
    true_rate, n_events = 3.0, 50
    waiting = np.random.exponential(scale=1 / true_rate, size=n_events)
    data = jnp.asarray(waiting.astype(np.float32))
    print(f"  True rate={true_rate}; observed mean waiting time "
          f"{waiting.mean():.3f} (n={n_events})")

    def log_prob(params):
        rate = params["rate"]
        return Gamma(2.0, 1.0).log_prob(rate) + jnp.sum(
            Exponential(rate).log_prob(data)
        )

    mcmc = MCMC(log_prob)
    samples = mcmc.run(
        {"rate": 2.0},
        num_samples=5000,
        num_warmup=1000,
        method="nuts",
        num_chains=4,
        verbose=False,
    )
    mcmc.print_summary()

    # Conjugacy: posterior is Gamma(2 + n, 1 + sum t).
    post = Gamma(2.0 + n_events, 1.0 + float(waiting.sum()))
    print(f"\n  Analytic posterior mean {float(post.mean()):.3f}, "
          f"sd {float(post.variance())**0.5:.3f}")
    assert abs(samples["rate"].mean() - float(post.mean())) < 0.05
    assert abs(samples["rate"].std() - float(post.variance()) ** 0.5) < 0.05
    maybe_plot_trace(samples, {"rate": true_rate}, "04_event_rates")
    print("\n✅ Example 04 complete: matches the conjugate analytic posterior.")


if __name__ == "__main__":
    main()
