"""Example 05: categorical outcome probabilities (product choice shares).

Port of reference examples/05_categorical_model.py (same scenario: seed 42,
true probs (0.5, 0.3, 0.2), n=300 choices). The reference parameterizes raw
probabilities with host-side simplex checks and rebuilds a Categorical per
observation (examples/05:57-72); here the simplex is handled properly with a
softmax (logit) parameterization — fully traced, no per-observation loop:
the whole likelihood is one gather via counts.
"""

import numpy as np
import jax.numpy as jnp

from mlx_mcmc_tpu import MCMC, Categorical, Normal


def main():
    print("=" * 70)
    print("Example 05: Categorical Model (choice shares)")
    print("=" * 70)

    np.random.seed(42)
    true_probs = np.array([0.5, 0.3, 0.2])
    n_customers = 300
    choices = np.random.choice(3, size=n_customers, p=true_probs)
    counts = jnp.asarray(np.bincount(choices, minlength=3).astype(np.float32))
    print(f"  Observed counts: {np.asarray(counts)} / {n_customers}")

    def log_prob(params):
        # Unconstrained logits with the last pinned to 0 for identifiability.
        logits = jnp.concatenate([params["logits"], jnp.zeros(1)])
        lp = jnp.sum(Normal(0.0, 5.0).log_prob(params["logits"]))
        cat = Categorical(logits=logits)
        # Multinomial likelihood: sum_k counts_k * log p_k.
        return lp + jnp.sum(counts * cat.log_prob(jnp.arange(3)))

    mcmc = MCMC(log_prob)
    mcmc.run(
        {"logits": jnp.zeros(2)},
        num_samples=5000,
        num_warmup=1000,
        method="nuts",
        num_chains=4,
        verbose=False,
    )
    mcmc.print_summary()

    draws = mcmc.result.to_numpy()["logits"].reshape(-1, 2)
    full = np.concatenate([draws, np.zeros((draws.shape[0], 1))], axis=1)
    probs = np.exp(full) / np.exp(full).sum(axis=1, keepdims=True)
    est = probs.mean(axis=0)
    obs_freq = np.asarray(counts) / n_customers
    print("\n  Posterior mean shares vs observed frequencies vs truth:")
    for i in range(3):
        print(f"    p{i + 1}: {est[i]:.3f}  vs  {obs_freq[i]:.3f}  vs  "
              f"{true_probs[i]:.3f}")
    assert np.all(np.abs(est - obs_freq) < 0.03)
    print("\n✅ Example 05 complete: choice shares recovered.")


if __name__ == "__main__":
    main()
