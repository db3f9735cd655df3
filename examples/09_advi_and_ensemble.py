"""Example 09: ADVI and the ensemble sampler (both beyond the reference).

Three ways to attack the same correlated posterior:
1. `fit_advi` — compiled mean-field VI: fastest, approximate (mean-field
   underestimates correlated variances by construction).
2. `sample_ensemble` — affine-invariant stretch move: gradient-free AND
   tuning-free; correlation costs it nothing.
3. `sample(..., init_strategy='advi')` — NUTS warm-started from the fitted
   q (chain starts + initial mass matrix): exact draws, shorter warmup.
"""

import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import Normal, fit_advi, sample, sample_ensemble


def main():
    print("=" * 70)
    print("Example 09: ADVI + ensemble sampler on a correlated Gaussian")
    print("=" * 70)

    rho = 0.9
    cov = np.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def log_prob(params):
        x = params["x"]
        return -0.5 * x @ prec @ x + jnp.sum(Normal(0.0, 10.0).log_prob(x)) * 0

    init = {"x": jnp.zeros(2)}

    # 1. ADVI ---------------------------------------------------------------
    advi = fit_advi(log_prob, init, num_steps=1500, seed=0)
    q_draws = np.asarray(advi.sample_posterior(seed=1, num_samples=4000)["x"])
    print(f"\nADVI        final ELBO {advi.elbo:+.3f}")
    print(f"  q std        {q_draws.std(axis=0).round(3)}  (true 1.0 — mean-field"
          " shrinks under correlation)")

    # 2. Ensemble -----------------------------------------------------------
    ens = sample_ensemble(
        log_prob, init, num_walkers=64, num_samples=1000, num_warmup=500, seed=0
    )
    e_draws = np.asarray(ens.samples["x"]).reshape(-1, 2)
    print(f"\nEnsemble    accept rate {ens.acceptance_rate:.2f}")
    print(f"  std          {e_draws.std(axis=0).round(3)}")
    print(f"  corr         {np.corrcoef(e_draws.T)[0, 1]:.3f}  (true {rho})")

    # 3. NUTS with ADVI warm start -------------------------------------------
    res = sample(
        log_prob, init, num_samples=500, num_warmup=300, num_chains=4,
        kernel="nuts", seed=0, init_strategy="advi",
    )
    n_draws = np.asarray(res.samples["x"]).reshape(-1, 2)
    print(f"\nNUTS(advi)  divergences {res.divergences}")
    print(f"  std          {n_draws.std(axis=0).round(3)}")
    print(f"  corr         {np.corrcoef(n_draws.T)[0, 1]:.3f}")
    print("\n✅ example 09 complete")


if __name__ == "__main__":
    main()
