"""Flagship benchmark: NUTS effective samples/sec/chip on the 100-param GLM.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ess/s", "vs_baseline": N}

Baseline derivation (see BASELINE.md — the reference publishes no rigorous
numbers): the reference's claimed medium-model wall time (100 params,
10K obs) is 120 s on M3 Pro CPU (README.md:105-113) for a standard
1000-draw run; its measured ESS fraction is ~5.3% (PROGRESS.md:80-82,
264/5000), giving ~53 effective samples / 120 s ~= 0.44 ess/s. That number
is what `vs_baseline` divides by.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from mlx_mcmc_tpu import sample
    from mlx_mcmc_tpu.diagnostics import effective_sample_size
    from mlx_mcmc_tpu.models import make_logistic_regression

    num_chains = 64
    num_warmup = 500
    num_samples = 500

    spec = make_logistic_regression(num_features=100, num_obs=10_000, seed=0)

    def run(seed):
        return sample(
            spec.log_prob,
            spec.initial_params,
            num_samples=num_samples,
            num_warmup=num_warmup,
            num_chains=num_chains,
            kernel="nuts",
            seed=seed,
            max_tree_depth=8,
            target_accept=0.8,
        )

    # Warm the compile cache, then time a fresh run end-to-end (warmup +
    # sampling; ESS counted over post-warmup draws only).
    result = run(0)
    np.asarray(result.samples["beta"]).ravel()[0]  # force completion

    t0 = time.time()
    result = run(1)
    draws = np.asarray(result.samples["beta"])  # (chains, draws, 100)
    wall = time.time() - t0

    ess = effective_sample_size(draws)  # (100,)
    min_ess = float(np.min(ess))
    ess_per_sec = min_ess / wall

    baseline = 0.44  # ess/s, reference-implied (see module docstring)
    print(
        json.dumps(
            {
                "metric": "min-ESS/sec/chip, NUTS 100-param logistic GLM (10K obs, 64 chains)",
                "value": round(ess_per_sec, 2),
                "unit": "ess/s",
                "vs_baseline": round(ess_per_sec / baseline, 1),
                "detail": {
                    "wall_seconds": round(wall, 2),
                    "min_ess": round(min_ess, 1),
                    "median_ess": round(float(np.median(ess)), 1),
                    "divergences": result.divergences,
                    "mean_accept": round(
                        float(np.asarray(result.info.accept_prob).mean()), 3
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
