"""Example 13: parameter sweeps and seed replication ride the runner cache.

The reference re-runs its whole Python sampling loop for every dataset and
seed (mlx_mcmc/inference/mcmc.py:60-101 — cost scales with draws x chains per
call). Here the first `sample()` call traces and compiles the full
warmup+sampling program ONCE; every later call with the same model structure
— new dataset via `data=`, new seed, even a new chain count — reuses it and
pays only device time. That turns a K-dataset sensitivity sweep or an
R-replication reproducibility study into K (or R) device-bound runs after a
single compile.

The pattern below is the canonical one: a binary model `log_prob(params,
data)`, the dataset always passed as the runtime `data=` argument (never
captured in the closure), one `sample()` call per dataset/seed.
"""

import time

import numpy as np
import jax.numpy as jnp

from mlx_mcmc_tpu import Normal, sample


def log_prob(params, data):
    # Bayesian simple linear regression: y ~ N(a + b*x, sigma_known)
    a, b = params["a"], params["b"]
    resid = data["y"] - (a + b * data["x"])
    return (
        Normal(0.0, 10.0).log_prob(a)
        + Normal(0.0, 10.0).log_prob(b)
        + jnp.sum(Normal(0.0, 1.0).log_prob(resid))
    )


def make_dataset(slope, seed, n=200):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2.0, 2.0, n).astype(np.float32)
    y = (1.0 + slope * x + rng.normal(0.0, 1.0, n)).astype(np.float32)
    return {"x": jnp.asarray(x), "y": jnp.asarray(y)}


def main():
    print("=" * 70)
    print("Example 13: Parameter sweep over datasets (compiled-runner cache)")
    print("=" * 70)

    slopes = [-1.0, -0.5, 0.0, 0.5, 1.0, 2.0]
    init = {"a": 0.0, "b": 0.0}
    walls = []
    for i, slope in enumerate(slopes):
        data = make_dataset(slope, seed=i)
        t0 = time.time()
        res = sample(
            log_prob, init, data=data,
            num_samples=500, num_warmup=500, num_chains=32,
            kernel="nuts", seed=i,
        )
        b_hat = float(np.mean(np.asarray(res.samples["b"])))
        walls.append(time.time() - t0)
        tag = "compile+run" if i == 0 else "cached     "
        print(f"  slope {slope:+.1f}: posterior b = {b_hat:+.3f}  "
              f"({tag} {walls[-1]:.2f}s)")
        assert abs(b_hat - slope) < 0.25, (slope, b_hat)

    # Seed replication: same dataset, R seeds — all cached.
    data = make_dataset(1.0, seed=99)
    reps = [
        float(np.mean(np.asarray(
            sample(log_prob, init, data=data, num_samples=500,
                   num_warmup=500, num_chains=32, kernel="nuts",
                   seed=r).samples["b"]
        )))
        for r in range(4)
    ]
    spread = max(reps) - min(reps)
    print(f"  4-seed replication of b: {[round(r, 3) for r in reps]} "
          f"(spread {spread:.3f})")
    assert spread < 0.1

    print(f"  first call {walls[0]:.2f}s; later calls "
          f"median {np.median(walls[1:]):.2f}s — the sweep pays one compile.")
    assert np.median(walls[1:]) < walls[0]
    print("OK")


if __name__ == "__main__":
    main()
