"""Example 14: draws beyond HBM (chunked storage) and bit-exact
post-warmup resume (beyond the reference — it accumulates draws in Python
lists and cannot resume at all, SURVEY.md §5.4, mlx_mcmc/kernels/nuts.py:60).

Three production mechanisms on one model:

1. ``sample(draw_chunk=k)`` scans the sampling phase in chunks, fetching
   each chunk to host RAM before the next runs — the full (chains, draws,
   D) store never has to fit device HBM, so draw counts are bounded by
   host memory. Draws are BIT-IDENTICAL to the unchunked run (every step
   is keyed by its global index).
2. ``store_dtype='bfloat16'`` halves the draw store instead (the chain
   itself still advances in f32; only stored draws are rounded).
3. ``resume()`` on an int-seeded run continues the sampling scan at the
   stored global offset with the original chain keys: running 500 draws,
   checkpointing, and resuming 500 more equals one uninterrupted
   1000-draw run, draw for draw.
"""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import Normal, sample
from mlx_mcmc_tpu.io import resume, save_checkpoint


def main():
    print("=" * 70)
    print("Example 14: chunked draw storage + bit-exact sampling resume")
    print("=" * 70)

    rng = np.random.default_rng(42)
    data = {"y": jnp.asarray(rng.normal(5.0, 2.0, 200).astype(np.float32))}

    def log_prob(params, data):
        return (
            Normal(0, 10).log_prob(params["mu"])
            + Normal(0, 1).log_prob(jnp.log(params["sigma"]))
            + jnp.sum(
                Normal(params["mu"], params["sigma"]).log_prob(data["y"])
            )
        )

    settings = dict(
        num_chains=32, num_warmup=500, kernel="nuts", seed=42, data=data,
        transforms={"sigma": "log"},
    )
    init = {"mu": 0.0, "sigma": 1.0}

    # -- 1. chunked == unchunked, bit for bit -----------------------------
    full = sample(log_prob, init, num_samples=1000, **settings)
    chunked = sample(log_prob, init, num_samples=1000, draw_chunk=250,
                     **settings)
    same = np.array_equal(
        np.asarray(full.samples["mu"]), np.asarray(chunked.samples["mu"])
    )
    print(f"\n1) draw_chunk=250 vs unchunked: bit-identical = {same}")
    print(f"   chunked store lives on host: {type(chunked.samples['mu'])}")

    # -- 2. bf16 draw store ------------------------------------------------
    bf16 = sample(log_prob, init, num_samples=1000,
                  store_dtype="bfloat16", **settings)
    drift = float(np.max(np.abs(
        np.asarray(bf16.samples["mu"].astype(jnp.float32))
        - np.asarray(full.samples["mu"])
    )))
    print(f"\n2) bf16 store: dtype={bf16.samples['mu'].dtype}, "
          f"max storage rounding = {drift:.2e} (chain identical, f32)")

    # -- 3. bit-exact post-warmup resume ----------------------------------
    half = sample(log_prob, init, num_samples=500, **settings)
    path = os.path.join(tempfile.mkdtemp(), "half.npz")
    save_checkpoint(path, half)
    rest = resume(log_prob, path, num_samples=500, data=data,
                  transforms={"sigma": "log"})
    glued = np.concatenate(
        [np.asarray(half.samples["mu"]), np.asarray(rest.samples["mu"])],
        axis=1,
    )
    same2 = np.array_equal(glued, np.asarray(full.samples["mu"]))
    print(f"\n3) 500 draws -> checkpoint -> resume 500 == one 1000-draw "
          f"run: {same2}")

    mu = np.asarray(full.samples["mu"]).mean()
    sigma = np.asarray(full.samples["sigma"]).mean()
    print(f"\nposterior: mu = {mu:.3f}, sigma = {sigma:.3f} "
          f"(sample moments {np.asarray(data['y']).mean():.3f}, "
          f"{np.asarray(data['y']).std():.3f})")
    assert same and same2
    print("\n✅ example 14 complete")


if __name__ == "__main__":
    main()
