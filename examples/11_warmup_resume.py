"""Example 11: mid-warmup checkpoint/resume, bit-identical (beyond the
reference — it keeps all state in Python locals and cannot resume at all,
SURVEY.md §5.4).

A long warmup is interrupted at step 400, checkpointed to disk, reloaded, and
finished. Because per-step RNG is keyed by the global step index and the
warmup schedule is static, the resumed run's draws are bit-for-bit identical
to an uninterrupted run with the same seed.
"""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import Normal, sample
from mlx_mcmc_tpu.io import load_checkpoint, resume_warmup, run_warmup, save_checkpoint


def main():
    print("=" * 70)
    print("Example 11: mid-warmup checkpoint/resume")
    print("=" * 70)

    np.random.seed(42)
    data = jnp.asarray(np.random.normal(5.0, 2.0, 100).astype(np.float32))

    def log_prob(params):
        return (
            Normal(0, 10).log_prob(params["mu"])
            + jnp.sum(Normal(params["mu"], 2.0).log_prob(data))
        )

    settings = dict(num_chains=8, kernel="nuts", seed=42)

    # Uninterrupted reference run.
    full = sample(log_prob, {"mu": 0.0}, num_warmup=1000, num_samples=500,
                  **settings)

    # Interrupted: warmup [0, 400) -> disk -> finish warmup + sample.
    ckpt = run_warmup(log_prob, {"mu": 0.0}, num_warmup=1000, stop=400,
                      **settings)
    path = os.path.join(tempfile.mkdtemp(), "warmup.npz")
    save_checkpoint(path, ckpt)
    print(f"  checkpoint at warmup step {ckpt['warmup_step']}/1000 -> {path}")

    resumed = resume_warmup(log_prob, load_checkpoint(path), num_samples=500)

    same = np.array_equal(
        np.asarray(full.samples["mu"]), np.asarray(resumed.samples["mu"])
    )
    print(f"  resumed draws identical to uninterrupted run: {same}")
    print(f"  posterior mean: {np.asarray(resumed.samples['mu']).mean():.4f} "
          f"(truth ~ {float(data.mean()):.4f})")
    assert same
    print("  OK: interrupted-at-400 == uninterrupted, bit for bit")


if __name__ == "__main__":
    main()
