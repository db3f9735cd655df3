"""Example 07: chains sharded across a device mesh (beyond the reference).

Runs 8x-the-devices NUTS chains sharded over all available devices with
collective warmup adaptation, and computes R-hat/ESS *on device* with
psum/pmean collectives — only the thin statistics cross the host boundary.

On a CPU host, set XLA_FLAGS=--xla_force_host_platform_device_count=8 to get
a virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu import HalfNormal, Normal
from mlx_mcmc_tpu.parallel import chain_mesh, sample_sharded


def main():
    print("=" * 70)
    print("Example 07: Mesh-sharded chains with collective adaptation")
    print("=" * 70)
    devices = jax.devices()
    print(f"  devices: {len(devices)} x {devices[0].platform}")

    np.random.seed(42)
    data = jnp.asarray(np.random.normal(5.0, 2.0, 100).astype(np.float32))

    def log_prob(params):
        mu, sigma = params["mu"], params["sigma"]
        return (
            Normal(0, 10).log_prob(mu)
            + HalfNormal(5).log_prob(sigma)
            + jnp.sum(Normal(mu, sigma).log_prob(data))
        )

    num_chains = 8 * len(devices)
    result = sample_sharded(
        log_prob,
        {"mu": 0.0, "sigma": 1.0},
        num_samples=1000,
        num_warmup=1000,
        num_chains=num_chains,
        kernel="nuts",
        seed=0,
        mesh=chain_mesh(),
        device_diagnostics=True,
    )

    print(f"\n  {num_chains} chains sharded over {len(devices)} devices")
    print(f"  acceptance: {result.acceptance_rate:.2%}  "
          f"divergences: {result.divergences}")
    print(f"  shared adapted step size: {float(result.tunables.step_size):.4f}")
    print("  on-device diagnostics (flat dims = [mu, sigma]):")
    print(f"    r_hat: {np.asarray(result.device_stats['r_hat'])}")
    print(f"    n_eff: {np.asarray(result.device_stats['n_eff'])}")

    mu = np.asarray(result.samples["mu"]).ravel()
    assert abs(mu.mean() - float(data.mean())) < 0.2
    assert np.all(np.asarray(result.device_stats["r_hat"]) < 1.05)
    print("\n✅ Example 07 complete: sharded posterior matches, R-hat clean.")


if __name__ == "__main__":
    main()
