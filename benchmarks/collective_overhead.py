"""Isolate cross-shard COLLECTIVE cost from host oversubscription.

Motivation (VERDICT r3 #3): this host has 2 physical cores, so an 8-shard
virtual-CPU weak-scaling run oversubscribes 4x and its efficiency column
measures host contention, not collectives. This harness measures the thing
the north star actually depends on — the per-warmup-step cost of the
cross-shard adaptation collectives — with a subtraction design where the
oversubscription cancels:

  same TOTAL chains C, same model, HMC with a FIXED leapfrog count (so the
  integration work is identical in every cell, unlike NUTS whose tree sizes
  respond to the adapted step size):

    t(layout, adapt)  for  layout in {vmap, 2/4/8-shard shard_map}
                      and  adapt in {ON, OFF}

  - adapt ON  runs the engine's pooled adaptation: a pmean'd accept
    statistic every step plus the exact psum Welford merge in slow windows
    (inference/engine.py:_welford_pmean_reduce) — on a sharded layout these
    are real cross-device collectives; under vmap the same ARITHMETIC runs
    with no collectives.
  - adapt OFF runs zero adaptation arithmetic and zero collectives.

  collective_ms_per_step(N) = [t(N, ON) - t(N, OFF)] - [t(vmap, ON) - t(vmap, OFF)]

  The inner subtractions cancel each layout's integration + dispatch cost
  (including oversubscription — both cells run the same FLOPs on the same
  cores); the outer subtraction removes the adaptation arithmetic itself,
  leaving the collectives' marginal cost.

Per-step times come from a two-length slope ((wall_long - wall_short) /
(steps_long - steps_short)), cancelling per-call fixed costs (step-size
probe, init, dispatch ramp).

Usage (CPU, 8 virtual devices — run as a subprocess, platform selection
must precede first backend use):
    python benchmarks/collective_overhead.py
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force_cpu():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")


def measure(total_chains: int = 32, steps=(120, 420), seed: int = 0) -> dict:
    import jax
    import numpy as np

    from mlx_mcmc_tpu import sample
    from mlx_mcmc_tpu.models import make_hierarchical_normal
    from mlx_mcmc_tpu.parallel import chain_mesh, sample_sharded

    spec = make_hierarchical_normal(num_groups=100, obs_per_group=10, seed=0)
    short, long_ = steps

    def run(n_shards, adapt, num_warmup):
        kw = dict(
            num_samples=1,
            num_warmup=num_warmup,
            num_chains=total_chains,
            kernel="hmc",
            num_leapfrog_steps=16,
            seed=seed,
            adapt_step_size=adapt,
            adapt_mass_matrix=adapt,
            step_size=0.05 if not adapt else "auto",
        )
        if n_shards == 0:
            return sample(spec.log_prob, spec.initial_params, **kw)
        return sample_sharded(
            spec.log_prob, spec.initial_params,
            mesh=chain_mesh(num_devices=n_shards), **kw,
        )

    def per_step_ms(n_shards, adapt):
        walls = {}
        for w in (short, long_):
            run(n_shards, adapt, w)  # compile + warm (runner cache)
            t0 = time.time()
            r = run(n_shards, adapt, w)
            np.asarray(next(iter(r.samples.values())))  # fetch = sync
            walls[w] = time.time() - t0
        return 1e3 * (walls[long_] - walls[short]) / (long_ - short)

    layouts = {"vmap": 0, "shard2": 2, "shard4": 4, "shard8": 8}
    grid = {}
    for name, n in layouts.items():
        grid[name] = {
            "on_ms_per_step": round(per_step_ms(n, True), 4),
            "off_ms_per_step": round(per_step_ms(n, False), 4),
        }
        grid[name]["adapt_delta_ms"] = round(
            grid[name]["on_ms_per_step"] - grid[name]["off_ms_per_step"], 4
        )
        print(name, grid[name], flush=True)

    base_delta = grid["vmap"]["adapt_delta_ms"]
    for name in ("shard2", "shard4", "shard8"):
        grid[name]["collective_ms_per_step"] = round(
            grid[name]["adapt_delta_ms"] - base_delta, 4
        )
        grid[name]["sharding_dispatch_ms_per_step"] = round(
            grid[name]["off_ms_per_step"] - grid["vmap"]["off_ms_per_step"], 4
        )

    return {
        "design": (
            "HMC(16 leapfrogs) hier100, 32 total chains on every layout; "
            "per-step ms from a two-length slope (120 vs 420 warmup steps). "
            "collective_ms_per_step = (on-off)[shardN] - (on-off)[vmap]: "
            "integration, dispatch and 2-core oversubscription cancel in "
            "the subtractions, isolating the cross-shard pmean+psum cost."
        ),
        "collectives_per_warmup_step": (
            "1 scalar pmean (pooled accept) every step; 3 psums of (D,) "
            "Welford moments per step inside slow windows; 2 (D,) pmeans "
            "at window ends"
        ),
        "grid": grid,
        "interpretation": (
            "If the grid's collective_ms_per_step values are non-monotone "
            "and of both signs across shard counts, the collective cost is "
            "below the host's measurement noise floor - report that, not "
            "a point estimate."
        ),
        "prediction": (
            "On real v5e ICI the same collectives are 1 scalar + a few "
            "(1000,)-element reductions per warmup step — single-digit "
            "microseconds at ICI latency/bandwidth, i.e. <1% of a "
            "multi-ms leapfrog step at production shapes. The measured "
            "virtual-mesh collective_ms_per_step is an XLA-CPU emulation "
            "cost, reported to bound the HARNESS overhead, not ICI."
        ),
    }


def main():
    _force_cpu()
    out = measure()
    path = sys.argv[1] if len(sys.argv) > 1 else None
    blob = json.dumps(out, indent=1)
    if path:
        with open(path, "w") as f:
            f.write(blob)
    print(blob)


if __name__ == "__main__":
    main()
