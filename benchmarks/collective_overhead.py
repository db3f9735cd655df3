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


def measure_repeated(
    n_reps: int = 24, total_chains: int = 32, steps=(120, 420), seed: int = 0
) -> dict:
    """VERDICT r4 #5: the 4-layout grid's single-shot subtraction bounced
    −0.09…+0.41 ms with no trend — below its own noise floor. This design
    repeats the subtraction N>=20 times on the ONLY layout pair that does
    not oversubscribe the 2-core host (vmap vs 2 shards on 2 devices) and
    reports median ± IQR, which resolves whether the cross-shard pmean+psum
    cost is a real positive number or statistically zero at this shape.

    Compilation happens once (runner cache); each rep then times the four
    cells (vmap/shard2 x adapt-on/off) at two warmup lengths and computes
    one subtraction estimate, so slow host-wide noise (cron, thermal)
    decorrelates across reps instead of biasing a single estimate.
    """
    import jax  # noqa: F401
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

    cells = [(n, a, w) for n in (0, 2) for a in (True, False)
             for w in (short, long_)]
    for n, a, w in cells:  # compile + warm every cell once
        run(n, a, w)

    def timed(n_shards, adapt, w):
        t0 = time.time()
        r = run(n_shards, adapt, w)
        np.asarray(next(iter(r.samples.values())))  # fetch = sync
        return time.time() - t0

    estimates = []
    for rep in range(n_reps):
        per_step = {}
        for n, a in ((0, True), (0, False), (2, True), (2, False)):
            per_step[(n, a)] = (
                1e3 * (timed(n, a, long_) - timed(n, a, short))
                / (long_ - short)
            )
        est = (per_step[(2, True)] - per_step[(2, False)]) - (
            per_step[(0, True)] - per_step[(0, False)]
        )
        estimates.append(est)
        print(f"rep {rep:2d}: collective_ms_per_step = {est:+.4f}", flush=True)

    arr = np.asarray(estimates)
    q25, q50, q75 = np.percentile(arr, [25, 50, 75])
    # Sign test: under H0 (true cost == 0, symmetric noise) the number of
    # positive estimates is Binomial(n, 0.5).
    n_pos = int(np.sum(arr > 0))
    from math import comb

    p_sign = sum(comb(len(arr), k) for k in range(n_pos, len(arr) + 1)) / (
        2 ** len(arr)
    )
    return {
        "design": (
            "Repeated subtraction, vmap vs 2 shards only (2 devices on the "
            "2-core host: no oversubscription). Each of the "
            f"{n_reps} reps times all four (layout x adapt) cells at two "
            "warmup lengths and forms one collective_ms_per_step estimate; "
            "compile amortized across reps via the runner cache."
        ),
        "n_reps": n_reps,
        "estimates_ms": [round(float(x), 4) for x in arr],
        "median_ms": round(float(q50), 4),
        "iqr_ms": [round(float(q25), 4), round(float(q75), 4)],
        "n_positive": n_pos,
        "sign_test_p_one_sided": round(float(p_sign), 4),
        "collectives_per_warmup_step": (
            "1 scalar pmean (pooled accept) every step; 3 psums of (D,) "
            "Welford moments per step inside slow windows; 2 (D,) pmeans "
            "at window ends"
        ),
        "prediction": (
            "On real v5e ICI the same collectives are 1 scalar + a few "
            "(1000,)-element reductions per warmup step — single-digit "
            "microseconds at ICI latency/bandwidth, i.e. <1% of a "
            "multi-ms leapfrog step at production shapes. The measured "
            "virtual-mesh number is an XLA-CPU emulation cost bounding the "
            "HARNESS overhead, not ICI."
        ),
    }


def main():
    _force_cpu()
    if "--repeat" in sys.argv:
        sys.argv.remove("--repeat")
        out = measure_repeated()
    else:
        out = measure()
    path = sys.argv[1] if len(sys.argv) > 1 else None
    blob = json.dumps(out, indent=1)
    if path:
        with open(path, "w") as f:
            f.write(blob)
    print(blob)


if __name__ == "__main__":
    main()
