"""Where does the flagship's wall go? Warmup vs sampling, lockstep tax.

Runs the glm100_fused flagship config with ``collect_warmup=True`` and
fetches only the per-draw integration-step counters for BOTH phases
((W, C) and (S, C) i32 — a few MB). Reports:

  - lockstep leaves per phase (sum over draws of max over chains): what the
    vmapped hardware actually executes;
  - useful leaves per phase (sum of means): what the ESS is paid for;
  - the lockstep tax (ratio) — chains wait for the deepest tree per draw;
  - implied wall attribution at the measured per-leaf cost
    (benchmarks/nuts_overhead.py: ~0.24 ms/lockstep leaf at 4096 chains).

Run on the real TPU:  timeout 1800 python benchmarks/flagship_breakdown.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mlx_mcmc_tpu.inference.engine import (
        build_sampler,
        make_chain_keys,
        prepare_initial_positions,
        resolve_step_size,
    )
    from mlx_mcmc_tpu.models import make_logistic_regression
    from mlx_mcmc_tpu.ops.pallas.glm import (
        make_fused_logistic_vag,
        prepare_fused_logistic_data,
    )

    C, D, N = 4096, 100, 10_000
    W, S = 300, 1000  # the r4 flagship shape (bench.py glm100_fused)
    spec = make_logistic_regression(num_features=D, num_obs=N, seed=0)
    data = prepare_fused_logistic_data(
        spec.X.astype(jnp.bfloat16), spec.y, tile_n=1024
    )
    vag = make_fused_logistic_vag(prior_scale=1.0, data_aware=True)

    def flat_log_prob(z, data):
        return vag(z, data)[0]

    run = build_sampler(
        flat_log_prob,
        D,
        kernel="nuts",
        num_warmup=W,
        num_samples=S,
        step_size=resolve_step_size("auto", "nuts", True),
        target_accept=0.8,
        max_tree_depth=6,
        value_and_grad_fn=vag,
        collect_warmup=True,
    )

    key = jax.random.PRNGKey(1)
    chain_keys = make_chain_keys(key, C)
    z0 = prepare_initial_positions(jnp.zeros((D,), jnp.float32), C)

    jrun = jax.jit(run)
    result, (w_pos, w_infos) = jrun(chain_keys, z0, data, None, run.sched)
    w_steps = np.asarray(w_infos.num_integration_steps)  # (W, C)
    t0 = time.time()
    result, (w_pos, w_infos) = jrun(chain_keys, z0, data, None, run.sched)
    s_steps = np.asarray(result.info.num_integration_steps)  # (C, S)
    w_steps = np.asarray(w_infos.num_integration_steps)
    wall = time.time() - t0

    s_steps = s_steps.T  # (S, C)
    per_leaf_ms = 0.2393  # measured, benchmarks/nuts_overhead.py @4096 chains

    def phase(steps):
        # paired-leaf loop: hardware iterations per draw = max over chains
        # of ceil((leaves-1)/2); executed leaves = 1 + 2*that (the peeled
        # root leaf runs once, each body iteration two leapfrogs).
        iters = np.ceil(np.maximum(steps - 1.0, 0.0) / 2.0)
        lockstep = float(np.sum(1.0 + 2.0 * iters.max(axis=1)))
        useful = float(steps.mean(axis=1).sum())
        return {
            "lockstep_leaves": int(lockstep),
            "useful_leaves": int(useful),
            "lockstep_tax": round(lockstep / useful, 3),
            "mean_leaves_per_draw": round(float(steps.mean(axis=1).mean()), 2),
            "max_leaves_per_draw": round(float(steps.max(axis=1).mean()), 2),
            "implied_wall_s": round(lockstep * per_leaf_ms / 1e3, 2),
        }

    report = {
        "wall_s_with_warmup_collect": round(wall, 2),
        "warmup": phase(w_steps),
        "sampling": phase(s_steps),
    }
    total_lockstep = (
        report["warmup"]["lockstep_leaves"]
        + report["sampling"]["lockstep_leaves"]
    )
    report["total_lockstep_leaves"] = total_lockstep
    report["implied_nuts_wall_s"] = round(total_lockstep * per_leaf_ms / 1e3, 2)
    report["note"] = (
        "implied_wall uses the measured per-lockstep-leaf cost (vag-bound: "
        "0.222 ms vag + 0.017 ms bookkeeping, nuts_overhead r4); the "
        "matmul-only floor is 0.205 ms/call (glm_kernel_variants), so the "
        "remaining per-leaf gap is the tanh/log epilogue (two EUP "
        "transcendentals) + 7% loop bookkeeping. The hoisted epilogue that "
        "would close half the gap is numerically rejected "
        "(ops/pallas/glm.py:_fused_hoisted_kernel)."
    )
    blob = json.dumps(report, indent=2)
    print(blob, flush=True)
    import sys
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(blob)


if __name__ == "__main__":
    main()
