"""Microbenchmark: where does a NUTS leapfrog's wall time go?

Breaks the flagship config (glm100_fused: 4096 chains x 100 params, bf16
fused Pallas value+grad) into:

  A. pure leapfrog scan          -> vag + integrator cost per leapfrog
  B. full NUTS step scan         -> per *executed* while iteration cost
     (iterations per draw = max leaves across the vmapped chain batch)
  C. NUTS-shaped while loop with a dummy (near-free) vag
     -> bookkeeping + loop overhead per iteration, no likelihood math

B - A  ~= bookkeeping tax per leaf;  C cross-checks it directly.

All timing fetches results (block_until_ready lies on axon). Run on the
real TPU:  timeout 1800 python benchmarks/nuts_overhead.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mlx_mcmc_tpu.kernels.base import Tunables
    from mlx_mcmc_tpu.kernels.integrators import IntegratorState, make_leapfrog
    from mlx_mcmc_tpu.kernels.nuts import make_nuts_kernel
    from mlx_mcmc_tpu.models import make_logistic_regression
    from mlx_mcmc_tpu.ops.pallas.glm import (
        make_fused_logistic_vag,
        prepare_fused_logistic_data,
    )

    C, D, N = 4096, 100, 10_000
    MAX_DEPTH = 6
    spec = make_logistic_regression(num_features=D, num_obs=N, seed=0)
    data = prepare_fused_logistic_data(spec.X.astype(jnp.bfloat16), spec.y)
    vag2 = make_fused_logistic_vag(prior_scale=1.0, data_aware=True)
    vag = lambda z: vag2(z, data)  # noqa: E731

    key = jax.random.PRNGKey(0)
    Z0 = 0.05 * jax.random.normal(key, (C, D), jnp.float32)
    eps = jnp.asarray(0.18, jnp.float32)
    tunables = Tunables(
        step_size=eps,
        inv_mass_diag=jnp.ones((D,), jnp.float32),
        trajectory_length=jnp.asarray(1.0, jnp.float32),
    )

    report = {}

    # ---------------- A: pure leapfrog scan ----------------
    T_A = 512
    leapfrog = make_leapfrog(None, vag)

    @jax.jit
    def run_leapfrogs(Z):
        lp, g = jax.vmap(vag)(Z)
        r = 0.01 * Z
        st = IntegratorState(Z, r, lp, g)

        def body(s, _):
            s2 = jax.vmap(lambda x: leapfrog(x, eps, tunables.inv_mass_diag))(s)
            return s2, None

        st, _ = jax.lax.scan(body, st, None, length=T_A)
        return jnp.sum(st.log_prob)

    float(run_leapfrogs(Z0))  # compile
    t0 = time.time()
    float(run_leapfrogs(Z0))
    wall_a = time.time() - t0
    report["A_leapfrog_ms"] = 1e3 * wall_a / T_A

    # ---------------- B: full NUTS step scan ----------------
    T_B = 64
    init_fn, step_fn = make_nuts_kernel(
        None, max_tree_depth=MAX_DEPTH, value_and_grad_fn=vag
    )

    @jax.jit
    def run_nuts(Z, k):
        st = jax.vmap(init_fn)(Z)
        keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(
            jnp.arange(C, dtype=jnp.int32)
        )

        def body(s, t):
            ks = jax.vmap(lambda ck: jax.random.fold_in(ck, t))(keys)
            s2, info = jax.vmap(step_fn, in_axes=(0, 0, None))(ks, s, tunables)
            return s2, info.num_integration_steps

        st, steps = jax.lax.scan(
            body, st, jnp.arange(T_B, dtype=jnp.int32)
        )
        return jnp.sum(st.log_prob), steps  # (T, C)

    s, steps = run_nuts(Z0, key)
    float(s)
    t0 = time.time()
    s, steps = run_nuts(Z0, key)
    float(s)
    wall_b = time.time() - t0
    steps = np.asarray(steps)
    iters = steps.max(axis=1).sum()  # lockstep: max leaves per draw
    useful = steps.mean(axis=1).sum()
    # NOTE: the kernel advances one even+odd leaf PAIR per while iteration
    # (kernels/nuts.py), so "per leaf" here is wall / lockstep LEAVES —
    # loop iterations are roughly half that.
    report["B_wall_s"] = wall_b
    report["B_leaves_lockstep"] = int(iters)
    report["B_mean_leaves_per_draw"] = float(steps.mean(axis=1).mean())
    report["B_max_leaves_per_draw"] = float(steps.max(axis=1).mean())
    report["B_per_leaf_ms"] = 1e3 * wall_b / iters
    report["B_per_useful_leaf_ms"] = 1e3 * wall_b / useful
    report["B_lockstep_tax"] = float(iters / useful)

    # ---------------- C: dummy-vag NUTS (bookkeeping only) ----------------
    def dummy_vag(z):
        s = jnp.sum(z * z)
        return -0.5 * s, -z

    init_fn_c, step_fn_c = make_nuts_kernel(
        None, max_tree_depth=MAX_DEPTH, value_and_grad_fn=dummy_vag
    )

    @jax.jit
    def run_nuts_dummy(Z, k):
        st = jax.vmap(init_fn_c)(Z)
        keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(
            jnp.arange(C, dtype=jnp.int32)
        )

        def body(s, t):
            ks = jax.vmap(lambda ck: jax.random.fold_in(ck, t))(keys)
            s2, info = jax.vmap(step_fn_c, in_axes=(0, 0, None))(ks, s, tunables)
            return s2, info.num_integration_steps

        st, steps = jax.lax.scan(body, st, jnp.arange(T_B, dtype=jnp.int32))
        return jnp.sum(st.log_prob), steps

    s, steps_c = run_nuts_dummy(Z0, key)
    float(s)
    t0 = time.time()
    s, steps_c = run_nuts_dummy(Z0, key)
    float(s)
    wall_c = time.time() - t0
    steps_c = np.asarray(steps_c)
    iters_c = steps_c.max(axis=1).sum()
    report["C_wall_s"] = wall_c
    report["C_iters_lockstep"] = int(iters_c)
    report["C_per_leaf_ms"] = 1e3 * wall_c / iters_c

    report["implied_bookkeeping_ms"] = (
        report["B_per_leaf_ms"] - report["A_leapfrog_ms"]
    )
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
