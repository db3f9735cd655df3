"""Flagship benchmark: NUTS effective samples/sec/chip on GLM posteriors.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ess/s", "vs_baseline": N}

Configs (select with BENCH_CONFIG env var or argv[1]):
    glm100  (default): 100 params, 10K obs, 64 chains  — BASELINE.md medium
    glm1000          : 1000 params, 100K obs, 16 chains — BASELINE.md large

Baseline derivation (see BASELINE.md — the reference publishes no rigorous
numbers): the reference's claimed medium-model wall time (100 params,
10K obs) is 120 s on M3 Pro CPU (README.md:105-113) for a standard
1000-draw run; its measured ESS fraction is ~5.3% (PROGRESS.md:80-82,
264/5000), giving ~53 effective samples / 120 s ~= 0.44 ess/s. The large
config's implied baseline is 30 min for the same run shape ~= 0.03 ess/s
(README.md:105-113 "Large model" row). `vs_baseline` divides by these.

Data is passed to the sampler as a runtime argument (`sample(..., data=...)`)
rather than a closure constant — closure constants are serialized into the
program body, which bloats (and on remote-compile backends, breaks)
compilation for multi-hundred-MB design matrices.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CONFIGS = {
    # Wide chain batches win on v5e: the chain axis rides the MXU lane
    # dimension, so ESS grows linearly with chains while wall grows slowly.
    # Measured min-ESS/s with on-device ESS: 107,370 @1024 / 170,413 @2048
    # / 262,373 @4096 (host-fetch ESS: 16,304 @128 / 54,714 @1024).
    "glm100": dict(
        num_features=100, num_obs=10_000, num_chains=4096,
        num_warmup=500, num_samples=500, max_tree_depth=8,
        baseline_ess_per_sec=0.44, fused=False,
        label="min-ESS/sec/chip, NUTS 100-param logistic GLM (10K obs, {chains} chains)",
    ),
    # bf16 design matrix + fused Pallas value+grad, same posterior as glm100.
    "glm100_fused": dict(
        num_features=100, num_obs=10_000, num_chains=128,
        num_warmup=500, num_samples=500, max_tree_depth=8,
        baseline_ess_per_sec=0.44, fused=True,
        label=(
            "min-ESS/sec/chip, NUTS 100-param logistic GLM "
            "(10K obs, 128 chains, bf16 fused Pallas)"
        ),
    ),
    "glm1000": dict(
        num_features=1000, num_obs=100_000, num_chains=16,
        num_warmup=400, num_samples=400, max_tree_depth=8,
        baseline_ess_per_sec=0.03, fused=False,
        label="min-ESS/sec/chip, NUTS 1000-param logistic GLM (100K obs, 16 chains)",
    ),
    # bf16 design matrix + fused single-pass Pallas value+grad kernel.
    # On TPU the MXU already computes f32 matmuls at bf16 operand precision,
    # so bf16 storage is numerically free; the fused kernel is what turns it
    # into bandwidth (XLA's autodiff upcasts X in the backward pass).
    "glm1000_fused": dict(
        num_features=1000, num_obs=100_000, num_chains=128,
        num_warmup=400, num_samples=400, max_tree_depth=8,
        baseline_ess_per_sec=0.03, fused=True,
        label=(
            "min-ESS/sec/chip, NUTS 1000-param logistic GLM "
            "(100K obs, 128 chains, bf16 fused Pallas)"
        ),
    ),
}


# Public single-chip peaks used for the MFU/roofline estimate in the bench
# detail (bf16 matmul peak; the MXU computes f32 matmuls at bf16 operand
# precision by default, so one peak covers both storage dtypes).
_DEVICE_PEAKS = {
    # device_kind substring: (peak TFLOP/s, HBM GB/s)
    "v5 lite": (197.0, 819.0),
    "v5e": (197.0, 819.0),
    "v4": (275.0, 1228.0),
    "v5p": (459.0, 2765.0),
}


def _device_peaks(device) -> tuple:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peaks in _DEVICE_PEAKS.items():
        if sub in kind:
            return peaks
    return (None, None)


def _mfu_detail(result, cfg, data, wall: float, device) -> dict:
    """Roofline accounting for the GLM value+grad hot op.

    Counts only *useful* flops (per-chain true leapfrog counts summed from
    ``num_integration_steps``; vmapped NUTS actually runs lockstep to the
    slowest chain, so hardware utilization is >= this). Warmup leapfrogs are
    not recorded (`collect_warmup=False`); they are estimated at the sampling
    phase's mean steps/draw — flagged as an estimate in the output.
    """
    import numpy as np

    steps = np.asarray(result.info.num_integration_steps, np.float64)
    sampling_leapfrogs = float(steps.sum())  # sum over (chains, draws)
    scale = 1.0 + cfg["num_warmup"] / cfg["num_samples"]
    total_leapfrogs = sampling_leapfrogs * scale
    if cfg["fused"]:
        n_eff, d_eff = data["Xp"].shape  # padded dims: real kernel work
        x_bytes = n_eff * d_eff * data["Xp"].dtype.itemsize
    else:
        n_eff, d_eff = data["X"].shape
        x_bytes = n_eff * d_eff * data["X"].dtype.itemsize
    # One value+grad = forward (N,D)@(D,) + backward X^T r: 4*N*D flops/chain.
    flops = total_leapfrogs * 4.0 * n_eff * d_eff
    achieved_tflops = flops / wall / 1e12
    peak_tflops, hbm_gbs = _device_peaks(device)
    out = {
        "total_leapfrogs": int(total_leapfrogs),
        "achieved_tflops": round(achieved_tflops, 2),
        "flop_count": "useful (per-chain true tree sizes; warmup estimated)",
    }
    if peak_tflops:
        # X is streamed once per *call* (all chains share the tile); the
        # fused kernel reads it once per leapfrog, XLA's autodiff twice.
        calls = total_leapfrogs / cfg["num_chains"]
        bytes_total = calls * x_bytes * (1.0 if cfg["fused"] else 2.0)
        ai = flops / max(bytes_total, 1.0)  # flops/byte
        bound_tflops = min(peak_tflops, ai * hbm_gbs / 1e3)
        out.update(
            mfu_pct=round(100.0 * achieved_tflops / peak_tflops, 2),
            roofline_bound_tflops=round(bound_tflops, 1),
            roofline_frac_pct=round(100.0 * achieved_tflops / bound_tflops, 2),
            arithmetic_intensity=round(ai, 1),
            peak_tflops=peak_tflops,
        )
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mlx_mcmc_tpu import sample
    from mlx_mcmc_tpu.diagnostics import effective_sample_size
    from mlx_mcmc_tpu.models import make_logistic_regression

    name = os.environ.get("BENCH_CONFIG") or (
        sys.argv[1] if len(sys.argv) > 1 else "glm100"
    )
    cfg = CONFIGS[name]
    if os.environ.get("BENCH_CHAINS"):  # chain-count sweeps without editing
        cfg = dict(cfg, num_chains=int(os.environ["BENCH_CHAINS"]))
    if os.environ.get("BENCH_TILE"):  # Pallas row-tile sweeps (fused configs)
        cfg = dict(cfg, tile_n=int(os.environ["BENCH_TILE"]))
    cfg = dict(cfg, label=cfg["label"].format(chains=cfg["num_chains"]))

    spec = make_logistic_regression(
        num_features=cfg["num_features"], num_obs=cfg["num_obs"], seed=0
    )

    from mlx_mcmc_tpu.distributions import Normal

    extra = {}
    if cfg["fused"]:
        from mlx_mcmc_tpu.ops.pallas.glm import (
            make_fused_logistic_vag,
            prepare_fused_logistic_data,
        )

        data = prepare_fused_logistic_data(
            spec.X.astype(jnp.bfloat16), spec.y,
            tile_n=cfg.get("tile_n", 1024),
        )
        extra["value_and_grad_fn"] = make_fused_logistic_vag(
            prior_scale=1.0, data_aware=True
        )

        def log_prob(params, data):
            # value path (init/energy): same density the fused vag computes
            beta = params["beta"]
            d = data["dim"].shape[0]
            s = jnp.dot(
                data["Xp"][:, :d], beta.astype(data["Xp"].dtype),
                preferred_element_type=jnp.float32,
            )
            ll = jnp.sum(data["yp"][:, 0] * s - jax.nn.softplus(s))
            return ll + data["pad_const"] + jnp.sum(Normal(0.0, 1.0).log_prob(beta))

    else:
        data = {"X": spec.X, "y": spec.y}

        def log_prob(params, data):
            beta = params["beta"]
            s = jnp.dot(data["X"], beta, preferred_element_type=jnp.float32)
            return jnp.sum(data["y"] * s - jax.nn.softplus(s)) + jnp.sum(
                Normal(0.0, 1.0).log_prob(beta)
            )

    def run(seed):
        return sample(
            log_prob,
            {"beta": jnp.zeros(cfg["num_features"])},
            data=data,
            num_samples=cfg["num_samples"],
            num_warmup=cfg["num_warmup"],
            num_chains=cfg["num_chains"],
            kernel="nuts",
            seed=seed,
            max_tree_depth=cfg["max_tree_depth"],
            target_accept=0.8,
            **extra,
        )

    # ESS on device by default: only the (D,) statistics cross the tunnel.
    # Fetching the full (chains, draws, D) draw tensor costs more than the
    # sampling itself at wide chain counts (205MB at 1024 chains); the
    # traced device_ess has numpy-identical semantics (tests/test_diagnostics).
    # BENCH_HOST_ESS=1 restores the fetch-everything path.
    host_ess = bool(os.environ.get("BENCH_HOST_ESS"))
    if not host_ess:
        import jax as _jax
        from mlx_mcmc_tpu.diagnostics.device import device_ess

        ess_fn = _jax.jit(device_ess)

    # Warm the compile cache, then time a fresh run end-to-end (warmup +
    # sampling; ESS counted over post-warmup draws only).
    result = run(0)
    if host_ess:
        np.asarray(result.samples["beta"]).ravel()[0]  # force completion
    else:
        np.asarray(ess_fn(result.samples["beta"]))  # warm ESS compile too

    t0 = time.time()
    result = run(1)
    if host_ess:
        draws = np.asarray(result.samples["beta"])  # (chains, draws, D)
        wall = time.time() - t0
        ess = effective_sample_size(draws)  # (D,)
    else:
        ess = np.asarray(ess_fn(result.samples["beta"]))  # (D,) fetch only
        wall = time.time() - t0
    min_ess = float(np.min(ess))
    ess_per_sec = min_ess / wall

    print(
        json.dumps(
            {
                "metric": cfg["label"],
                "value": round(ess_per_sec, 2),
                "unit": "ess/s",
                "vs_baseline": round(ess_per_sec / cfg["baseline_ess_per_sec"], 1),
                "detail": {
                    "wall_seconds": round(wall, 2),
                    "min_ess": round(min_ess, 1),
                    "median_ess": round(float(np.median(ess)), 1),
                    "divergences": result.divergences,
                    "mean_accept": round(
                        float(np.asarray(result.info.accept_prob).mean()), 3
                    ),
                    "mean_tree_depth": round(
                        float(np.asarray(result.info.tree_depth).mean()), 2
                    ),
                    "ess_backend": "host" if host_ess else "device",
                    "device": str(jax.devices()[0]),
                    "roofline": _mfu_detail(
                        result, cfg, data, wall, jax.devices()[0]
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
