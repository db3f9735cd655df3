"""Split R-hat and effective sample size (Stan/BDA3 formulations).

- ``potential_scale_reduction``: split-chain R-hat (Gelman et al., BDA3
  §11.4; Vehtari et al. 2021 splitting).
- ``effective_sample_size``: FFT autocovariance + Geyer initial monotone
  positive sequence truncation (Stan reference manual, "Effective Sample
  Size"), combined across chains.

Inputs are numpy arrays shaped ``(chains, draws)`` (or ``(chains, draws, ...)``
— trailing axes are treated as independent parameters and vectorized over).
These run host-side on gathered draws; a device-resident sharded variant
lives in ``parallel/sharded.py``.
"""

from __future__ import annotations

import numpy as np

try:  # native OpenMP engine (src/fastdiag/fastdiag.c); numpy is the fallback
    from mlx_mcmc_tpu import _fastdiag
except ImportError:  # pragma: no cover - extension not built
    _fastdiag = None

# Below this many (chains*draws*params) elements the numpy path wins on
# call overhead; above it the native path wins on parallelism + no temps.
_NATIVE_MIN_ELEMS = 1 << 18


def _as_cnp(x: np.ndarray):
    """(chains, draws, ...) -> C-contiguous f64 (chains, draws, P) + shape."""
    trailing = x.shape[2:]
    p = int(np.prod(trailing)) if trailing else 1
    flat = np.ascontiguousarray(
        x.reshape(x.shape[0], x.shape[1], p), dtype=np.float64
    )
    return flat, trailing


def _split_chains(x: np.ndarray) -> np.ndarray:
    """(chains, draws, ...) -> (2*chains, draws//2, ...), dropping an odd draw."""
    c, n = x.shape[0], x.shape[1]
    half = n // 2
    x = x[:, : 2 * half]
    return np.concatenate([x[:, :half], x[:, half:]], axis=0)


def potential_scale_reduction(
    x: np.ndarray, split: bool = True, use_native: bool | None = None
) -> np.ndarray:
    """Split R-hat. ``x`` is (chains, draws, ...); returns shape ``(...)``.

    With a single unsplit chain this is undefined; splitting always yields
    >= 2 chains so single-chain runs still get a meaningful statistic.
    ``use_native=None`` auto-selects the OpenMP engine for large inputs.
    """
    x = np.asarray(x, np.float64)
    if split and _fastdiag is not None and x.shape[1] >= 4:
        if use_native or (use_native is None and x.size >= _NATIVE_MIN_ELEMS):
            flat, trailing = _as_cnp(x)
            c, n, p = flat.shape
            out = np.asarray(_fastdiag.rhat(flat, c, n, p))
            return out.reshape(trailing) if trailing else out[0]
    if split:
        x = _split_chains(x)
    m, n = x.shape[0], x.shape[1]
    if n < 2:
        return np.full(x.shape[2:], np.nan)
    chain_means = x.mean(axis=1)
    chain_vars = x.var(axis=1, ddof=1)
    within = chain_vars.mean(axis=0)
    between = n * chain_means.var(axis=0, ddof=1)
    var_plus = (n - 1) / n * within + between / n
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_plus / within)
    return rhat


def effective_sample_size(
    x: np.ndarray, use_native: bool | None = None
) -> np.ndarray:
    """Combined-chain ESS via autocovariance + Geyer truncation.

    ``x`` is (chains, draws, ...); returns shape ``(...)``.
    ``use_native=None`` auto-selects the OpenMP direct-autocovariance engine
    (early lag termination) for large inputs; numpy FFT otherwise.
    """
    x = np.asarray(x, np.float64)
    m, n = x.shape[0], x.shape[1]
    if n < 4:
        return np.full(x.shape[2:], np.nan)
    if _fastdiag is not None and (
        use_native or (use_native is None and x.size >= _NATIVE_MIN_ELEMS)
    ):
        flat, trailing = _as_cnp(x)
        c, nn, p = flat.shape
        out = np.asarray(_fastdiag.ess(flat, c, nn, p))
        return out.reshape(trailing) if trailing else out[0]

    # Per-chain autocovariance by FFT (biased, /n normalization as in Stan).
    centered = x - x.mean(axis=1, keepdims=True)
    pad = 2 ** int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(centered, n=pad, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=pad, axis=1)[:, :n].real / n

    chain_var = acov[:, 0] * n / (n - 1.0)  # unbiased lag-0
    mean_var = chain_var.mean(axis=0)  # W
    var_plus = mean_var * (n - 1.0) / n
    if m > 1:
        var_plus = var_plus + x.mean(axis=1).var(axis=0, ddof=1)

    # rho_t = 1 - (W - mean_c acov_{c,t}) / var_plus
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = 1.0 - (mean_var[None] - acov.mean(axis=0)) / var_plus[None]
    rho[0] = 1.0

    # Geyer: pair sums P_k = rho_{2k} + rho_{2k+1} starting at lag 0;
    # truncate at the first non-positive pair, enforce monotone
    # non-increasing, then tau = -1 + 2 * sum_k P_k (since rho_0 = 1).
    max_pairs = n // 2
    pair = rho[: 2 * max_pairs].reshape(max_pairs, 2, *rho.shape[1:]).sum(axis=1)
    keep = np.logical_and.accumulate(pair > 0, axis=0)
    pair = np.where(keep, pair, 0.0)
    pair = np.minimum.accumulate(pair, axis=0)
    pair = np.maximum(pair, 0.0)
    tau = -1.0 + 2.0 * pair.sum(axis=0)
    ess = m * n / np.maximum(tau, 1e-12)
    return np.minimum(ess, m * n * np.log10(np.maximum(m * n, 10.0)))


def summary_stats(x: np.ndarray, credible_interval: float = 0.95) -> dict:
    """Per-parameter posterior summary for (chains, draws) arrays.

    Key format matches the reference facade (mlx_mcmc/inference/mcmc.py:213-227):
    mean/std/median plus percentile-named CI keys such as '2.5%'/'97.5%',
    extended with n_eff and r_hat.
    """
    x = np.asarray(x)
    flat = x.reshape(-1, *x.shape[2:])
    alpha = 1 - credible_interval
    lower_pct = 100 * alpha / 2
    upper_pct = 100 * (1 - alpha / 2)
    return {
        "mean": float(np.mean(flat)),
        "std": float(np.std(flat)),
        "median": float(np.median(flat)),
        f"{lower_pct:.1f}%": float(np.percentile(flat, lower_pct)),
        f"{upper_pct:.1f}%": float(np.percentile(flat, upper_pct)),
        "n_eff": float(effective_sample_size(x)),
        "r_hat": float(potential_scale_reduction(x)),
    }
