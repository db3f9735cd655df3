"""High-level ``MCMC`` facade — reference API parity.

Reference parity: mlx_mcmc/inference/mcmc.py:10-246. Same constructor
(``MCMC(log_prob_fn)``), same ``run(initial_params, num_samples, num_warmup,
method, proposal_scale, random_seed, verbose, **kwargs)`` dispatch and
warmup-then-restart Metropolis behavior (mcmc.py:145-178, including the
``random_seed + 1`` sampling-phase reseed at mcmc.py:175), same ``summary``
key format (mean/std/median/'2.5%'/'97.5%', mcmc.py:213-227) and
``print_summary`` table.

Beyond the reference: ``num_chains``/``jitter`` for compiled multi-chain runs,
``diagnostics()`` (split R-hat / ESS), per-draw ``stats`` (TransitionInfo),
and verbose is honored everywhere (the reference's hmc/nuts print even with
``verbose=False``, mcmc.py:90-97 + hmc.py:156).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from mlx_mcmc_tpu.diagnostics.stats import summary_stats
from mlx_mcmc_tpu.inference.api import MCMCResult, sample


class MCMC:
    """High-level MCMC inference interface over a dict-of-params model.

    Examples
    --------
    >>> from mlx_mcmc_tpu import Normal, MCMC
    >>> def log_prob(params):
    ...     return Normal(0, 10).log_prob(params['mu'])
    >>> mcmc = MCMC(log_prob)
    >>> samples = mcmc.run({'mu': 0.0}, num_samples=1000)
    """

    def __init__(self, log_prob_fn):
        self.log_prob_fn = log_prob_fn
        self.samples: Optional[Dict[str, np.ndarray]] = None
        self.acceptance_rate: Optional[float] = None
        self.result: Optional[MCMCResult] = None

    def run(
        self,
        initial_params: Any,
        num_samples: int = 1000,
        num_warmup: int = 1000,
        method: str = "metropolis",
        proposal_scale: float = 0.1,
        random_seed: int = 0,
        verbose: bool = True,
        num_chains: int = 1,
        jitter: float = 0.0,
        chain_method: str = "vmap",
        **kwargs,
    ) -> Dict[str, np.ndarray]:
        """Run MCMC sampling; returns {name: np.ndarray of draws}.

        ``method``: 'metropolis' | 'hmc' | 'nuts' (reference parity) or
        'chees' | 'mala' | 'ensemble' (beyond). Extra kwargs forward to the
        kernel: ``step_size``, ``num_leapfrog_steps``, ``adapt_step_size``,
        ``target_accept`` (hmc); ``step_size``, ``max_tree_depth``,
        ``adapt_step_size``, ``target_accept`` (nuts); ``a``, ``transforms``
        (ensemble, where ``num_chains`` is the walker count).

        ``chain_method``: 'vmap' batches all chains on one device; 'sharded'
        shards them across the device mesh with collective adaptation
        (metropolis/hmc/nuts/chees/mala; requires num_chains divisible by the
        device count). Sharded metropolis uses the engine's standard
        adaptive warmup rather than the reference's facade-managed
        warmup-restart (the two differ only in the RNG stream).
        """
        if method not in ("metropolis", "hmc", "nuts", "chees", "mala", "ensemble"):
            raise ValueError(f"Unknown sampling method: {method}")
        if chain_method not in ("vmap", "sharded"):
            raise ValueError(f"Unknown chain_method: {chain_method}")
        if chain_method == "sharded":
            if method == "ensemble":
                raise ValueError(
                    "chain_method='sharded' supports metropolis/hmc/nuts/"
                    "chees/mala (the ensemble sampler couples walkers and "
                    "has its own driver)"
                )
            from mlx_mcmc_tpu.parallel.sharded import sample_sharded

            result = sample_sharded(
                self.log_prob_fn,
                initial_params,
                num_samples=num_samples,
                num_warmup=num_warmup,
                num_chains=num_chains,
                kernel=method,
                seed=random_seed,
                jitter=jitter,
                **kwargs,
            )
            self.result = result
            self.acceptance_rate = result.acceptance_rate
            self.samples = result.flat_samples()
            if verbose:
                print(f"Sharded sampling complete "
                      f"({num_chains} chains across mesh); "
                      f"acceptance rate: {self.acceptance_rate:.2%}")
            return self.samples

        if verbose:
            print("=" * 70)
            print(f"mlx-mcmc-tpu: {method.upper()} sampling "
                  f"({num_chains} chain{'s' if num_chains != 1 else ''}, "
                  f"{num_warmup} warmup + {num_samples} draws)")
            print("=" * 70)

        if method == "ensemble":
            # Affine-invariant stretch move: num_chains names the walker
            # count (even, >= 4; default bumped to the sampler's minimum
            # useful ensemble when the caller left it at 1).
            from mlx_mcmc_tpu.inference.ensemble import sample_ensemble

            result = sample_ensemble(
                self.log_prob_fn,
                initial_params,
                num_walkers=num_chains if num_chains > 1 else 64,
                num_samples=num_samples,
                num_warmup=num_warmup,
                seed=random_seed,
                jitter=jitter if jitter > 0 else 0.1,
                **kwargs,
            )
        elif method == "metropolis":
            # Facade-managed warmup: run, restart from last warmup state with
            # seed+1 (reference mcmc.py:145-178). No adaptation, parity.
            start = initial_params
            batched_start = False
            if num_warmup > 0:
                warm = sample(
                    self.log_prob_fn,
                    start,
                    num_samples=num_warmup,
                    num_warmup=0,
                    num_chains=num_chains,
                    kernel="metropolis",
                    seed=random_seed,
                    step_size=proposal_scale,
                    adapt_step_size=False,
                    adapt_mass_matrix=False,
                    jitter=jitter,
                )
                if verbose:
                    print(f"Warmup acceptance rate: {warm.acceptance_rate:.2%}")
                # Restart every chain from its last warmup draw.
                start = {k: v[:, -1] for k, v in warm.samples.items()}
                batched_start = True
            result = sample(
                self.log_prob_fn,
                start,
                num_samples=num_samples,
                num_warmup=0,
                num_chains=num_chains,
                kernel="metropolis",
                seed=random_seed + 1 if num_warmup > 0 else random_seed,
                step_size=proposal_scale,
                adapt_step_size=False,
                adapt_mass_matrix=False,
                jitter=0.0 if batched_start else jitter,
                batched_initial=batched_start,
            )
        else:
            result = sample(
                self.log_prob_fn,
                initial_params,
                num_samples=num_samples,
                num_warmup=num_warmup,
                num_chains=num_chains,
                kernel=method,
                seed=random_seed,
                jitter=jitter,
                **kwargs,
            )

        self.result = result
        self.acceptance_rate = result.acceptance_rate
        self.samples = result.flat_samples()

        if verbose:
            print(f"Sampling acceptance rate: {self.acceptance_rate:.2%}")
            if result.divergences:
                print(f"Divergent transitions: {result.divergences}")
            print("Sampling complete!")

        return self.samples

    # -- post-processing ---------------------------------------------------

    @property
    def stats(self):
        """Per-draw TransitionInfo pytree with (chains, draws) leaves."""
        if self.result is None:
            raise ValueError("Must run sampling first. Call run() method.")
        return self.result.info

    def diagnostics(self) -> Dict[str, Dict[str, float]]:
        """Split R-hat / ESS per parameter (beyond the reference)."""
        if self.result is None:
            raise ValueError("Must run sampling first. Call run() method.")
        return self.result.diagnostics()

    def summary(self, credible_interval: float = 0.95) -> Dict[str, Dict[str, float]]:
        """Posterior summary; key format matches reference mcmc.py:213-227."""
        if self.samples is None:
            raise ValueError("Must run sampling first. Call run() method.")
        out = {}
        for k, v in self.result.to_numpy().items():
            if v.ndim == 2:
                out[k] = summary_stats(v, credible_interval)
            else:
                flat_event = v.reshape(v.shape[0], v.shape[1], -1)
                for i in range(flat_event.shape[-1]):
                    out[f"{k}[{i}]"] = summary_stats(flat_event[..., i],
                                                     credible_interval)
        return out

    def print_summary(self, credible_interval: float = 0.95) -> None:
        """Formatted posterior table (reference mcmc.py:229-246 format,
        plus n_eff / r_hat columns)."""
        summary = self.summary(credible_interval)
        ci_pct = int(credible_interval * 100)
        # Percentile key names as emitted by diagnostics.stats.summary_stats
        # (looked up by name, not dict position — the reference extracts CI
        # bounds positionally, mlx_mcmc/inference/mcmc.py:239-241, which
        # breaks the moment the summary dict reorders).
        alpha = 1 - credible_interval
        lower_key = f"{100 * alpha / 2:.1f}%"
        upper_key = f"{100 * (1 - alpha / 2):.1f}%"
        print("\nPosterior Summary:")
        print("=" * 96)
        print(f"{'Parameter':<15} {'Mean':<10} {'Std':<10} {'Median':<10} "
              f"{f'{ci_pct}% CI':<22} {'n_eff':<8} {'r_hat':<6}")
        print("-" * 96)
        for name, stats in summary.items():
            ci_lower, ci_upper = stats[lower_key], stats[upper_key]
            ci_str = f"[{ci_lower:.3f}, {ci_upper:.3f}]"
            print(f"{name:<15} {stats['mean']:<10.3f} {stats['std']:<10.3f} "
                  f"{stats['median']:<10.3f} {ci_str:<22} "
                  f"{stats['n_eff']:<8.0f} {stats['r_hat']:<6.3f}")
        print("=" * 96)
