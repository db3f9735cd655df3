"""Sampler checkpoint/resume.

A checkpoint captures everything needed to continue drawing from where a run
stopped: per-chain positions, the adapted tunables (step size, inverse mass
diagonal), kernel name, and a draw counter for RNG continuation. Storage is
Orbax when available, with a plain ``.npz`` fallback (both formats carry the
same pytree).

Resume semantics: adaptation is already frozen post-warmup, so a resumed run
continues the *sampling phase* with the checkpointed tunables — equivalent to
having asked for more draws up front (modulo the RNG stream, which is
re-keyed by the resume seed).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

_META_KEY = "__mlx_mcmc_tpu_meta__"


def _result_state(result) -> Dict[str, Any]:
    last_draws = {
        k: np.asarray(v[:, -1]) for k, v in result.samples.items()
    }  # (chains, *event) per param
    return {
        "positions": last_draws,
        "step_size": float(np.asarray(result.tunables.step_size)),
        "inv_mass_diag": np.asarray(result.tunables.inv_mass_diag),
        "kernel": result.kernel,
        "num_chains": result.num_chains,
        "draws_completed": result.num_samples,
    }


def save_checkpoint(path: str, result, backend: str = "auto") -> None:
    """Persist an :class:`MCMCResult` as a resumable checkpoint.

    ``backend``: 'npz' (single portable file), 'orbax' (directory tree,
    async-capable, multi-host-aware), or 'auto' — orbax when installed and
    ``path`` has no .npz suffix, else npz.
    """
    state = _result_state(result)
    if backend == "auto":
        backend = "npz" if path.endswith(".npz") else _orbax_or_npz()
    if backend == "orbax":
        _orbax_save(path, state)
        return
    meta = {
        "kernel": state["kernel"],
        "num_chains": state["num_chains"],
        "draws_completed": state["draws_completed"],
        "step_size": state["step_size"],
        "param_names": list(state["positions"].keys()),
    }
    arrays = {f"pos_{k}": v for k, v in state["positions"].items()}
    arrays["inv_mass_diag"] = state["inv_mass_diag"]
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **arrays, **{_META_KEY: json.dumps(meta)})


def _orbax_or_npz() -> str:
    try:
        import orbax.checkpoint  # noqa: F401

        return "orbax"
    except ImportError:  # pragma: no cover
        return "npz"


def _orbax_save(path: str, state: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            {
                "positions": state["positions"],
                "inv_mass_diag": state["inv_mass_diag"],
                "step_size": np.float32(state["step_size"]),
                "num_chains": np.int32(state["num_chains"]),
                "draws_completed": np.int32(state["draws_completed"]),
                "kernel_id": np.int32(
                    ["metropolis", "hmc", "nuts"].index(state["kernel"])
                ),
            },
            force=True,
        )


def _orbax_load(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    return {
        "positions": dict(tree["positions"]),
        "step_size": float(tree["step_size"]),
        "inv_mass_diag": np.asarray(tree["inv_mass_diag"]),
        "kernel": ["metropolis", "hmc", "nuts"][int(tree["kernel_id"])],
        "num_chains": int(tree["num_chains"]),
        "draws_completed": int(tree["draws_completed"]),
    }


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint saved by :func:`save_checkpoint` (either backend)."""
    if os.path.isdir(path):
        return _orbax_load(path)
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data[_META_KEY]))
        positions = {k: data[f"pos_{k}"] for k in meta["param_names"]}
        return {
            "positions": positions,
            "step_size": meta["step_size"],
            "inv_mass_diag": data["inv_mass_diag"],
            "kernel": meta["kernel"],
            "num_chains": meta["num_chains"],
            "draws_completed": meta["draws_completed"],
        }


def resume(
    log_prob_fn,
    checkpoint: Dict[str, Any] | str,
    *,
    num_samples: int = 1000,
    seed: Optional[int] = None,
    **kwargs,
):
    """Continue sampling from a checkpoint (dict or path).

    Warmup is skipped; the checkpointed step size and mass matrix are used
    as-is. Extra kwargs forward to :func:`mlx_mcmc_tpu.sample`.
    """
    from mlx_mcmc_tpu.inference.api import sample

    if isinstance(checkpoint, str):
        checkpoint = load_checkpoint(checkpoint)
    if seed is None:
        # Continue the stream deterministically past the completed draws.
        seed = int(checkpoint["draws_completed"]) + 1

    start = {k: jnp.asarray(v) for k, v in checkpoint["positions"].items()}
    return sample(
        log_prob_fn,
        start,
        num_samples=num_samples,
        num_warmup=0,
        num_chains=checkpoint["num_chains"],
        kernel=checkpoint["kernel"],
        seed=seed,
        step_size=checkpoint["step_size"],
        adapt_step_size=False,
        adapt_mass_matrix=False,
        init_inv_mass_diag=jnp.asarray(checkpoint["inv_mass_diag"]),
        batched_initial=True,
        **kwargs,
    )
