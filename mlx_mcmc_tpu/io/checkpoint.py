"""Sampler checkpoint/resume — sampling phase AND mid-warmup.

A sampling-phase checkpoint of an int-seeded run captures everything needed
to continue drawing **bit-identically**: the final kernel positions, the raw
adaptation pytrees (whose dual-averaging average IS the frozen step size),
the run seed, and the global draw offset. Because the engine keys every
step's RNG by the *global* step index (``fold_in(chain_key, t)`` with
``t = num_warmup + (draw_offset + j) * thin``, inference/engine.py), a
:func:`resume` continues the sampling scan at the stored offset with the
same chain keys — the resumed draws equal the corresponding draws of one
uninterrupted longer run, bit for bit (tests/test_checkpoint.py).

Legacy position-only checkpoints (older files, or runs whose seed was a raw
PRNG key) resume with the checkpointed tunables but a re-keyed RNG stream —
statistically equivalent, not bit-identical.

Mid-warmup checkpoints (SURVEY.md §5.4 "resume mid-warmup or mid-sampling")
persist the same adaptation pytrees plus the warmup step index; the warmup
schedule is a static function of ``num_warmup``, so
:func:`run_warmup` + :func:`resume_warmup` produce draws bit-identical to an
uninterrupted :func:`~mlx_mcmc_tpu.sample` call with the same seed.

Storage: Orbax (async-capable, multi-host-aware directory tree) when
installed and the path has no ``.npz`` suffix, with a plain single-file
``.npz`` fallback — both formats carry the same arrays + JSON metadata, for
every checkpoint kind (sampling, mid-warmup, sharded mid-warmup).
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


def _resolve_backend(path: str, backend: str) -> str:
    if backend == "auto":
        return "npz" if path.endswith(".npz") else _orbax_or_npz()
    return backend


def save_checkpoint(path: str, result, backend: str = "auto") -> None:
    """Persist an :class:`MCMCResult` (or a :func:`run_warmup` dict) as a
    resumable checkpoint.

    An ``MCMCResult`` from an int-seeded :func:`~mlx_mcmc_tpu.sample` run
    carries a ``resume_payload`` and is saved as a **bit-exact** sampling
    checkpoint: :func:`resume` continues draw-for-draw identical to an
    uninterrupted longer run. Results without a payload (PRNG-key seeds) fall
    back to the legacy position-only format (statistical resume).

    ``backend``: 'npz' (single portable file), 'orbax' (directory tree,
    async-capable, multi-host-aware), or 'auto' — orbax when installed and
    ``path`` has no .npz suffix, else npz.
    """
    if isinstance(result, dict) and result.get("phase") == "warmup":
        meta, arrays = _warmup_payload(result)
        _write_ckpt(path, meta, arrays, _resolve_backend(path, backend))
        return
    payload = getattr(result, "resume_payload", None)
    if payload is not None:
        meta, arrays = _sampling_payload(payload)
        _write_ckpt(path, meta, arrays, _resolve_backend(path, backend))
        return
    state = _result_state(result)
    backend = _resolve_backend(path, backend)
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


def _warmup_payload(ckpt: Dict[str, Any]):
    """(meta, arrays) for a mid-warmup checkpoint dict."""
    meta = {
        k: ckpt[k]
        for k in (
            "phase", "warmup_step", "num_warmup", "num_chains", "kernel",
            "seed", "dim",
        )
    }
    meta["sampler_kwargs"] = ckpt.get("sampler_kwargs", {})
    meta["data_fingerprint"] = ckpt.get("data_fingerprint")
    meta["mesh_axes"] = ckpt.get("mesh_axes")
    meta["param_names"] = list(ckpt["positions"].keys())
    meta["n_adapt"] = len(ckpt["adapt_leaves"])
    meta["n_traj"] = len(ckpt["traj_leaves"])
    arrays = {f"pos_{k}": np.asarray(v) for k, v in ckpt["positions"].items()}
    arrays.update(
        {f"adapt_{i}": np.asarray(x) for i, x in enumerate(ckpt["adapt_leaves"])}
    )
    arrays.update(
        {f"traj_{i}": np.asarray(x) for i, x in enumerate(ckpt["traj_leaves"])}
    )
    return meta, arrays


def _sampling_payload(payload: Dict[str, Any]):
    """(meta, arrays) for a bit-exact sampling checkpoint from an
    ``MCMCResult.resume_payload`` (inference/api.py)."""
    import jax

    positions = jax.vmap(payload["unravel"])(payload["flat_position"])
    meta = {
        "phase": "sampling",
        "num_warmup": payload["num_warmup"],
        "num_chains": payload["num_chains"],
        "next_sample_start": payload["next_sample_start"],
        "thin": payload["thin"],
        "kernel": payload["kernel"],
        "seed": payload["seed"],
        "dim": payload["dim"],
        "step_size": payload["step_size"],
        "adapt_step_size": payload["adapt_step_size"],
        "adapt_mass_matrix": payload["adapt_mass_matrix"],
        "target_accept": payload["target_accept"],
        "store_dtype": payload["store_dtype"],
        "sampler_kwargs": _storable_kwargs(payload["kernel_kwargs"]),
        # Callable kwargs (value_and_grad_fn, custom step fns) cannot be
        # serialized; record their NAMES so resume can demand they be
        # re-passed — silently rebuilding with autodiff instead of, say,
        # the fused Pallas vag would void bit-exactness without any error.
        "callable_kwargs": sorted(
            k for k, v in payload["kernel_kwargs"].items() if callable(v)
        ),
        "has_transforms": payload["has_transforms"],
        "data_fingerprint": payload["data_fingerprint"],
        # Sharded-run extras (sample_sharded payloads): the mesh layout the
        # tiled adaptation pytrees were produced under, and which
        # non-serializable arguments must be re-passed on resume.
        "mesh_axes": payload.get("mesh_axes"),
        "has_log_prior": bool(payload.get("has_log_prior", False)),
        "has_data_specs": bool(payload.get("has_data_specs", False)),
        "param_names": list(positions.keys()),
    }
    adapt_leaves = jax.tree_util.tree_leaves(payload["adapt"])
    traj_leaves = jax.tree_util.tree_leaves(payload["traj"])
    meta["n_adapt"] = len(adapt_leaves)
    meta["n_traj"] = len(traj_leaves)
    arrays = {f"pos_{k}": np.asarray(v) for k, v in positions.items()}
    arrays.update({f"adapt_{i}": np.asarray(x) for i, x in enumerate(adapt_leaves)})
    arrays.update({f"traj_{i}": np.asarray(x) for i, x in enumerate(traj_leaves)})
    # Redundant convenience copy (the mass matrix also lives inside the
    # adapt pytree): lets tooling inspect the adapted metric without
    # reconstructing AdaptationState.
    arrays["inv_mass_diag"] = np.asarray(payload["inv_mass_diag"])
    return meta, arrays


def _write_ckpt(path: str, meta: dict, arrays: dict, backend: str) -> None:
    """Write a (meta, arrays) checkpoint as npz (single file) or an Orbax
    directory (meta JSON travels as a uint8 code array — Orbax stores array
    pytrees, not strings)."""
    if backend == "orbax":
        import orbax.checkpoint as ocp

        tree = dict(arrays)
        tree["meta_json"] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        ).copy()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), tree, force=True)
        return
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **arrays, **{_META_KEY: json.dumps(meta)})


def _load_warmup_npz(data, meta) -> Dict[str, Any]:
    return {
        "phase": "warmup",
        "warmup_step": int(meta["warmup_step"]),
        "num_warmup": int(meta["num_warmup"]),
        "num_chains": int(meta["num_chains"]),
        "kernel": meta["kernel"],
        "seed": int(meta["seed"]),
        "dim": int(meta["dim"]),
        "sampler_kwargs": meta.get("sampler_kwargs", {}),
        "data_fingerprint": meta.get("data_fingerprint"),
        "mesh_axes": meta.get("mesh_axes"),
        "positions": {k: data[f"pos_{k}"] for k in meta["param_names"]},
        "adapt_leaves": [data[f"adapt_{i}"] for i in range(meta["n_adapt"])],
        "traj_leaves": [data[f"traj_{i}"] for i in range(meta["n_traj"])],
    }


def _load_sampling(data, meta) -> Dict[str, Any]:
    """Rehydrate a bit-exact sampling checkpoint (npz entries or an orbax
    array tree — both index arrays by the same keys)."""
    out = dict(meta)
    out["positions"] = {k: data[f"pos_{k}"] for k in meta["param_names"]}
    out["adapt_leaves"] = [data[f"adapt_{i}"] for i in range(meta["n_adapt"])]
    out["traj_leaves"] = [data[f"traj_{i}"] for i in range(meta["n_traj"])]
    if "inv_mass_diag" in data:
        out["inv_mass_diag"] = data["inv_mass_diag"]
    return out


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
                # The kernel NAME as ascii codes (Orbax stores arrays, not
                # strings) — an index into a hardcoded kernel list broke for
                # every kernel added after it was written (chees/mala/...).
                "kernel_name": np.frombuffer(
                    state["kernel"].encode("ascii"), dtype=np.uint8
                ).copy(),
            },
            force=True,
        )


def _orbax_load(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    if "meta_json" in tree:
        # New-format dict checkpoint (warmup or exact-sampling): the JSON
        # metadata travels as a uint8 code array alongside the array leaves.
        meta = json.loads(bytes(np.asarray(tree["meta_json"])).decode("utf-8"))
        if meta.get("phase") == "warmup":
            return _load_warmup_npz(tree, meta)
        return _load_sampling(tree, meta)
    if "kernel_name" in tree:
        kernel = bytes(np.asarray(tree["kernel_name"])).decode("ascii")
    else:  # legacy checkpoints (kernel_id index)
        kernel = ["metropolis", "hmc", "nuts"][int(tree["kernel_id"])]
    return {
        "positions": dict(tree["positions"]),
        "step_size": float(tree["step_size"]),
        "inv_mass_diag": np.asarray(tree["inv_mass_diag"]),
        "kernel": kernel,
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
        if meta.get("phase") == "warmup":
            return _load_warmup_npz(data, meta)
        if meta.get("phase") == "sampling":
            return _load_sampling(data, meta)
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
    data=None,
    transforms=None,
    mesh=None,
    axis: str = "chains",
    data_axis=None,
    data_specs=None,
    log_prior_fn=None,
    **kwargs,
):
    """Continue sampling from a checkpoint (dict, path, or an
    :class:`~mlx_mcmc_tpu.inference.api.MCMCResult` still in memory).

    Bit-exact checkpoints (int-seeded runs saved by :func:`save_checkpoint`,
    or a live ``MCMCResult``) continue the sampling scan at the stored global
    draw offset with the original chain keys: the returned draws equal —
    bit for bit — draws ``[offset, offset + num_samples)`` of one
    uninterrupted longer run. ``seed`` is ignored for these (the stream is
    the checkpoint's); ``data``/``transforms`` must match the original call.

    A checkpoint saved from a :func:`~mlx_mcmc_tpu.parallel.sample_sharded`
    result resumes with ``mesh=`` (plus ``axis``/``data_axis``/``data_specs``
    /``log_prior_fn`` matching the original call): the continuation runs
    under ``shard_map`` on a mesh of the SAME layout — cross-shard adaptation
    statistics round differently per layout, so a different one is refused —
    and its draws are bit-identical to the corresponding slice of one longer
    uninterrupted ``sample_sharded`` run. A vmap checkpoint cannot resume
    sharded, nor vice versa.

    Legacy position-only checkpoints resume with the checkpointed tunables
    but a fresh RNG stream (statistically equivalent continuation); extra
    kwargs forward to :func:`mlx_mcmc_tpu.sample`.
    """
    from mlx_mcmc_tpu.inference.api import sample

    if hasattr(checkpoint, "resume_payload"):
        payload = checkpoint.resume_payload
        if payload is not None:
            # A live MCMCResult: serialize->rehydrate through the same
            # payload helpers the file path uses, skipping the disk
            # roundtrip.
            meta, arrays = _sampling_payload(payload)
            checkpoint = _load_sampling(arrays, meta)
        else:
            # PRNG-key-seeded result: no exact payload exists; fall back to
            # the legacy statistical resume from the result's last draws.
            checkpoint = _result_state(checkpoint)
    if isinstance(checkpoint, str):
        checkpoint = load_checkpoint(checkpoint)
    if checkpoint.get("phase") == "sampling":
        if seed is not None:
            import warnings

            warnings.warn(
                "resume: `seed` is ignored for a bit-exact sampling "
                "checkpoint — the continuation always uses the "
                f"checkpointed run's RNG stream (seed={checkpoint['seed']}). "
                "For an independent continuation, use a legacy "
                "position-only checkpoint (save a PRNG-key-seeded result).",
                stacklevel=2,
            )
        if checkpoint.get("mesh_axes") is not None or mesh is not None:
            return _resume_exact_sharded(
                log_prob_fn,
                checkpoint,
                num_samples=num_samples,
                data=data,
                transforms=transforms,
                mesh=mesh,
                axis=axis,
                data_axis=data_axis,
                data_specs=data_specs,
                log_prior_fn=log_prior_fn,
                **kwargs,
            )
        return _resume_exact(
            log_prob_fn,
            checkpoint,
            num_samples=num_samples,
            data=data,
            transforms=transforms,
            **kwargs,
        )
    if checkpoint.get("phase") == "warmup":
        raise ValueError(
            "resume() got a mid-warmup checkpoint; use resume_warmup()"
        )
    if seed is None:
        # Continue the stream deterministically past the completed draws.
        seed = int(checkpoint["draws_completed"]) + 1

    start = {k: jnp.asarray(v) for k, v in checkpoint["positions"].items()}
    if data is not None:
        kwargs["data"] = data
    if transforms is not None:
        kwargs["transforms"] = transforms
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


def _validate_exact_resume(ckpt, kwargs, transforms, data):
    """Shared guards for bit-exact sampling continuations (vmap AND
    sharded): transforms presence, stored-kwarg contradictions, thin,
    missing callable kwargs, and the data fingerprint. Mutates ``kwargs``
    in place (re-applies the stored sampler kwargs) and returns
    ``(thin, fp)``."""
    if bool(ckpt.get("has_transforms")) != (transforms is not None):
        raise ValueError(
            "resume: the checkpointed run "
            + ("used" if ckpt.get("has_transforms") else "did not use")
            + " `transforms`; pass the same transforms dict to resume "
            "bit-exactly"
        )
    stored = dict(ckpt.get("sampler_kwargs") or {})
    for k, v in stored.items():
        if k in kwargs and kwargs[k] != v:
            raise ValueError(
                f"resume: kwarg {k}={kwargs[k]!r} contradicts the "
                f"checkpointed run's {k}={v!r}; resuming with different "
                "sampler settings is not bit-exact"
            )
        kwargs.setdefault(k, v)
    thin = int(ckpt.get("thin", 1))
    if kwargs.get("thin", thin) != thin:
        raise ValueError(
            f"resume: thin={kwargs['thin']} contradicts the checkpointed "
            f"run's thin={thin}"
        )
    kwargs["thin"] = thin
    missing_callables = [
        k for k in ckpt.get("callable_kwargs", []) if k not in kwargs
    ]
    if missing_callables:
        raise ValueError(
            "resume: the checkpointed run used callable kwarg(s) "
            f"{missing_callables} (e.g. a fused value_and_grad_fn) that "
            "cannot be serialized — re-pass the same callable(s) to resume "
            "bit-exactly (rebuilding with autodiff would silently change "
            "the accumulation order)"
        )
    stored_fp = ckpt.get("data_fingerprint")
    fp = _data_fingerprint(data)
    norm_stored = (
        None if stored_fp is None else [list(e) for e in stored_fp]
    )
    if fp != norm_stored:
        raise ValueError(
            "resume: the provided `data` pytree does not match the "
            "checkpointed run's data (structure/shape/dtype fingerprint "
            f"differs):\n  checkpoint: {norm_stored}\n  provided:   {fp}"
        )
    return thin, fp


def _resume_exact(
    log_prob_fn,
    ckpt: Dict[str, Any],
    *,
    num_samples: int,
    data,
    transforms,
    **kwargs,
):
    """Bit-exact sampling continuation: rebuild the engine with a zero-length
    warmup segment and scan draws ``[offset, offset + num_samples)`` of the
    original global step stream (engine ``sample_start``)."""
    import jax

    from mlx_mcmc_tpu.inference.api import MCMCResult, _as_key
    from mlx_mcmc_tpu.inference.engine import build_sampler, make_chain_keys
    from mlx_mcmc_tpu.ops.ravel import make_flat_logprob, ravel_params

    thin, fp = _validate_exact_resume(ckpt, kwargs, transforms, data)

    if transforms:
        from mlx_mcmc_tpu.distributions.transforms import (
            make_transformed_logprob,
        )

        lp_fn, to_constrained, _ = make_transformed_logprob(
            log_prob_fn, transforms, data_aware=data is not None
        )
    else:
        lp_fn, to_constrained = log_prob_fn, None

    positions = {k: jnp.asarray(v) for k, v in ckpt["positions"].items()}
    example = jax.tree_util.tree_map(lambda x: x[0], positions)
    z0_batch = jax.vmap(lambda tree: ravel_params(tree)[0])(positions)
    flat_log_prob, _, unravel = make_flat_logprob(
        lp_fn, example, data_aware=data is not None
    )
    num_warmup = int(ckpt["num_warmup"])
    dim = int(ckpt["dim"])
    store_key = ckpt.get("store_dtype")
    kernel = ckpt["kernel"]
    run = build_sampler(
        flat_log_prob,
        dim,
        kernel=kernel,
        num_warmup=num_warmup,
        num_samples=num_samples,
        step_size=ckpt["step_size"],
        adapt_step_size=bool(ckpt["adapt_step_size"]),
        adapt_mass_matrix=bool(ckpt["adapt_mass_matrix"]),
        target_accept=ckpt["target_accept"],
        warmup_start=num_warmup,
        warmup_stop=num_warmup,
        store_dtype=None if store_key is None else jnp.dtype(store_key),
        **kwargs,
    )
    key = _as_key(int(ckpt["seed"]))
    _, key_run = jax.random.split(key)
    chain_keys = make_chain_keys(key_run, int(ckpt["num_chains"]))
    resume_state = _resume_state_from_ckpt(ckpt)
    offset = int(ckpt["next_sample_start"])
    # Reuse the compiled continuation runner across repeated resume() calls
    # (api._RUNNER_CACHE): a resume LOOP extending a run would otherwise
    # re-trace+re-compile the whole sampling scan every call (~6 s host
    # work at the flagship shape). Same identity-keying rules as sample();
    # unhashable kwargs fall back to a one-off jit.
    from mlx_mcmc_tpu.inference.api import _hashable, _reuse_jit

    cacheable = (
        _hashable(ckpt["step_size"])
        and _hashable(ckpt["target_accept"])
        and all(_hashable(v) for v in kwargs.values())
        and (
            transforms is None
            or all(_hashable(v) for v in transforms.values())
        )
    )
    if cacheable:
        jrun = _reuse_jit(
            "resume_exact",
            (
                id(log_prob_fn),
                None
                if transforms is None
                else tuple(sorted(transforms.items())),
                kernel,
                num_warmup,
                num_samples,
                ckpt["step_size"],
                bool(ckpt["adapt_step_size"]),
                bool(ckpt["adapt_mass_matrix"]),
                ckpt["target_accept"],
                store_key,
                dim,
                data is not None,
                tuple(sorted(kwargs.items(), key=lambda kv: kv[0])),
            ),
            run,
            pin=(log_prob_fn, tuple(kwargs.values())),
        )
    else:
        jrun = jax.jit(run)
    result = jrun(
        chain_keys, z0_batch, data, resume_state, run.sched, offset
    )
    vv_unravel = jax.vmap(jax.vmap(unravel))
    samples = vv_unravel(result.positions)
    if to_constrained is not None:
        samples = to_constrained(samples)
    new_payload = {
        "phase": "sampling",
        "flat_position": result.final_state.position,
        "adapt": result.final_adapt,
        "traj": result.final_traj,
        "inv_mass_diag": result.final_tunables.inv_mass_diag,
        "unravel": unravel,
        "num_warmup": num_warmup,
        "num_chains": int(ckpt["num_chains"]),
        "next_sample_start": offset + num_samples,
        "thin": thin,
        "kernel": kernel,
        "seed": int(ckpt["seed"]),
        "dim": dim,
        "step_size": ckpt["step_size"],
        "adapt_step_size": bool(ckpt["adapt_step_size"]),
        "adapt_mass_matrix": bool(ckpt["adapt_mass_matrix"]),
        "target_accept": ckpt["target_accept"],
        "store_dtype": store_key,
        "kernel_kwargs": dict(kwargs),
        "has_transforms": transforms is not None,
        "data_fingerprint": fp,
    }
    return MCMCResult(
        samples=samples,
        info=result.info,
        tunables=result.final_tunables,
        num_chains=int(ckpt["num_chains"]),
        num_samples=num_samples,
        kernel=kernel,
        resume_payload=new_payload,
    )


def _resume_exact_sharded(
    log_prob_fn,
    ckpt: Dict[str, Any],
    *,
    num_samples: int,
    data,
    transforms,
    mesh,
    axis,
    data_axis,
    data_specs,
    log_prior_fn,
    **kwargs,
):
    """Bit-exact sampling continuation of a ``sample_sharded`` run: drives a
    zero-length-warmup engine segment under ``shard_map`` over a mesh of the
    checkpointed layout, restoring the TILED per-shard adaptation pytrees
    (each shard's Welford moments are its own) and scanning draws
    ``[offset, offset + num_samples)`` of the original global step stream."""
    import jax

    from mlx_mcmc_tpu.inference.api import MCMCResult
    from mlx_mcmc_tpu.ops.ravel import ravel_params
    from mlx_mcmc_tpu.parallel.sharded import _sharded_engine_run

    if transforms is not None:
        raise ValueError(
            "resume: sharded runs do not support transforms; the checkpoint "
            "cannot have been produced with them"
        )
    _check_mesh_axes(ckpt.get("mesh_axes"), mesh, axis, data_axis)
    if ckpt.get("has_log_prior") and log_prior_fn is None:
        raise ValueError(
            "resume: the checkpointed sharded run used log_prior_fn (the "
            "data-sharded prior split); re-pass the same function to resume "
            "bit-exactly"
        )
    if ckpt.get("has_data_specs") and data_specs is None:
        raise ValueError(
            "resume: the checkpointed sharded run passed explicit data_specs;"
            " re-pass the same PartitionSpecs to resume with the identical "
            "data layout"
        )
    thin, fp = _validate_exact_resume(ckpt, kwargs, transforms, data)

    positions = {k: jnp.asarray(v) for k, v in ckpt["positions"].items()}
    example = jax.tree_util.tree_map(lambda x: x[0], positions)
    z0_batch = jax.vmap(lambda tree: ravel_params(tree)[0])(positions)
    num_warmup = int(ckpt["num_warmup"])
    kernel = ckpt["kernel"]
    offset = int(ckpt["next_sample_start"])
    store_key = ckpt.get("store_dtype")
    if store_key is not None:
        kwargs["store_dtype"] = jnp.dtype(store_key)
    resume_state = _resume_state_from_ckpt(ckpt)

    (res_positions, info, tunables, final_state, adapt, traj, _stats,
     unravel, dim) = _sharded_engine_run(
        log_prob_fn,
        example,
        num_samples=num_samples,
        num_warmup=num_warmup,
        num_chains=int(ckpt["num_chains"]),
        kernel=kernel,
        seed=int(ckpt["seed"]),
        mesh=mesh,
        axis=axis,
        step_size=ckpt["step_size"],
        adapt_step_size=bool(ckpt["adapt_step_size"]),
        adapt_mass_matrix=bool(ckpt["adapt_mass_matrix"]),
        target_accept=ckpt["target_accept"],
        jitter=0.0,
        device_diagnostics=False,
        data=data,
        data_axis=data_axis,
        data_specs=data_specs,
        log_prior_fn=log_prior_fn,
        warmup_start=num_warmup,
        warmup_stop=num_warmup,
        resume_state=resume_state,
        z0_batch_override=z0_batch,
        sample_start=offset,
        **kwargs,
    )

    samples = jax.vmap(jax.vmap(unravel))(res_positions)
    new_payload = {
        "phase": "sampling",
        "flat_position": final_state.position,
        "adapt": adapt,
        "traj": traj,
        "inv_mass_diag": tunables.inv_mass_diag,
        "unravel": unravel,
        "num_warmup": num_warmup,
        "num_chains": int(ckpt["num_chains"]),
        "next_sample_start": offset + num_samples,
        "thin": thin,
        "kernel": kernel,
        "seed": int(ckpt["seed"]),
        "dim": dim,
        "step_size": ckpt["step_size"],
        "adapt_step_size": bool(ckpt["adapt_step_size"]),
        "adapt_mass_matrix": bool(ckpt["adapt_mass_matrix"]),
        "target_accept": ckpt["target_accept"],
        "store_dtype": store_key,
        "kernel_kwargs": {
            k: v for k, v in kwargs.items() if k != "store_dtype"
        },
        "has_transforms": False,
        "data_fingerprint": fp,
        "mesh_axes": ckpt.get("mesh_axes"),
        "has_log_prior": bool(ckpt.get("has_log_prior")),
        "has_data_specs": bool(ckpt.get("has_data_specs")),
    }
    return MCMCResult(
        samples=samples,
        info=info,
        tunables=tunables,
        num_chains=int(ckpt["num_chains"]),
        num_samples=num_samples,
        kernel=kernel,
        resume_payload=new_payload,
    )


# ---------------------------------------------------------------------------
# Mid-warmup checkpoint/resume
# ---------------------------------------------------------------------------


def _adapt_templates(dim: int, kernel: str):
    """Pytree templates used to (de)serialize adaptation state by leaf order."""
    from mlx_mcmc_tpu.kernels.adaptation import adaptation_init
    from mlx_mcmc_tpu.kernels.chees import trajectory_init

    adapt = adaptation_init(dim, 0.1, None)
    traj = trajectory_init(0.1) if kernel == "chees" else ()
    return adapt, traj


def _mesh_axes_meta(mesh, axis, data_axis):
    """The mesh layout recorded into a sharded warmup checkpoint: the
    chain-axis and data-axis sizes. Sharded adaptation pools statistics with
    pmean-of-shard-means / psums whose floating-point rounding depends on the
    shard factorization, so bit-exact resume requires the SAME layout — a
    checkpoint therefore refuses to resume under a different one."""
    if mesh is None:
        return None
    return {
        "axis": axis,
        "axis_size": int(mesh.shape[axis]),
        "data_axis": data_axis,
        "data_axis_size": int(mesh.shape[data_axis]) if data_axis else None,
    }


def _check_mesh_axes(stored, mesh, axis, data_axis):
    current = _mesh_axes_meta(mesh, axis, data_axis)
    if stored != current:
        raise ValueError(
            "resume_warmup: mesh layout differs from the checkpointed "
            f"run's (checkpoint: {stored}, resume: {current}). Cross-shard "
            "adaptation statistics round differently per layout, so "
            "resuming on a different mesh is not bit-exact — re-create the "
            "original mesh or re-run warmup from scratch."
        )


def _sharded_warmup_run(
    log_prob_fn,
    initial_params,
    *,
    num_warmup,
    warmup_start,
    warmup_stop,
    num_samples,
    num_chains,
    kernel,
    seed,
    data,
    jitter,
    resume_state,
    z0_batch_override,
    mesh,
    axis,
    data_axis,
    data_specs,
    log_prior_fn,
    **kwargs,
):
    """Sharded sibling of :func:`_warmup_run`: drives the same engine warmup
    segment under ``shard_map`` over ``mesh`` (parallel/sharded.py). Returns
    the same ``(result, unravel, dim)`` contract via a thin result shim."""
    import types

    from mlx_mcmc_tpu.parallel.sharded import _sharded_engine_run

    (positions, info, tunables, final_state, adapt, traj, _stats,
     unravel, dim) = _sharded_engine_run(
        log_prob_fn,
        initial_params,
        num_samples=num_samples,
        num_warmup=num_warmup,
        num_chains=num_chains,
        kernel=kernel,
        seed=seed,
        mesh=mesh,
        axis=axis,
        step_size=kwargs.pop("step_size", "auto"),
        adapt_step_size=kwargs.pop("adapt_step_size", True),
        adapt_mass_matrix=kwargs.pop("adapt_mass_matrix", True),
        target_accept=kwargs.pop("target_accept", None),
        jitter=jitter,
        device_diagnostics=False,
        data=data,
        data_axis=data_axis,
        data_specs=data_specs,
        log_prior_fn=log_prior_fn,
        warmup_start=warmup_start,
        warmup_stop=warmup_stop,
        resume_state=resume_state,
        z0_batch_override=z0_batch_override,
        **kwargs,
    )
    result = types.SimpleNamespace(
        positions=positions,
        info=info,
        final_tunables=tunables,
        final_state=final_state,
        final_adapt=adapt,
        final_traj=traj,
    )
    return result, unravel, dim


def _warmup_run(
    log_prob_fn,
    initial_params,
    *,
    num_warmup: int,
    warmup_start: int,
    warmup_stop: Optional[int],
    num_samples: int,
    num_chains: int,
    kernel: str,
    seed,
    data,
    jitter: float,
    resume_state,
    z0_batch_override,
    **kwargs,
):
    """Shared engine driver for warmup segments (mirrors the core of
    ``sample()``: same key derivation, so segments compose bit-identically
    with uninterrupted runs)."""
    import jax

    from mlx_mcmc_tpu.inference.api import _as_key
    from mlx_mcmc_tpu.inference.engine import (
        build_sampler,
        make_chain_keys,
        prepare_initial_positions,
        resolve_step_size,
    )
    from mlx_mcmc_tpu.ops.ravel import make_flat_logprob

    flat_log_prob, z0, unravel = make_flat_logprob(
        log_prob_fn, initial_params, data_aware=data is not None
    )
    del initial_params
    dim = z0.shape[0]
    step_size = resolve_step_size(
        kwargs.pop("step_size", "auto"), kernel, kwargs.get("adapt_step_size", True)
    )
    run = build_sampler(
        flat_log_prob,
        dim,
        kernel=kernel,
        num_warmup=num_warmup,
        num_samples=num_samples,
        step_size=step_size,
        warmup_start=warmup_start,
        warmup_stop=warmup_stop,
        **kwargs,
    )
    key = _as_key(seed)
    key_init, key_run = jax.random.split(key)
    chain_keys = make_chain_keys(key_run, num_chains)
    if z0_batch_override is not None:
        z0_batch = jnp.asarray(z0_batch_override)
    else:
        z0_batch = prepare_initial_positions(z0, num_chains, key_init, jitter)
    result = jax.jit(run)(chain_keys, z0_batch, data, resume_state, run.sched)
    return result, unravel, dim


def _data_fingerprint(data):
    """Cheap structural fingerprint of the ``data`` pytree (leaf paths,
    shapes, dtypes) — enough to catch "resumed with a different dataset"
    without hashing multi-GB arrays."""
    import jax

    if data is None:
        return None
    return [
        [
            jax.tree_util.keystr(path),
            list(np.shape(leaf)),
            # .dtype avoids a host copy for device arrays; plain Python
            # scalars fall back through np.asarray (tiny).
            str(leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype),
        ]
        for path, leaf in jax.tree_util.tree_flatten_with_path(data)[0]
    ]


def _storable_kwargs(kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """The JSON-serializable sampler kwargs. Callables (value_and_grad_fn,
    progress callbacks) cannot be checkpointed and must be re-passed on
    resume; everything scalar is recorded so a resume cannot silently run
    with different tunables than the original segment."""
    return {
        k: v
        for k, v in kwargs.items()
        if isinstance(v, (bool, int, float, str)) or v is None
    }


def _warmup_ckpt_dict(
    result, unravel, *, step, num_warmup, num_chains, kernel, seed, dim,
    sampler_kwargs=None, data_fingerprint=None, mesh_axes=None,
):
    import jax

    positions = jax.vmap(unravel)(result.final_state.position)
    return {
        "phase": "warmup",
        "warmup_step": int(step),
        "num_warmup": int(num_warmup),
        "num_chains": int(num_chains),
        "kernel": kernel,
        "seed": int(seed),
        "dim": int(dim),
        "sampler_kwargs": dict(sampler_kwargs or {}),
        "data_fingerprint": data_fingerprint,
        "mesh_axes": mesh_axes,
        # dict of (chains, *event) arrays — carries the param structure, so
        # resume_warmup can rebuild the flat<->dict mapping without the
        # original initial_params.
        "positions": {
            k: np.asarray(v) for k, v in positions.items()
        },
        "adapt_leaves": [
            np.asarray(x) for x in jax.tree_util.tree_leaves(result.final_adapt)
        ],
        "traj_leaves": [
            np.asarray(x) for x in jax.tree_util.tree_leaves(result.final_traj)
        ],
    }


def _resume_state_from_ckpt(checkpoint):
    import jax

    adapt_t, traj_t = _adapt_templates(checkpoint["dim"], checkpoint["kernel"])
    adapt = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(adapt_t),
        [jnp.asarray(x) for x in checkpoint["adapt_leaves"]],
    )
    traj = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(traj_t),
        [jnp.asarray(x) for x in checkpoint["traj_leaves"]],
    )
    return (adapt, traj)


def run_warmup(
    log_prob_fn,
    initial_params,
    *,
    num_warmup: int = 1000,
    stop: int,
    num_chains: int = 1,
    kernel: str = "nuts",
    seed: int = 0,
    data=None,
    jitter: float = 0.0,
    mesh=None,
    axis: str = "chains",
    data_axis=None,
    data_specs=None,
    log_prior_fn=None,
    **kwargs,
) -> Dict[str, Any]:
    """Run the warmup segment ``[0, stop)`` of an ``num_warmup``-step warmup
    and return a mid-warmup checkpoint dict (serialize with
    :func:`save_checkpoint`, continue with :func:`resume_warmup`).

    All other kwargs follow :func:`mlx_mcmc_tpu.sample` (kernel options,
    ``target_accept``, ``adapt_*`` flags, ...). The eventual draws are
    bit-identical to ``sample(..., num_warmup=num_warmup, seed=seed)``.

    With ``mesh=`` the segment runs sharded over ``mesh[axis]`` exactly like
    :func:`~mlx_mcmc_tpu.parallel.sample_sharded` (same collective
    adaptation; ``data_axis``/``data_specs``/``log_prior_fn`` follow its
    observation-sharding contract), and the eventual draws are bit-identical
    to the uninterrupted ``sample_sharded`` run on the same mesh. The mesh
    layout is recorded in the checkpoint: cross-shard statistics round
    differently per layout, so resume must re-create it.
    """
    if not 0 < stop <= num_warmup:
        raise ValueError(f"stop must be in (0, {num_warmup}], got {stop}")
    if not isinstance(seed, (int, np.integer)):
        # sample() also accepts PRNG-key seeds, but a checkpoint must record
        # the seed as a plain int to re-derive the identical key stream on
        # resume; fail BEFORE running the (possibly long) warmup segment.
        raise TypeError(
            "run_warmup requires an int seed (PRNG-key seeds cannot be "
            f"serialized into a warmup checkpoint), got {type(seed).__name__}"
        )
    common = dict(
        num_warmup=num_warmup,
        warmup_start=0,
        warmup_stop=stop,
        num_samples=0,
        num_chains=num_chains,
        kernel=kernel,
        seed=seed,
        data=data,
        jitter=jitter,
        resume_state=None,
        z0_batch_override=None,
    )
    if mesh is not None:
        result, unravel, dim = _sharded_warmup_run(
            log_prob_fn, initial_params, mesh=mesh, axis=axis,
            data_axis=data_axis, data_specs=data_specs,
            log_prior_fn=log_prior_fn, **common, **kwargs,
        )
    else:
        result, unravel, dim = _warmup_run(
            log_prob_fn, initial_params, **common, **kwargs,
        )
    return _warmup_ckpt_dict(
        result,
        unravel,
        step=stop,
        num_warmup=num_warmup,
        num_chains=num_chains,
        kernel=kernel,
        seed=seed,
        dim=dim,
        sampler_kwargs=dict(_storable_kwargs(kwargs), jitter=jitter),
        data_fingerprint=_data_fingerprint(data),
        mesh_axes=_mesh_axes_meta(mesh, axis, data_axis),
    )


def resume_warmup(
    log_prob_fn,
    checkpoint: Dict[str, Any] | str,
    *,
    num_samples: int = 1000,
    stop: Optional[int] = None,
    data=None,
    mesh=None,
    axis: str = "chains",
    data_axis=None,
    data_specs=None,
    log_prior_fn=None,
    **kwargs,
):
    """Continue from a mid-warmup checkpoint.

    With ``stop`` (< num_warmup): runs warmup ``[step, stop)`` and returns an
    updated checkpoint dict (segments chain arbitrarily). Without ``stop``:
    finishes warmup ``[step, num_warmup)``, draws ``num_samples``, and
    returns the :class:`~mlx_mcmc_tpu.inference.api.MCMCResult` —
    bit-identical to the uninterrupted run.

    A checkpoint written by a sharded ``run_warmup(..., mesh=...)`` must be
    resumed with a mesh of the same layout (chain-axis and data-axis sizes;
    validated), and vice versa a vmap checkpoint cannot resume sharded —
    cross-shard adaptation statistics round differently per layout.
    """
    if isinstance(checkpoint, str):
        checkpoint = load_checkpoint(checkpoint)
    if checkpoint.get("phase") != "warmup":
        raise ValueError(
            "resume_warmup needs a mid-warmup checkpoint (run_warmup); for "
            "post-warmup checkpoints use resume()"
        )
    _check_mesh_axes(checkpoint.get("mesh_axes"), mesh, axis, data_axis)
    start = int(checkpoint["warmup_step"])
    num_warmup = int(checkpoint["num_warmup"])
    kernel = checkpoint["kernel"]
    partial = stop is not None and stop < num_warmup
    if stop is not None and not start < stop <= num_warmup:
        raise ValueError(f"stop must be in ({start}, {num_warmup}], got {stop}")

    # Re-apply the original segment's sampler kwargs; a silent mismatch
    # (different max_tree_depth/target_accept/adapt flags) would void the
    # bit-exactness guarantee without any error. Caller kwargs may ADD
    # non-serializable options (value_and_grad_fn) but may not contradict
    # what the checkpoint recorded.
    stored = dict(checkpoint.get("sampler_kwargs") or {})
    jitter_stored = stored.pop("jitter", 0.0)  # positions already jittered
    del jitter_stored
    for k, v in stored.items():
        if k in kwargs and kwargs[k] != v:
            raise ValueError(
                f"resume_warmup: kwarg {k}={kwargs[k]!r} contradicts the "
                f"checkpointed run's {k}={v!r}; resuming with different "
                "sampler settings is not bit-exact (pass matching values "
                "or re-run warmup from scratch)"
            )
        kwargs.setdefault(k, v)
    stored_fp = checkpoint.get("data_fingerprint")
    if stored_fp is not None:
        fp = _data_fingerprint(data)
        if fp != [list(e) for e in stored_fp]:
            raise ValueError(
                "resume_warmup: the provided `data` pytree does not match "
                "the checkpointed run's data (structure/shape/dtype "
                f"fingerprint differs):\n  checkpoint: {stored_fp}\n"
                f"  provided:   {fp}"
            )

    import jax

    from mlx_mcmc_tpu.ops.ravel import ravel_params

    positions = {
        k: jnp.asarray(v) for k, v in checkpoint["positions"].items()
    }
    example = jax.tree_util.tree_map(lambda x: x[0], positions)
    z0_batch = jax.vmap(lambda tree: ravel_params(tree)[0])(positions)

    common = dict(
        num_warmup=num_warmup,
        warmup_start=start,
        warmup_stop=stop,
        num_samples=0 if partial else num_samples,
        num_chains=checkpoint["num_chains"],
        kernel=kernel,
        seed=checkpoint["seed"],
        data=data,
        jitter=0.0,
        resume_state=_resume_state_from_ckpt(checkpoint),
        z0_batch_override=z0_batch,
    )
    if mesh is not None:
        result, unravel, dim = _sharded_warmup_run(
            log_prob_fn, example, mesh=mesh, axis=axis, data_axis=data_axis,
            data_specs=data_specs, log_prior_fn=log_prior_fn,
            **common, **kwargs,
        )
    else:
        result, unravel, dim = _warmup_run(log_prob_fn, example, **common,
                                           **kwargs)
    if partial:
        return _warmup_ckpt_dict(
            result,
            unravel,
            step=stop,
            num_warmup=num_warmup,
            num_chains=checkpoint["num_chains"],
            kernel=kernel,
            seed=checkpoint["seed"],
            dim=dim,
            sampler_kwargs=checkpoint.get("sampler_kwargs"),
            data_fingerprint=checkpoint.get("data_fingerprint"),
            mesh_axes=checkpoint.get("mesh_axes"),
        )
    from mlx_mcmc_tpu.inference.api import MCMCResult

    samples = jax.vmap(jax.vmap(unravel))(result.positions)
    return MCMCResult(
        samples=samples,
        info=result.info,
        tunables=result.final_tunables,
        num_chains=checkpoint["num_chains"],
        num_samples=num_samples,
        kernel=kernel,
    )
