"""Typed configuration dataclasses (SURVEY.md §5.6: the reference has no
config system — everything is loose kwargs at each layer). These stay
kwargs-friendly: ``sample(..., config=SamplerConfig(...))`` is equivalent to
spelling the fields out, and ``to_kwargs()`` flattens for the functional API.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class AdaptationConfig:
    """Warmup adaptation settings (Stan-style windowed schedule)."""

    adapt_step_size: bool = True
    adapt_mass_matrix: bool = True
    target_accept: Optional[float] = None  # kernel-dependent default
    init_buffer: int = 75
    term_buffer: int = 50
    base_window: int = 25


@dataclass(frozen=True)
class SamplerConfig:
    """Full sampler run configuration."""

    kernel: str = "nuts"
    num_samples: int = 1000
    num_warmup: int = 1000
    num_chains: int = 1
    # 'auto' = Stan-style find-reasonable-step-size probe for gradient
    # kernels (resolved per-kernel by the engine; metropolis falls back 0.1)
    step_size: object = "auto"
    num_leapfrog_steps: int = 10  # hmc only
    max_tree_depth: int = 10  # nuts only
    max_leapfrog_steps: int = 1000  # chees only: trajectory-length cap
    seed: int = 0
    jitter: float = 0.0
    thin: int = 1
    # Draw-store management (SURVEY.md §7 "full draws only on demand"):
    # store_dtype='bfloat16' halves the (chains, draws, D) HBM store;
    # draw_chunk=k scans the sampling phase in host-fetched chunks so the
    # store never has to fit HBM at all (bit-identical draws either way).
    store_dtype: Optional[str] = None
    draw_chunk: Optional[int] = None
    adaptation: AdaptationConfig = field(default_factory=AdaptationConfig)

    def to_kwargs(self) -> dict:
        kw = asdict(self)
        ad = kw.pop("adaptation")
        if kw.get("store_dtype") is None:
            kw.pop("store_dtype")
        if kw.get("draw_chunk") is None:
            kw.pop("draw_chunk")
        if kw.get("thin") == 1:
            kw.pop("thin")
        kw.update(
            adapt_step_size=ad["adapt_step_size"],
            adapt_mass_matrix=ad["adapt_mass_matrix"],
            target_accept=ad["target_accept"],
        )
        # Keep only the knobs the selected kernel consumes (metropolis/mala
        # take none of the trajectory knobs; their tuning is step_size +
        # adaptation flags, which always pass through).
        if self.kernel != "hmc":
            kw.pop("num_leapfrog_steps")
        if self.kernel != "nuts":
            kw.pop("max_tree_depth")
        if self.kernel != "chees":
            kw.pop("max_leapfrog_steps")
        return kw


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded sampling."""

    chains: Optional[int] = None  # mesh axis size; None = all devices
    data: int = 1
    axis_names: Tuple[str, str] = ("chains", "data")

    def build(self):
        from mlx_mcmc_tpu.parallel.mesh import chain_mesh, data_chain_mesh

        if self.data == 1:
            return chain_mesh(num_devices=self.chains)
        return data_chain_mesh(self.chains, self.data)
