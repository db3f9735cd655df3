"""Checkpoint/resume for sampler runs (absent in the reference: samples only
ever accumulate in Python lists, SURVEY.md §5.4)."""

from mlx_mcmc_tpu.io.checkpoint import (
    load_checkpoint,
    resume,
    save_checkpoint,
)

__all__ = ["save_checkpoint", "load_checkpoint", "resume"]
