"""Device mesh construction helpers.

Chains map to a data-parallel mesh axis ('chains'); very large observation
sets can additionally shard the likelihood over a 'data' axis (the MCMC
analog of sequence/tensor parallelism — SURVEY.md §5.7). On a multi-host pod
slice, ``jax.experimental.mesh_utils`` lays the axes out so 'data'
collectives (per-leapfrog psum of log-likelihood terms) ride ICI within a
host's chips while 'chains' (one pmean per warmup step) spans DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def chain_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh with a single 'chains' axis over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("chains",))


def data_chain_mesh(
    chains: int,
    data: int,
    devices=None,
) -> Mesh:
    """2-D ('chains', 'data') mesh: chains x data-shards.

    The 'data' axis carries the per-leapfrog log-likelihood psum (latency
    critical -> keep it on ICI); the 'chains' axis only communicates once per
    warmup draw.
    """
    if devices is None:
        device_array = mesh_utils.create_device_mesh((chains, data))
    else:
        device_array = np.asarray(devices).reshape(chains, data)
    return Mesh(device_array, ("chains", "data"))
