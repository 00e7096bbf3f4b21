"""Device mesh helpers.

The reference's only parallelism is OpenMP chunking over one host
(multiexp.tcc:403-441, basic_radix2_domain_aux.tcc:218-296).  The TPU
equivalent is SPMD over a jax.sharding.Mesh: MSM points/scalars and FFT
columns shard across chips; window partials / transposes ride ICI
collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def shard_last(mesh: Mesh, ndim: int) -> NamedSharding:
    """NamedSharding that splits the last axis across the data axis."""
    spec = P(*([None] * (ndim - 1) + [DATA_AXIS]))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
