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

# two-level mesh axes: the outer axis models the slow interconnect
# (DCN, across hosts), the inner one the fast interconnect (ICI,
# within a slice).  Collectives reduce over ICI first, then DCN —
# the hierarchical pattern SURVEY §2.5 prescribes for multi-host MSM.
OUTER_AXIS = "dcn"
INNER_AXIS = "ici"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_mesh_2d(n_outer: int, n_inner: int, devices=None) -> Mesh:
    """(outer=DCN, inner=ICI) mesh: n_outer simulated hosts of n_inner
    chips each.  On real multi-host hardware pass the global device list
    in host-major order so the inner axis maps onto each host's slice."""
    if devices is None:
        devices = jax.devices()
    need = n_outer * n_inner
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_outer, n_inner)
    return Mesh(arr, (OUTER_AXIS, INNER_AXIS))


def shard_last(mesh: Mesh, ndim: int) -> NamedSharding:
    """NamedSharding that splits the last axis across the data axis."""
    spec = P(*([None] * (ndim - 1) + [DATA_AXIS]))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
