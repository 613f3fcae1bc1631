"""Multi-host data loading: per-process shard reads → global device arrays.

SURVEY hard part #3. Each host reads only its slice of the ensemble archive
(tensorstore range reads — no full-array load), then
``jax.make_array_from_process_local_data`` assembles the global sharded array
over the mesh. Replaces the reference's ``DistributedSampler`` (per-rank
subsampling of a fully-loaded dataset, models_cnn.py:496-498) with reads that
scale with per-host memory, not global size.

Degrades cleanly to single-process (shard = everything).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_slice(total: int, axis_procs: int | None = None) -> slice:
    """This process's contiguous slice of a length-``total`` axis."""
    nproc = jax.process_count() if axis_procs is None else axis_procs
    pid = jax.process_index()
    base, rem = divmod(total, nproc)
    start = pid * base + min(pid, rem)
    return slice(start, start + base + (1 if pid < rem else 0))


def load_member_shard(zarr_array, time_idx: slice | None = None) -> np.ndarray:
    """Read this process's member slice from a (time, member, ...) store."""
    sl = process_slice(zarr_array.shape[zarr_array.axis("member")])
    idx = [slice(None)] * len(zarr_array.dims)
    idx[zarr_array.axis("member")] = sl
    if time_idx is not None:
        idx[zarr_array.axis("time")] = time_idx
    return zarr_array[tuple(idx)]


def global_sharded_array(
    local: np.ndarray,
    mesh: Mesh,
    spec: P,
) -> jax.Array:
    """Assemble a global array from per-process local shards.

    ``spec`` names the mesh axes each array axis is sharded over; the local
    block must be this process's portion under that sharding.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local)


def all_gather_from_hosts(x) -> np.ndarray:
    """Gather per-host values to every host (replaces dist.all_gather +
    rank reorder, models_gnn.py:470-471). Single-process: identity."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))
