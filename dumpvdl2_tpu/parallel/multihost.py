"""Multi-host deployment: distributed init, DCN ingest fan-out, gather.

The reference is a single process; its "distribution" is pthread
barriers over one shared buffer (dumpvdl2.c:117-135).  At pod scale
the equivalents are:

* ``init_distributed()`` — jax.distributed bring-up from the standard
  coordinator env vars; no-op in single-process runs.
* ``make_multihost_mesh()`` — (channel, time) mesh laid out so the
  time axis (which carries per-block ppermute halo traffic) stays
  inside each host's ICI domain, while the channel axis (zero steady
  traffic) spans hosts over DCN.
* ``distribute_block()`` — ingest fan-out: each process contributes
  the raw-IQ time span(s) its local devices own and receives a global
  sharded array; with one process this is a plain device_put.
* ``gather_candidates()`` — result gather: fetch only the shards a
  process can address; candidates are tiny (indices + symbols) next
  to the raw stream, so DCN result traffic is negligible.

Exercised two ways by tests/test_multihost.py: single-process on the
simulated 8-device CPU mesh, and FOR REAL with two ``jax.distributed``
processes over a localhost coordinator (4 forced CPU devices each ->
an 8-device global mesh spanning both), asserting per-process gathered
candidates equal the single-process run bit-for-bit.
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import CHANNEL_AXIS, TIME_AXIS


def init_distributed() -> bool:
    """Initialize jax.distributed from the environment, if configured.

    Uses the standard coordinator variables (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or their auto-detected cloud
    equivalents).  Returns True when running multi-process.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if addr and nproc and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    return jax.process_count() > 1


def make_multihost_mesh(channel_shards: int, time_shards: int) -> Mesh:
    """(channel, time) mesh with time contiguous within each host.

    ``jax.devices()`` orders devices process-major, so reshaping to
    (channel, time) with time as the fastest axis keeps every halo
    ppermute hop between devices of the same process (ICI), as long as
    time_shards divides the per-process device count.
    """
    devices = np.asarray(jax.devices())
    n = channel_shards * time_shards
    if devices.size < n:
        raise ValueError(f"need {n} devices, have {devices.size}")
    per_proc = max(1, jax.local_device_count())
    if jax.process_count() > 1 and time_shards > per_proc:
        raise ValueError(
            f"time_shards={time_shards} exceeds the per-host device "
            f"count {per_proc}: halo exchange would ride DCN")
    grid = devices[:n].reshape(channel_shards, time_shards)
    return Mesh(grid, (CHANNEL_AXIS, TIME_AXIS))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of a planar (2, N) raw block: time-sharded only (every
    channel shard consumes the same wideband stream)."""
    return NamedSharding(mesh, P(None, TIME_AXIS))


def local_time_spans(mesh: Mesh, n: int) -> list[tuple[int, int]]:
    """The [start, end) raw spans of the time shards this process's
    devices own — what a multi-host ingest must deliver to this host."""
    sharding = block_sharding(mesh)
    spans = set()
    for d in sharding.addressable_devices:
        idx = sharding.devices_indices_map((2, n))[d][1]
        spans.add((idx.start or 0, idx.stop if idx.stop is not None else n))
    return sorted(spans)


def distribute_block(mesh: Mesh, local_data: np.ndarray, n: int
                     ) -> jax.Array:
    """Build the global (2, N) raw block from per-process data.

    ``local_data``: this process's concatenated time spans (in
    local_time_spans order).  Single-process: the whole block.
    """
    sharding = block_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_data, sharding)
    return jax.make_array_from_process_local_data(
        sharding, local_data, global_shape=(2, n))


def gather_candidates(cands) -> dict:
    """Fetch the addressable portion of a sharded candidate pytree.

    Returns {field: np.ndarray} of the shards this process can read,
    stacked in shard order.  On one process this is the whole array.
    """
    out = {}
    for field in cands._fields:
        arr = getattr(cands, field)
        if jax.process_count() == 1 or not hasattr(arr, "addressable_shards"):
            out[field] = np.asarray(arr)
            continue
        shards = sorted(arr.addressable_shards,
                        key=lambda s: tuple(
                            sl.start or 0 for sl in s.index))
        out[field] = np.concatenate(
            [np.asarray(s.data) for s in shards],
            axis=0) if shards else np.asarray(arr)
    return out
