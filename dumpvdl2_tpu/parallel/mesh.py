"""Device-mesh construction for the sharded VDL2 pipeline.

The reference's concurrency is thread-per-channel over a shared sample
buffer plus a barrier pair (dumpvdl2.c:117-135, demod.c:299-336).  The
TPU-native re-expression is a 2-D logical mesh:

* ``channel`` axis — embarrassingly parallel: each shard demodulates a
  subset of the VDL2 channel frequencies over the full time range
  (data parallelism; no communication).
* ``time`` axis — overlap-save sequence parallelism: the raw IQ block
  is split into contiguous time shards; FIR carry and sync-lookback /
  burst-extension halos move between neighbouring shards with
  ``jax.lax.ppermute`` over ICI.

Multi-host deployments map ``time`` within a host's chips (halos ride
ICI) and ``channel`` across hosts (no traffic rides DCN except ingest
fan-out and result gather).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

CHANNEL_AXIS = "channel"
TIME_AXIS = "time"


def make_mesh(channel_shards: int, time_shards: int,
              devices=None) -> Mesh:
    """Build a (channel, time) mesh over ``channel_shards*time_shards``
    devices (defaults to ``jax.devices()``)."""
    if devices is None:
        devices = jax.devices()
    n = channel_shards * time_shards
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for a {channel_shards}x{time_shards} mesh, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(channel_shards, time_shards)
    return Mesh(grid, (CHANNEL_AXIS, TIME_AXIS))
