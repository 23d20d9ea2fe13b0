"""One-transfer device fetch: pack a pytree into a single buffer.

``jax.device_get`` issues one transfer per array leaf; on a
latency-bound host<->device link (the deployment target is a remote
TPU: ~45 ms floor per transfer, ~40 MB/s) a drain of ~20 small result
arrays costs ~1 s in pure round-trips.  ``coalesced_get`` bit-packs
every leaf into ONE uint8 device buffer (a trivial fused reshape +
concatenate program, compiled once per shape signature) so the whole
pytree crosses the link in a single transfer, then unpacks on the host
with zero-copy ``np.frombuffer`` views.

Reference analog: none — the reference is a host-only program; this is
the TPU-native replacement for its "decoder thread reads a struct from
a queue" step (decode.c:422-440).
"""
from __future__ import annotations

import numpy as np


def _pack(leaves):
    import jax.numpy as jnp
    from jax import lax
    parts = []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if arr.dtype == jnp.bool_:
            arr = arr.astype(jnp.uint8)
        if arr.dtype != jnp.uint8:
            arr = lax.bitcast_convert_type(arr, jnp.uint8)
        parts.append(arr.reshape(-1))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


_PACK_JIT = None


def coalesced_get(tree):
    """Fetch an arbitrary pytree of device arrays in ONE transfer.

    Returns the same pytree structure with numpy arrays (host views
    into one backing buffer — treat as read-only).  None leaves pass
    through (they are empty subtrees).  Host-resident numpy leaves are
    packed along with the rest (cheap) to keep the structure uniform.
    """
    global _PACK_JIT
    import jax
    from jax import tree_util

    leaves, treedef = tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    if jax.default_backend() == "cpu":
        # no link to amortize: packing would just memcpy the big
        # arrays through an extra buffer
        return jax.device_get(tree)
    # convert up front so pack and unpack agree on the WIRE dtype —
    # e.g. a host numpy int64 leaf becomes int32 on a non-x64 device,
    # and unpacking with the original 8-byte dtype would corrupt every
    # later leaf's offset
    import jax.numpy as jnp
    leaves = [jnp.asarray(leaf) for leaf in leaves]
    if _PACK_JIT is None:
        _PACK_JIT = jax.jit(lambda ls: _pack(ls))
    buf = np.asarray(jax.device_get(_PACK_JIT(leaves)))
    out, off = [], 0
    for leaf in leaves:
        shape = tuple(leaf.shape)
        dt = np.dtype(leaf.dtype)
        is_bool = dt == np.bool_
        wire_dt = np.dtype(np.uint8) if is_bool else dt
        n = int(np.prod(shape, dtype=np.int64))
        arr = np.frombuffer(buf, dtype=wire_dt, count=n,
                            offset=off).reshape(shape)
        if is_bool:
            arr = arr.view(np.bool_)
        out.append(arr)
        off += n * wire_dt.itemsize
    return tree_util.tree_unflatten(treedef, out)
