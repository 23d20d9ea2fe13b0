"""utils/fetch.coalesced_get: one-transfer pytree fetch round-trips.

On the CPU test backend the function falls back to plain device_get;
the packing path is forced here via the private _PACK_JIT machinery so
the bit-exact unpack logic is covered everywhere (it is the TPU drain
path for every pipeline).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dumpvdl2_tpu.utils import fetch


def _tree():
    return {
        "i32": jnp.arange(7, dtype=jnp.int32) - 3,
        "f32": (jnp.linspace(-2, 2, 6, dtype=jnp.float32)
                .reshape(2, 3), None),
        "bool": jnp.asarray([True, False, True]),
        "f16": jnp.asarray(np.arange(6).reshape(3, 2) * 0.25,
                           jnp.float16),
        "u8": jnp.asarray(np.arange(5), jnp.uint8),
        "scalar": jnp.int32(42),
        "i64": jnp.asarray([1 << 40, -5], jnp.int64)
        if jax.config.jax_enable_x64 else jnp.asarray([7, -5], jnp.int32),
    }


def _check(got, want):
    assert np.array_equal(got["i32"], np.asarray(want["i32"]))
    assert np.allclose(got["f32"][0], np.asarray(want["f32"][0]))
    assert got["f32"][1] is None
    assert got["bool"].dtype == np.bool_
    assert list(got["bool"]) == [True, False, True]
    assert got["f16"].dtype == np.float16
    assert np.array_equal(got["f16"], np.asarray(want["f16"]))
    assert np.array_equal(got["u8"], np.asarray(want["u8"]))
    assert got["scalar"] == 42 and got["scalar"].shape == ()
    assert np.array_equal(got["i64"], np.asarray(want["i64"]))


def test_coalesced_get_roundtrip():
    tree = _tree()
    _check(fetch.coalesced_get(tree), tree)


def test_packed_path_roundtrip():
    """Force the bit-packing path (used on non-CPU backends)."""
    tree = _tree()
    if fetch._PACK_JIT is None:
        fetch._PACK_JIT = jax.jit(lambda ls: fetch._pack(ls))
    from jax import tree_util
    leaves, treedef = tree_util.tree_flatten(tree)
    buf = np.asarray(jax.device_get(fetch._PACK_JIT(leaves)))
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
    assert off == buf.size              # exact packing, no slack
    _check(tree_util.tree_unflatten(treedef, out), tree)


def test_empty_and_none_trees():
    assert fetch.coalesced_get(None) is None
    assert fetch.coalesced_get(()) == ()
    assert fetch.coalesced_get({"a": None}) == {"a": None}
