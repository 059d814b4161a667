"""Single-transfer scene upload: pack a pytree into ONE device buffer.

The tunneled TPU backend pays a ~10-20 ms round trip per host->device
transfer; building a scene leaf-by-leaf (~100+ arrays across geometry,
lights, materials, samplers, accel tables) costs seconds of pure latency
(round-4 verdict: Cornell fresh-process build ~11.5 s on TPU). This module
serializes every array leaf into one contiguous byte buffer host-side,
ships it with a single device_put, and slices/bitcasts the leaves back out
on device under one jitted unpack (persistent-cache friendly: the unpack
graph depends only on the leaf layout).

Reference analogue: none — the reference's scene lives in host/GPU unified
memory. This is tunnel-latency engineering specific to the TPU deployment.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_ALIGN = 128


def _is_array_leaf(x):
    return isinstance(x, (np.ndarray, jnp.ndarray)) and not isinstance(
        x, (bool, int, float)
    )


def pack_to_device(tree, device=None):
    """Move every array leaf of `tree` to the (default) device via one
    transfer. Non-array leaves (None, python scalars, static fields) pass
    through untouched. Host numpy leaves are packed; jax.Array leaves are
    converted host-side first (np.asarray)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    metas = []
    chunks = []
    offset = 0
    for i, leaf in enumerate(leaves):
        if not _is_array_leaf(leaf):
            metas.append(None)
            continue
        a = np.asarray(leaf)
        if a.dtype == np.bool_:
            raw = a.astype(np.uint8)
        else:
            raw = a
        b = raw.reshape(-1).view(np.uint8)
        pad = (-len(b)) % _ALIGN
        metas.append((i, a.dtype, a.shape, offset, len(b)))
        chunks.append(b)
        if pad:
            chunks.append(np.zeros(pad, np.uint8))
        offset += len(b) + pad
    if not chunks:
        return tree
    buf = np.concatenate(chunks)

    # One transfer.
    dbuf = jax.device_put(buf, device)

    @jax.jit
    def unpack(dbuf):
        out = []
        for m in metas:
            if m is None:
                out.append(None)
                continue
            _, dtype, shape, off, nbytes = m
            raw = jax.lax.dynamic_slice(dbuf, (off,), (nbytes,))
            if dtype == np.bool_:
                arr = raw.reshape(shape).astype(jnp.bool_)
            else:
                item = np.dtype(dtype).itemsize
                arr = jax.lax.bitcast_convert_type(
                    raw.reshape(-1, item), jnp.dtype(dtype)
                ).reshape(shape)
            out.append(arr)
        return tuple(out)

    unpacked = unpack(dbuf)
    new_leaves = [
        unpacked[i] if metas[i] is not None else leaves[i]
        for i in range(len(leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def build_on_host(builder):
    """Run a scene builder with jnp array creation pinned to the host CPU
    backend (zero tunnel RPCs), returning the host-resident result. Pair
    with pack_to_device for the single-upload pattern. Requires the CPU
    platform to be allowed (jax_platforms includes 'cpu')."""
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        return builder()
    with jax.default_device(cpus[0]):
        return builder()
