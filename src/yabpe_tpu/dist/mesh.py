"""Device mesh construction helpers.

The training mesh has two logical axes:

- ``data``: unique-word rows are sharded across it; per-step pair counts are
  partial sums psum'd over this axis (ICI within a slice, DCN across hosts).
- ``vocab``: optional second axis sharding the dense pair-count table by
  left-symbol rows, for vocabularies whose [V, V] table is too large per
  device.

The reference has no distributed runtime at all (SURVEY.md §2.2/§5.8); this
layer is the TPU-native equivalent mandated by the north star.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from yabpe_tpu.utils.jaxsetup import compute_devices


def make_data_mesh(num_shards: int | None = None) -> Mesh:
    """1-D ``data`` mesh over the first ``num_shards`` local devices."""
    devices = compute_devices()
    if num_shards is None:
        num_shards = len(devices)
    if num_shards > len(devices):
        raise ValueError(
            f"requested {num_shards} shards but only {len(devices)} devices"
        )
    return jax.make_mesh((num_shards,), ("data",), devices=devices[:num_shards])


def make_2d_mesh(data_shards: int, vocab_shards: int) -> Mesh:
    """(data, vocab) mesh; data x vocab must cover exactly that many devices."""
    devices = np.asarray(compute_devices())
    need = data_shards * vocab_shards
    if need > devices.size:
        raise ValueError(f"need {need} devices, have {devices.size}")
    grid = devices[:need].reshape(data_shards, vocab_shards)
    return Mesh(grid, ("data", "vocab"))


def put_global(tree, shardings):
    """Place a pytree of host-replicated arrays onto a (possibly
    multi-process) mesh.

    Single process: plain ``jax.device_put``. Multi-process: every process
    must hold the SAME host value for every leaf (true for training state —
    the globally-unioned ingest table is identical everywhere, see
    yabpe_tpu.dist.ingest); each process then donates its addressable
    shards via ``jax.make_array_from_callback``, which is the supported
    construction for arrays spanning non-addressable devices.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put_leaf(x, sharding):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # Already a global array (e.g. produced by a shard_map on this
            # mesh); it must already carry the requested layout.
            if x.sharding != sharding:
                raise ValueError(
                    f"global array has sharding {x.sharding}, wanted "
                    f"{sharding}; cross-process resharding is not supported "
                    "here"
                )
            return x
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree.map(put_leaf, tree, shardings)


def multihost_initialize() -> None:
    """Initialize jax.distributed when running under a multi-host launcher.

    No-op when the coordinator env vars are absent (single host).
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


__all__ = [
    "make_data_mesh",
    "make_2d_mesh",
    "multihost_initialize",
    "put_global",
]
