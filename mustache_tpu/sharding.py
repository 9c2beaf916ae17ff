"""Multi-device / multi-host execution: mesh construction and sharded runners.

The unit of data parallelism is the detection block (the reference's
multiprocessing fan-out, mustache.py:913-934, re-expressed as SPMD): a
``[B, N, N]`` block batch is sharded over the ``block`` mesh axis. A second
``row`` axis shards each block's rows; XLA GSPMD then partitions the blur
convolutions with automatic halo exchange over ICI and inserts collectives
(psum/all-gather) for the masked reductions, the BH sort, and top_k — the
TPU-native answer to the reference's fork+pickle+Manager IPC.

Multi-host: ``initialize_distributed`` wires ``jax.distributed`` so the
same code runs across pod-slice hosts; per-host block batches are combined
with ``multihost_utils`` on the driver side.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def make_mesh(n_block: int | None = None, n_row: int = 1, devices=None):
    """Build a (block, row) mesh over the available devices."""
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    nd = len(devices)
    if n_block is None:
        n_block = nd // n_row
    if n_block < 1 or n_block * n_row > nd:
        raise ValueError(
            f"mesh {n_block}x{n_row} needs {max(n_block, 1) * n_row} "
            f"devices, have {nd}")
    arr = np.array(devices[: n_block * n_row]).reshape(n_block, n_row)
    return Mesh(arr, ("block", "row"))


def block_sharding(mesh):
    """NamedSharding for a [B, N, N] block batch: batch over `block`,
    rows over `row` (XLA adds conv halo exchange automatically)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("block", "row", None))


def make_runner(mesh):
    """A pipeline `runner(detector, blocks)`: place the batch with the mesh
    sharding and invoke the jitted detector; outputs come back addressable
    on the host. ``blocks`` is a [B, N, N] batch, or a tuple of two such
    batches for the differential detector (both conditions sharded alike)."""
    import jax

    sharding = block_sharding(mesh)

    def runner(detector, blocks):
        parts = blocks if isinstance(blocks, tuple) else (blocks,)
        B = parts[0].shape[0]
        nb = mesh.shape["block"]
        pad = (-B) % nb
        if pad:
            parts = tuple(
                np.concatenate(
                    [b, np.zeros((pad,) + b.shape[1:], b.dtype)])
                for b in parts)
        arrs = tuple(jax.device_put(b, sharding) for b in parts)
        out = detector.fn(*arrs)
        if pad:
            out = jax.tree.map(lambda a: a[:B], out)
        return out

    return runner


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up (jax.distributed); no-op when single-process."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_chromosomes(chromosomes: Sequence[str], process_id: int,
                      num_processes: int) -> list[str]:
    """Static chromosome partition across hosts (config-4 benchmark shape:
    chromosomes x band-tiles over a pod slice)."""
    return [c for i, c in enumerate(chromosomes)
            if i % num_processes == process_id]
