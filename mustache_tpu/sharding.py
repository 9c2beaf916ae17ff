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


class MeshRunner:
    """Band-resident sharded execution over a (block, row) mesh.

    The pipelines keep the chromosome's diagonal band RESIDENT on the mesh
    (replicated — every chip holds the band once) and shard only the tiny
    per-batch ``starts`` vector over the ``block`` axis; each chip then
    densifies and detects its own slice of the block batch from its local
    band copy. Replication costs one band H2D per chip but removes ALL
    per-batch host work (no host densify, no dense [B, N, N] re-upload —
    the round-2 transfer wins apply at mesh scale), and device-normalize
    runs on the placed band so every chip normalizes its copy in place
    (redundant FLOPs, zero communication). Outputs come back as the same
    packed two-buffer D2H the single-chip band path uses.

    The legacy dense entry ``runner(detector, blocks)`` remains for callers
    that already hold a dense [B, N, N] batch (or a tuple of two for the
    differential detector)."""

    def __init__(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self._band_sh = NamedSharding(mesh, P())          # replicated
        self._starts_sh = NamedSharding(mesh, P("block"))
        self._dense_sh = block_sharding(mesh)

    @property
    def nb(self) -> int:
        return int(self.mesh.shape["block"])

    def place_band(self, band):
        """Place a [rows, Dl] chromosome band replicated over the mesh
        (accepts host arrays or an already-placed device array)."""
        import jax

        return jax.device_put(band, self._band_sh)

    def place_starts(self, starts):
        """Place a [B] block-starts vector sharded over the `block` axis;
        B must be a multiple of the block axis size (pipelines pad)."""
        import jax

        return jax.device_put(np.asarray(starts, np.int32), self._starts_sh)

    def round_batch(self, b: int) -> int:
        """Smallest multiple of the block axis size >= b (batch shaping:
        every chip gets the same per-launch block count)."""
        return -(-b // self.nb) * self.nb

    def __call__(self, detector, blocks):
        import jax

        parts = blocks if isinstance(blocks, tuple) else (blocks,)
        B = parts[0].shape[0]
        pad = (-B) % self.nb
        if pad:
            parts = tuple(
                np.concatenate(
                    [b, np.zeros((pad,) + b.shape[1:], b.dtype)])
                for b in parts)
        arrs = tuple(jax.device_put(b, self._dense_sh) for b in parts)
        out = detector.fn(*arrs)
        if pad:
            out = jax.tree.map(lambda a: a[:B], out)
        return out


def make_runner(mesh) -> MeshRunner:
    """Build the band-resident sharded runner for ``mesh``."""
    return MeshRunner(mesh)


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
