"""Device mesh construction for multi-chip scale-out.

The reference is single-node share-nothing (SURVEY §2c); the TPU design
scales along two axes:

* ``reads`` — data parallelism over the read stream (alignment, triage);
* ``genome`` — the k-mer table sharded by position range, for genomes whose
  index exceeds one chip's HBM (human-scale; BASELINE north star).

Gap-fill instances shard along ``reads`` as well (gaps are embarrassingly
parallel).  Model sufficient statistics merge with ``psum`` over both axes —
the two collective merge points called out in SURVEY §5.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, genome_shards: int = 1) -> Mesh:
    """Mesh of shape (reads, genome); genome axis defaults to 1 (replicated)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if n % genome_shards != 0:
        raise ValueError(f"{n} devices not divisible by {genome_shards}")
    arr = np.array(devs).reshape(n // genome_shards, genome_shards)
    return Mesh(arr, ("reads", "genome"))


def reads_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("reads"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
