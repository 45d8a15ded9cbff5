"""Device-mesh scaling: data-parallel read batches over `jax.sharding`.

The pore model and reference tables are tiny (<= 2M floats) and replicated;
reads are embarrassingly parallel, so the mesh design is a single 'data'
axis over all chips (ICI-linked).  Host-side, each process feeds its own
shard of the BAM stream (read_idx % n_hosts) and outputs merge
deterministically by read index — the distributed analogue of the
reference's per-host file sharding + freq-merge (SURVEY §2.7).

Collectives: meth-freq count maps are associative sums -> psum over the
mesh; per-read outputs are gathered per host and merged by index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] arrays with B sharded over 'data'."""
    def put(x):
        if getattr(x, "ndim", 0) >= 1:
            spec = P("data", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def sharded_abea(mesh: Mesh, batch, n_bands: int, max_pairs: int):
    """ABEA fill+backtrace with the read axis sharded over the mesh.

    XLA partitions the vmapped scan along the batch axis; no cross-device
    communication is needed until outputs are gathered.
    """
    from ..ops.abea import abea_backtrace, abea_fill

    batch = shard_batch(mesh, batch)

    @functools.partial(jax.jit, static_argnames=("n_bands", "max_pairs"))
    def step(b, n_bands, max_pairs):
        fill_out = abea_fill(b, n_bands)
        return abea_backtrace(fill_out, b, max_pairs)

    return step(batch, n_bands=n_bands, max_pairs=max_pairs)


def sharded_pipeline_step(mesh: Mesh, abea_batch, hmm_batch, n_bands: int,
                          max_pairs: int, pad_events: int):
    """One full device step (ABEA + HMM forward) under the mesh, plus a
    psum'd global event count as the cross-chip statistics collective."""
    from ..ops.abea import abea_backtrace, abea_fill
    from ..ops.hmm import hmm_forward_batch

    abea_batch = shard_batch(mesh, abea_batch)
    hmm_batch = shard_batch(mesh, hmm_batch)

    @functools.partial(jax.jit,
                       static_argnames=("n_bands", "max_pairs", "pad_events"))
    def step(ab, hb, n_bands, max_pairs, pad_events):
        fill_out = abea_fill(ab, n_bands)
        pk, pe, n, sum_em, max_gap, failed = abea_backtrace(
            fill_out, ab, max_pairs)
        scores = hmm_forward_batch(hb, pad_events=pad_events)
        total_aligned = jnp.sum(n)          # global reduce over the mesh
        return (pk, pe, n, sum_em, max_gap, failed), scores, total_aligned

    return step(abea_batch, hmm_batch, n_bands=n_bands, max_pairs=max_pairs,
                pad_events=pad_events)
