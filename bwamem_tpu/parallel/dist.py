"""Multi-chip data parallelism for the aligner.

The reference scales by replicating PE arrays behind private double
buffers, scheduled round-robin by batch_manager (SURVEY.md §2.1 items
1-2).  The TPU analogue: a `jax.sharding.Mesh` with a "data" axis; task
batches are sharded along the batch dimension (each chip = one giant PE
array), scoring parameters are replicated, and per-read result merging
(max over candidate alignments for MAPQ/XS, which needs all scores of a
read — SURVEY.md §7 "hard parts") runs as ICI collectives inside
shard_map rather than host gathers.

Reads-per-chip placement keeps a read's seeds on one chip (like the
reference keeps a task inside one PE array), so the merge collective is
only needed for cross-chip statistics, not per-read data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bwamem_tpu.ops.extend_jax import ExtendOut, ExtendParams, extend_batch


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def extend_sharded(mesh: Mesh, params: ExtendParams):
    """Build a jitted, data-parallel two-pass extension step.

    Returns fn(query, qlen, target, tlen, w, h0, max_ins, max_del)
    -> (ExtendOut, stats) where all (B, ...) inputs are sharded on the
    batch axis and stats = (total_best_score, n_improved) reduced over
    the whole mesh with psum (the result-merge collective path).
    """
    axis = mesh.axis_names[0]
    dp = P(axis)

    def local_step(query, qlen, target, tlen, w, h0, max_ins, max_del):
        out = extend_batch(query, qlen, target, tlen, w, h0,
                           max_ins, max_del, params)
        improved = (out.score > h0).astype(jnp.int32)
        local_sum = jnp.sum(out.score)
        local_n = jnp.sum(improved)
        tot = jax.lax.psum(local_sum, axis)
        n = jax.lax.psum(local_n, axis)
        return out, (tot, n)

    shard_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(dp, dp, dp, dp, dp, dp, dp, dp),
        out_specs=(ExtendOut(*([dp] * 7)), (P(), P())),
        # the while_loop carry mixes replicated init values with sharded
        # inputs; skip the varying-manual-axes consistency check
        check_vma=False,
    )
    return jax.jit(shard_fn)


def shard_batch(mesh: Mesh, arrays):
    """Device-put a pytree of (B, ...) host arrays with batch-dim sharding."""
    axis = mesh.axis_names[0]
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))),
        arrays)
