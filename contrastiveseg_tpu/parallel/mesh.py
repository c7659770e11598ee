"""Device mesh + sharding helpers: the whole distributed layer.

Replaces the reference's launcher / DDP / NCCL stack (lib/utils/distributed.py,
lib/extensions/parallel/**, SURVEY.md §2.9) with JAX global-view SPMD:

  * data parallelism = batch sharded over the ``data`` mesh axis; gradients,
    BN batch stats, confusion matrices and queue updates become XLA
    collectives inserted by the partitioner — no hand-written all-reduce;
  * the memory bank can be replicated (default; consistent by construction,
    fixing the reference's per-rank drift) or sharded over the memory axis
    with the loss matmul all-gathering over ICI;
  * multi-host: ``jax.distributed.initialize`` + per-host data feeding via
    ``jax.make_array_from_process_local_data`` (pipeline.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host batch dict on the mesh with the leading dim sharded.

    Single-process: a plain ``device_put`` (one process owns every device).
    Multi-process (a real pod): each host holds only its
    ``global_batch / process_count`` slice (data/pipeline.py divides the
    batch, mirroring the reference's ``batch_size // world_size``,
    /root/reference/lib/datasets/data_loader.py:137-138); the slices are
    assembled into one global array with
    ``jax.make_array_from_process_local_data`` — the JAX multi-host input
    recipe — so the jitted step sees the full global batch.
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _put_global(x: Any, sharding: NamedSharding) -> Any:
    """Place one host value on a (possibly multi-process) mesh sharding.

    Multi-process: every host computes the SAME full value (same seed /
    config), so ``make_array_from_callback`` hands each process its
    addressable shards of it — valid for any PartitionSpec, unlike
    ``device_put`` which rejects non-addressable shardings."""
    if jax.process_count() > 1:
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = _put_global(jax.random.key_data(x), sharding)
            return jax.random.wrap_key_data(
                data, impl=jax.random.key_impl(x))
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(x, sharding)


def shard_state(state: Any, mesh: Mesh, shard_queue: bool = False,
                axis_name: str = "data") -> Any:
    """Replicate the train state across the mesh (params are small enough
    for pure DP).  ``shard_queue`` additionally shards the memory bank's
    [C, M, D] queues over their memory axis — the framework's large-state
    axis; the contrast loss all-gathers the shard over ICI (the BASELINE
    north-star layout, also exercised by __graft_entry__.dryrun_multichip).
    """
    rep = replicate(mesh)
    state = jax.tree_util.tree_map(lambda x: _put_global(x, rep), state)
    if shard_queue and getattr(state, "bank", None) is not None:
        qshard = NamedSharding(mesh, P(None, axis_name, None))
        state = state.replace(
            bank=state.bank._replace(
                segment_queue=_put_global(state.bank.segment_queue, qshard),
                pixel_queue=_put_global(state.bank.pixel_queue, qshard),
            )
        )
    return state
