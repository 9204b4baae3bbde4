"""Device mesh and sharding helpers.

The reference scales with single-process ``torch.nn.DataParallel``
(/root/reference/ssn_train.py:67) — replicate module, scatter batch, gather
outputs. The TPU-native equivalent is one jitted program over a
``jax.sharding.Mesh``: the batch is sharded over the ``data`` axis, parameters
are replicated, and XLA inserts the gradient all-reduce over ICI. Multi-host
scaling uses the same program after ``jax.distributed.initialize`` (DCN
between hosts, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def select_devices(indices: Optional[Sequence[int]] = None):
    """Device subset by LOCAL index — the reference's ``--gpus`` device list
    (ssn_opts.py:60, ssn_test.py:52). None selects all GLOBAL devices (the
    multi-host default mesh); explicit indices select from this process's
    ``jax.local_devices()`` (a single-host convenience, like the reference's
    per-node GPU ids — don't combine --gpus with multi-host runs, where every
    process must contribute the same mesh)."""
    if indices is None:
        return jax.devices()
    devs = jax.local_devices()
    if len(set(indices)) != len(indices):
        raise ValueError(f"duplicate device indices in --gpus: {list(indices)}")
    bad = [i for i in indices if not 0 <= i < len(devs)]
    if bad:
        raise ValueError(f"device indices {bad} out of range: "
                         f"{len(devs)} local devices available")
    return [devs[i] for i in indices]


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Form a batch-sharded global pytree from host arrays.

    Single process: a plain device_put. Multi-host: each process contributes
    its local slice of the batch (its addressable shard of the global array);
    pass per-process data whose leading dim is ``global_batch / process_count``.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh (hosts must hold identical values)."""
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, jax.device_get(x)), tree)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join a multi-host training job (DCN). No-op for single host."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
