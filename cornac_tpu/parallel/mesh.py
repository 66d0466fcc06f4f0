"""Device mesh + sharding helpers — the framework's communication backend.

The reference has no distributed runtime at all (OpenMP threads inside
Cython kernels only — SURVEY §2.4); this module is the TPU-native
equivalent built on ``jax.sharding``: a 2-D ``Mesh`` with a ``data`` axis
(batch parallelism) and a ``model`` axis (row-sharded embedding tables —
the recsys analogue of tensor/expert parallelism, since the scale axis is
catalog/user count, not sequence length). Collectives (psum for gradient
reduction, all-to-all for cross-shard row gather/scatter) are inserted by
XLA GSPMD from these annotations and ride ICI.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address=None, num_processes=None, process_id=None, **kwargs
):
    """Initialize the multi-host JAX runtime (``jax.distributed``).

    Call once per host before any device use when training across hosts
    (each host drives its local chips; collectives cross hosts over DCN).
    With no arguments the standard cluster environment variables
    (``JAX_COORDINATOR_ADDRESS`` etc. / TPU pod metadata) are used.
    Safe to call when already initialized or in a single-process run —
    both cases are no-ops.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except (RuntimeError, ValueError) as e:
        # already initialized, or single-process with no coordinator info
        if "already" not in str(e) and coordinator_address is not None:
            raise


def make_mesh(devices=None, data_parallel=None):
    """Build a (data, model) mesh over the available devices.

    In a multi-host run (``jax.process_count() > 1``) the data axis is
    laid out so that it crosses hosts while the model axis stays within a
    host's slice — gradient psums ride DCN once per step, but the chatty
    row-gather/scatter all-to-alls of the sharded embedding tables stay on
    ICI (SURVEY §2.4's mandated layout).

    Parameters
    ----------
    devices: list of jax devices, optional
        Defaults to ``jax.devices()`` (all devices across all hosts).
    data_parallel: int, optional
        Size of the data axis; the model axis takes the rest. Defaults to
        all devices on data (model axis of 1) — the right choice until
        embedding tables outgrow one chip's HBM.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n
    if n % data_parallel != 0:
        raise ValueError(
            f"data_parallel={data_parallel} must divide device count {n}"
        )
    model_parallel = n // data_parallel

    n_proc = getattr(jax, "process_count", lambda: 1)()
    if n_proc > 1 and len(devices) == len(jax.devices()):
        # hybrid ICI x DCN layout: hosts partition the data axis
        if data_parallel % n_proc == 0 and (n // n_proc) % model_parallel == 0:
            try:
                from jax.experimental import mesh_utils

                dev_array = mesh_utils.create_hybrid_device_mesh(
                    (data_parallel // n_proc, model_parallel),
                    (n_proc, 1),
                    devices=devices,
                )
            except ValueError:
                # no slice metadata (e.g. multi-process CPU simulation):
                # group process-major so the model axis stays inside one
                # process (ICI) and the data axis crosses processes (DCN)
                by_proc = sorted(
                    devices, key=lambda d: (d.process_index, d.id)
                )
                dev_array = np.asarray(by_proc).reshape(
                    data_parallel, model_parallel
                )
            return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))

    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def shard_rows(mesh, x):
    """Shard a parameter table's leading (row) dim over the model axis."""
    spec = P(MODEL_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_batch(mesh, x):
    """Shard a batch's leading dim over the data axis."""
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_replicated(mesh, x):
    """Replicate an array across the whole mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_rows_to_multiple(x, multiple):
    """Pad a table's row count so it divides evenly across shards."""
    pad = (-x.shape[0]) % multiple
    if pad == 0:
        return x
    return np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def shard_tables(mesh, *tables):
    """Row-shard parameter tables over the model axis, padding each row
    count to the shard count. Padded rows are inert — training ids never
    reference them — and callers slice ``[:n]`` when pulling results back.
    ``None`` entries pass through. One table in, one table out (no tuple).
    """
    shards = mesh.shape[MODEL_AXIS]
    out = tuple(
        None
        if t is None
        else shard_rows(mesh, pad_rows_to_multiple(np.asarray(t), shards))
        for t in tables
    )
    return out[0] if len(out) == 1 else out


def replicate_all(mesh, *values):
    """Replicate arrays (or pytrees of arrays) across the whole mesh.
    ``None`` entries pass through; one value in, one value out."""
    out = tuple(
        None
        if v is None
        else jax.tree_util.tree_map(lambda a: shard_replicated(mesh, a), v)
        for v in values
    )
    return out[0] if len(out) == 1 else out
