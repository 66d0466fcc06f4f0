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


def make_mesh(devices=None, data_parallel=None):
    """Build a (data, model) mesh over the available devices.

    Parameters
    ----------
    devices: list of jax devices, optional
        Defaults to ``jax.devices()``.
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
