"""Sharded-embedding and sharded-ranking primitives (SURVEY §2.4).

The reference's only parallelism is OpenMP threads inside Cython kernels;
this module provides the TPU-native scale path the survey mandates:

* **Row-sharded embedding tables** over the ``model`` mesh axis — the
  recsys analogue of tensor/expert parallelism (catalog and user count are
  the scale axes).  ``row_shard_lookup`` resolves arbitrary global row ids
  against a sharded table inside ``shard_map``: every shard gathers the
  rows it owns and a ``psum`` over the model axis assembles the result —
  the all-to-all exchange rides ICI.
* **Sharded full-catalog ranking** — ``sharded_topk`` computes per-shard
  scores for the local item rows, takes a local ``top_k``, and merges the
  (score, id) candidates with ``all_gather`` + final ``top_k``: k log k
  work per chip instead of an n_items-wide argsort on one chip.

All functions are pure and jit/pjit-compatible; they compile against any
``Mesh`` built by :func:`cornac_tpu.parallel.make_mesh`, including the
virtual CPU meshes used in tests.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def row_shard_lookup(mesh, table, ids):
    """Gather rows of a model-axis row-sharded table by global row id.

    Parameters
    ----------
    mesh: jax.sharding.Mesh with a ``model`` axis.
    table: (R, d) array sharded P('model', None). R must be divisible by
        the model-axis size.
    ids: (B,) int32 global row indices (replicated or data-sharded).

    Returns
    -------
    (B, d) array with the same sharding as ``ids``'s leading axis.
    """
    n_shards = mesh.shape[MODEL_AXIS]
    rows_per_shard = table.shape[0] // n_shards

    def local_lookup(table_local, ids_local):
        shard = jax.lax.axis_index(MODEL_AXIS)
        off = shard * rows_per_shard
        local = ids_local - off
        owned = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        contrib = jnp.where(owned[:, None], table_local[safe], 0.0)
        return jax.lax.psum(contrib, MODEL_AXIS)

    return jax.shard_map(
        local_lookup,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )(table, ids)


def row_shard_scatter_add(mesh, table, ids, updates):
    """Scatter-add updates into a model-axis row-sharded table.

    Each shard applies only the updates whose global row it owns — the
    deterministic replacement for the reference's hogwild racy writes.
    """
    n_shards = mesh.shape[MODEL_AXIS]
    rows_per_shard = table.shape[0] // n_shards

    def local_scatter(table_local, ids_local, upd_local):
        shard = jax.lax.axis_index(MODEL_AXIS)
        off = shard * rows_per_shard
        local = ids_local - off
        owned = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        upd = jnp.where(owned[:, None], upd_local, 0.0)
        return table_local.at[safe].add(upd)

    return jax.shard_map(
        local_scatter,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(), P()),
        out_specs=P(MODEL_AXIS, None),
    )(table, ids, updates)


def sharded_topk(mesh, user_emb, item_table, k, item_bias=None):
    """Full-catalog top-k ranking with the item table row-sharded.

    Per shard: (B, d) @ (n_local, d)^T scores + local top-k; then the
    (k, score, global id) candidates are all-gathered over the model axis
    and merged with a final top-k — per-chip work is O(B · n/s · d).

    Returns (top scores (B, k), top global item ids (B, k)).
    """
    n_shards = mesh.shape[MODEL_AXIS]
    rows_per_shard = item_table.shape[0] // n_shards
    k = min(k, rows_per_shard)

    def local_rank(u_local, items_local, bias_local):
        shard = jax.lax.axis_index(MODEL_AXIS)
        off = shard * rows_per_shard
        scores = u_local @ items_local.T
        if bias_local is not None:
            scores = scores + bias_local[None, :]
        s, idx = jax.lax.top_k(scores, k)
        gid = idx + off
        # gather all shards' candidates, merge
        s_all = jax.lax.all_gather(s, MODEL_AXIS, axis=1, tiled=True)
        g_all = jax.lax.all_gather(gid, MODEL_AXIS, axis=1, tiled=True)
        sm, im = jax.lax.top_k(s_all, k)
        return sm, jnp.take_along_axis(g_all, im, axis=1)

    specs_in = (P(), P(MODEL_AXIS, None))
    args = (user_emb, item_table)
    if item_bias is not None:
        specs_in = specs_in + (P(MODEL_AXIS),)
        args = args + (item_bias,)
        fn = local_rank
    else:
        fn = lambda u, t: local_rank(u, t, None)

    # outputs are replicated by construction (every shard runs the same
    # final merge on all-gathered candidates); the checker can't infer it
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=specs_in, out_specs=(P(), P()),
        check_vma=False,
    )
    return mapped(*args)


def pad_rows_for_mesh(x, mesh, fill=0.0):
    """Pad a table's leading dim up to a multiple of the model-axis size."""
    import numpy as np

    n_shards = mesh.shape[MODEL_AXIS]
    pad = (-x.shape[0]) % n_shards
    if pad == 0:
        return x, x.shape[0]
    pad_block = np.full((pad, *x.shape[1:]), fill, dtype=x.dtype)
    return np.concatenate([np.asarray(x), pad_block]), x.shape[0]
