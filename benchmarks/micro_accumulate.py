"""Microbenchmark: deterministic grouped row accumulation strategies.

Compares, inside a fused ``lax.fori_loop`` (so per-dispatch latency through
the remote tunnel is amortized away), the candidate lowerings of
``table[ids] += updates`` at recommender shapes:

- ``onehot_f32``  : one_hot(ids).T @ updates in f32 (current small-table path)
- ``onehot_bf16`` : bf16 one-hot & updates, f32 accumulation (halved HBM
  traffic, doubled MXU rate; summation order unchanged)
- ``scatter``     : XLA scatter-add (current large-table path)
- ``sort_combine``: sort ids, combine duplicate rows via segment boundaries
  on a cumulative sum, then scatter unique sorted rows with
  ``unique_indices=True, indices_are_sorted=True``

Prints one JSON line per (rows, batch, k, strategy).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def onehot_f32(table, ids, updates):
    oh = jax.nn.one_hot(ids, table.shape[0], dtype=table.dtype)
    return table + jnp.tensordot(oh, updates, axes=((0,), (0,)))


def onehot_bf16(table, ids, updates):
    oh = jax.nn.one_hot(ids, table.shape[0], dtype=jnp.bfloat16)
    acc = jax.lax.dot_general(
        oh,
        updates.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return table + acc


def scatter(table, ids, updates):
    return table.at[ids].add(updates)


def sorted_scatter(table, ids, updates):
    order = jnp.argsort(ids)
    return table.at[ids[order]].add(updates[order], indices_are_sorted=True)


def sort_combine(table, ids, updates):
    """Sort ids, reduce duplicate rows to one update each (difference of
    cumulative sums at run boundaries), then scatter unique sorted rows."""
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sids = ids[order]
    csum = jnp.cumsum(updates[order], axis=0)
    pos = jnp.arange(n)
    is_first = jnp.concatenate([jnp.array([True]), sids[1:] != sids[:-1]])
    is_last = jnp.concatenate([sids[1:] != sids[:-1], jnp.array([True])])
    # index of own run's first element, propagated by a max-scan
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, pos, -1)
    )
    prev_csum = jnp.where(
        (seg_start > 0)[:, None],
        csum[jnp.maximum(seg_start - 1, 0)],
        0.0,
    )
    run_total = jnp.where(is_last[:, None], csum - prev_csum, 0.0)
    # non-run-end entries -> padding row, sliced off after the scatter
    tgt = jnp.where(is_last, sids, table.shape[0])
    padded = jnp.concatenate(
        [table, jnp.zeros((1,) + table.shape[1:], table.dtype)]
    )
    # tgt is not sorted (padding ids interleave) and the padding id repeats,
    # so no fast-path flags here; the win, if any, is the shrunken number of
    # colliding rows the scatter has to serialize.
    out = padded.at[tgt].add(run_total)
    return out[:-1]


STRATS = {
    "onehot_f32": onehot_f32,
    "onehot_bf16": onehot_bf16,
    "scatter": scatter,
    "sorted_scatter": sorted_scatter,
    "sort_combine": sort_combine,
}


def bench(rows, batch, k, name, fn):
    def loop(table, key):
        def body(i, tb):
            kk = jax.random.fold_in(key, i)
            ids = jax.random.randint(kk, (batch,), 0, rows)
            upd = jax.random.normal(kk, (batch, k), jnp.float32) * 1e-4
            return fn(tb, ids, upd)

        return jax.lax.fori_loop(0, ITERS, body, table)

    jl = jax.jit(loop)
    table = jnp.zeros((rows, k), jnp.float32)
    key = jax.random.PRNGKey(0)
    jl(table, key).block_until_ready()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jl(table, key).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    us = best / ITERS * 1e6
    print(
        json.dumps(
            {
                "rows": rows,
                "batch": batch,
                "k": k,
                "strategy": name,
                "us_per_step": round(us, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    # correctness spot-check on CPU-sized data first
    rows, batch, k = 257, 1024, 11
    rng = np.random.RandomState(0)
    tb = jnp.asarray(rng.randn(rows, k).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, rows, batch).astype(np.int32))
    upd = jnp.asarray(rng.randn(batch, k).astype(np.float32))
    ref = np.asarray(scatter(tb, ids, upd))
    for name, fn in STRATS.items():
        got = np.asarray(fn(tb, ids, upd))
        err = np.abs(got - ref).max()
        # matmul strategies run through the MXU whose default f32 precision
        # is bf16 passes — tolerance reflects that
        tol = 5e-2 if "onehot" in name else 1e-4
        assert err < tol, (name, err)
    print(json.dumps({"check": "ok"}), flush=True)

    for rows, batch, k in [
        (3706, 8192, 11),   # ML-1M items
        (6040, 8192, 11),   # ML-1M users
        (3706, 8192, 51),   # wider factors
        (131072, 16384, 33),  # large-catalog regime
        (1682, 4096, 11),   # ML-100K items (headline bench shape)
    ]:
        for name, fn in STRATS.items():
            bench(rows, batch, k, name, fn)
