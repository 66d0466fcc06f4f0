"""Deterministic grouped row accumulation: ``table[ids] += updates``.

The strategy is picked from static shapes at trace time:

- **one-hot matmul** (``one_hot(ids).T @ updates``) when the table has at
  most as many rows as the update batch. It runs on the MXU with a fixed
  reduction order and measures faster than XLA's scatter lowering at
  recommender factor widths — but its FLOPs scale with ``rows x batch``.
- **scatter-add** above that: O(batch) work regardless of table size.
  XLA's TPU scatter is deterministic (sequential semantics), so both
  strategies are reproducible; they differ only in float summation order.

Measured crossover on v5e (k=32, batch 16384): rows 2048 -> one-hot wins
(542 vs 607 us/step), rows 16384 -> scatter edges ahead, rows 131072 ->
scatter 1.8x faster (PERF.md).
"""

import jax
import jax.numpy as jnp


def accumulate_rows(table, ids, updates):
    """Return ``table`` with ``updates`` summed into rows ``ids``.

    ``table``: (R, ...) float array; ``ids``: (B,) int; ``updates``:
    (B, ...) matching trailing dims. Deterministic under either strategy.
    """
    n_rows = table.shape[0]
    if n_rows <= ids.shape[0]:
        oh = jax.nn.one_hot(ids, n_rows, dtype=table.dtype)
        return table + jnp.tensordot(oh, updates, axes=((0,), (0,)))
    return table.at[ids].add(updates)
