"""Device-side CSR value lookup (binary search returning stored values).

Extends :mod:`cornac_tpu.ops.membership` for models that need the *rating*
of a (user, item) pair, not just its presence (e.g. MTER's BPR pair-order
reversal on co-rated items, reference ``recom_mter.pyx:578-585``).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


class CsrLookup:
    """Pytree-compatible (indptr, indices, data) with a jit-safe query."""

    def __init__(self, arrays, search_steps):
        self.arrays = arrays
        self.search_steps = search_steps

    @classmethod
    def build(cls, csr_matrix):
        if not csr_matrix.has_sorted_indices:
            csr_matrix = csr_matrix.sorted_indices()
        max_degree = int(np.diff(csr_matrix.indptr).max(initial=0))
        steps = max(1, math.ceil(math.log2(max_degree + 1)) + 1)
        return cls(
            (
                jnp.asarray(np.asarray(csr_matrix.indptr, dtype=np.int32)),
                jnp.asarray(np.asarray(csr_matrix.indices, dtype=np.int32)),
                jnp.asarray(np.asarray(csr_matrix.data, dtype=np.float32)),
            ),
            steps,
        )

    def query(self, users, items):
        """Returns (found bool array, values float array; 0 when absent)."""
        indptr, indices, data = self.arrays
        users = users.astype(jnp.int32)
        items = items.astype(jnp.int32)
        lo = indptr[users]
        hi = indptr[users + 1]
        row_end = hi

        def step(_, carry):
            lo, hi = carry
            active = lo < hi
            mid = (lo + hi) // 2
            v = indices[jnp.maximum(mid, 0)]
            go_right = v < items
            new_lo = jnp.where(active & go_right, mid + 1, lo)
            new_hi = jnp.where(active & ~go_right, mid, hi)
            return new_lo, new_hi

        lo, hi = jax.lax.fori_loop(0, self.search_steps, step, (lo, hi))
        safe = jnp.minimum(lo, indices.shape[0] - 1)
        found = (lo < row_end) & (indices[safe] == items)
        return found, jnp.where(found, data[safe], 0.0)

    def query_position(self, users, items):
        """Like query, but also returns the nnz position of each found pair
        (0 when absent) — useful as a compact (user, item) pair id for
        secondary lookups without 64-bit key encodings."""
        indptr, indices, data = self.arrays
        users = users.astype(jnp.int32)
        items = items.astype(jnp.int32)
        lo = indptr[users]
        hi = indptr[users + 1]
        row_end = hi

        def step(_, carry):
            lo, hi = carry
            active = lo < hi
            mid = (lo + hi) // 2
            v = indices[jnp.maximum(mid, 0)]
            go_right = v < items
            new_lo = jnp.where(active & go_right, mid + 1, lo)
            new_hi = jnp.where(active & ~go_right, mid, hi)
            return new_lo, new_hi

        lo, hi = jax.lax.fori_loop(0, self.search_steps, step, (lo, hi))
        safe = jnp.minimum(lo, indices.shape[0] - 1)
        found = (lo < row_end) & (indices[safe] == items)
        return found, jnp.where(found, data[safe], 0.0), jnp.where(found, safe, 0)


jax.tree_util.register_pytree_node(
    CsrLookup,
    lambda m: (m.arrays, m.search_steps),
    lambda steps, arrays: CsrLookup(arrays, steps),
)
