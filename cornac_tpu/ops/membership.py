"""Device-side membership tests over sparse interaction sets.

TPU-native replacement for the reference's per-sample CSR binary search in C
(``models/bpr/recom_bpr.pyx:47-51 has_non_zero``): a branchless, fully
vectorized binary search over CSR rows. All arithmetic is int32 (TPU-native;
no emulated int64), so it is safe at any catalog scale — unlike a flattened
``u * num_items + i`` key encoding, which overflows int32 beyond ~2^31
cells.
"""

import jax
import jax.numpy as jnp
import numpy as np

# 2^31 rows is beyond any realistic per-row degree; 31 halving steps always
# converge the [lo, hi) window of the binary search.
_SEARCH_STEPS = 31


def build_csr_device(csr_matrix):
    """Host-side: (indptr, indices) int32 device arrays from a scipy CSR
    (column indices sorted within each row)."""
    if not csr_matrix.has_sorted_indices:
        csr_matrix = csr_matrix.sorted_indices()
    return (
        jnp.asarray(np.asarray(csr_matrix.indptr, dtype=np.int32)),
        jnp.asarray(np.asarray(csr_matrix.indices, dtype=np.int32)),
    )


def is_member(indptr, indices, users, items):
    """(n,) bool — whether each (user, item) pair is a stored entry.

    Vectorized binary search: every element keeps its own [lo, hi) window in
    the CSR ``indices`` array; 31 fixed halving steps run as pure VPU math
    under jit (no data-dependent control flow).
    """
    users = users.astype(jnp.int32)
    items = items.astype(jnp.int32)
    lo = indptr[users]
    hi = indptr[users + 1]
    row_end = hi

    def step(_, carry):
        lo, hi = carry
        active = lo < hi
        mid = (lo + hi) // 2
        # clamp for empty windows; result unused when inactive
        v = indices[jnp.maximum(mid, 0)]
        go_right = v < items
        new_lo = jnp.where(active & go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, _SEARCH_STEPS, step, (lo, hi))
    found = (lo < row_end) & (indices[jnp.minimum(lo, indices.shape[0] - 1)] == items)
    return found
