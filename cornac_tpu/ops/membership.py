"""Device-side membership tests over sparse interaction sets.

TPU-native replacement for the reference's per-sample CSR binary search in C
(``models/bpr/recom_bpr.pyx:47-51 has_non_zero``). Two strategies, chosen at
build time by :func:`build_membership`:

- **bitmap**: one bit per (user, item) cell packed into uint32 words,
  row-major with each user's row padded to whole words — a single gather +
  bit test per query. Word indexing is ``user * words_per_row + (item>>5)``
  so it stays within int32 far beyond 2^31 dense cells (the limit is
  2^31 *words*, i.e. ~68G cells). Budget default 64 MB: measured at
  Netflix shape (480k x 17.7k, benchmarks/micro_netflix_step.py), the
  1.06 GiB giant bitmap LOSES to the binary search inside the real
  training loop (2.74 vs 1.73 s/epoch at 8M interactions) — the isolated
  query is 16x faster (0.05 vs 0.76 ms) but random single-word gathers
  over a GiB-scale table thrash HBM once the rest of the step competes
  for bandwidth, and the table costs ~19 s of extra transfer per fit
  through this rig's tunnel. Small catalogs keep the win.
- **b+tree**: per-user sorted item ids packed into 64-wide int32 leaves
  plus one 64-wide internal node per user (slot 0 = the user's first leaf
  index, slots 1.. = first key of each later leaf, INT32_MAX padded).  A
  query is TWO 256-byte row gathers + vectorized compares — 256-byte rows
  ride the TPU's fast row-gather path (~115 Mrows/s on v5e vs ~23 Mrows/s
  for thin rows, benchmarks/micro_gather_variants.py), so this replaces
  log2(max_degree) serial 4-byte gathers of the binary search and
  measures ~4x faster at Netflix scale (benchmarks/micro_btree_probe.py).
  Exact; holds degrees up to 64*63 = 4032 per user.
- **binary search**: branchless vectorized search over CSR rows, with the
  step count bounded by log2(max row degree) instead of a worst-case
  constant. All arithmetic int32 (TPU-native; no emulated int64), safe at
  any catalog scale. Fallback when a user's degree exceeds the b+tree cap.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

_BITMAP_MAX_BYTES = 64 * 1024 * 1024
_BTREE_WIDTH = 64  # 64 x int32 = 256 B, the fast row-gather granularity
_SENTINEL = np.int32(2**31 - 1)


class Membership:
    """Device-resident membership structure with a jit-safe ``query``.

    Instances are pytree-compatible via the (arrays, meta) split so they
    can be closed over in jitted functions.
    """

    def __init__(self, kind, arrays, num_items, search_steps=0):
        self.kind = kind  # 'bitmap' | 'csr'
        self.arrays = arrays
        self.num_items = num_items
        self.search_steps = search_steps

    @property
    def words_per_row(self):
        return (self.num_items + 31) // 32

    def query(self, users, items):
        """(n,) bool — whether each (user, item) pair is a stored entry.
        Runs under jit; pure VPU math + gathers."""
        users = users.astype(jnp.int32)
        items = items.astype(jnp.int32)
        if self.kind == "bitmap":
            (bitmap,) = self.arrays
            word_idx = users * jnp.int32(self.words_per_row) + (
                jax.lax.shift_right_logical(items, 5)
            )
            word = bitmap[word_idx]
            bit = jax.lax.shift_right_logical(
                word, (items & 31).astype(jnp.uint32)
            ) & jnp.uint32(1)
            return bit != 0

        if self.kind == "btree":
            leaves, internal = self.arrays
            node = internal[users]  # (B, 64) fat row gather
            base = node[:, 0]
            child = jnp.sum(
                node[:, 1:] <= items[:, None], axis=1
            ).astype(jnp.int32)
            leaf = leaves[base + child]  # (B, 64) fat row gather
            return jnp.any(leaf == items[:, None], axis=1)

        indptr, indices = self.arrays
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
        found = (lo < row_end) & (
            indices[jnp.minimum(lo, indices.shape[0] - 1)] == items
        )
        return found


def build_membership(csr_matrix, bitmap_max_bytes=None, btree_max_degree=None):
    """Host-side: build the best membership structure for a scipy CSR.
    Order: bitmap while it fits the byte budget (1 thin gather — wins on
    small catalogs), then the b+tree while every user's degree fits its
    2-level cap (2 fast fat gathers — wins at scale), then the CSR binary
    search (any scale). ``bitmap_max_bytes``/``btree_max_degree`` default
    to the module constants (read at call time so tests/benchmarks can
    pick a strategy explicitly)."""
    if bitmap_max_bytes is None:
        bitmap_max_bytes = _BITMAP_MAX_BYTES
    if btree_max_degree is None:
        btree_max_degree = _BTREE_WIDTH * (_BTREE_WIDTH - 1)
    n_users, n_items = csr_matrix.shape
    wpr = (n_items + 31) // 32
    n_words = n_users * wpr
    if n_words < 2**31 and n_words * 4 <= bitmap_max_bytes:
        words = np.zeros(n_words, dtype=np.uint32)
        rows = np.repeat(
            np.arange(n_users, dtype=np.int64), np.diff(csr_matrix.indptr)
        )
        cols = np.asarray(csr_matrix.indices, dtype=np.int64)
        np.bitwise_or.at(
            words,
            rows * wpr + (cols >> 5),
            np.uint32(1) << (cols & 31).astype(np.uint32),
        )
        return Membership("bitmap", (jnp.asarray(words),), n_items)

    if not csr_matrix.has_sorted_indices:
        csr_matrix = csr_matrix.sorted_indices()
    max_degree = int(np.diff(csr_matrix.indptr).max(initial=0))
    if max_degree <= btree_max_degree:
        return Membership(
            "btree", _build_btree_arrays(csr_matrix), n_items
        )
    steps = max(1, math.ceil(math.log2(max_degree + 1)) + 1)
    return Membership(
        "csr",
        (
            jnp.asarray(np.asarray(csr_matrix.indptr, dtype=np.int32)),
            jnp.asarray(np.asarray(csr_matrix.indices, dtype=np.int32)),
        ),
        n_items,
        search_steps=steps,
    )


# pytree registration so Membership can cross jit boundaries as an argument
jax.tree_util.register_pytree_node(
    Membership,
    lambda m: (m.arrays, (m.kind, m.num_items, m.search_steps)),
    lambda meta, arrays: Membership(meta[0], arrays, meta[1], meta[2]),
)


def _build_btree_arrays(csr_matrix, width=_BTREE_WIDTH):
    """Host build of the b+tree arrays (leaves, internal); see module
    docstring for the layout. Vectorized: one scatter for all leaf slots,
    one short loop (max_leaves iterations) for the separators."""
    n_users = csr_matrix.shape[0]
    deg = np.diff(csr_matrix.indptr)
    n_leaves = np.maximum((deg + width - 1) // width, 1)
    leaf_start = np.zeros(n_users + 1, np.int64)
    np.cumsum(n_leaves, out=leaf_start[1:])
    leaves = np.full((int(leaf_start[-1]), width), _SENTINEL, np.int32)
    rows = np.repeat(np.arange(n_users), deg)
    offs = np.arange(len(csr_matrix.indices)) - np.repeat(
        csr_matrix.indptr[:-1].astype(np.int64), deg
    )
    leaves[leaf_start[rows] + (offs // width), offs % width] = (
        csr_matrix.indices
    )
    internal = np.full((n_users, width), _SENTINEL, np.int32)
    internal[:, 0] = leaf_start[:-1]
    for l in range(1, int(n_leaves.max(initial=1))):
        has = n_leaves > l
        internal[has, l] = leaves[leaf_start[:-1][has] + l, 0]
    return jnp.asarray(leaves), jnp.asarray(internal)


def build_csr_device(csr_matrix):
    """(indptr, indices) int32 device arrays from a scipy CSR (legacy)."""
    if not csr_matrix.has_sorted_indices:
        csr_matrix = csr_matrix.sorted_indices()
    return (
        jnp.asarray(np.asarray(csr_matrix.indptr, dtype=np.int32)),
        jnp.asarray(np.asarray(csr_matrix.indices, dtype=np.int32)),
    )


def is_member(indptr, indices, users, items, search_steps=31):
    """Legacy functional form of the CSR binary search."""
    m = Membership("csr", (indptr, indices), 0, search_steps=search_steps)
    return m.query(users, items)
