"""Ranking metrics.

Two computation paths per metric, both with the exact semantics of reference
``cornac/metrics/ranking.py:20-527``:

- ``compute(...)``: per-user, numpy — identical inputs/outputs to the
  reference (``gt_pos``/``gt_neg`` index vectors, ``pd_rank`` ranked
  candidate indices, ``pd_scores`` candidate scores). Used as ground truth
  in tests and by the slow/compat eval path.
- ``batch_compute(ctx)``: vectorized over a batch of users via a shared
  :class:`RankingContext` of rank/count arrays derived from a dense score
  matrix. This is what the batched TPU eval harness calls — it replaces the
  reference's per-user Python loop (``eval_methods/base_method.py:177-226``).
  Count-based metrics (AUC, MAP, Precision/Recall tp counts) are tie-exact;
  order-based metrics (NDCG/NCRR/MRR positions) match the reference up to
  tie-breaking among equal scores.
"""

import numpy as np
from scipy.stats import rankdata

# above this many score cells, rank/tie computation moves to the device.
# The crossover is environment-specific: through this benchmark rig's
# remote-dispatch tunnel, shipping the (B, N) rank/tie matrices back costs
# more than the host argsort until ~8M cells (measured: 1024x3706 batches
# are faster on host); on a directly-attached TPU the device path wins far
# earlier and the threshold can be lowered. Below the threshold the numpy
# path also reproduces reference tie handling at float64 exactly.
# Minimum B*N score-matrix size before the per-user rank/tie fallback
# offloads to the device. Below this, host numpy wins: each device program
# costs a dispatch round-trip (multi-hundred ms through a remote-TPU
# tunnel). Tunable via RuntimeConfig(device_metrics_min_cells=...) — e.g.
# set it low on a local (non-tunneled) backend. The batched production
# eval path doesn't use this fallback at all (it runs the fused metric
# kernel, eval_methods/base_method.py).
_DEVICE_MIN_CELLS = 8_000_000


def set_device_metrics_min_cells(n):
    global _DEVICE_MIN_CELLS
    _DEVICE_MIN_CELLS = int(n)


def _device_rank_and_ties(scores, pos_mask, cand_mask):
    """(rank_of, c_lt, p_lt) computed in one jitted program (int32 — the
    transfer back through the dispatch tunnel is the cost at scale).

    Sort-based throughout (permutation inverses via double argsort) — no
    scatters. Scores are compared in float32 on device: models score in
    f32, so tie groups match the host float64 path except for genuine
    f64-only distinctions, which recommender scores do not produce.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def kernel(scores, pos_mask, cand_mask):
        B, N = scores.shape
        order = jnp.argsort(-scores, axis=1, stable=True)
        iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
        rank_of = jnp.put_along_axis(
            jnp.empty((B, N), jnp.int32), order, iota, axis=1, inplace=False
        )

        s = jnp.where(cand_mask, scores, -jnp.inf)
        rev = order[:, ::-1]  # ascending
        s_sorted = jnp.take_along_axis(s, rev, axis=1)
        cand_sorted = jnp.take_along_axis(cand_mask, rev, axis=1)
        pos_sorted = jnp.take_along_axis(pos_mask, rev, axis=1)

        idx = jnp.arange(N, dtype=jnp.int32)[None, :]
        new_group = jnp.concatenate(
            [
                jnp.ones((B, 1), bool),
                s_sorted[:, 1:] != s_sorted[:, :-1],
            ],
            axis=1,
        )
        group_start = jax.lax.cummax(jnp.where(new_group, idx, 0), axis=1)

        cand_cum = jnp.concatenate(
            [
                jnp.zeros((B, 1), jnp.int32),
                jnp.cumsum(cand_sorted, axis=1, dtype=jnp.int32),
            ],
            axis=1,
        )
        pos_cum = jnp.concatenate(
            [
                jnp.zeros((B, 1), jnp.int32),
                jnp.cumsum(pos_sorted, axis=1, dtype=jnp.int32),
            ],
            axis=1,
        )
        c_lt_sorted = jnp.take_along_axis(cand_cum, group_start, axis=1)
        p_lt_sorted = jnp.take_along_axis(pos_cum, group_start, axis=1)

        inv_rev = (jnp.int32(N) - 1) - rank_of
        c_lt = jnp.take_along_axis(c_lt_sorted, inv_rev, axis=1)
        p_lt = jnp.take_along_axis(p_lt_sorted, inv_rev, axis=1)
        return rank_of.astype(jnp.int32), c_lt, p_lt

    out = kernel(
        jnp.asarray(scores, jnp.float32),
        jnp.asarray(pos_mask),
        jnp.asarray(cand_mask),
    )
    return tuple(np.asarray(a) for a in out)


# --------------------------------------------------------------------- #
# fully-fused device evaluation
# --------------------------------------------------------------------- #
# Per-positive counts stay < N on device and AUC uses the
# mean-of-fractions form, so exactness holds to N = 2^24 (f32-exact
# integers) — that bound IS the gate. Catalog size no longer pushes eval
# off the device: the eval loop shrinks its user batch so B*N cells stay
# under _EVAL_CELL_BUDGET (dense masks and the score block scale with
# B*N, so a Gowalla-shape catalog of ~1.3M items simply runs ~50 users
# per device call instead of 1024). Was 200k items in r4 (flat gate),
# 40k in r3 (int32 N^2 pair accumulation, removed in r4).
_FUSED_MAX_ITEMS = 1 << 24

# per-eval-batch score-cell cap (B*N): 64M cells = 256 MB f32 scores on
# device + 64 MB per host-side bool mask — flat in N because the user
# batch shrinks to compensate
_EVAL_CELL_BUDGET = 64 * 1024 * 1024

_RANK_SENTINEL = 2**31 - 1


def _fused_metrics_kernel(specs):
    """Build the jitted (scores, cand_bits, pos_idx) -> (B, M) kernel for a
    static tuple of metric specs. Computes every supported ranking metric
    in ONE device program, so a whole eval batch costs a single small
    transfer back.

    Sort-free: every supported metric needs only per-POSITIVE quantities —
    the rank of each positive (candidates scored above it, ties broken by
    column index like the host stable argsort) and its strict-below tie
    counts — so instead of sorting each (N,) row, the kernel counts
    comparisons of the row against the (few) positive scores. That is a
    fused compare+mask+reduce over (B, P, N) on the VPU, far cheaper than
    B argsorts, and the positive ids upload as a (B, P) int32 instead of a
    dense mask."""
    import jax
    import jax.numpy as jnp

    def _unpack_bits(bits, N):
        """(B, ceil(N/8)) uint8 (np.packbits big-endian) -> (B, N) bool."""
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)[None, None, :]
        bools = (bits[:, :, None] >> shifts) & jnp.uint8(1)
        return bools.reshape(bits.shape[0], -1)[:, :N] != 0

    @jax.jit
    def kernel(scores, cand_bits, pos_idx):
        B, N = scores.shape
        P = pos_idx.shape[1]
        cand_mask = _unpack_bits(cand_bits, N)
        s = jnp.where(cand_mask, scores.astype(jnp.float32), -jnp.inf)

        valid = pos_idx >= 0  # (B, P); padded slots are -1
        safe_idx = jnp.maximum(pos_idx, 0)
        sp = jnp.take_along_axis(s, safe_idx, axis=1)  # (B, P)

        iota = jnp.arange(N, dtype=jnp.int32)[None, None, :]
        s3 = s[:, None, :]
        cand3 = cand_mask[:, None, :]
        sp3 = sp[:, :, None]

        # rank of each positive under the host's stable descending argsort:
        # strictly-above candidates + equal-scored candidates at a smaller
        # column index (non-candidates are -inf and never rank above)
        above = jnp.sum((s3 > sp3) & cand3, axis=2, dtype=jnp.int32)
        tie_lo = jnp.sum(
            (s3 == sp3) & cand3 & (iota < safe_idx[:, :, None]),
            axis=2,
            dtype=jnp.int32,
        )
        rank_p = above + tie_lo
        pos_ranks = jnp.where(valid, rank_p, jnp.int32(_RANK_SENTINEL))

        # strict-below tie counts at each positive: candidates over N,
        # positives over the (B, P, P) pairwise compare of positive scores
        c_lt = jnp.sum((s3 < sp3) & cand3, axis=2, dtype=jnp.int32)
        p_lt = jnp.sum(
            (sp[:, None, :] < sp3) & valid[:, None, :], axis=2, dtype=jnp.int32
        )

        n_pos = jnp.sum(valid, axis=1, dtype=jnp.int32)
        n_cand = jnp.sum(cand_mask, axis=1, dtype=jnp.int32)
        n_neg = n_cand - n_pos

        # shared ideal-prefix tables (indexable by a traced count)
        max_ideal = min(P, N)
        disc_cum = jnp.concatenate(
            [jnp.zeros(1, jnp.float32),
             jnp.cumsum(1.0 / jnp.log2(jnp.arange(max_ideal, dtype=jnp.float32) + 2.0))]
        )
        harm_cum = jnp.concatenate(
            [jnp.zeros(1, jnp.float32),
             jnp.cumsum(1.0 / (jnp.arange(max_ideal, dtype=jnp.float32) + 1.0))]
        )

        pr_f = pos_ranks.astype(jnp.float32)

        def k_eff(k):
            if k > 0:
                return jnp.full((B,), jnp.int32(k))
            return n_cand

        outs = []
        for kind, k in specs:
            ke = k_eff(k)
            in_k = pos_ranks < ke[:, None]
            if kind == "ndcg":
                dcg = jnp.sum(
                    jnp.where(in_k, 1.0 / jnp.log2(pr_f + 2.0), 0.0), axis=1
                )
                idcg = disc_cum[jnp.minimum(n_pos, jnp.minimum(ke, max_ideal))]
                outs.append(dcg / jnp.maximum(idcg, 1e-12))
            elif kind == "ncrr":
                crr = jnp.sum(jnp.where(in_k, 1.0 / (pr_f + 1.0), 0.0), axis=1)
                icrr = harm_cum[jnp.minimum(n_pos, jnp.minimum(ke, max_ideal))]
                outs.append(
                    jnp.where(crr > 0, crr / jnp.maximum(icrr, 1e-12), 0.0)
                )
            elif kind == "mrr":
                first = jnp.min(pos_ranks, axis=1).astype(jnp.float32)
                outs.append(1.0 / (first + 1.0))
            elif kind in ("hit", "prec", "rec", "f1"):
                tp = jnp.sum(in_k, axis=1, dtype=jnp.int32).astype(jnp.float32)
                tp_fp = ke.astype(jnp.float32)
                tp_fn = jnp.maximum(n_pos, 1).astype(jnp.float32)
                if kind == "hit":
                    outs.append((tp > 0).astype(jnp.float32))
                elif kind == "prec":
                    outs.append(tp / tp_fp)
                elif kind == "rec":
                    outs.append(tp / tp_fn)
                else:
                    prec, rec = tp / tp_fp, tp / tp_fn
                    denom = prec + rec
                    outs.append(
                        jnp.where(
                            denom > 0,
                            2.0 * prec * rec / jnp.maximum(denom, 1e-12),
                            0.0,
                        )
                    )
            elif kind == "auc":
                # mean-of-fractions form: each per-positive negatives-below
                # count is < N (exact in f32 up to 2^24 items), so no
                # N^2-scale integer accumulation exists — algebraically
                # identical to sum(neg_lt) / (n_pos * n_neg)
                frac = jnp.where(
                    valid, (c_lt - p_lt).astype(jnp.float32), 0.0
                ) / jnp.maximum(n_neg, 1).astype(jnp.float32)[:, None]
                outs.append(
                    jnp.sum(frac, axis=1)
                    / jnp.maximum(n_pos, 1).astype(jnp.float32)
                )
            elif kind == "map":
                c_ge = (n_cand[:, None] - c_lt).astype(jnp.float32)
                p_ge = (n_pos[:, None] - p_lt).astype(jnp.float32)
                ap = jnp.sum(
                    jnp.where(valid, p_ge / jnp.maximum(c_ge, 1.0), 0.0),
                    axis=1,
                )
                outs.append(ap / jnp.maximum(n_pos, 1).astype(jnp.float32))
            else:  # pragma: no cover - specs are validated by the caller
                raise ValueError(kind)
        return jnp.stack(outs, axis=1)

    return kernel


_FUSED_KERNEL_CACHE = {}


def metric_device_specs(metrics):
    """Static (kind, k) spec per metric, or None when any metric has no
    fused device implementation (exact type match only — subclasses may
    override ``compute`` semantics)."""
    table = {
        NDCG: "ndcg",
        NCRR: "ncrr",
        MRR: "mrr",
        HitRatio: "hit",
        Precision: "prec",
        Recall: "rec",
        FMeasure: "f1",
        AUC: "auc",
        MAP: "map",
    }
    specs = []
    for m in metrics:
        kind = table.get(type(m))
        if kind is None:
            return None
        k = getattr(m, "k", -1)
        if hasattr(k, "__len__"):
            return None
        specs.append((kind, int(k)))
    return tuple(specs)


def batch_eval_device(scores_dev, pos_mask, cand_mask, specs, mesh=None):
    """Run the fused metric kernel: ``scores_dev`` is a device (or host)
    (B, N) float array, masks are host bool arrays. Returns a (B, M)
    float64 numpy array — the only device->host transfer.

    With ``mesh``, the kernel runs sharded (SURVEY §2.4 sharded
    full-catalog ranking): scores and candidate bits are laid out with
    users over the data axis and items over the model axis, so the rank /
    tie-count reductions over the item axis compile to per-shard partial
    sums + a psum over the model axis — per-chip work is O(B·N/s·P)
    instead of O(B·N·P), replacing the reference's single-host per-user
    loop (``base_method.py:177-226``) at scale."""
    import jax
    import jax.numpy as jnp

    kernel = _FUSED_KERNEL_CACHE.get(specs)
    if kernel is None:
        kernel = _fused_metrics_kernel(specs)
        _FUSED_KERNEL_CACHE[specs] = kernel

    pos_mask = np.asarray(pos_mask, dtype=bool)
    B = pos_mask.shape[0]
    counts = pos_mask.sum(axis=1)
    # (B, P) positive column ids, -1 padded; P rounded to a power of two to
    # bound the number of compiled kernel variants
    max_c = max(int(counts.max(initial=1)), 1)
    P = 1 << (max_c - 1).bit_length()
    rows, cols = np.nonzero(pos_mask)  # row-major: per-row runs contiguous
    starts = np.cumsum(counts) - counts
    offs = np.arange(len(rows)) - starts[rows]
    pos_idx = np.full((B, P), -1, dtype=np.int32)
    pos_idx[rows, offs] = cols

    cand = np.asarray(cand_mask, dtype=bool)
    if mesh is None:
        out = kernel(
            scores_dev, jnp.asarray(np.packbits(cand, axis=1)),
            jnp.asarray(pos_idx),
        )
        return np.asarray(out, dtype=np.float64)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    # pad to shardable sizes: users to the data-axis size, items to a
    # multiple of 8*model-size (packbits bytes must split evenly). Padded
    # items are non-candidates (never rank); padded user rows are sliced
    # off after the kernel.
    dsz, msz = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
    N = cand.shape[1]
    b_pad = (-B) % dsz
    n_pad = (-N) % (8 * msz)
    scores = jnp.asarray(scores_dev, jnp.float32)
    scores = jnp.pad(scores, ((0, b_pad), (0, n_pad)))
    cand = np.pad(cand, ((0, b_pad), (0, n_pad)))
    pos_idx = np.pad(pos_idx, ((0, b_pad), (0, 0)), constant_values=-1)

    scores_in = jax.device_put(scores, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)))
    bits_in = jax.device_put(
        jnp.asarray(np.packbits(cand, axis=1)),
        NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)),
    )
    idx_in = jax.device_put(
        jnp.asarray(pos_idx), NamedSharding(mesh, P(DATA_AXIS, None))
    )
    out = kernel(scores_in, bits_in, idx_in)
    return np.asarray(out, dtype=np.float64)[:B]


class RankingContext:
    """Lazily-computed per-batch ranking quantities.

    Parameters
    ----------
    scores: (B, N) float array
        Model scores; columns outside the candidate set must be ``-inf``.
    pos_mask: (B, N) bool array
        Ground-truth positive items (a subset of the candidate set).
    cand_mask: (B, N) bool array
        Candidate items under evaluation (positives + negatives).
    """

    def __init__(self, scores, pos_mask, cand_mask):
        self.scores = scores
        self.pos_mask = pos_mask
        self.cand_mask = cand_mask
        self.B, self.N = scores.shape
        self.n_pos = pos_mask.sum(axis=1)
        self.n_cand = cand_mask.sum(axis=1)
        self.n_neg = self.n_cand - self.n_pos
        self._rank_of = None
        self._tie_counts = None

    def _try_device_path(self):
        """At large batch sizes, compute order/ranks/tie-counts in one
        device program (falls back to numpy on any failure)."""
        if self.B * self.N < _DEVICE_MIN_CELLS:
            return False
        try:
            rank_of, c_lt, p_lt = _device_rank_and_ties(
                self.scores, self.pos_mask, self.cand_mask
            )
        except Exception:
            return False
        # rank_of/tie caches make the column order itself unnecessary;
        # mark it filled so the host argsort never runs
        self._order = "device"
        self._rank_of = rank_of
        self._tie_counts = (c_lt, p_lt)
        return True

    @property
    def _desc_order(self):
        """(B, N) stable descending-score column order (single shared sort:
        tie counts reuse its reverse, since c_lt/p_lt only depend on tie-
        group boundaries, which are intra-group-order invariant)."""
        if getattr(self, "_order", None) is None:
            if not self._try_device_path():
                self._order = np.argsort(-self.scores, axis=1, kind="stable")
        return self._order

    @property
    def rank_of(self):
        """(B, N) int: 0-based descending-score rank of each column
        (excluded columns sink to the bottom; ties broken by column index)."""
        if self._rank_of is None:
            order = self._desc_order  # may fill the cache via the device path
        if self._rank_of is None:
            self._rank_of = np.empty_like(order)
            rows = np.arange(self.B)[:, None]
            self._rank_of[rows, order] = np.arange(self.N)[None, :]
        return self._rank_of

    # sentinel rank for non-positive columns: must compare greater than any
    # truncation cutoff, including k > N (a sentinel of N breaks there: the
    # non-positive columns would pass ``rank < k`` and inflate every @k
    # metric on catalogs smaller than k)
    OUT_OF_RANGE = np.int64(2**31)

    @property
    def pos_ranks(self):
        """(B, N) int: rank of each positive column, OUT_OF_RANGE elsewhere."""
        return np.where(self.pos_mask, self.rank_of, self.OUT_OF_RANGE)

    def _compute_tie_counts(self):
        """For every column j (restricted to candidates): the number of
        candidates with score strictly below scores[:, j] (``c_lt``) and the
        number of positives with score strictly below (``p_lt``). Exact under
        ties — one ascending sort + prefix sums per row."""
        order_probe = self._desc_order  # may fill the cache via device path
        if self._tie_counts is not None:
            return
        s = np.where(self.cand_mask, self.scores, -np.inf)
        # ascending order; excluded (-inf) first. Reuses the shared
        # descending sort — valid because scores obey the -inf contract and
        # every derived quantity is invariant to order within tie groups.
        order = self._desc_order[:, ::-1]
        rows = np.arange(self.B)[:, None]
        s_sorted = np.take_along_axis(s, order, axis=1)
        cand_sorted = np.take_along_axis(self.cand_mask, order, axis=1)
        pos_sorted = np.take_along_axis(self.pos_mask, order, axis=1)

        # index (within sorted row) of the first element of each tie group
        idx = np.arange(self.N)[None, :]
        new_group = np.ones((self.B, self.N), dtype=bool)
        new_group[:, 1:] = s_sorted[:, 1:] != s_sorted[:, :-1]
        group_start = np.maximum.accumulate(np.where(new_group, idx, 0), axis=1)

        # prefix counts of candidates / positives before a sorted position
        cand_cum = np.concatenate(
            [np.zeros((self.B, 1), dtype=np.int64), np.cumsum(cand_sorted, axis=1)],
            axis=1,
        )
        pos_cum = np.concatenate(
            [np.zeros((self.B, 1), dtype=np.int64), np.cumsum(pos_sorted, axis=1)],
            axis=1,
        )
        c_lt_sorted = np.take_along_axis(cand_cum, group_start, axis=1)
        p_lt_sorted = np.take_along_axis(pos_cum, group_start, axis=1)

        c_lt = np.empty((self.B, self.N), dtype=np.int64)
        p_lt = np.empty((self.B, self.N), dtype=np.int64)
        c_lt[rows, order] = c_lt_sorted
        p_lt[rows, order] = p_lt_sorted
        self._tie_counts = (c_lt, p_lt)

    @property
    def c_lt(self):
        """(B, N): per column, #candidates with strictly lower score."""
        if self._tie_counts is None:
            self._compute_tie_counts()
        return self._tie_counts[0]

    @property
    def p_lt(self):
        """(B, N): per column, #positives with strictly lower score."""
        if self._tie_counts is None:
            self._compute_tie_counts()
        return self._tie_counts[1]

    def truncation(self, k):
        """(B,) effective cutoff length: ``k`` if positive else the full
        candidate-list length (reference truncates ``pd_rank[:k]``)."""
        if k > 0:
            return np.full(self.B, k, dtype=np.int64)
        return self.n_cand

    def tp_at_k(self, k):
        """(B,) number of positives ranked inside the cutoff."""
        k_eff = self.truncation(k)[:, None]
        return (self.pos_ranks < k_eff).sum(axis=1)


class RankingMetric:
    """Base ranking metric (higher is better)."""

    def __init__(self, name=None, k=-1, higher_better=True):
        assert hasattr(k, "__len__") or k == -1 or k > 0
        self.type = "ranking"
        self.name = name
        self.k = k
        self.higher_better = higher_better

    def compute(self, **kwargs):
        raise NotImplementedError()

    def batch_compute(self, ctx):
        """Vectorized metric over a :class:`RankingContext`; returns (B,)."""
        raise NotImplementedError()


class NDCG(RankingMetric):
    """Normalized Discounted Cumulative Gain (binary relevance)."""

    def __init__(self, k=-1):
        RankingMetric.__init__(self, name="NDCG@{}".format(k), k=k)

    @staticmethod
    def dcg_score(gt_pos, pd_rank, k=-1):
        """DCG over the (optionally truncated) ranked list with 0/1 gains."""
        truncated = pd_rank[:k] if k > 0 else pd_rank
        rel = np.isin(truncated, gt_pos).astype(int)
        gain = 2**rel - 1
        discounts = np.log2(np.arange(len(rel)) + 2)
        return np.sum(gain / discounts)

    def compute(self, gt_pos, pd_rank, **kwargs):
        dcg = self.dcg_score(gt_pos, pd_rank, self.k)
        idcg = self.dcg_score(gt_pos, gt_pos, self.k)
        return dcg / idcg

    def batch_compute(self, ctx):
        k_eff = ctx.truncation(self.k)[:, None]
        pos_ranks = ctx.pos_ranks
        dcg = np.where(
            pos_ranks < k_eff, 1.0 / np.log2(pos_ranks + 2.0), 0.0
        ).sum(axis=1)
        # ideal: positives occupy the first min(n_pos, k_eff) slots
        n_ideal = np.minimum(ctx.n_pos, k_eff[:, 0])
        max_n = int(n_ideal.max()) if len(n_ideal) else 0
        discounts = 1.0 / np.log2(np.arange(max_n) + 2.0)
        cum = np.concatenate([[0.0], np.cumsum(discounts)])
        idcg = cum[n_ideal]
        return dcg / np.maximum(idcg, 1e-12)


class NCRR(RankingMetric):
    """Normalized Cumulative Reciprocal Rank."""

    def __init__(self, k=-1):
        RankingMetric.__init__(self, name="NCRR@{}".format(k), k=k)

    def compute(self, gt_pos, pd_rank, **kwargs):
        truncated = pd_rank[: self.k] if self.k > 0 else pd_rank
        hit_positions = np.where(np.isin(truncated, gt_pos))[0]
        if len(hit_positions) == 0:
            return 0.0
        crr = np.sum(1.0 / (hit_positions + 1))
        max_nb_pos = min(len(gt_pos), len(truncated))
        icrr = np.sum(1.0 / (np.arange(max_nb_pos) + 1))
        return crr / icrr

    def batch_compute(self, ctx):
        k_eff = ctx.truncation(self.k)[:, None]
        pos_ranks = ctx.pos_ranks
        crr = np.where(pos_ranks < k_eff, 1.0 / (pos_ranks + 1.0), 0.0).sum(axis=1)
        n_ideal = np.minimum(ctx.n_pos, k_eff[:, 0])
        max_n = int(n_ideal.max()) if len(n_ideal) else 0
        cum = np.concatenate([[0.0], np.cumsum(1.0 / (np.arange(max_n) + 1.0))])
        icrr = cum[n_ideal]
        return np.where(crr > 0, crr / np.maximum(icrr, 1e-12), 0.0)


class MRR(RankingMetric):
    """Mean Reciprocal Rank (reciprocal rank of the first hit)."""

    def __init__(self):
        RankingMetric.__init__(self, name="MRR")

    def compute(self, gt_pos, pd_rank, **kwargs):
        matched = np.nonzero(np.isin(pd_rank, gt_pos))[0]
        if len(matched) == 0:
            raise ValueError(
                "No matched between ground-truth items and recommendations"
            )
        return 1.0 / (matched[0] + 1)

    def batch_compute(self, ctx):
        first_pos_rank = ctx.pos_ranks.min(axis=1)
        return 1.0 / (first_pos_rank + 1.0)


class MeasureAtK(RankingMetric):
    """Shared tp / tp+fn / tp+fp computation for @K measures."""

    def __init__(self, name=None, k=-1):
        RankingMetric.__init__(self, name, k)

    def compute(self, gt_pos, pd_rank, **kwargs):
        truncated = pd_rank[: self.k] if self.k > 0 else pd_rank
        tp = np.sum(np.isin(truncated, gt_pos))
        tp_fn = len(gt_pos)
        tp_fp = self.k if self.k > 0 else len(truncated)
        return tp, tp_fn, tp_fp

    def _batch_counts(self, ctx):
        tp = ctx.tp_at_k(self.k)
        tp_fn = ctx.n_pos
        tp_fp = ctx.truncation(self.k)
        return tp, tp_fn, tp_fp


class HitRatio(MeasureAtK):
    """1.0 when at least one positive appears in the top-k."""

    def __init__(self, k=-1):
        super().__init__(name="HitRatio@{}".format(k), k=k)

    def compute(self, gt_pos, pd_rank, **kwargs):
        tp, *_ = MeasureAtK.compute(self, gt_pos, pd_rank, **kwargs)
        return 1.0 if tp > 0 else 0.0

    def batch_compute(self, ctx):
        tp, _, _ = self._batch_counts(ctx)
        return (tp > 0).astype(np.float64)


class Precision(MeasureAtK):
    """Precision@K."""

    def __init__(self, k=-1):
        super().__init__(name="Precision@{}".format(k), k=k)

    def compute(self, gt_pos, pd_rank, **kwargs):
        tp, _, tp_fp = MeasureAtK.compute(self, gt_pos, pd_rank, **kwargs)
        return tp / tp_fp

    def batch_compute(self, ctx):
        tp, _, tp_fp = self._batch_counts(ctx)
        return tp / tp_fp


class Recall(MeasureAtK):
    """Recall@K."""

    def __init__(self, k=-1):
        super().__init__(name="Recall@{}".format(k), k=k)

    def compute(self, gt_pos, pd_rank, **kwargs):
        tp, tp_fn, _ = MeasureAtK.compute(self, gt_pos, pd_rank, **kwargs)
        return tp / tp_fn

    def batch_compute(self, ctx):
        tp, tp_fn, _ = self._batch_counts(ctx)
        return tp / np.maximum(tp_fn, 1)


class FMeasure(MeasureAtK):
    """F1@K."""

    def __init__(self, k=-1):
        super().__init__(name="F1@{}".format(k), k=k)

    def compute(self, gt_pos, pd_rank, **kwargs):
        tp, tp_fn, tp_fp = MeasureAtK.compute(self, gt_pos, pd_rank, **kwargs)
        prec = tp / tp_fp
        rec = tp / tp_fn
        return 2 * (prec * rec) / (prec + rec) if (prec + rec) > 0 else 0

    def batch_compute(self, ctx):
        tp, tp_fn, tp_fp = self._batch_counts(ctx)
        prec = tp / tp_fp
        rec = tp / np.maximum(tp_fn, 1)
        denom = prec + rec
        return np.where(denom > 0, 2 * prec * rec / np.maximum(denom, 1e-12), 0.0)


class AUC(RankingMetric):
    """Area under the ROC curve over (positive, negative) candidate pairs."""

    def __init__(self):
        RankingMetric.__init__(self, name="AUC")

    def compute(self, item_indices, pd_scores, gt_pos, gt_neg=None, **kwargs):
        pos_mask = np.isin(item_indices, gt_pos)
        neg_mask = (
            np.logical_not(pos_mask) if gt_neg is None else np.isin(item_indices, gt_neg)
        )
        pos_scores = pd_scores[pos_mask]
        neg_scores = pd_scores[neg_mask]
        ui_scores = np.repeat(pos_scores, len(neg_scores))
        uj_scores = np.tile(neg_scores, len(pos_scores))
        return (ui_scores > uj_scores).sum() / len(uj_scores)

    def batch_compute(self, ctx):
        # pairs won: for each positive, #negatives with strictly lower score
        neg_lt = np.where(ctx.pos_mask, ctx.c_lt - ctx.p_lt, 0).sum(axis=1)
        denom = ctx.n_pos * ctx.n_neg
        return neg_lt / np.maximum(denom, 1)


class MAP(RankingMetric):
    """Mean Average Precision (rankdata 'max' convention of the reference)."""

    def __init__(self):
        RankingMetric.__init__(self, name="MAP")

    def compute(self, item_indices, pd_scores, gt_pos, **kwargs):
        relevant = np.isin(item_indices, gt_pos)
        rank = rankdata(-pd_scores, "max")[relevant]
        L = rankdata(-pd_scores[relevant], "max")
        return (L / rank).mean()

    def batch_compute(self, ctx):
        # rankdata('max') of -scores == #candidates with score >= s
        c_ge = ctx.n_cand[:, None] - ctx.c_lt
        p_ge = ctx.n_pos[:, None] - ctx.p_lt
        ap = np.where(ctx.pos_mask, p_ge / np.maximum(c_ge, 1), 0.0).sum(axis=1)
        return ap / np.maximum(ctx.n_pos, 1)
