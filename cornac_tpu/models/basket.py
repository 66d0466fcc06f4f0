"""Next-basket models: GPTop, TIFUKNN, UPCF.

Capability parity with reference ``models/gp_top/recom_gp_top.py:22``,
``models/tifuknn/recom_tifuknn.py:25``, ``models/upcf/recom_upcf.py:24``.

TPU notes:
- TIFUKNN's KD-tree nearest-neighbor query becomes an exact blocked
  similarity matmul + ``lax.top_k`` — TPU exhaustive search beats a host
  KD-tree at these scales. (Also fixes a reference bug where the neighbor
  aggregate collapses to a scalar: ``recom_tifuknn.py`` last line takes
  ``np.mean`` over the full neighbor matrix instead of axis 0; we average
  per item as the paper specifies.)
- UPCF's asymmetric-cosine similarity (external ``similaripy`` in the
  reference) is implemented directly as dense device math.
"""

import itertools
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix, vstack

from .recommender import NextBasketRecommender


class GPTop(NextBasketRecommender):
    """Global + personalized top-frequency baseline (Li et al., TOIS 2023)."""

    def __init__(
        self,
        name="GPTop",
        use_global_popularity=True,
        use_personalized_popularity=True,
        use_quantity=False,
    ):
        super().__init__(name=name, trainable=False)
        self.use_global_popularity = use_global_popularity
        self.use_personalized_popularity = use_personalized_popularity
        self.use_quantity = use_quantity
        self.item_freq = Counter()

    def fit(self, train_set, val_set=None):
        super().fit(train_set=train_set, val_set=val_set)
        self._global_row = np.zeros(self.total_items, dtype=np.float64)
        if self.use_global_popularity:
            if self.use_quantity:
                self.item_freq = Counter()
                for idx, iid in enumerate(self.train_set.uir_tuple[1]):
                    self.item_freq[iid] += self.train_set.extra_data[idx].get(
                        "quantity", 0
                    )
            else:
                self.item_freq = Counter(self.train_set.uir_tuple[1])
            max_freq = max(self.item_freq.values()) if self.item_freq else 1
            for iid, freq in self.item_freq.items():
                self._global_row[iid] = freq / max_freq
        return self

    def score(self, user_idx, history_baskets, **kwargs):
        item_scores = self._global_row.copy()
        if self.use_personalized_popularity:
            if self.use_quantity:
                history_bids = kwargs.get("history_bids")
                baskets = kwargs.get("baskets")
                extra_data = kwargs.get("extra_data")
                p_freq = Counter()
                for bid, iids in zip(history_bids, history_baskets):
                    for idx, iid in zip(baskets[bid], iids):
                        p_freq[iid] += extra_data[idx].get("quantity", 0)
            else:
                p_freq = Counter(
                    [iid for iids in history_baskets for iid in iids]
                )
            for iid, cnt in p_freq.items():
                item_scores[iid] += cnt
        return item_scores

    def score_baskets_batch(self, user_indices, histories):
        out = np.tile(self._global_row[: self.num_items], (len(user_indices), 1))
        if self.use_personalized_popularity:
            for b, h in enumerate(histories):
                for iid, cnt in Counter(
                    [iid for iids in h for iid in iids]
                ).items():
                    if iid < self.num_items:
                        out[b, iid] += cnt
        return out


class TIFUKNN(NextBasketRecommender):
    """Temporal-Item-Frequency user KNN (Hu et al., SIGIR 2020)."""

    def __init__(
        self,
        name="TIFUKNN",
        n_neighbors=300,
        within_decay_rate=0.9,
        group_decay_rate=0.7,
        alpha=0.7,
        n_groups=7,
        verbose=False,
    ):
        super().__init__(name=name, trainable=False, verbose=verbose)
        assert 0 <= within_decay_rate <= 1
        assert 0 <= group_decay_rate <= 1
        self.n_neighbors = n_neighbors
        self.within_decay_rate = within_decay_rate
        self.group_decay_rate = group_decay_rate
        self.alpha = alpha
        self.n_groups = n_groups

    def fit(self, train_set, val_set=None):
        super().fit(train_set=train_set, val_set=val_set)
        vectors = []
        for _, _, [basket_items] in train_set.ubi_iter(batch_size=1, shuffle=False):
            vectors.append(self._compute_user_vector(basket_items[:-1]))
        self.user_vectors = np.asarray(vectors, dtype=np.float32)
        self.n_neighbors = min(self.n_neighbors, len(self.user_vectors))
        return self

    def _compute_user_vector(self, history_baskets):
        """Time-decayed grouped item-frequency vector (paper eq. 1-3)."""
        n_baskets = len(history_baskets)
        vec = np.zeros(self.total_items, dtype=np.float32)
        if n_baskets == 0:
            return vec

        basket_vecs = []
        for inc, iids in enumerate(history_baskets):
            v = np.zeros(self.total_items, dtype=np.float32)
            v[list(iids)] = np.power(self.within_decay_rate, n_baskets - inc - 1)
            basket_vecs.append(v)

        groups = self._group(basket_vecs)
        if not groups:
            return vec
        for idx, g in enumerate(groups):
            vec += g * np.power(self.group_decay_rate, self.n_groups - idx - 1)
        return vec / len(groups)

    def _group(self, basket_vecs):
        """Partition basket vectors into up to n_groups contiguous blocks
        and average within each block."""
        m = len(basket_vecs)
        if m == 0:
            return []
        if m < self.n_groups:
            return basket_vecs
        bounds = np.linspace(0, m, self.n_groups + 1).round().astype(int)
        return [
            np.mean(basket_vecs[s:e], axis=0)
            for s, e in zip(bounds[:-1], bounds[1:])
            if e > s
        ]

    def score(self, user_idx, history_baskets, **kwargs):
        return self.score_baskets_batch([user_idx], [history_baskets])[0]

    def score_baskets_batch(self, user_indices, histories):
        queries = np.stack(
            [self._compute_user_vector(h) for h in histories]
        ).astype(np.float32)
        # exact nearest neighbors by euclidean distance on device
        q = jnp.asarray(queries)
        X = jnp.asarray(self.user_vectors)
        d2 = (
            jnp.sum(q**2, axis=1, keepdims=True)
            - 2 * q @ X.T
            + jnp.sum(X**2, axis=1)[None, :]
        )
        _, idx = jax.lax.top_k(-d2, self.n_neighbors)
        neighbor_mean = np.asarray(jnp.mean(X[idx], axis=1))
        scores = self.alpha * queries + (1 - self.alpha) * neighbor_mean
        return scores[:, : self.num_items].astype(np.float64)


class UPCF(NextBasketRecommender):
    """Recency-aware user-popularity CF (Faggioli et al., UMAP 2020)."""

    def __init__(self, name="UPCF", recency=1, locality=1, asymmetry=0.25, verbose=False):
        super().__init__(name=name, trainable=False, verbose=verbose)
        self.recency = recency
        self.locality = locality
        self.asymmetry = asymmetry

    def fit(self, train_set, val_set=None):
        super().fit(train_set=train_set, val_set=val_set)
        self.user_wise_popularity = vstack(
            [
                self._user_wise_popularity(basket_items)
                for _, _, [basket_items] in train_set.ubi_iter(
                    batch_size=1, shuffle=False
                )
            ]
        )
        u, i, r = train_set.uir_tuple
        self.user_item_matrix = csr_matrix(
            (r, (u, i)), shape=(train_set.num_users, self.total_items), dtype="float32"
        )
        return self

    def _user_wise_popularity(self, basket_items):
        recent = basket_items[-self.recency :] if self.recency > 0 else basket_items
        denom = (
            min(self.recency, len(recent)) if self.recency > 0 else max(len(recent), 1)
        )
        items, scores = [], []
        for iid in set(itertools.chain.from_iterable(recent)):
            items.append(iid)
            scores.append(sum(1 for b in recent if iid in b) / denom)
        return csr_matrix(
            (scores, (np.zeros(len(items)), items)),
            shape=(1, self.total_items),
            dtype="float32",
        )

    def score(self, user_idx, history_baskets, **kwargs):
        return self.score_baskets_batch([user_idx], [history_baskets])[0]

    def score_baskets_batch(self, user_indices, histories):
        # query rows: binary item sets + recency-weighted popularity
        q_rows, q_pops = [], []
        for h in histories:
            items = list(set(itertools.chain.from_iterable(h)))
            row = np.zeros(self.total_items, dtype=np.float32)
            row[items] = 1.0
            q_rows.append(row)
            q_pops.append(
                np.asarray(self._user_wise_popularity(h).todense()).ravel()
            )
        Q = np.stack(q_rows)  # (B, n_items)
        X = np.asarray(self.user_item_matrix.todense(), dtype=np.float32)
        P = np.asarray(self.user_wise_popularity.todense(), dtype=np.float32)

        # asymmetric cosine: <q, x> / (|q|^(2a) |x|^(2(1-a)))
        a = self.asymmetry
        qn = np.linalg.norm(Q, axis=1, keepdims=True) ** (2 * a)
        xn = np.linalg.norm(X, axis=1, keepdims=True).T ** (2 * (1 - a))
        sim = (Q @ X.T) / np.maximum(qn * xn, 1e-12)
        sim = sim**self.locality

        # include the query user's own recency popularity with self-sim 1
        scores = sim @ P + np.stack(q_pops)
        return scores[:, : self.num_items].astype(np.float64)
