"""UserKNN / ItemKNN — neighborhood collaborative filtering.

Capability parity with reference ``cornac/models/knn/recom_knn.py:91,267`` +
the OpenMP similarity engine (``similarity.pyx`` / ``similarity.h``), whose
semantics are:

- similarity = co-support cosine: sim(r, c) = <w_r, w_c> / (||w_r|co-rated||
  * ||w_c|co-rated||) — denominators restricted to co-rated columns
  (``similarity.pyx:80-92``). On TPU this is three blocked MXU matmuls:
  W Wᵀ, (W∘W) Bᵀ and B (W∘W)ᵀ with B = (W != 0).
- score(u, i) = sum_{top-k co-raters by similarity} sim * rating /
  (sum |sim| + 1e-8) (+ the user's mean for mean-centered explicit data),
  where co-raters are users who rated i (UserKNN) / items rated by u
  (ItemKNN) (``similarity.pyx:109-200``, ``similarity.h`` TopK keeps the k
  largest by signed similarity). Here the per-item top-k runs as one
  ``jax.lax.top_k`` over a masked (neighbors x items) weight matrix per
  user chunk.

Weighting options (mean-centered / amplify / idf / bm25) match
``recom_knn.py:34-90``.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import coo_matrix

from ..exception import ScoreException
from ..utils import get_rng
from .recommender import Recommender

EPS = 1e-8

SIMILARITIES = ["cosine", "pearson"]
WEIGHTING_OPTIONS = ["idf", "bm25"]


def _mean_centered(ui_mat):
    """Subtract per-row means; exact zeros after centering become EPS so the
    'rated' support is preserved (reference ``recom_knn.py:35-46``)."""
    ui_mat = ui_mat.copy()
    mean_arr = np.zeros(ui_mat.shape[0])
    counts = np.diff(ui_mat.indptr)
    sums = np.add.reduceat(
        ui_mat.data, ui_mat.indptr[:-1][counts > 0]
    ) if ui_mat.nnz else np.array([])
    nz = counts > 0
    mean_arr[nz] = sums / counts[nz]
    ui_mat.data = ui_mat.data - np.repeat(mean_arr, counts)
    ui_mat.data[ui_mat.data == 0] = EPS
    return ui_mat, mean_arr


def _amplify(mat, alpha=1.0):
    if alpha == 1.0:
        return mat
    data = mat.data
    mat.data = np.where(data > 0, data**alpha, -((-data) ** alpha))
    return mat


def _idf_weight(ui_mat):
    X = coo_matrix(ui_mat)
    N = float(X.shape[0])
    idf = np.log(N / np.bincount(X.col))
    return idf[ui_mat.indices] + EPS


def _bm25_weight(ui_mat):
    K1, B = 1.2, 0.8
    X = coo_matrix(ui_mat)
    X.data = np.ones_like(X.data)
    N = float(X.shape[0])
    idf = np.log(N / np.bincount(X.col))
    row_sums = np.ravel(X.sum(axis=1))
    length_norm = (1.0 - B) + B * row_sums / row_sums.mean()
    return (K1 + 1.0) / (K1 * length_norm[X.row] + X.data) * idf[X.col] + EPS


@jax.jit
def _co_support_cosine(W):
    """Dense co-support cosine similarity of the rows of W (three MXU
    matmuls)."""
    B = (W != 0).astype(W.dtype)
    num = W @ W.T
    d1 = (W * W) @ B.T  # ||w_r||^2 over columns c also rated
    d2 = B @ (W * W).T  # ||w_c||^2 over columns r also rated
    denom = jnp.sqrt(d1) * jnp.sqrt(d2)
    return jnp.where(num != 0, num / jnp.maximum(denom, 1e-12), 0.0)


def compute_similarity(data_mat, k=20, verbose=False, chunk=2048):
    """All-pairs co-support cosine similarity, row-blocked on device.

    Drop-in equivalent of reference ``similarity.pyx:51-107`` (which also
    returns the full similarity matrix; its ``k`` is applied at scoring
    time). Returns a dense numpy array.
    """
    W_host = np.asarray(data_mat.todense(), dtype=np.float32)
    n = W_host.shape[0]
    if n <= chunk:
        return np.asarray(_co_support_cosine(jnp.asarray(W_host)), dtype=np.float64)
    # blocked: sim rows per chunk
    W = jnp.asarray(W_host)
    Bm = (W != 0).astype(W.dtype)
    W2 = W * W
    out = np.empty((n, n), dtype=np.float64)

    @jax.jit
    def block(rows):
        wr = W[rows]
        br = (wr != 0).astype(W.dtype)
        num = wr @ W.T
        d1 = (wr * wr) @ Bm.T
        d2 = br @ W2.T
        denom = jnp.sqrt(d1) * jnp.sqrt(d2)
        return jnp.where(num != 0, num / jnp.maximum(denom, 1e-12), 0.0)

    for s in range(0, n, chunk):
        rows = jnp.arange(s, min(s + chunk, n))
        out[s : s + chunk] = np.asarray(block(rows))
    return out


@partial(jax.jit, static_argnames=("k",))
def _knn_scores(sim_rows, R, rated_mask, k):
    """(B, n_items) weighted-vote scores for a chunk of query entities.

    sim_rows: (B, n_neighbors) similarities of the chunk's entities to all
    neighbors; R: (n_neighbors, n_items) ratings; rated_mask: R != 0.
    For every item: take the k largest-similarity neighbors among raters,
    score = sum(sim * rating) / (sum |sim| + 1e-8).
    """
    Bsz = sim_rows.shape[0]
    n_items = R.shape[1]
    # (B, n_items, n_neighbors) masked weights
    w = sim_rows[:, None, :] * jnp.ones((1, n_items, 1), sim_rows.dtype)
    eligible = rated_mask.T[None, :, :] & (sim_rows[:, None, :] != 0)
    w = jnp.where(eligible, w, -jnp.inf)
    top_w, top_idx = jax.lax.top_k(w, k)  # by signed similarity
    valid = jnp.isfinite(top_w)
    top_w = jnp.where(valid, top_w, 0.0)
    # gather ratings of the selected neighbors
    top_r = jnp.take_along_axis(
        R.T[None, :, :].repeat(Bsz, axis=0), top_idx, axis=2
    )
    top_r = jnp.where(valid, top_r, 0.0)
    num = jnp.sum(top_w * top_r, axis=2)
    denom = jnp.sum(jnp.abs(top_w), axis=2)
    return num / (denom + EPS)


class _KNNBase(Recommender):
    def __init__(
        self,
        name,
        k=20,
        similarity="cosine",
        mean_centered=False,
        weighting=None,
        amplify=1.0,
        num_threads=0,
        trainable=True,
        verbose=True,
        seed=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.num_threads = num_threads  # no-op: no host threading on TPU
        self.k = k
        self.similarity = similarity
        self.mean_centered = mean_centered
        self.weighting = weighting
        self.amplify = amplify
        self.seed = seed
        self.rng = get_rng(seed)

        if self.similarity not in SIMILARITIES:
            raise ValueError(
                "Invalid similarity choice, supported {}".format(SIMILARITIES)
            )
        if self.weighting is not None and self.weighting not in WEIGHTING_OPTIONS:
            raise ValueError(
                "Invalid weighting choice, supported {}".format(WEIGHTING_OPTIONS)
            )

    def _build_neighbor_index(self, num_neighbors, force=None):
        """Precompute the (n, k) neighbor table with the fused similarity
        top-k kernel (``ops.pallas_similarity.cosine_topk``): the Pallas
        path (opt-in via ops/dispatch) never materializes the (n, n)
        similarity matrix. Replaces the reference's full-matrix
        ``similarity.pyx:51-107`` + per-query heap for neighbor queries."""
        from ..ops.pallas_similarity import cosine_topk

        W = np.asarray(self._weight_mat.todense(), dtype=np.float32)
        sims, ids = cosine_topk(W, num_neighbors, exclude_self=True, force=force)
        sims = np.asarray(sims, dtype=np.float64)
        if self.amplify != 1.0:  # monotone per sign: order is unchanged
            sims = np.where(sims > 0, sims**self.amplify, -((-sims) ** self.amplify))
        self._nn_k = int(min(num_neighbors, W.shape[0] - 1))
        self._nn_sims, self._nn_ids = sims, np.asarray(ids)

    def neighbors(self, indices=None, num_neighbors=None, force=None):
        """Top-``num_neighbors`` most similar entities per entity, under
        the model's own (weighted/centered/amplified) co-support cosine —
        the related-users / related-items serving surface.

        Returns (neighbor_ids (n, k), similarities (n, k)); with
        ``indices`` only those rows. The table is computed once and cached.
        """
        kk = int(num_neighbors if num_neighbors is not None else self.k)
        if (
            getattr(self, "_nn_ids", None) is None
            or self._nn_k < kk
            or force is not None
        ):
            self._build_neighbor_index(kk, force=force)
        kk = min(kk, self._nn_ids.shape[1])
        ids, sims = self._nn_ids[:, :kk], self._nn_sims[:, :kk]
        if indices is None:
            return ids, sims
        idx = np.asarray(indices)
        return ids[idx], sims[idx]

    def _chunked_scores(self, sim_rows, R, chunk=16):
        rated = R != 0
        R_d = jnp.asarray(R, dtype=jnp.float32)
        mask_d = jnp.asarray(rated)
        outs = []
        for s in range(0, sim_rows.shape[0], chunk):
            block = sim_rows[s : s + chunk]
            pad = chunk - block.shape[0]
            if pad:
                block = np.concatenate([block, np.zeros((pad, block.shape[1]))], 0)
            out = np.asarray(
                _knn_scores(
                    jnp.asarray(block, dtype=jnp.float32),
                    R_d,
                    mask_d,
                    k=min(self.k, R.shape[0]),
                )
            )
            outs.append(out[: out.shape[0] - pad] if pad else out)
        return np.concatenate(outs, axis=0)


class UserKNN(_KNNBase):
    """User-based KNN: neighbors are co-rating users."""

    def __init__(
        self,
        name="UserKNN",
        k=20,
        similarity="cosine",
        mean_centered=False,
        weighting=None,
        amplify=1.0,
        num_threads=0,
        trainable=True,
        verbose=True,
        seed=None,
    ):
        super().__init__(
            name=name,
            k=k,
            similarity=similarity,
            mean_centered=mean_centered,
            weighting=weighting,
            amplify=amplify,
            num_threads=num_threads,
            trainable=trainable,
            verbose=verbose,
            seed=seed,
        )

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)

        ui_mat = train_set.matrix.copy()
        self.mean_arr = np.zeros(ui_mat.shape[0])
        if self.min_rating != self.max_rating:  # explicit feedback
            ui_mat, self.mean_arr = _mean_centered(ui_mat)

        if self.mean_centered or self.similarity == "pearson":
            weight_mat = ui_mat.copy()
        else:
            weight_mat = train_set.matrix.copy()

        if self.weighting == "idf":
            weight_mat.data *= np.sqrt(_idf_weight(train_set.matrix))
        elif self.weighting == "bm25":
            weight_mat.data *= np.sqrt(_bm25_weight(train_set.matrix))

        self.ui_centered = np.asarray(ui_mat.todense())  # (n_users, n_items)
        self._weight_mat = weight_mat  # rows = users (neighbor entities)
        self.sim_mat = compute_similarity(weight_mat, k=self.k, verbose=self.verbose)
        if self.amplify != 1.0:
            s = self.sim_mat
            self.sim_mat = np.where(s > 0, s**self.amplify, -((-s) ** self.amplify))

        return self

    def nearest_users(self, user_indices=None, num_neighbors=None, force=None):
        """Related-users serving API; see :meth:`_KNNBase.neighbors`."""
        return self.neighbors(user_indices, num_neighbors, force=force)

    def score(self, user_idx, item_idx=None):
        if not self.knows_user(user_idx):
            raise ScoreException(
                "Can't make score prediction for (user_id=%d)" % user_idx
            )
        if item_idx is not None and not self.knows_item(item_idx):
            raise ScoreException(
                "Can't make score prediction for (item_id=%d)" % item_idx
            )
        row = self._chunked_scores(
            self.sim_mat[user_idx : user_idx + 1], self.ui_centered
        )[0]
        scores = self.mean_arr[user_idx] + row
        return scores if item_idx is None else scores[item_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        safe = np.where(known, users, 0)
        rows = self._chunked_scores(self.sim_mat[safe], self.ui_centered)
        scores = self.mean_arr[safe][:, None] + rows
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores


class ItemKNN(_KNNBase):
    """Item-based KNN: neighbors are items co-rated by the same users."""

    def __init__(
        self,
        name="ItemKNN",
        k=20,
        similarity="cosine",
        mean_centered=False,
        weighting=None,
        amplify=1.0,
        num_threads=0,
        trainable=True,
        verbose=True,
        seed=None,
    ):
        super().__init__(
            name=name,
            k=k,
            similarity=similarity,
            mean_centered=mean_centered,
            weighting=weighting,
            amplify=amplify,
            num_threads=num_threads,
            trainable=trainable,
            verbose=verbose,
            seed=seed,
        )

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)

        ui_mat = train_set.matrix.copy()
        self.mean_arr = np.zeros(ui_mat.shape[0])
        if self.min_rating != self.max_rating:  # explicit feedback
            ui_mat, self.mean_arr = _mean_centered(ui_mat)

        if self.mean_centered:
            weight_mat = ui_mat.copy()
        else:
            weight_mat = train_set.matrix.copy()

        if self.similarity == "pearson":  # center by item columns
            weight_mat, _ = _mean_centered(weight_mat.T.tocsr())
            weight_mat = weight_mat.T.tocsr()

        if self.weighting == "idf":
            weight_mat.data *= np.sqrt(_idf_weight(train_set.matrix))
        elif self.weighting == "bm25":
            weight_mat.data *= np.sqrt(_bm25_weight(train_set.matrix))

        self.ui_centered = np.asarray(ui_mat.todense())
        # item-item similarity: rows are items
        self._weight_mat = weight_mat.T.tocsr()  # rows = items
        self.sim_mat = compute_similarity(
            self._weight_mat, k=self.k, verbose=self.verbose
        )
        if self.amplify != 1.0:
            s = self.sim_mat
            self.sim_mat = np.where(s > 0, s**self.amplify, -((-s) ** self.amplify))

        return self

    def nearest_items(self, item_indices=None, num_neighbors=None, force=None):
        """Related-items serving API; see :meth:`_KNNBase.neighbors`."""
        return self.neighbors(item_indices, num_neighbors, force=force)

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        scores = self.score_batch(np.asarray([user_idx]))[0, : self.num_items]
        return scores if item_idx is None else scores[item_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        safe = np.where(known, users, 0)
        # neighbors are items: sim_rows = user's ratings row selects which
        # neighbor items are eligible; weights come from sim_mat columns.
        # Reuse the generic top-k kernel with roles swapped:
        #   sim_rows (B, n_items_neighbors) = user's rating vector != 0
        #   R (n_neighbors, n_items) = sim_mat, eligibility = sim != 0
        # but weight ranking must be by similarity, so instead compute per
        # user: w[j, i] = sim[j, i] where user rated j.
        R = self.ui_centered[safe]  # (B, n_items) user ratings
        sim = jnp.asarray(self.sim_mat, dtype=jnp.float32)
        out = np.empty((len(users), self.sim_mat.shape[0]))
        chunk = 16
        for s in range(0, len(users), chunk):
            block = R[s : s + chunk]
            out[s : s + chunk] = np.asarray(
                _item_knn_scores(
                    jnp.asarray(block, dtype=jnp.float32),
                    sim,
                    k=min(self.k, self.sim_mat.shape[0]),
                )
            )
        scores = self.mean_arr[safe][:, None] + out
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            padded = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            padded[:, : scores.shape[1]] = scores
            return padded
        return scores


@partial(jax.jit, static_argnames=("k",))
def _item_knn_scores(user_rows, sim, k):
    """(B, n_items) item-based weighted votes: for target item i, the
    neighbors are items j the user rated, ranked by sim[j, i]."""
    rated = user_rows != 0  # (B, n_j)
    # weights (B, n_i, n_j): sim[j, i] where user rated j else -inf
    w = jnp.where(rated[:, None, :], sim.T[None, :, :], -jnp.inf)
    top_w, top_idx = jax.lax.top_k(w, k)
    valid = jnp.isfinite(top_w) & (top_w != 0)
    top_w = jnp.where(valid, top_w, 0.0)
    # ratings of the selected neighbor items
    top_r = jnp.take_along_axis(
        user_rows[:, None, :].repeat(sim.shape[0], axis=1), top_idx, axis=2
    )
    top_r = jnp.where(valid, top_r, 0.0)
    num = jnp.sum(top_w * top_r, axis=2)
    denom = jnp.sum(jnp.abs(top_w), axis=2)
    return num / (denom + EPS)
