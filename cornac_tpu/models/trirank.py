"""TriRank — review-aware tripartite graph ranking (He et al., CIKM 2015).

Capability parity with reference ``cornac/models/trirank/recom_trirank.py:29``
(numpy, per-user power iteration). TPU redesign: symmetric normalization is
vectorized (the reference loops over every nonzero in Python), and the
online recommendation propagates a whole *batch* of users' (p, a, u) vectors
simultaneously as dense matmuls — this is what makes the batched eval path
fast for a model whose scoring is itself an iterative solve.
"""

import numpy as np
from scipy.sparse import csr_matrix

from ..exception import ScoreException
from ..utils import get_rng
from ..utils.init_utils import uniform
from .recommender import Recommender

EPS = 1e-10


class TriRank(Recommender):
    """Tripartite (user-item-aspect) smoothness ranking."""

    def __init__(
        self,
        name="TriRank",
        alpha=1,
        beta=1,
        gamma=1,
        eta_U=1,
        eta_P=1,
        eta_A=1,
        max_iter=100,
        verbose=True,
        init_params=None,
        seed=None,
    ):
        super().__init__(name)
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.eta_U = eta_U
        self.eta_P = eta_P
        self.eta_A = eta_A
        self.max_iter = max_iter
        self.verbose = verbose
        self.seed = seed
        self.rng = get_rng(seed)

        self.init_params = {} if init_params is None else init_params
        self.R = self.init_params.get("R", None)
        self.X = self.init_params.get("X", None)
        self.Y = self.init_params.get("Y", None)
        self.p = self.init_params.get("p", None)
        self.a = self.init_params.get("a", None)
        self.u = self.init_params.get("u", None)

    def _init(self, train_set):
        if self.p is None:
            self.p = uniform(train_set.num_items, random_state=self.rng)
        if self.a is None:
            self.a = uniform(train_set.sentiment.num_aspects, random_state=self.rng)
        if self.u is None:
            self.u = uniform(train_set.num_users, random_state=self.rng)

    @staticmethod
    def _symmetrical_normalization(matrix):
        """w_ij / sqrt(d_i d_j), fully vectorized over the nonzeros."""
        matrix = matrix.tocoo()
        row_norm = np.sqrt(np.asarray(matrix.sum(axis=1)).ravel())
        col_norm = np.sqrt(np.asarray(matrix.sum(axis=0)).ravel())
        data = matrix.data / np.maximum(
            row_norm[matrix.row] * col_norm[matrix.col], EPS
        )
        return csr_matrix((data, (matrix.row, matrix.col)), shape=matrix.shape)

    def _create_matrices(self, train_set):
        sentiment = train_set.sentiment
        n_users, n_items = train_set.num_users, train_set.num_items
        n_aspects = sentiment.num_aspects

        X_row, X_col, Y_row, Y_col = [], [], [], []
        for uid, isid in sentiment.user_sentiment.items():
            for iid, sid in isid.items():
                aids = {aid for aid, _, _ in sentiment.sentiment[sid]}
                for aid in aids:
                    X_row.append(iid)
                    X_col.append(aid)
                    Y_row.append(uid)
                    Y_col.append(aid)

        X = csr_matrix(
            (np.ones(len(X_row)), (X_row, X_col)), shape=(n_items, n_aspects)
        )
        Y = csr_matrix(
            (np.ones(len(Y_row)), (Y_row, Y_col)), shape=(n_users, n_aspects)
        )
        X.data = np.log2(X.data) + 1
        Y.data = np.log2(Y.data) + 1

        self.R = self._symmetrical_normalization(train_set.csr_matrix)
        self.X = self._symmetrical_normalization(X)
        self.Y = self._symmetrical_normalization(Y)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if train_set.sentiment is None:
            raise ValueError("this model needs the sentiment modality attached to the eval method")
        self._init(train_set)
        self.r_mat = train_set.csr_matrix
        if not self.trainable:
            return self
        self._create_matrices(train_set)
        return self

    def _online_recommendation_batch(self, users):
        """Run the power iteration for a batch of users at once."""
        B = len(users)
        n_users, n_items = self.r_mat.shape

        p_0 = (self.r_mat[users] > 0).astype(np.float64).toarray()
        a_0 = np.asarray(self.Y[users].todense(), dtype=np.float64)
        u_0 = np.zeros((B, n_users))
        u_0[np.arange(B), users] = 1.0

        def l1_normalize(M):
            norms = np.abs(M).sum(axis=1, keepdims=True)
            return np.where(norms > 0, M / np.maximum(norms, EPS), M)

        p_0, a_0, u_0 = l1_normalize(p_0), l1_normalize(a_0), l1_normalize(u_0)

        p = np.tile(self.p, (B, 1))
        a = np.tile(self.a, (B, 1))
        u = np.tile(self.u, (B, 1))

        u_den = self.alpha + self.gamma + self.eta_U + EPS
        p_den = self.alpha + self.beta + self.eta_P + EPS
        a_den = self.gamma + self.beta + self.eta_A + EPS

        inc = 1
        while True:
            new_u = (
                self.alpha / u_den * (self.R @ p.T).T
                + self.gamma / u_den * (self.Y @ a.T).T
                + self.eta_U / u_den * u_0
            )
            new_p = (
                self.alpha / p_den * (self.R.T @ new_u.T).T
                + self.beta / p_den * (self.X @ a.T).T
                + self.eta_P / p_den * p_0
            )
            new_a = (
                self.gamma / a_den * (self.Y.T @ new_u.T).T
                + self.beta / a_den * (self.X.T @ new_p.T).T
                + self.eta_P / a_den * a_0
            )
            if (self.max_iter > 0 and inc > self.max_iter) or (
                np.allclose(new_u, u) and np.allclose(new_p, p) and np.allclose(new_a, a)
            ):
                u, p, a = new_u, new_p, new_a
                break
            u, p, a = new_u, new_p, new_a
            inc += 1
        return p, a, u

    def _scaled_scores(self, users):
        p, _, _ = self._online_recommendation_batch(users)
        # zero out already-rated items, then rescale to the rating range
        for b, uidx in enumerate(users):
            p[b, self.r_mat[uidx].indices] = 0
        max_p = np.maximum(p.max(axis=1, keepdims=True), EPS)
        return p * (self.max_rating - self.min_rating) / max_p + self.min_rating

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        scores = self._scaled_scores(np.asarray([user_idx]))[0]
        return scores if item_idx is None else scores[item_idx]

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = self._scaled_scores(np.where(known, users, 0))
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
