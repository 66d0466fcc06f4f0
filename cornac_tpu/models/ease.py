"""EASE — Embarrassingly Shallow Autoencoder (Steck, WWW 2019).

Capability parity with reference ``cornac/models/ease/recom_ease.py:8``
(numpy closed-form ridge inverse). The Gram matrix + inverse run on device:
G = XᵀX is one big MXU matmul and the inverse is a Cholesky-based solve —
exactly the workload TPUs are built for.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from .recommender import ANNMixin, MEASURE_DOT, Recommender


@jax.jit
def _ease_B(X, lamb):
    """Closed-form item-item weight matrix B from dense interactions X."""
    G = X.T @ X
    G = G + lamb * jnp.eye(G.shape[0], dtype=G.dtype)
    P = jnp.linalg.inv(G)
    B = P / (-jnp.diag(P))[None, :]
    B = B * (1.0 - jnp.eye(B.shape[0], dtype=B.dtype))
    return B


class EASE(Recommender, ANNMixin):
    """Closed-form linear item-item autoencoder.

    Parameters
    ----------
    lamb: float, default: 500
        L2 regularization of the Gram matrix.
    posB: bool, default: True
        Clamp negative weights in B to zero.
    """

    def __init__(
        self,
        name="EASEᴿ",
        lamb=500,
        posB=True,
        trainable=True,
        verbose=True,
        seed=None,
        B=None,
        U=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.lamb = lamb
        self.posB = posB
        self.seed = seed
        self.B = B
        self.U = U

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)

        self.U = train_set.matrix  # user-item CSR, kept for scoring

        X = jnp.asarray(self.U.toarray(), dtype=jnp.float32)
        B = np.asarray(_ease_B(X, jnp.float32(self.lamb)), dtype=np.float64)

        if self.posB:
            B[B < 0] = 0

        self.B = B
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)

        if item_idx is None:
            return np.asarray(self.U[user_idx, :].dot(self.B)).ravel()
        return float(np.asarray(self.U[user_idx, :].dot(self.B[:, item_idx])).ravel()[0])

    def _known_scores_device(self, safe_users, known):
        import jax.numpy as jnp

        if getattr(self, "_B_src", None) is not self.B:
            self._B_dev = jnp.asarray(self.B, jnp.float32)
            self._B_src = self.B
            for attr in ("_B_dev", "_B_src"):
                if attr not in self.ignored_attrs:
                    self.ignored_attrs.append(attr)
        rows = jnp.asarray(
            self.U[safe_users].toarray().astype(np.float32, copy=False)
        )
        return rows @ self._B_dev

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        rows = self.U[np.where(known, users, 0)].toarray()  # (B, n_items)
        scores = rows @ self.B
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores

    def score_pairs(self, user_indices, item_indices):
        users = np.asarray(user_indices)
        items = np.asarray(item_indices)
        known = (
            (users >= 0)
            & (users < self.num_users)
            & (items >= 0)
            & (items < self.num_items)
        )
        rows = self.U[np.where(known, users, 0)].toarray()
        preds = np.einsum("bi,ib->b", rows, self.B[:, np.where(known, items, 0)])
        return np.where(known, preds, self.default_score())

    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return self.U

    def get_item_vectors(self):
        return self.B
