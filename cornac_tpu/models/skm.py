"""SKMeans — spherical k-means recommender (Salah et al., 2016).

Capability parity with reference ``cornac/models/skm/recom_skmeans.py:23`` +
``skm/skmeans.py`` (scipy sparse spherical k-means). The clustering loop is
dense device math: centroid update = one matmul (Zᵀ X), assignment = one
matmul + argmax — both MXU work.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from functools import partial

from ..utils import get_rng
from .recommender import Recommender


@jax.jit
def _skmeans_iter(X, Z):
    """(centroids, partition, likelihood) for one spherical k-means step."""
    MU = Z.T @ X
    MU = MU / (jnp.linalg.norm(MU, axis=1, keepdims=True) + 1e-20)
    sim = X @ MU.T  # (n, k)
    par = jnp.argmax(sim, axis=1)
    likelihood = jnp.sum(jnp.max(sim, axis=1))
    return MU, par, likelihood


@partial(jax.jit, static_argnames=("k",))
def _skmeans_fit(X, par0, k, max_iter, tol):
    """Whole k-means loop on device: iterate until the likelihood moves
    by <= tol or max_iter is hit (single compiled while_loop — the
    per-iteration host round-trip is what dominated wall-clock before)."""
    n = X.shape[0]
    MU0 = jnp.zeros((k, X.shape[1]), X.dtype)

    def cond(state):
        it, _, _, l_cur, l_prev = state
        return (it < max_iter) & (jnp.abs(l_cur - l_prev) > tol)

    def body(state):
        it, par, _, l_cur, _ = state
        Z = jnp.zeros((n, k), X.dtype).at[jnp.arange(n), par].set(1.0)
        MU, par_new, likelihood = _skmeans_iter(X, Z)
        return it + 1, par_new, MU, likelihood, l_cur

    state = (jnp.int32(0), par0, MU0, jnp.float32(jnp.inf), jnp.float32(-jnp.inf))
    it, par, MU, l_cur, _ = jax.lax.while_loop(cond, body, state)
    return MU, par, l_cur, it


class SKMeans(Recommender):
    """Cluster users on the unit hypersphere; score by similarity-weighted
    centroid average."""

    def __init__(
        self,
        k=5,
        max_iter=100,
        name="Skmeans",
        trainable=True,
        tol=1e-6,
        verbose=True,
        seed=None,
        init_par=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.init_par = init_par
        self.centroids = None

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)

        X = np.asarray(train_set.matrix.todense(), dtype=np.float32)
        X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-20)

        if self.trainable:
            n = X.shape[0]
            par = (
                np.asarray(getattr(self, "final_par", self.init_par))
                if getattr(self, "final_par", self.init_par) is not None
                else get_rng(self.seed).randint(self.k, size=n)
            )
            X_d = jnp.asarray(X)
            if self.verbose:
                # per-iteration printing keeps the host in the loop
                par = jnp.asarray(par)
                l_prev = -np.inf
                for it in range(self.max_iter):
                    Z = jnp.zeros((n, self.k), dtype=jnp.float32).at[
                        jnp.arange(n), par
                    ].set(1.0)
                    MU, par, likelihood = _skmeans_iter(X_d, Z)
                    likelihood = float(likelihood)
                    print("Iter %i, likelihood: %f" % (it + 1, likelihood))
                    if abs(likelihood - l_prev) <= self.tol:
                        break
                    l_prev = likelihood
            else:
                MU, par, _, _ = _skmeans_fit(
                    X_d,
                    jnp.asarray(par, dtype=jnp.int32),
                    k=self.k,
                    max_iter=jnp.int32(self.max_iter),
                    tol=jnp.float32(self.tol),
                )
            self.centroids = np.asarray(MU, dtype=np.float64)
            self.final_par = np.asarray(par)
        elif self.verbose:
            print("%s is trained already (trainable = False)" % self.name)

        # user-centroid cosine similarity, used for scoring
        self.user_center_sim = X.astype(np.float64) @ self.centroids.T

        return self

    def _scores_for(self, sims):
        """(B, n_items): similarity-weighted centroid average."""
        weights = sims / (sims.sum(axis=1, keepdims=True) + 1e-20)
        return weights @ self.centroids

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)

        scores = self._scores_for(self.user_center_sim[user_idx : user_idx + 1])[0]
        return scores if item_idx is None else scores[item_idx]

    def _known_scores_device(self, safe_users, known):
        from ..ops.dense_scores import device_dot

        sims = self.user_center_sim[safe_users]
        weights = sims / (sims.sum(axis=1, keepdims=True) + 1e-20)
        return device_dot(weights, self.centroids.T)

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = self._scores_for(self.user_center_sim[np.where(known, users, 0)])
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores
