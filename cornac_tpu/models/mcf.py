"""MCF — Matrix Co-Factorization of ratings + item affinity network
(Park, Kim & Choi, 2017).

Capability parity with reference ``cornac/models/mcf/recom_mcf.py:25`` +
``cython/mcf.pyx``: RMSProp over an item-network stream (V, Z) and a rating
stream (U, V) sharing the item table, both on the shared device kernel.
"""

import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..ops.rmsprop import run_stream_epoch
from ..utils import get_rng
from ..utils.common import scale, sigmoid
from ..utils.init_utils import normal
from .recommender import ANNMixin, MEASURE_DOT, Recommender


class MCF(Recommender, ANNMixin):
    """Co-factorize ratings (U, V) and the item-item network (V, Z)."""

    def __init__(
        self,
        name="MCF",
        k=5,
        max_iter=100,
        learning_rate=0.001,
        gamma=0.9,
        lamda=0.001,
        batch_size=1024,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.gamma = gamma
        self.lamda = lamda
        self.batch_size = batch_size
        self.seed = seed
        self.mesh = mesh

        self.init_params = {} if init_params is None else init_params
        self.U = self.init_params.get("U", None)
        self.V = self.init_params.get("V", None)
        self.Z = self.init_params.get("Z", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)

        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        if self.U is None:
            self.U = normal((self.num_users, self.k), std=0.001, random_state=rng)
        if self.V is None:
            self.V = normal((self.num_items, self.k), std=0.001, random_state=rng)
        if self.Z is None:
            self.Z = normal((self.num_items, self.k), std=0.001, random_state=rng)

        (rat_uid, rat_iid, rat_val) = train_set.uir_tuple

        train_item_indices = set(train_set.uir_tuple[1])
        (net_iid, net_jid, net_val) = train_set.item_graph.get_train_triplet(
            train_item_indices, train_item_indices
        )

        if [self.min_rating, self.max_rating] != [0, 1]:
            if self.min_rating == self.max_rating:
                rat_val = scale(rat_val, 0.0, 1.0, 0.0, self.max_rating)
            else:
                rat_val = scale(rat_val, 0.0, 1.0, self.min_rating, self.max_rating)

        if len(net_val) > 0 and [min(net_val), max(net_val)] != [0, 1]:
            if min(net_val) == max(net_val):
                net_val = scale(net_val, 0.0, 1.0, 0.0, max(net_val))
            else:
                net_val = scale(net_val, 0.0, 1.0, min(net_val), max(net_val))

        U = jnp.asarray(self.U, dtype=jnp.float32)
        V = jnp.asarray(self.V, dtype=jnp.float32)
        Z = jnp.asarray(self.Z, dtype=jnp.float32)
        n_u, n_v, n_z = U.shape[0], V.shape[0], Z.shape[0]
        if self.mesh is not None:
            # row-shard all three factor tables (+ their RMSProp caches,
            # which inherit the sharding via zeros_like) over the model
            # axis, same treatment as PMF; padded rows are never indexed
            # by the streams and are sliced off at the end
            from ..parallel import shard_tables

            U, V, Z = shard_tables(self.mesh, U, V, Z)
        cu, cv, cz = jnp.zeros_like(U), jnp.zeros_like(V), jnp.zeros_like(Z)

        net_r = jnp.asarray(np.asarray(net_iid), dtype=jnp.int32)
        net_c = jnp.asarray(np.asarray(net_jid), dtype=jnp.int32)
        net_v = jnp.asarray(np.asarray(net_val), dtype=jnp.float32)
        rat_r = jnp.asarray(np.asarray(rat_uid), dtype=jnp.int32)
        rat_c = jnp.asarray(np.asarray(rat_iid), dtype=jnp.int32)
        rat_v = jnp.asarray(np.asarray(rat_val), dtype=jnp.float32)

        lr = self.learning_rate
        for epoch in range(self.max_iter):
            loss = 0.0
            if len(net_val) > 0:
                V, Z, cv, cz, l1 = run_stream_epoch(
                    V, Z, cv, cz, net_r, net_c, net_v, rng,
                    lr_a=lr, lr_b=lr, reg=self.lamda, gamma=self.gamma,
                    batch_size=self.batch_size,
                )
                loss += float(l1)
            U, V, cu, cv, l2 = run_stream_epoch(
                U, V, cu, cv, rat_r, rat_c, rat_v, rng,
                lr_a=lr, lr_b=lr, reg=self.lamda, gamma=self.gamma,
                batch_size=self.batch_size,
            )
            loss += float(l2)
            if self.verbose:
                print("epoch %i, loss: %f" % (epoch, loss))

        self.U = np.asarray(U, dtype=np.float64)[:n_u]
        self.V = np.asarray(V, dtype=np.float64)[:n_v]
        self.Z = np.asarray(Z, dtype=np.float64)[:n_z]
        return self

    def score(self, user_idx, item_idx=None):
        if item_idx is None:
            if not self.knows_user(user_idx):
                raise ScoreException(
                    "Can't make score prediction for (user_id=%d)" % user_idx
                )
            return self.V.dot(self.U[user_idx, :])

        if not (self.knows_user(user_idx) and self.knows_item(item_idx)):
            raise ScoreException(
                "Can't make score prediction for (user_id=%d, item_id=%d)"
                % (user_idx, item_idx)
            )
        user_pred = sigmoid(self.V[item_idx, :].dot(self.U[user_idx, :]))
        if self.min_rating == self.max_rating:
            return scale(user_pred, 0.0, self.max_rating, 0.0, 1.0)
        return scale(user_pred, self.min_rating, self.max_rating, 0.0, 1.0)

    def _known_scores_device(self, safe_users, known):
        from ..ops.dense_scores import device_dot

        return device_dot(self.U[safe_users], self.V)

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = self.U[np.where(known, users, 0)] @ self.V.T
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
        preds = sigmoid(
            np.sum(
                self.U[np.where(known, users, 0)] * self.V[np.where(known, items, 0)],
                axis=1,
            )
        )
        if self.min_rating == self.max_rating:
            preds = scale(preds, 0.0, self.max_rating, 0.0, 1.0)
        else:
            preds = scale(preds, self.min_rating, self.max_rating, 0.0, 1.0)
        return np.where(known, preds, self.default_score())

    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return self.U

    def get_item_vectors(self):
        return self.V
