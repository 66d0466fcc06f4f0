"""SoRec — Social Recommendation via Probabilistic Matrix Co-Factorization
(Ma et al., CIKM 2008).

Capability parity with reference ``cornac/models/sorec/recom_sorec.py:26`` +
``cython/sorec.pyx`` (single-thread RMSProp over a social-edge stream and a
rating stream sharing the user table). Both streams run as the shared
device kernel :func:`cornac_tpu.ops.rmsprop.rmsprop_stream_epoch`.
"""

import math

import jax.numpy as jnp
import numpy as np

from ..exception import ScoreException
from ..ops.rmsprop import run_stream_epoch
from ..utils import get_rng
from ..utils.common import scale, sigmoid
from ..utils.init_utils import normal
from .recommender import ANNMixin, MEASURE_DOT, Recommender


class SoRec(Recommender, ANNMixin):
    """Co-factorize the rating matrix (U, V) and the social adjacency
    matrix (U, Z) with a shared user table."""

    def __init__(
        self,
        name="SoRec",
        k=5,
        max_iter=100,
        learning_rate=0.001,
        lambda_c=10,
        lambda_reg=0.001,
        gamma=0.9,
        weight_link=True,
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
        self.lambda_c = lambda_c
        self.lambda_reg = lambda_reg
        self.gamma = gamma
        self.weight_link = weight_link
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
            self.Z = normal((self.num_users, self.k), std=0.001, random_state=rng)

        (rat_uid, rat_iid, rat_val) = train_set.uir_tuple

        train_user_indices = set(train_set.uir_tuple[0])
        (net_uid, net_jid, net_val) = train_set.user_graph.get_train_triplet(
            train_user_indices, train_user_indices
        )

        if self.weight_link:
            degree = train_set.user_graph.get_node_degree(
                train_user_indices, train_user_indices
            )
            net_val = np.asarray(
                [
                    math.sqrt(
                        degree[int(j)][0] / (degree[int(j)][0] + degree[int(u)][1])
                    )
                    * v
                    for u, j, v in zip(net_uid, net_jid, net_val)
                ],
                dtype="float32",
            )

        if [self.min_rating, self.max_rating] != [0, 1]:
            if self.min_rating == self.max_rating:
                rat_val = scale(rat_val, 0.0, 1.0, 0.0, self.max_rating)
            else:
                rat_val = scale(rat_val, 0.0, 1.0, self.min_rating, self.max_rating)

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

        net_r = jnp.asarray(np.asarray(net_uid), dtype=jnp.int32)
        net_c = jnp.asarray(np.asarray(net_jid), dtype=jnp.int32)
        net_v = jnp.asarray(np.asarray(net_val), dtype=jnp.float32)
        rat_r = jnp.asarray(np.asarray(rat_uid), dtype=jnp.int32)
        rat_c = jnp.asarray(np.asarray(rat_iid), dtype=jnp.int32)
        rat_v = jnp.asarray(np.asarray(rat_val), dtype=jnp.float32)

        lr = self.learning_rate
        for epoch in range(self.max_iter):
            loss = 0.0
            if len(net_val) > 0:
                # social stream: both tables move at lambda_c * lr
                U, Z, cu, cz, l1 = run_stream_epoch(
                    U, Z, cu, cz, net_r, net_c, net_v, rng,
                    lr_a=self.lambda_c * lr, lr_b=self.lambda_c * lr,
                    reg=self.lambda_reg, gamma=self.gamma,
                    batch_size=self.batch_size,
                )
                loss += float(l1)
            U, V, cu, cv, l2 = run_stream_epoch(
                U, V, cu, cv, rat_r, rat_c, rat_v, rng,
                lr_a=lr, lr_b=lr, reg=self.lambda_reg, gamma=self.gamma,
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
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is not None and self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)

        if item_idx is None:
            return self.V.dot(self.U[user_idx, :])

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
