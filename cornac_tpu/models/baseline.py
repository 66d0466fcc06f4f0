"""Non-personalized / bias-only baselines.

Parity with reference ``models/global_avg/recom_global_avg.py:22``,
``models/most_pop/recom_most_pop.py:22``, and
``models/baseline_only/recom_bo.pyx:34`` (Cython bias-only SGD — here a
jitted scatter-add SGD epoch on device).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.accumulate import accumulate_rows
from ..utils import get_rng
from ..utils.init_utils import zeros
from .recommender import Recommender


class GlobalAvg(Recommender):
    """Predict the global mean rating for every pair."""

    def __init__(self, name="GlobalAvg"):
        super().__init__(name=name, trainable=False)

    def score(self, user_idx, item_idx=None):
        if item_idx is None:
            return np.full(self.num_items, self.global_mean)
        return self.global_mean

    def _known_scores_device(self, safe_users, known):
        from ..ops.dense_scores import device_broadcast_row

        return device_broadcast_row(
            np.full(self.num_items, self.global_mean, dtype=np.float32),
            len(safe_users),
        )

    def score_batch(self, user_indices):
        return np.full((len(user_indices), self.total_items), self.global_mean)

    def score_pairs(self, user_indices, item_indices):
        return np.full(len(user_indices), self.global_mean)


class MostPop(Recommender):
    """Rank items by train-set interaction count."""

    def __init__(self, name="MostPop"):
        super().__init__(name=name, trainable=False)
        self.item_pop = None

    def fit(self, train_set, val_set=None):
        super().fit(train_set, val_set)
        self.item_pop = np.ediff1d(train_set.csc_matrix.indptr)
        return self

    def score(self, user_idx, item_idx=None):
        if item_idx is None:
            return self.item_pop
        return self.item_pop[item_idx]

    def _known_scores_device(self, safe_users, known):
        from ..ops.dense_scores import device_broadcast_row

        return device_broadcast_row(
            np.asarray(self.item_pop, dtype=np.float32), len(safe_users)
        )

    def score_batch(self, user_indices):
        row = np.asarray(self.item_pop, dtype=np.float64)
        if len(row) < self.total_items:
            full = np.full(self.total_items, row.min())
            full[: len(row)] = row
            row = full
        return np.broadcast_to(row, (len(user_indices), len(row))).copy()

    def score_pairs(self, user_indices, item_indices):
        items = np.asarray(item_indices)
        known = items < len(self.item_pop)
        return np.where(known, self.item_pop[np.minimum(items, len(self.item_pop) - 1)], 0.0).astype(np.float64)


@partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0, 1))
def _bias_sgd_epoch(Bu, Bi, perm, mask, rid, cid, val, lr, reg, mu, batch_size):
    """One epoch of bias-only SGD (r ~ mu + bu + bi) on device."""
    n_batches = perm.shape[0] // batch_size

    def body(b, carry):
        Bu, Bi, loss = carry
        idx = jax.lax.dynamic_slice(perm, (b * batch_size,), (batch_size,))
        m = jax.lax.dynamic_slice(mask, (b * batch_size,), (batch_size,))
        u, i, r = rid[idx], cid[idx], val[idx]
        err = (r - (mu + Bu[u] + Bi[i])) * m
        loss = loss + jnp.sum(err * err)
        # width-1 scatter-adds are pathological on TPU at small tables;
        # accumulate_rows picks one-hot matmul vs scatter by shape
        Bu = accumulate_rows(Bu, u, lr * (err - reg * Bu[u] * m))
        Bi = accumulate_rows(Bi, i, lr * (err - reg * Bi[i] * m))
        return Bu, Bi, loss

    Bu, Bi, loss = jax.lax.fori_loop(0, n_batches, body, (Bu, Bi, jnp.float32(0.0)))
    return Bu, Bi, 0.5 * loss


class BaselineOnly(Recommender):
    """r_ui ~ mu + b_u + b_i fitted by SGD (Koren, TKDD 2010)."""

    def __init__(
        self,
        name="BaselineOnly",
        max_iter=20,
        learning_rate=0.01,
        lambda_reg=0.02,
        batch_size=256,
        early_stop=False,
        num_threads=0,
        trainable=True,
        verbose=False,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.lambda_reg = lambda_reg
        self.batch_size = batch_size
        self.early_stop = early_stop
        self.num_threads = num_threads  # no-op: no host threading on TPU
        self.seed = seed

        self.init_params = {} if init_params is None else init_params
        self.u_biases = self.init_params.get("Bu", None)
        self.i_biases = self.init_params.get("Bi", None)

    def _init(self):
        if self.u_biases is None:
            self.u_biases = zeros(self.num_users, dtype=np.float32)
        if self.i_biases is None:
            self.i_biases = zeros(self.num_items, dtype=np.float32)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        self._init()
        if not self.trainable:
            return self

        rng = get_rng(self.seed)
        rid, cid, val = train_set.uir_tuple
        n = len(val)
        bsz = min(self.batch_size, n)
        n_pad = (-n) % bsz

        rid_d = jnp.asarray(rid, dtype=jnp.int32)
        cid_d = jnp.asarray(cid, dtype=jnp.int32)
        val_d = jnp.asarray(val, dtype=jnp.float32)
        mask_h = jnp.asarray(
            np.concatenate([np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
        )

        Bu, Bi = jnp.asarray(self.u_biases), jnp.asarray(self.i_biases)
        n_u, n_i = Bu.shape[0], Bi.shape[0]
        if self.mesh is not None:
            from ..parallel import replicate_all, shard_tables

            Bu, Bi = shard_tables(self.mesh, Bu, Bi)
            rid_d, cid_d, val_d, mask_h = replicate_all(
                self.mesh, rid_d, cid_d, val_d, mask_h
            )
        last_loss = 0.0
        for epoch in range(self.max_iter):
            perm = np.concatenate([rng.permutation(n), np.zeros(n_pad, np.int64)])
            Bu, Bi, loss = _bias_sgd_epoch(
                Bu,
                Bi,
                jnp.asarray(perm, dtype=jnp.int32),
                mask_h,
                rid_d,
                cid_d,
                val_d,
                jnp.float32(self.learning_rate),
                jnp.float32(self.lambda_reg),
                jnp.float32(self.global_mean),
                batch_size=bsz,
            )
            loss = float(loss)
            if self.verbose:
                print("Epoch %d/%d, loss = %.2f" % (epoch + 1, self.max_iter, loss))
            if self.early_stop and epoch > 0 and abs(loss - last_loss) < 1e-5:
                break
            last_loss = loss

        self.u_biases = np.asarray(Bu)[:n_u]
        self.i_biases = np.asarray(Bi)[:n_i]
        return self

    def score(self, user_idx, item_idx=None):
        if item_idx is None:
            known_item_scores = self.global_mean + self.i_biases.astype(np.float64)
            if self.knows_user(user_idx):
                known_item_scores += self.u_biases[user_idx]
            return known_item_scores
        score = self.global_mean + (
            self.i_biases[item_idx] if self.knows_item(item_idx) else 0.0
        )
        if self.knows_user(user_idx):
            score += self.u_biases[user_idx]
        return score

    def score_batch_device(self, user_indices):
        import jax.numpy as jnp

        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        bu = np.where(known, self.u_biases[np.where(known, users, 0)], 0.0)
        return (
            jnp.float32(self.global_mean)
            + jnp.asarray(bu, jnp.float32)[:, None]
            + jnp.asarray(self.i_biases, jnp.float32)[None, :]
        )

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        bu = np.where(known, self.u_biases[np.where(known, users, 0)], 0.0)
        scores = self.global_mean + bu[:, None] + self.i_biases[None, :]
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
        known_u = (users >= 0) & (users < self.num_users)
        known_i = (items >= 0) & (items < self.num_items)
        bu = np.where(known_u, self.u_biases[np.where(known_u, users, 0)], 0.0)
        bi = np.where(known_i, self.i_biases[np.where(known_i, items, 0)], 0.0)
        return self.global_mean + bu + bi
